"""Loglikelihood task-harness tests: scoring correctness on synthetic
docs, zero-shot vs 5-shot context assembly, and the MMLU formatter
(reference suite: lm-eval 0-shot x7 + 5-shot MMLU, evaluate.sh:9-27)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arcquant_tpu.config import get_model_config
from arcquant_tpu.evals import tasks as T
from arcquant_tpu.models import llama


@pytest.fixture(scope="module")
def model():
    cfg = get_model_config("test-tiny")
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    return cfg, params


def test_loglikelihood_matches_manual(model):
    """score() must equal the hand-computed summed logprob of the
    continuation tokens given the context."""
    cfg, params = model
    ll = T.make_loglikelihood_fn(cfg, params, None, None)
    toks = np.zeros((2, 32), np.int32)
    seq = np.arange(1, 13) % cfg.vocab_size
    toks[0, :12] = seq
    toks[1, :12] = seq[::-1]
    ctx_lens = np.asarray([8, 8], np.int32)
    lens = np.asarray([12, 12], np.int32)
    out = np.asarray(ll(jnp.asarray(toks), jnp.asarray(ctx_lens),
                        jnp.asarray(lens)))
    logits = llama.model_forward(cfg, params, jnp.asarray(toks))
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    for b in range(2):
        want = sum(float(logp[b, t - 1, toks[b, t]])
                   for t in range(8, 12))
        assert abs(out[b] - want) < 1e-3


def test_evaluate_tasks_zero_and_five_shot(model):
    """The 5-shot path must run end-to-end and score the SAME docs
    with longer contexts than zero-shot (pipeline check on synthetic
    docs; accuracy value is not a model metric here)."""
    cfg, params = model
    r0 = T.evaluate_tasks(cfg, params, ["synthetic:8"], limit=8,
                          batch=4, seed=3)
    r5 = T.evaluate_tasks(cfg, params, ["synthetic:8"], limit=8,
                          batch=4, seed=3, num_fewshot=5)
    assert set(r0) == {"synthetic:8"} and set(r5) == {"synthetic:8"}
    assert 0.0 <= r0["synthetic:8"] <= 1.0
    assert 0.0 <= r5["synthetic:8"] <= 1.0


def test_fewshot_prefix_token_level():
    docs = [([1, 2], [[3], [4]], 1, None), ([5], [[6], [7]], 0, None)]
    pre = T._fewshot_prefix(docs, None, 2, token_level=True)
    # each shot = context + CORRECT continuation
    assert pre == [1, 2, 4, 5, 6]


def test_fewshot_prefix_subject_matched_text():
    docs = [("q1", [" A", " B"], 0, "law"),
            ("q2", [" A", " B"], 1, "math"),
            ("q3", [" A", " B"], 1, "law")]
    pre = T._fewshot_prefix(docs, "law", 5, token_level=False)
    assert pre == "q1 A\n\nq3 B\n\n"
    # no shots -> empty prefix, no separator
    assert T._fewshot_prefix(docs, "chemistry", 5, False) == ""


def test_mmlu_formatter():
    d = {"question": "What is 2+2?",
         "choices": ["3", "4", "5", "6"], "answer": 1,
         "subject": "elementary_mathematics"}
    ctx, choices, ans, subject = T._mmlu(d)
    assert ctx.splitlines()[0] == "What is 2+2?"
    assert ctx.splitlines()[2] == "B. 4"
    assert ctx.endswith("Answer:")
    assert choices == [" A", " B", " C", " D"]
    assert ans == 1 and subject == "elementary_mathematics"
    assert TaskSpecsHasMMLU()


def TaskSpecsHasMMLU():
    args, split, fn, fs = T.TASK_SPECS["mmlu"]
    return split == "test" and fs == "dev" and fn is T._mmlu
