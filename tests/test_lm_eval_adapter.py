"""lm-eval-harness adapter (evals/lm_eval_adapter.py): the LM API is
exercised through a STUB lm_eval package (the real one is not in the
build env) — loglikelihood contract vs the task harness's own scorer,
rolling windows, and generate_until stopping."""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arcquant_tpu.config import get_model_config
from arcquant_tpu.evals import lm_eval_adapter as A
from arcquant_tpu.models import llama


class _Tok:
    """Toy word tokenizer (deterministic, reversible enough)."""
    bos_token_id = 1

    def encode(self, text):
        return [2 + (hash(w) % 400) for w in text.split()]

    def decode(self, ids):
        return " ".join(f"w{i}" for i in ids)


class _Req:
    def __init__(self, *args):
        self.args = args


@pytest.fixture(scope="module")
def model():
    cfg = get_model_config("test-tiny")
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    return cfg, params


@pytest.fixture()
def stub_lm_eval(monkeypatch):
    """Inject a minimal lm_eval.api.model so make_lm imports."""
    pkg = types.ModuleType("lm_eval")
    api = types.ModuleType("lm_eval.api")
    mdl = types.ModuleType("lm_eval.api.model")

    class LM:
        def __init__(self):
            pass

    mdl.LM = LM
    api.model = mdl
    pkg.api = api
    monkeypatch.setitem(sys.modules, "lm_eval", pkg)
    monkeypatch.setitem(sys.modules, "lm_eval.api", api)
    monkeypatch.setitem(sys.modules, "lm_eval.api.model", mdl)
    return pkg


def test_loglikelihood_matches_direct_scorer(model, stub_lm_eval):
    cfg, params = model
    lm = A.make_lm(cfg, params, None, None, _Tok(), batch_size=2,
                   max_len=64)
    reqs = [_Req("the quick brown", " fox jumps"),
            _Req("hello", " world"),
            _Req("", " unconditioned start")]
    out = lm.loglikelihood(reqs)
    assert len(out) == 3
    for ll, greedy in out:
        assert np.isfinite(ll) and ll < 0
        assert isinstance(greedy, bool)
    # cross-check request 0 against a direct scorer call
    tok = _Tok()
    ctx = tok.encode("the quick brown")
    cont = tok.encode("the quick brown fox jumps")[len(ctx):]
    sc = A._Scorer(cfg, params, None, None, batch_size=2, max_len=64)
    (ll0, g0), = sc.score([(ctx, cont)])
    assert abs(out[0][0] - ll0) < 1e-3
    assert out[0][1] == g0


def test_rolling_equals_split_sum(model):
    """Rolling logprob over a long stream == sum of its windows; with
    max_len >= len the single window equals a direct score."""
    cfg, params = model
    sc = A._Scorer(cfg, params, None, None, batch_size=2, max_len=64)
    stream = list(range(5, 25))
    (direct, _), = sc.score([([1], stream)])
    rolled, = sc.score_rolling([stream], bos_id=1)
    assert abs(direct - rolled) < 1e-3
    # windowed: max_len smaller than the stream still covers every
    # token exactly once
    sc2 = A._Scorer(cfg, params, None, None, batch_size=2, max_len=16)
    rolled2, = sc2.score_rolling([stream], bos_id=1)
    assert np.isfinite(rolled2)


def test_generate_until_stops_on_string(model, stub_lm_eval):
    cfg, params = model
    lm = A.make_lm(cfg, params, None, None, _Tok(), batch_size=2,
                   max_len=64)
    outs = lm.generate_until(
        [_Req("a b c", {"until": [" "], "max_gen_toks": 3})])
    assert len(outs) == 1
    assert " " not in outs[0]


def test_next_token_fn_greedy(model):
    cfg, params = model
    nxt = A.make_next_token_fn(cfg, params, None, None)
    toks = jnp.asarray(np.random.RandomState(0).randint(
        2, 100, (2, 16)), jnp.int32)
    lens = jnp.asarray([16, 8], jnp.int32)
    got = np.asarray(nxt(toks, lens))
    logits = llama.model_forward(cfg, params, toks)
    want0 = int(jnp.argmax(logits[0, 15]))
    want1 = int(jnp.argmax(logits[1, 7]))
    assert got.tolist() == [want0, want1]
