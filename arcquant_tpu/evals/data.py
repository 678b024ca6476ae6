"""Calibration/eval dataset loaders.

Mirrors the reference's loaders (model/datautils.py:1-177 and
utilize.py:256-384: wikitext2, ptb, c4, pile, humaneval) on top of HF
`datasets`, with a deterministic synthetic fallback for air-gapped
environments (this build environment has no network egress). The
synthetic stream is Zipf-distributed with Markov structure so
perplexity is meaningful and reproducible.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

DATASETS = ("wikitext2", "ptb", "c4", "pile", "humaneval", "synthetic")


def synthetic_stream(vocab_size: int, n_tokens: int,
                     seed: int = 0) -> np.ndarray:
    """Deterministic pseudo-language token stream: Zipf unigram prior
    mixed with a first-order Markov kernel, so a real LM achieves
    non-trivial (and quantization-sensitive) perplexity."""
    rng = np.random.default_rng(seed)
    v = vocab_size
    ranks = np.arange(1, v + 1)
    unigram = 1.0 / ranks
    unigram /= unigram.sum()
    # sparse per-token successor preferences
    n_succ = min(32, v)
    succ = rng.integers(0, v, size=(v, n_succ))
    out = np.empty(n_tokens, np.int32)
    cur = int(rng.integers(0, v))
    unigram_draws = rng.choice(v, size=n_tokens, p=unigram)
    mix = rng.random(n_tokens)
    succ_pick = rng.integers(0, n_succ, size=n_tokens)
    for i in range(n_tokens):
        if mix[i] < 0.6:
            cur = int(succ[cur, succ_pick[i]])
        else:
            cur = int(unigram_draws[i])
        out[i] = cur
    return out


# dataset -> (load_dataset args, text column, joiner[, fixed split])
_HF_SPECS: Dict[str, tuple] = {
    "wikitext2": (("wikitext", "wikitext-2-raw-v1"), "text", "\n\n"),
    "ptb": (("ptb_text_only", "penn_treebank"), "sentence", " "),
    "c4": (("allenai/c4", "en"), "text", " "),
    "pile": (("monology/pile-uncopyrighted",), "text", "\n\n"),
    # joined problem prompts (reference utilize.py:352-384 via
    # human_eval.read_problems); the HF mirror has only "test"
    "humaneval": (("openai_humaneval",), "prompt", "\n\n", "test"),
}


def _local_records(dataset: str, split: str):
    """Offline mirror: ARC_DATA_DIR/<dataset>.<split>.jsonl with one
    JSON record per line carrying the dataset's text column (same
    record schema as the HF dataset, so column selection and joining
    run the identical code path). Returns a list of records or None."""
    import json
    import os
    root = os.environ.get("ARC_DATA_DIR")
    if not root:
        return None
    path = os.path.join(root, f"{dataset}.{split}.jsonl")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def _hf_text_stream(dataset: str, split: str) -> str:
    """Join a text dataset split: column select + joiner per _HF_SPECS
    (reference datautils.py:11-27 joins column text with the dataset's
    separator). Records come from a local ARC_DATA_DIR mirror when
    present, else HF `datasets` (requires network or local cache)."""
    if dataset not in _HF_SPECS:
        raise KeyError(dataset)
    spec = _HF_SPECS[dataset]
    args, column, joiner = spec[:3]
    if len(spec) > 3:
        split = spec[3]
    records = _local_records(dataset, split)
    if records is None:
        from datasets import load_dataset  # lazy: offline envs never import
        ds = load_dataset(*args, split=split)
        return joiner.join(ds[column])
    return joiner.join(r[column] for r in records)


def get_token_stream(dataset: str, split: str, tokenizer,
                     vocab_size: int = 32000, n_tokens: int = 2048 * 16,
                     seed: int = 0) -> np.ndarray:
    """Return a flat int32 token stream for PPL eval / calibration.

    tokenizer: a callable text -> list[int] (HF tokenizer.encode), or
    None with dataset='synthetic'."""
    if dataset == "synthetic":
        return synthetic_stream(vocab_size, n_tokens, seed)
    text = _hf_text_stream(dataset, split)
    return np.asarray(tokenizer(text), np.int32)


def get_calib_samples(dataset: str, tokenizer, nsamples: int = 128,
                      seqlen: int = 2048, vocab_size: int = 32000,
                      seed: int = 0) -> np.ndarray:
    """[nsamples, seqlen] random windows from the train split
    (reference utilize.py:256-274)."""
    stream = get_token_stream(
        dataset, "train", tokenizer, vocab_size,
        n_tokens=max(nsamples * seqlen * 2, 2048 * 32), seed=seed)
    rng = np.random.default_rng(seed)
    n = stream.shape[0]
    starts = rng.integers(0, max(n - seqlen - 1, 1), size=nsamples)
    return np.stack([stream[s:s + seqlen] for s in starts]).astype(np.int32)
