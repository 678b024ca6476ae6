"""lm-eval-harness adapter: run ANY lm-eval task against the
quantized model.

The reference plugs into lm-eval via HFLM
(/root/reference/model/main.py:177-190: `HFLM(pretrained=model,
tokenizer=tokenizer)` + `simple_evaluate`), so every harness task is
available by name. The hand-implemented tasks in evals/tasks.py cover
the reference's evaluate.sh suite offline; this adapter restores the
*generality* when the `lm_eval` package is installed (it is not baked
into the build environment — everything here is import-gated and
exercised by tests through a stub harness).

Usage:
  lm = make_lm(cfg, qparams, calib, qcfg, tokenizer)
  import lm_eval
  results = lm_eval.simple_evaluate(model=lm, tasks=["hellaswag"])

or turn-key: `python evaluate.py --model <dir> --lm_eval hellaswag`.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax.numpy as jnp

from ..config import ModelConfig, QuantConfig
from . import tasks as T


class _Scorer:
    """Batched, length-bucketed scoring over the accuracy-path
    forward — the compute core shared by the LM methods (one jit per
    (batch, length) bucket, same protocol as evals/tasks.py)."""

    def __init__(self, cfg: ModelConfig, qparams, calib,
                 qcfg: Optional[QuantConfig], batch_size: int = 8,
                 max_len: int = 2048):
        self.cfg = cfg
        self.batch = batch_size
        self.max_len = max_len
        self._ll = T.make_loglikelihood_fn(cfg, qparams, qcfg, calib)
        self._greedy = T.make_greedy_match_fn(cfg, qparams, qcfg,
                                              calib)
        self._next = make_next_token_fn(cfg, qparams, calib, qcfg)

    def _pad_batch(self, rows: Sequence[Tuple[List[int], int]]):
        """rows: (tokens, ctx_len). Returns padded arrays for one
        bucket call."""
        lens = [len(t) for t, _ in rows]
        width = T._bucket(max(lens))
        toks = np.zeros((len(rows), width), np.int32)
        for i, (t, _) in enumerate(rows):
            toks[i, :len(t)] = t
        ctx = np.asarray([c for _, c in rows], np.int32)
        return (jnp.asarray(toks), jnp.asarray(ctx),
                jnp.asarray(lens, np.int32))

    def score(self, reqs: Sequence[Tuple[List[int], List[int]]]
              ) -> List[Tuple[float, bool]]:
        """reqs: (context_tokens, continuation_tokens) ->
        (sum logprob, greedy-matches) per request, lm-eval's
        loglikelihood contract."""
        out: List[Optional[Tuple[float, bool]]] = [None] * len(reqs)
        # group by bucket width for compile reuse; sort by length
        order = sorted(range(len(reqs)),
                       key=lambda i: len(reqs[i][0]) + len(reqs[i][1]))
        for s in range(0, len(order), self.batch):
            idx = order[s:s + self.batch]
            rows = []
            for i in idx:
                ctx, cont = reqs[i]
                full = (list(ctx) + list(cont))[-self.max_len:]
                ctx_len = max(1, len(full) - len(cont))
                rows.append((full, ctx_len))
            # pad the batch to a full batch for compile reuse
            while len(rows) < self.batch:
                rows.append(([0, 0], 1))
            toks, ctx_l, lens = self._pad_batch(rows)
            lls = np.asarray(self._ll(toks, ctx_l, lens))
            greedy = np.asarray(self._greedy(toks, ctx_l, lens))
            for j, i in enumerate(idx):
                out[i] = (float(lls[j]), bool(greedy[j]))
        return out  # type: ignore[return-value]

    def score_rolling(self, streams: Sequence[List[int]],
                      bos_id: int = 0) -> List[float]:
        """Full-sequence logprob (lm-eval loglikelihood_rolling):
        windows of max_len scored with a 1-token conditioning
        prefix carry-over."""
        out = []
        for toks in streams:
            total, start = 0.0, 0
            toks = list(toks)
            while start < len(toks):
                win = toks[max(0, start - 1):start + self.max_len - 1]
                ctx_len = 1    # one conditioning token per window
                if start == 0:
                    win = [bos_id] + win
                (ll, _), = self.score([(win[:ctx_len],
                                        win[ctx_len:])])
                total += ll
                start += len(win) - ctx_len
            out.append(total)
        return out


def make_lm(cfg: ModelConfig, qparams, calib,
            qcfg: Optional[QuantConfig], tokenizer,
            batch_size: int = 8, max_len: int = 2048):
    """Build an lm_eval.api.model.LM over the quantized model.

    Requires the `lm_eval` package (raises ImportError otherwise);
    `tokenizer` is an HF-style tokenizer (encode/decode + eos token).
    """
    from lm_eval.api.model import LM

    scorer = _Scorer(cfg, qparams, calib, qcfg, batch_size, max_len)

    class ARCQuantLM(LM):
        def __init__(self):
            super().__init__()
            self.tokenizer = tokenizer

        # -- lm-eval API ------------------------------------------------
        def loglikelihood(self, requests) -> List[Tuple[float, bool]]:
            reqs = []
            for r in requests:
                ctx, cont = r.args
                ctx_t = (tokenizer.encode(ctx) if ctx
                         else [getattr(tokenizer, "bos_token_id", 0)
                               or 0])
                cont_t = tokenizer.encode(ctx + cont)[len(ctx_t):]
                if not cont_t:          # tokenizer merged the join
                    cont_t = tokenizer.encode(cont)
                reqs.append((ctx_t, cont_t))
            return scorer.score(reqs)

        def loglikelihood_rolling(self, requests) -> List[float]:
            streams = [tokenizer.encode(r.args[0]) for r in requests]
            bos = getattr(tokenizer, "bos_token_id", 0) or 0
            return scorer.score_rolling(streams, bos_id=bos)

        def generate_until(self, requests) -> List[str]:
            # greedy generation through the serving engine would be
            # faster; the accuracy path keeps this adapter
            # self-contained (generation tasks are rare in the
            # reference suite)
            outs = []
            for r in requests:
                ctx, gen_kwargs = r.args
                until = gen_kwargs.get("until", [])
                max_new = gen_kwargs.get("max_gen_toks", 128)
                toks = tokenizer.encode(ctx)
                done = []
                for _ in range(max_new):
                    row = toks[-scorer.max_len + 1:]
                    t, _c, l = scorer._pad_batch(
                        [(row, len(row))] * scorer.batch)
                    nxt = int(np.asarray(scorer._next(t, l))[0])
                    toks.append(nxt)
                    done.append(nxt)
                    text = tokenizer.decode(done)
                    if any(u in text for u in until):
                        for u in until:
                            if u in text:
                                text = text.split(u)[0]
                        break
                else:
                    text = tokenizer.decode(done)
                outs.append(text)
            return outs

    return ARCQuantLM()


def make_next_token_fn(cfg: ModelConfig, qparams, calib,
                       qcfg: Optional[QuantConfig]):
    """Returns next(toks [B, T], lens [B]) -> argmax token id at each
    row's last position (jitted per bucket)."""
    import jax
    from ..models import llama, quantized

    jitted = {}

    def forward(toks):
        if qcfg is None or qcfg.quant_type == "BF16":
            return llama.model_forward(cfg, qparams, toks)
        return quantized.quant_model_forward(cfg, qparams, calib,
                                             qcfg, toks)

    def nxt(toks, lens):
        logits = forward(toks)
        last = jnp.take_along_axis(
            logits, jnp.maximum(lens - 1, 0)[:, None, None]
            .astype(jnp.int32), axis=1)[:, 0]
        return jnp.argmax(last.astype(jnp.float32), axis=-1)

    def call(toks, lens):
        key = toks.shape
        if key not in jitted:
            jitted[key] = jax.jit(nxt)
        return jitted[key](toks, lens)

    return call
