"""Perplexity evaluation — the reference's accuracy protocol
(model/eval.py:14-85): seqlen-2048 samples, layer-by-layer
memory-bounded forwarding, NLL over shifted logits.

Works for both the bf16 baseline and any quantized configuration; the
quantized/bf16 PPL delta is the headline accuracy metric
(BASELINE.md)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig, QuantConfig
from ..models import llama, quantized


def eval_ppl(cfg: ModelConfig, params, token_stream: jax.Array,
             seqlen: int = 2048,
             qcfg: Optional[QuantConfig] = None,
             calib=None,
             batch: int = 1) -> float:
    """Compute perplexity over a flat token stream.

    Args:
      params: model params. When qcfg is given, these must be
        *already-quantized* params (quantized.quantize_model_params);
        passing raw bf16 params with a qcfg raises.
      token_stream: [N] int32 tokens; evaluated as floor(N/seqlen)
        non-overlapping seqlen windows (reference eval.py:20-26).
      qcfg/calib: if given, use the quantized forward.
    Returns perplexity (float).

    Layer-by-layer protocol (reference eval.py:44-84): embeddings for
    all samples are computed first, then each decoder layer forwards
    every sample before moving on — bounding live memory to one
    layer's activations, the TPU analog of the reference's GPU↔CPU
    layer shuttling."""
    nsamples = token_stream.shape[0] // seqlen
    assert nsamples >= 1, "token stream shorter than seqlen"
    toks = token_stream[:nsamples * seqlen].reshape(nsamples, seqlen)

    positions = jnp.arange(seqlen)[None, :]
    cos, sin = llama.rope_cos_sin(cfg, positions)

    @jax.jit
    def embed(t):
        return params["embed"][t]

    if qcfg is not None and qcfg.quant_type != "BF16":
        first = params["layers"][0]["q"]
        if isinstance(first, dict) and "w" in first:
            raise ValueError(
                "eval_ppl got a QuantConfig but raw bf16 layer params; "
                "quantize first with quantized.quantize_model_params")

        # layers with the same per-site select counts share one
        # compiled function (identical shapes; the per-layer reorder
        # indices are traced arguments) — with identity calibration
        # that is ONE compile for the whole model
        from ..models.quantized import SiteCalib
        _sig_cache = {}

        def make_layer_fn(i):
            lc = calib[i]
            sig = tuple(sorted((s, c.select_num) for s, c in lc.items()))
            if sig not in _sig_cache:
                @jax.jit
                def f(lp, ridxs, x, sig=sig):
                    lc2 = {site: SiteCalib(ridxs[site], sel)
                           for site, sel in sig}
                    out, _ = quantized.quant_layer_forward(
                        cfg, lp, x, cos, sin, lc2, qcfg)
                    return out
                _sig_cache[sig] = f
            fn = _sig_cache[sig]
            lp = params["layers"][i]
            ridxs = {site: c.reorder_index for site, c in lc.items()}
            return lambda x: fn(lp, ridxs, x)
    else:
        @jax.jit
        def _bf16_layer(lp, x):
            out, _ = llama.layer_forward(cfg, lp, x, cos, sin)
            return out

        def make_layer_fn(i):
            lp = params["layers"][i]
            return lambda x: _bf16_layer(lp, x)

    @jax.jit
    def nll(x, t):
        x = llama.rms_norm(x, params["final_norm"], cfg.rms_eps)
        head = params.get("lm_head", params["embed"])
        logits = jnp.dot(x, head.T, preferred_element_type=jnp.float32)
        # shift: predict t[1:] from logits[:-1] (eval.py:71-80)
        logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
        tgt = t[:, 1:]
        picked = jnp.take_along_axis(logp, tgt[..., None], axis=-1)
        return -jnp.sum(picked)

    # Build each layer's jitted fn ONCE (per-layer select_nums are
    # static, so layers compile separately; hoisting avoids
    # recompiling per sample).
    layer_fns = [make_layer_fn(i) for i in range(cfg.num_layers)]

    total_nll = 0.0
    for b0 in range(0, nsamples, batch):
        tb = toks[b0:b0 + batch]
        x = embed(tb)
        for f in layer_fns:
            x = f(x)
        total_nll += float(nll(x, tb))

    ntokens = nsamples * (seqlen - 1)
    return float(jnp.exp(total_nll / ntokens))
