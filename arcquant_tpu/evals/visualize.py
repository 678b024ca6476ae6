"""Quantization-error visualization — port of the reference's
model/visualize.py (:23-221): per-layer activation-quantization MSE
for NVFP4 vs Hadamard+NVFP4 vs NVFP4+ARC, per-channel error bar plots,
and MSE-vs-k evolution curves.

Matplotlib renders to files (headless backend); the analysis functions
are usable without matplotlib for tests.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..quant import arc, numerics as N


def hadamard_transform(x: jax.Array, block_size: Optional[int] = None
                       ) -> jax.Array:
    """Power-of-2 butterfly Hadamard transform over the last dim,
    optionally blockwise (reference quantize.py:270-318 — used only in
    visualization comparisons; ARC is positioned as the alternative to
    Hadamard outlier smoothing)."""
    k = x.shape[-1]
    bs = block_size or k
    assert bs & (bs - 1) == 0, f"block_size {bs} not a power of 2"
    shape = x.shape
    h = x.reshape(-1, k // bs, bs).astype(jnp.float32)
    step = 1
    while step < bs:
        h = h.reshape(-1, k // bs, bs // (2 * step), 2, step)
        a = h[..., 0, :]
        b = h[..., 1, :]
        h = jnp.stack([a + b, a - b], axis=-2)
        step *= 2
    h = h.reshape(shape).astype(x.dtype)
    return h / jnp.sqrt(jnp.float32(bs)).astype(x.dtype)


def measure_mse(x: jax.Array, reorder_index: jax.Array,
                select_num: int) -> Dict[str, float]:
    """Activation-quantization MSE under three schemes (reference
    measure_and_record_mse, visualize.py:23-57):
      nvfp4        — plain NVFP4 qdq
      hadamard     — Hadamard-rotate → NVFP4 qdq → rotate back
      arc          — NVFP4 + ARC residual compensation: the residual
                     channels are folded back onto their source
                     channels (visualize.py:45 qx[:,-2k:-k] += qx[:,-k:])
    """
    x2 = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    k = x2.shape[-1]
    out = {}

    q = N.quantize_tensor_qdq(x2, "NVFP4")
    out["nvfp4"] = float(jnp.mean((q - x2) ** 2))

    bs = 1 << (k.bit_length() - 1)
    if bs == k:
        xh = hadamard_transform(x2)
        qh = N.quantize_tensor_qdq(xh, "NVFP4")
        back = hadamard_transform(qh)   # H is its own inverse (scaled)
        out["hadamard"] = float(jnp.mean((back - x2) ** 2))

    xa, gs = arc.arc_quantize_x_qdq(x2, reorder_index, select_num)
    if select_num:
        idx = arc.top_channels(reorder_index, select_num)
        rec = xa[:, :k].at[:, idx].add(xa[:, k:])
    else:
        rec = xa
    out["arc"] = float(jnp.mean((rec * gs - x2) ** 2))
    return out


def mse_evolution(x: jax.Array, reorder_index: jax.Array,
                  ks: Sequence[int]) -> List[float]:
    """ARC MSE as a function of the number of compensated channels
    (reference plot_mse_evolution, visualize.py:59-97)."""
    return [measure_mse(x, reorder_index, k)["arc"] for k in ks]


def plot_layer_mse(records: List[Dict[str, float]], path: str) -> None:
    """Line plot of per-layer MSE per scheme (visualize.py:59-97)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(8, 4))
    for scheme in records[0]:
        ax.plot([r[scheme] for r in records], label=scheme, marker="o")
    ax.set_xlabel("layer")
    ax.set_ylabel("activation quantization MSE")
    ax.set_yscale("log")
    ax.legend()
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)


def plot_channel_error(x: jax.Array, path: str) -> None:
    """Per-channel quantization-error bar plot (visualize.py:127-221)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    x2 = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    q = N.quantize_tensor_qdq(x2, "NVFP4")
    err = np.asarray(jnp.mean((q - x2) ** 2, axis=0))
    fig, ax = plt.subplots(figsize=(10, 3))
    ax.bar(np.arange(err.shape[0]), err, width=1.0)
    ax.set_xlabel("input channel")
    ax.set_ylabel("MSE")
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
