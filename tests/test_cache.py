"""Paged int4 KV cache tests: quantize/dequant roundtrip, append
scatter, gather, and Pallas flash-decode parity vs dense attention."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arcquant_tpu.config import get_model_config
from arcquant_tpu.cache import paged
from arcquant_tpu.kernels.paged_decode import paged_decode


def test_quantize_kv_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 7, 3, 128))
    codes, scale, minv = paged.quantize_kv(x)
    assert codes.shape == (4, 7, 3, 64) and codes.dtype == jnp.uint8
    y = paged.dequantize_kv(codes, scale, minv)
    # int4 asym with 15 levels: error bounded by scale/2
    err = jnp.abs(y - x)
    bound = scale[..., None] * 0.5 + 1e-6
    assert bool(jnp.all(err <= bound))


def test_quantize_kv_matches_reference_numerics():
    """Codes and dequant must equal the reference's
    asym_quantize_and_pack_i4 / unpack_i4_and_asym_dequantize
    (kv_cache.py:22-38): continuous zero = -xmin, single rounding
    q = round((x - xmin)/scale), dequant q*scale + xmin."""
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 64)) * 3
    codes, scale, minv = paged.quantize_kv(x)
    vals = paged.unpack_codes(codes).astype(jnp.float32)
    # reference formula (kv_cache.py:24-29)
    xmax = jnp.max(x, -1, keepdims=True)
    xmin = jnp.min(x, -1, keepdims=True)
    rscale = jnp.maximum(xmax - xmin, 1e-5) / 15.0
    rq = jnp.clip(jnp.round((x - xmin) / rscale), 0, 15)
    np.testing.assert_array_equal(np.asarray(vals), np.asarray(rq))
    ref = rq * rscale + xmin                  # q*scale - zero
    got = vals * scale[:, None] + minv[:, None]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    # the continuous zero strictly improves on a grid-rounded zero for
    # one-sided vectors (an all-positive vector saturates the grid
    # zero at |xmin| error; VERDICT weak #8 / ADVICE round 1)
    xp = jnp.abs(x) + 0.5                      # strictly positive rows
    c2, s2, m2 = paged.quantize_kv(xp)
    mse_cont = float(jnp.mean(
        (paged.dequantize_kv(c2, s2, m2) - xp) ** 2))
    gz = jnp.clip(jnp.round(-jnp.min(xp, -1) / s2), 0, 15)
    qg = jnp.clip(jnp.round(xp / s2[:, None]) + gz[:, None], 0, 15)
    mse_grid = float(jnp.mean(
        ((qg - gz[:, None]) * s2[:, None] - xp) ** 2))
    assert mse_cont <= mse_grid


@pytest.fixture(scope="module")
def small_cache():
    cfg = get_model_config("test-tiny")  # Hkv=2, Dh=64
    cache = paged.init_cache(cfg, num_pages=8, page_size=16)
    return cfg, cache


def test_append_and_gather(small_cache):
    cfg, cache = small_cache
    b, t, h, d = 2, 20, cfg.num_kv_heads, cfg.head_dim
    k = jax.random.normal(jax.random.PRNGKey(2), (b, t, h, d))
    v = jax.random.normal(jax.random.PRNGKey(3), (b, t, h, d))
    # seq 0 uses pages [1, 2]; seq 1 uses pages [3, 4]
    page_table = jnp.asarray([[1, 2, 0, 0], [3, 4, 0, 0]], jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
    cache = paged.append_kv(cache, 0, k, v, page_table, positions)
    kg, vg = paged.gather_kv(cache, 0, page_table, max_len=t)
    kq = paged.dequantize_kv(*paged.quantize_kv(k))
    vq = paged.dequantize_kv(*paged.quantize_kv(v))
    np.testing.assert_allclose(np.asarray(kg), np.asarray(kq), atol=1e-5)
    np.testing.assert_allclose(np.asarray(vg), np.asarray(vq), atol=1e-5)


def test_append_masked_positions(small_cache):
    cfg, cache = small_cache
    b, t, h, d = 2, 4, cfg.num_kv_heads, cfg.head_dim
    k = jnp.ones((b, t, h, d))
    v = jnp.ones((b, t, h, d))
    page_table = jnp.asarray([[1, 0], [2, 0]], jnp.int32)
    # seq 1 writes nothing (all positions masked)
    positions = jnp.stack([jnp.arange(t),
                           jnp.full((t,), -1, jnp.int32)])
    cache = paged.append_kv(cache, 0, k, v, page_table, positions)
    # params axis 2 row 0 = k_scale
    assert int(jnp.sum(cache.params[0][2, :, paged.K_SCALE])) == 0
    assert float(jnp.max(cache.params[0][1, :, paged.K_SCALE])) > 0


def _dense_ref_decode(q, k, v, seq_lens):
    """Per-seq masked attention of a single query token (f32)."""
    b, hq, dh = q.shape
    hkv = k.shape[2]
    g = hq // hkv
    kk = jnp.repeat(k, g, axis=2)
    vv = jnp.repeat(v, g, axis=2)
    s = jnp.einsum("bhd,bthd->bht", q.astype(jnp.float32),
                   kk.astype(jnp.float32)) / math.sqrt(dh)
    mask = jnp.arange(k.shape[1])[None, None, :] < seq_lens[:, None, None]
    s = jnp.where(mask, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bht,bthd->bhd", p, vv.astype(jnp.float32))


@pytest.mark.parametrize("seq_lens", [[33, 17], [16, 32], [1, 5]])
def test_paged_decode_parity(small_cache, seq_lens):
    cfg, cache = small_cache
    b, h, d = 2, cfg.num_kv_heads, cfg.head_dim
    hq = cfg.num_heads
    tmax = 32
    seq_lens = jnp.asarray(seq_lens, jnp.int32)
    tall = int(seq_lens.max())
    k = jax.random.normal(jax.random.PRNGKey(4), (b, tmax + 8, h, d))
    v = jax.random.normal(jax.random.PRNGKey(5), (b, tmax + 8, h, d))
    page_table = jnp.asarray([[1, 2, 3, 0], [4, 5, 6, 0]], jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(tmax + 8)[None], (b, tmax + 8))
    positions = jnp.where(positions < seq_lens[:, None], positions, -1)
    cache = paged.append_kv(cache, 1, k, v, page_table, positions)

    q = jax.random.normal(jax.random.PRNGKey(6), (b, hq, d))
    out = paged_decode(q, cache, 1, page_table, seq_lens)

    kq = paged.dequantize_kv(*paged.quantize_kv(k))[:, :tall]
    vq = paged.dequantize_kv(*paged.quantize_kv(v))[:, :tall]
    ref = _dense_ref_decode(q, kq, vq, seq_lens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def _dense_ref_prefill(q, k, v, q_starts, seq_lens):
    """Causal masked attention of a Tq-chunk with per-row origins
    (f32). q: [B, Tq, Hq, D]; k/v: [B, Tk, Hkv, D]."""
    b, tq, hq, dh = q.shape
    hkv = k.shape[2]
    g = hq // hkv
    kk = jnp.repeat(k, g, axis=2)
    vv = jnp.repeat(v, g, axis=2)
    s = jnp.einsum("bihd,bjhd->bhij", q.astype(jnp.float32),
                   kk.astype(jnp.float32)) / math.sqrt(dh)
    qpos = q_starts[:, None] + jnp.arange(tq)[None, :]       # [B, Tq]
    kpos = jnp.arange(k.shape[1])                            # [Tk]
    mask = ((kpos[None, None, None, :] <= qpos[:, None, :, None])
            & (kpos[None, None, None, :] < seq_lens[:, None, None, None]))
    s = jnp.where(mask, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    p = jnp.where(jnp.isnan(p), 0.0, p)       # fully-masked rows
    return jnp.einsum("bhij,bjhd->bihd", p, vv.astype(jnp.float32))


@pytest.mark.parametrize("starts,seq_lens", [
    ([0, 0], [12, 20]),          # first chunk, ragged lengths
    ([16, 16], [36, 29]),        # later chunk, shared start
    ([16, 4], [36, 24]),         # ragged per-ROW starts (prefix share)
    ([0, 0], [20, 0]),           # idle row: zero pages, guarded DMA
])
def test_paged_prefill_parity(small_cache, starts, seq_lens):
    from arcquant_tpu.kernels.paged_decode import paged_prefill
    cfg, cache = small_cache
    b, h, d = 2, cfg.num_kv_heads, cfg.head_dim
    hq = cfg.num_heads
    tq = 20
    starts = jnp.asarray(starts, jnp.int32)
    seq_lens = jnp.asarray(seq_lens, jnp.int32)
    tall = max(int(seq_lens.max()), 1)
    tk = 48
    k = jax.random.normal(jax.random.PRNGKey(7), (b, tk, h, d))
    v = jax.random.normal(jax.random.PRNGKey(8), (b, tk, h, d))
    page_table = jnp.asarray([[1, 2, 3, 0], [4, 5, 6, 0]], jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(tk)[None], (b, tk))
    positions = jnp.where(positions < seq_lens[:, None], positions, -1)
    cache = paged.append_kv(cache, 0, k, v, page_table, positions)

    q = jax.random.normal(jax.random.PRNGKey(9), (b, tq, hq, d))
    out = paged_prefill(q, cache, 0, page_table, starts, seq_lens)

    kq = paged.dequantize_kv(*paged.quantize_kv(k))[:, :tall]
    vq = paged.dequantize_kv(*paged.quantize_kv(v))[:, :tall]
    ref = _dense_ref_prefill(q, kq, vq, starts, seq_lens)
    got = np.asarray(out, np.float64)
    want = np.asarray(ref, np.float64)
    # compare only rows whose query position is within the sequence
    # (padded/past-end rows are discarded by the engine)
    for bi in range(b):
        valid = (np.asarray(starts)[bi] + np.arange(tq)
                 < np.asarray(seq_lens)[bi])
        np.testing.assert_allclose(got[bi][valid], want[bi][valid],
                                   rtol=2e-3, atol=2e-3)
