"""Ring attention (sequence parallelism) tests on the 8-device CPU
mesh: exact parity vs dense attention, and a 32k-token long-context
run with spot-row verification (VERDICT round-1 #9)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from arcquant_tpu.parallel.ring import ring_attention, sp_flash_prefill

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8-device mesh")


def _sp_mesh():
    return Mesh(np.array(jax.devices()[:8]), ("sp",))


def _dense_ref(q, k, v, causal=True):
    b, t, hq, d = q.shape
    g = hq // k.shape[2]
    kk = np.repeat(np.asarray(k, np.float32), g, axis=2)
    vv = np.repeat(np.asarray(v, np.float32), g, axis=2)
    s = np.einsum("bqhd,bkhd->bhqk", np.asarray(q, np.float32),
                  kk) / math.sqrt(d)
    if causal:
        mask = np.tril(np.ones((t, t), bool))
        s = np.where(mask[None, None], s, -np.inf)
    s -= s.max(-1, keepdims=True)
    p = np.exp(s)
    p /= p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bkhd->bqhd", p, vv)


@pytest.mark.parametrize("causal", [True, False])
def test_ring_matches_dense(causal):
    b, t, hq, hkv, d = 2, 512, 4, 2, 64
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, t, hq, d), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, t, hkv, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, t, hkv, d))
    out = sp_flash_prefill(_sp_mesh(), q, k, v, causal=causal)
    ref = _dense_ref(q, k, v, causal)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5,
                               atol=2e-5)


def test_ring_long_context_32k():
    """32k tokens over 8 sequence shards (4k per device — the dense
    [T, T] scores never materialize). Spot-verify full rows against
    an exact single-row attention."""
    b, t, hq, hkv, d = 1, 32768, 2, 1, 64
    q = jax.random.normal(jax.random.PRNGKey(0), (b, t, hq, d),
                          jnp.float32) * 0.5
    k = jax.random.normal(jax.random.PRNGKey(1), (b, t, hkv, d)) * 0.5
    v = jax.random.normal(jax.random.PRNGKey(2), (b, t, hkv, d))
    out = np.asarray(sp_flash_prefill(_sp_mesh(), q, k, v))
    assert out.shape == (b, t, hq, d)
    assert np.isfinite(out).all()
    kn = np.asarray(k[0, :, 0], np.float32)
    vn = np.asarray(v[0, :, 0], np.float32)
    for pos in (0, 5000, 16383, 32767):     # rows across shards
        for h in range(hq):
            qr = np.asarray(q[0, pos, h], np.float32)
            s = kn[:pos + 1] @ qr / math.sqrt(d)
            s -= s.max()
            p = np.exp(s)
            p /= p.sum()
            ref = p @ vn[:pos + 1]
            np.testing.assert_allclose(out[0, pos, h], ref,
                                       rtol=3e-5, atol=3e-5)
