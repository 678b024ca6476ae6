"""Fused Pallas activation-quantize (kernels/quantize.py round-4):
bit-parity with the golden path at prefill shapes, fallback below the
M threshold, ARC residual handling, and the ue4m3 RNE bit map.

The kernel exists because the XLA lowering of the qdq expressions ran
~10x above HBM bandwidth at K=18944 (round-3/4 prefill traces) and
needed separate abs-max / concat / row-major-pin passes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arcquant_tpu.kernels import quantize as qk
from arcquant_tpu.quant import arc, numerics as N


def synthetic_x(key, m, k, dtype=jnp.float32):
    x = jax.random.normal(key, (m, k))
    cols = jax.random.choice(jax.random.PRNGKey(99), k, (k // 32,),
                             replace=False)
    x = x.at[:, cols].mul(25.0)
    return x.astype(dtype)


class TestUe4m3Bits:
    def test_matches_f8_cast_dense_sweep(self):
        # every float in [2^-10, 600) on a fine grid + exact e4m3
        # values + halfway points
        s = np.concatenate([
            np.geomspace(2.0 ** -10, 600.0, 200001, dtype=np.float32),
            np.linspace(2.0 ** -10, 600.0, 100001, dtype=np.float32),
        ])
        got = np.asarray(qk._ue4m3_qdq_bits(jnp.asarray(s)))
        want = np.asarray(N.quantize_ue4m3(jnp.asarray(s)))
        np.testing.assert_array_equal(got, want)

    def test_exact_grid_points_fixed(self):
        for v, want in [(448.0, 448.0), (449.0, 448.0), (6.0, 6.0),
                        (2.0 ** -9, 2.0 ** -9), (2.0 ** -6, 2.0 ** -6),
                        (1e-12, 2.0 ** -9), (1000.0, 448.0)]:
            got = float(qk._ue4m3_qdq_bits(jnp.float32(v)))
            assert got == want, (v, got, want)


class TestActqPallasParity:
    """m >= 256 triggers the Pallas path; golden = the pure-jnp chain
    (identical expressions, so interpret-mode equality is exact)."""

    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    @pytest.mark.parametrize("ke", [0, 64])
    def test_plain_matches_golden(self, dtype, ke):
        m, k = 256, 512
        x = synthetic_x(jax.random.PRNGKey(0), m, k, dtype)
        ridx = jnp.arange(k, dtype=jnp.int32)
        xa, gx = qk.quantize_x_arc(x, ridx, ke, per_row=True)
        golden, ggx = arc.arc_quantize_x_qdq(x, ridx, ke,
                                             per_row=True)
        np.testing.assert_array_equal(
            np.asarray(xa[:, :k + ke], np.float32),
            np.asarray(golden, np.float32))
        np.testing.assert_array_equal(np.asarray(gx), np.asarray(ggx))
        # pad region stays zero
        if xa.shape[1] > k + ke:
            assert float(jnp.abs(xa[:, k + ke:]).max()) == 0.0

    def test_fallback_below_threshold_identical(self, monkeypatch):
        """The m<threshold XLA path and the Pallas path must agree
        exactly (same expressions either way)."""
        m, k, ke = 256, 512, 64
        x = synthetic_x(jax.random.PRNGKey(1), m, k)
        ridx = jnp.arange(k, dtype=jnp.int32)
        xa_p, gx_p = qk.quantize_x_arc(x, ridx, ke, per_row=True)
        monkeypatch.setenv(qk._ACTQ_PALLAS_M_ENV, "0")
        qk._actq_pallas_min_m.cache_clear()
        xa_x, gx_x = qk.quantize_x_arc(x, ridx, ke, per_row=True)
        monkeypatch.delenv(qk._ACTQ_PALLAS_M_ENV)
        qk._actq_pallas_min_m.cache_clear()
        np.testing.assert_array_equal(np.asarray(xa_p, np.float32),
                                      np.asarray(xa_x, np.float32))
        np.testing.assert_array_equal(np.asarray(gx_p),
                                      np.asarray(gx_x))

    def test_per_tensor_scale_stays_on_xla_path(self):
        # per-tensor needs a global max the row-blocked kernel cannot
        # see; the dispatch must fall back (and still be correct)
        m, k = 256, 512
        x = synthetic_x(jax.random.PRNGKey(2), m, k)
        ridx = jnp.arange(k, dtype=jnp.int32)
        xa, gx = qk.quantize_x_arc(x, ridx, 0, per_row=False)
        assert gx.ndim == 0
        golden, ggx = arc.arc_quantize_x_qdq(x, ridx, 0, per_row=False)
        np.testing.assert_array_equal(np.asarray(xa[:, :k], np.float32),
                                      np.asarray(golden, np.float32))

    def test_ragged_m_padding(self):
        """m not a multiple of the row block (e.g. 300) pads and
        slices back."""
        m, k = 300, 512
        x = synthetic_x(jax.random.PRNGKey(3), m, k)
        ridx = jnp.arange(k, dtype=jnp.int32)
        xa, gx = qk.quantize_x_arc(x, ridx, 0, per_row=True)
        assert xa.shape[0] == m and gx.shape == (m, 1)
        golden, ggx = arc.arc_quantize_x_qdq(x, ridx, 0, per_row=True)
        np.testing.assert_array_equal(np.asarray(xa[:, :k], np.float32),
                                      np.asarray(golden, np.float32))

    def test_zero_rows_are_safe(self):
        x = jnp.zeros((256, 256), jnp.bfloat16)
        ridx = jnp.arange(256, dtype=jnp.int32)
        xa, gx = qk.quantize_x_arc(x, ridx, 0, per_row=True)
        assert float(jnp.abs(xa).max()) == 0.0
        assert bool(jnp.all(gx == 1e-12))


class TestRmsnormFused:
    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_matches_llama_rmsnorm_chain(self, dtype):
        """Fused rmsnorm+quantize vs llama.rms_norm -> golden quantize.

        NOT bit-exact by design: the variance is a SUM reduce whose
        f32 accumulation order differs between lowering contexts
        (eager vs fused vs Mosaic), so the bf16 normalized values can
        flip on ulp boundaries and the quantized outputs move by at
        most one e2m1 step on those elements. (plain and silu_mul
        modes have no sum reduce and ARE bit-exact — see
        TestActqPallasParity / TestSiluMulGu.)"""
        from arcquant_tpu.models import llama
        m, k = 256, 512
        x = synthetic_x(jax.random.PRNGKey(4), m, k, dtype)
        w = (jax.random.normal(jax.random.PRNGKey(5), (k,)) * 0.1 + 1
             ).astype(dtype)
        ridx = jnp.arange(k, dtype=jnp.int32)
        xa, gx = qk.rmsnorm_quantize_x(x, w, 1e-6, ridx, 0,
                                       per_row=True)
        normed = llama.rms_norm(x, w, 1e-6)
        golden, ggx = arc.arc_quantize_x_qdq(normed, ridx, 0,
                                             per_row=True)
        a = np.asarray(xa[:, :k], np.float32)
        g = np.asarray(golden, np.float32)
        frac = float((a != g).mean())
        assert frac < 0.03, f"too many boundary flips: {frac}"
        # flipped elements moved to an ADJACENT grid point: the gap
        # between neighboring representable values is at most
        # max(|a|,|g|) (the 0 <-> 0.5*scale step), never more
        gap = np.abs(a - g)
        bound = np.maximum(np.abs(a), np.abs(g)) * 1.0001 + 1e-6
        assert (gap <= bound).all()
        np.testing.assert_allclose(np.asarray(gx), np.asarray(ggx),
                                   rtol=1e-2)


class TestSiluMulGu:
    @pytest.mark.parametrize("ke", [0, 64])
    def test_matches_engine_manual_chain(self, ke):
        """silu_mul_quantize_gu == the engine's unfused chain
        (slice -> f32 silu*up -> bf16 -> quantize_x_arc), bit-exact."""
        m, f = 256, 512
        gu = synthetic_x(jax.random.PRNGKey(6), m, 2 * f, jnp.bfloat16)
        ridx = jnp.arange(f, dtype=jnp.int32)
        xa, gx = qk.silu_mul_quantize_gu(gu, ridx, ke, per_row=True)
        inter = (jax.nn.silu(gu[:, :f].astype(jnp.float32))
                 * gu[:, f:].astype(jnp.float32)).astype(jnp.bfloat16)
        golden, ggx = arc.arc_quantize_x_qdq(inter, ridx, ke,
                                             per_row=True)
        np.testing.assert_array_equal(
            np.asarray(xa[:, :f + ke], np.float32),
            np.asarray(golden, np.float32))
        np.testing.assert_array_equal(np.asarray(gx), np.asarray(ggx))

    @pytest.mark.parametrize("ke", [0, 64])
    def test_defused_dispatch_identical(self, monkeypatch, ke):
        """ARC_SILU_GU_DEFUSE_M routes small M through XLA silu*mul +
        the PLAIN actq kernel; output must stay bit-identical to the
        fused silu_mul mode (the decode-perf flag must never move
        numerics)."""
        m, f = 8, 512
        gu = synthetic_x(jax.random.PRNGKey(8), m, 2 * f, jnp.bfloat16)
        ridx = jnp.arange(f, dtype=jnp.int32)
        xa0, gx0 = qk.silu_mul_quantize_gu(gu, ridx, ke, per_row=True)
        monkeypatch.setenv(qk._SILU_GU_DEFUSE_M_ENV, "64")
        qk._silu_gu_defuse_m.cache_clear()
        xa1, gx1 = qk.silu_mul_quantize_gu(gu, ridx, ke, per_row=True)
        monkeypatch.delenv(qk._SILU_GU_DEFUSE_M_ENV)
        qk._silu_gu_defuse_m.cache_clear()
        np.testing.assert_array_equal(np.asarray(xa0, np.float32),
                                      np.asarray(xa1, np.float32))
        np.testing.assert_array_equal(np.asarray(gx0), np.asarray(gx1))

    def test_small_m_fallback(self, monkeypatch):
        monkeypatch.setenv(qk._ACTQ_PALLAS_M_ENV, "256")
        qk._actq_pallas_min_m.cache_clear()
        m, f = 8, 512
        gu = synthetic_x(jax.random.PRNGKey(7), m, 2 * f, jnp.bfloat16)
        ridx = jnp.arange(f, dtype=jnp.int32)
        xa, gx = qk.silu_mul_quantize_gu(gu, ridx, 64, per_row=True)
        monkeypatch.delenv(qk._ACTQ_PALLAS_M_ENV)
        qk._actq_pallas_min_m.cache_clear()
        inter = (jax.nn.silu(gu[:, :f].astype(jnp.float32))
                 * gu[:, f:].astype(jnp.float32)).astype(jnp.bfloat16)
        golden, _ = arc.arc_quantize_x_qdq(inter, ridx, 64,
                                           per_row=True)
        np.testing.assert_array_equal(
            np.asarray(xa[:, :f + 64], np.float32),
            np.asarray(golden, np.float32))
