"""Golden numerics tests (the reference's de-facto unit tests,
kernels/fake.py and kernels/main.py, formalized as pytest —
SURVEY.md §4 item 1/2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arcquant_tpu.quant import numerics as N
from arcquant_tpu.quant import arc, packing


def synthetic_outlier_x(key, m, k, dtype=jnp.float32):
    """Activation matrix with a planted outlier tail in the last
    channels (reference kernels/main.py:14-18, fake.py:182-187)."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    x = jax.random.uniform(k1, (m, k), dtype) * 3
    ks, ko = max(k // 8, 16), max(k // 32, 16)
    x = x.at[:, -ks:].set(jax.random.uniform(k2, (m, ks), dtype) * 3 + 3)
    x = x.at[:, -ko:].set(jax.random.uniform(k3, (m, ko), dtype) * 8 + 8)
    x = x.at[:, -16:].set(jax.random.uniform(k4, (m, 16), dtype) * 16 + 16)
    signs = jax.random.bernoulli(k5, 0.5, (m, k)).astype(dtype) * 2 - 1
    return x * signs


class TestElementCodecs:
    def test_e2m1_values_roundtrip(self):
        vals = jnp.array([-6, -4, -3, -2, -1.5, -1, -0.5, 0,
                          0.5, 1, 1.5, 2, 3, 4, 6], jnp.float32)
        assert jnp.all(N.quantize_e2m1(vals) == vals)

    def test_e2m1_rounding(self):
        x = jnp.array([0.2, 0.26, 0.74, 0.76, 5.01, 4.9, 100.0, -100.0,
                       2.4, 2.6], jnp.float32)
        expect = jnp.array([0.0, 0.5, 0.5, 1.0, 6.0, 4.0, 6.0, -6.0,
                            2.0, 3.0], jnp.float32)
        assert jnp.all(N.quantize_e2m1(x) == expect)

    def test_e2m1_ties_toward_smaller_magnitude(self):
        x = jnp.array([0.25, -0.25, 1.25, -1.25, 5.0, -5.0], jnp.float32)
        expect = jnp.array([0.0, 0.0, 1.0, -1.0, 4.0, -4.0], jnp.float32)
        assert jnp.all(N.quantize_e2m1(x) == expect)

    def test_e2m1_encode_decode_roundtrip(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (64, 64)) * 3
        q = N.quantize_e2m1(x)
        codes = N.e2m1_encode(x)
        assert codes.dtype == jnp.uint8
        assert int(codes.max()) <= 15
        assert jnp.all(N.e2m1_decode(codes) == q)

    def test_ue4m3_range(self):
        s = jnp.array([1e-6, 2.0**-9, 0.01, 1.0, 447.9, 1000.0])
        q = N.quantize_ue4m3(s)
        assert float(q.min()) >= N.UE4M3_MIN
        assert float(q.max()) <= N.UE4M3_MAX
        # exact fp8 values survive
        assert float(N.quantize_ue4m3(jnp.array(1.5))) == 1.5

    def test_ue8m0_is_pow2_ceil(self):
        s = jnp.array([0.3, 1.0, 1.1, 7.9])
        q = N.quantize_ue8m0(s)
        np.testing.assert_allclose(np.asarray(q), [0.5, 1.0, 2.0, 8.0])

    def test_e3m2_roundtrip(self):
        vals = jnp.array([0.0625, 0.1875, 1.0, 1.75, 28.0, -28.0, -0.125])
        assert jnp.all(N.quantize_e3m2(vals) == vals)
        assert float(N.quantize_e3m2(jnp.array(100.0))) == 28.0


class TestGroupQuant:
    @pytest.mark.parametrize("fn,tol", [
        (N.nvfp4_qdq, 0.15), (N.mxfp4_qdq, 0.20),
        (N.mxfp6_qdq, 0.06), (N.int4_group_qdq, 0.15),
    ])
    def test_qdq_relative_error(self, fn, tol):
        x = jax.random.normal(jax.random.PRNGKey(1), (128, 256))
        q = fn(x)
        rel = jnp.linalg.norm(q - x) / jnp.linalg.norm(x)
        assert float(rel) < tol, f"{fn.__name__} rel err {rel}"

    def test_nvfp4_group_scale_semantics(self):
        # one group, absmax 6.0 -> scale 1.0 -> values quantize exactly
        x = jnp.array([[6.0, 3.0, -1.5, 0.5] + [0.0] * 12])
        assert jnp.all(N.nvfp4_qdq(x) == x)

    def test_nvfp4_nonmultiple_padding(self):
        x = jax.random.normal(jax.random.PRNGKey(2), (4, 50))
        q = N.nvfp4_qdq(x)
        assert q.shape == x.shape

    def test_asym_int_group(self):
        x = jax.random.normal(jax.random.PRNGKey(3), (8, 128)) * 2 + 1
        q4 = N.asym_int_group_qdq(x, nbits=4, group=64)
        q8 = N.asym_int_group_qdq(x, nbits=8, group=64)
        e4 = float(jnp.mean((q4 - x) ** 2))
        e8 = float(jnp.mean((q8 - x) ** 2))
        assert e8 < e4 < 0.05

    def test_asym_int4_encode_matches_qdq(self):
        x = jax.random.normal(jax.random.PRNGKey(4), (8, 128)) * 3
        codes, scale, zero = N.asym_int4_encode(x, group=64)
        assert codes.dtype == jnp.uint8 and int(codes.max()) <= 15
        g = codes.reshape(-1, 64).astype(jnp.float32)
        deq = ((g - zero.reshape(-1, 1)) * scale.reshape(-1, 1)
               ).reshape(x.shape)
        np.testing.assert_allclose(
            np.asarray(deq), np.asarray(N.asym_int_group_qdq(x, 4, 64)),
            rtol=1e-5, atol=1e-5)


class TestARC:
    """ARC MSE must decrease monotonically with select_num on an
    outlier-tail distribution (reference kernels/fake.py:189-216,
    kernels/main.py sweep)."""

    def test_arc_mse_monotone_in_k(self):
        key = jax.random.PRNGKey(45510)
        m, n, k = 32, 64, 512
        x = synthetic_outlier_x(key, m, k)
        w = jax.random.uniform(jax.random.PRNGKey(7), (n, k)) * 3
        # outliers are planted at the END -> identity reorder index
        ridx = jnp.arange(k, dtype=jnp.int32)
        y_true = x @ w.T
        mses = []
        for ke in [0, 64, 128, 256]:
            y = arc.arc_linear_fake(x, w, ridx, ke)
            mses.append(float(jnp.mean((y - y_true) ** 2)))
        for a, b in zip(mses, mses[1:]):
            assert b < a, f"ARC MSE not monotone: {mses}"
        # compensating half the channels must cut the error
        # substantially (the residual bulk error remains)
        assert mses[-1] < 0.55 * mses[0], mses

    def test_arc_zero_k_equals_plain_nvfp4(self):
        x = jax.random.normal(jax.random.PRNGKey(8), (16, 128)) * 2
        ridx = jnp.arange(128, dtype=jnp.int32)
        xa, gs = arc.arc_quantize_x_qdq(x, ridx, 0)
        expect = N.nvfp4_qdq(x.astype(jnp.float32) / gs)
        np.testing.assert_allclose(np.asarray(xa), np.asarray(expect),
                                   rtol=1e-6, atol=1e-6)

    def test_arc_respects_reorder_index(self):
        # plant outliers at the FRONT, reorder index maps them to the end
        key = jax.random.PRNGKey(9)
        k = 256
        x = synthetic_outlier_x(key, 16, k)[:, ::-1]  # outliers first
        w = jax.random.uniform(jax.random.PRNGKey(10), (32, k))
        ridx = jnp.arange(k - 1, -1, -1, dtype=jnp.int32)  # front = end
        y_true = x @ w.T
        y0 = arc.arc_linear_fake(x, w, ridx, 0)
        y1 = arc.arc_linear_fake(x, w, ridx, 64)
        e0 = float(jnp.mean((y0 - y_true) ** 2))
        e1 = float(jnp.mean((y1 - y_true) ** 2))
        assert e1 < e0

    def test_average_bits(self):
        assert arc.average_bits(4096, 0) == 4.5
        assert abs(arc.average_bits(4096, 1792) - 4.5 * 5888 / 4096) < 1e-9


class TestPacking:
    def test_nibble_roundtrip(self):
        codes = jax.random.randint(jax.random.PRNGKey(11), (32, 64),
                                   0, 16).astype(jnp.uint8)
        packed = packing.pack_nibbles(codes, axis=-1)
        assert packed.shape == (32, 32)
        assert jnp.all(packing.unpack_nibbles(packed, axis=-1) == codes)
        packed0 = packing.pack_nibbles(codes, axis=0)
        assert packed0.shape == (16, 64)
        assert jnp.all(packing.unpack_nibbles(packed0, axis=0) == codes)

    def test_group_quant_pack_matches_qdq(self):
        x = jax.random.normal(jax.random.PRNGKey(12), (8, 256)) * 4
        codes, scales = packing.quantize_nvfp4_groups(x)
        deq = packing.dequantize_nvfp4_groups(codes, scales)
        np.testing.assert_allclose(np.asarray(deq),
                                   np.asarray(N.nvfp4_qdq(x)),
                                   rtol=1e-6, atol=1e-6)

    def test_packed_weight_matches_golden(self):
        w = jax.random.normal(jax.random.PRNGKey(13), (64, 512)) * 0.1
        ridx = jnp.argsort(jnp.max(jnp.abs(w), axis=0)).astype(jnp.int32)
        ke = 64
        pw = packing.pack_weight_arc(w, ridx, ke, fmt="w4")
        assert pw.codes.shape == (packing.pad_kq(512, ke) // 2, 64)
        golden, gs = arc.arc_quantize_w_qdq(w, ridx, ke)
        got = packing.dequantize_weight(pw, 512, ke)
        np.testing.assert_allclose(np.asarray(got), np.asarray(golden),
                                   rtol=1e-6, atol=1e-6)
        assert abs(float(pw.global_scale) - float(gs)) < 1e-9

    def test_padding_contributes_zero(self):
        w = jax.random.normal(jax.random.PRNGKey(14), (32, 512))
        # w4: decode the nibble codes directly
        pw4 = packing.pack_weight_arc(w, jnp.arange(512), 64, fmt="w4")
        assert pw4.kq > 512 + 64
        full = packing.dequantize_nvfp4_groups(
            packing.unpack_nibbles(pw4.codes.T, axis=-1), pw4.scales.T)
        assert float(jnp.abs(full[:, 512 + 64:]).max()) == 0.0
        # w8: padded group scales are zero, so values * scales vanish
        pw8 = packing.pack_weight_arc(w, jnp.arange(512), 64, fmt="w8")
        s8 = pw8.scales.T.astype(jnp.float32)       # [N, Kq//16]
        assert float(jnp.abs(s8[:, (512 + 64) // 16:]).max()) == 0.0
