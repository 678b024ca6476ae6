"""Pallas kernel parity tests (interpret mode on CPU): the fused
dequant-GEMM and activation quantize ops must match the golden jnp
numerics bit-for-bit-ish (fp32 accumulation ordering aside).

Formalizes the reference's kernel correctness sweep
(kernels/main.py:14-47) as pytest (SURVEY.md §4 item 1).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arcquant_tpu.quant import arc, numerics as N, packing
from arcquant_tpu.kernels import gemm, quantize as qk
from tests.test_numerics import synthetic_outlier_x


class TestDecoders:
    def test_e2m1_bit_decode_matches_table(self):
        codes = jnp.arange(16, dtype=jnp.int32).reshape(2, 8)
        got = gemm._decode_e2m1_f32(codes)
        expect = N.e2m1_decode(codes.astype(jnp.uint8))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(expect))

    def test_ue4m3_bit_decode_matches_fp8(self):
        # 0x7F is NaN in e4m3fn; the encoder never emits it (values are
        # clamped to <= 448 == 0x7E), so it is excluded here.
        bytes_ = jnp.arange(112, dtype=jnp.int32).reshape(7, 16)
        got = gemm._decode_ue4m3_f32(bytes_)
        fp8 = jax.lax.bitcast_convert_type(
            bytes_.astype(jnp.uint8), jnp.float8_e4m3fn)
        expect = fp8.astype(jnp.float32)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(expect))


class TestQuantizeX:
    def test_matches_golden_arc(self):
        x = synthetic_outlier_x(jax.random.PRNGKey(0), 24, 512)
        ridx = jnp.arange(512, dtype=jnp.int32)
        for ke in (0, 64, 128):
            xa, gx = qk.quantize_x_arc(x, ridx, ke)
            golden, ggx = arc.arc_quantize_x_qdq(x, ridx, ke)
            kq = packing.pad_kq(512, ke)
            assert xa.shape == (24, kq)
            np.testing.assert_allclose(
                np.asarray(xa[:, :512 + ke], np.float32),
                np.asarray(golden), rtol=0, atol=0)
            if kq > 512 + ke:
                assert float(jnp.abs(xa[:, 512 + ke:]).max()) == 0.0
            assert abs(float(gx) - float(ggx)) < 1e-12

    def test_rmsnorm_quantize_matches_unfused(self):
        from arcquant_tpu.models import llama
        x = jax.random.normal(jax.random.PRNGKey(1), (8, 256))
        w = jax.random.normal(jax.random.PRNGKey(2), (256,)) * 0.1 + 1
        ridx = jnp.arange(256, dtype=jnp.int32)
        xa, gx = qk.rmsnorm_quantize_x(x, w, 1e-5, ridx, 64)
        normed = llama.rms_norm(x, w, 1e-5)
        xa2, gx2 = qk.quantize_x_arc(normed, ridx, 64)
        np.testing.assert_allclose(np.asarray(xa, np.float32),
                                   np.asarray(xa2, np.float32),
                                   rtol=1e-2, atol=1e-3)


class TestGemmDequant:
    @pytest.mark.parametrize("fmt", ["w4", "w8"])
    @pytest.mark.parametrize("m,n,k,ke", [
        (4, 256, 512, 0),       # decode shape
        (24, 256, 512, 128),    # ragged M with ARC
        (128, 512, 1024, 64),   # prefill-ish
    ])
    def test_matches_golden_linear(self, m, n, k, ke, fmt):
        key = jax.random.PRNGKey(m + n + k + ke)
        x = synthetic_outlier_x(key, m, k)
        w = (jax.random.normal(jax.random.PRNGKey(5), (n, k)) * 0.05)
        ridx = jnp.argsort(jnp.max(jnp.abs(w), axis=0)).astype(jnp.int32)

        pw = packing.pack_weight_arc(w, ridx, ke, fmt=fmt)
        xa, gx = qk.quantize_x_arc(x, ridx, ke, kq=pw.kq)
        y = gemm.gemm_dequant(xa, pw, gx, out_dtype=jnp.float32)

        golden = arc.arc_linear_fake(x, w, ridx, ke)
        assert y.shape == (m, n)
        np.testing.assert_allclose(np.asarray(y), np.asarray(golden),
                                   rtol=2e-2, atol=2e-2)

    def test_w4_w8_same_numerics(self):
        """The two storage formats must decode to identical values."""
        w = jax.random.normal(jax.random.PRNGKey(12), (64, 512)) * 0.1
        ridx = jnp.arange(512, dtype=jnp.int32)
        a = packing.dequantize_weight(
            packing.pack_weight_arc(w, ridx, 64, fmt="w4"), 512, 64)
        b = packing.dequantize_weight(
            packing.pack_weight_arc(w, ridx, 64, fmt="w8"), 512, 64)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    @pytest.mark.parametrize("fmt", ["w4", "w8"])
    def test_bias(self, fmt):
        m, n, k = 8, 128, 256
        x = jax.random.normal(jax.random.PRNGKey(6), (m, k))
        w = jax.random.normal(jax.random.PRNGKey(7), (n, k)) * 0.1
        b = jax.random.normal(jax.random.PRNGKey(8), (n,))
        ridx = jnp.arange(k, dtype=jnp.int32)
        pw = packing.pack_weight_arc(w, ridx, 0, bias=b, fmt=fmt)
        xa, gx = qk.quantize_x_arc(x, ridx, 0, kq=pw.kq)
        y = gemm.gemm_dequant(xa, pw, gx, out_dtype=jnp.float32)
        golden = arc.arc_linear_fake(x, w, ridx, 0, bias=b)
        np.testing.assert_allclose(np.asarray(y), np.asarray(golden),
                                   rtol=2e-2, atol=2e-2)

    def test_mse_decreases_with_ke_sweep(self):
        """Port of the reference kernel MSE sweep (kernels/main.py)."""
        m, n, k = 32, 128, 512
        x = synthetic_outlier_x(jax.random.PRNGKey(9), m, k)
        w = jax.random.normal(jax.random.PRNGKey(10), (n, k)) * 0.05
        ridx = jnp.arange(k, dtype=jnp.int32)  # outliers planted at end
        y_true = x @ w.T
        mses = []
        for ke in (0, 128, 256):
            pw = packing.pack_weight_arc(w, ridx, ke)
            xa, gx = qk.quantize_x_arc(x, ridx, ke, kq=pw.kq)
            y = gemm.gemm_dequant(xa, pw, gx, out_dtype=jnp.float32)
            mses.append(float(jnp.mean((y - y_true) ** 2)))
        assert mses[2] < mses[1] < mses[0], mses

    @pytest.mark.parametrize("fmt", ["w4", "w8"])
    def test_dequantize_weight_kernel_matches_host(self, fmt):
        w = jax.random.normal(jax.random.PRNGKey(11), (64, 512))
        ridx = jnp.arange(512, dtype=jnp.int32)
        pw = packing.pack_weight_arc(w, ridx, 64, fmt=fmt)
        full = gemm.dequantize_weight_kernel(pw, jnp.float32)
        host = packing.dequantize_weight(pw, 512, 64)
        np.testing.assert_allclose(np.asarray(full.T[:, :512 + 64]),
                                   np.asarray(host), rtol=1e-6, atol=1e-6)

    @pytest.mark.parametrize("fmt", ["w4", "w8"])
    @pytest.mark.parametrize("bias", [False, True])
    def test_xla_dispatch_matches_fused(self, fmt, bias, monkeypatch):
        """The large-M dispatch (_gemm_xla: Pallas one-pass weight
        decode + native matmul) must agree with the fused kernel —
        same decode expressions, same bf16 weight grid; only the f32
        k-summation order may differ."""
        m, n, k, ke = 96, 256, 512, 64
        x = synthetic_outlier_x(jax.random.PRNGKey(21), m, k)
        w = jax.random.normal(jax.random.PRNGKey(22), (n, k)) * 0.05
        b = (jax.random.normal(jax.random.PRNGKey(23), (n,))
             if bias else None)
        ridx = jnp.argsort(jnp.max(jnp.abs(w), axis=0)).astype(jnp.int32)
        pw = packing.pack_weight_arc(w, ridx, ke, bias=b, fmt=fmt)
        xa, gx = qk.quantize_x_arc(x, ridx, ke, kq=pw.kq)

        monkeypatch.setenv(gemm._XLA_M_ENV, "0")
        y_fused = gemm.gemm_dequant(xa, pw, gx, out_dtype=jnp.float32)
        monkeypatch.setenv(gemm._XLA_M_ENV, "64")
        y_xla = gemm.gemm_dequant(xa, pw, gx, out_dtype=jnp.float32)

        np.testing.assert_allclose(np.asarray(y_xla),
                                   np.asarray(y_fused),
                                   rtol=1e-4, atol=1e-4)
        golden = arc.arc_linear_fake(x, w, ridx, ke, bias=b)
        np.testing.assert_allclose(np.asarray(y_xla),
                                   np.asarray(golden),
                                   rtol=2e-2, atol=2e-2)

    @pytest.mark.parametrize("bias", [False, True])
    @pytest.mark.parametrize("per_row", [False, True])
    def test_dma_stream_matches_fused(self, bias, per_row, monkeypatch,
                                      tmp_path):
        """The decode-shape manual-DMA kernel (_gemm_dma: codes stay in
        HBM, explicit multi-buffered stripe DMAs) must be BIT-exact vs
        the auto-pipelined fused kernel — identical decode and scale
        expressions, identical f32 k-block accumulation order.

        The weight is square AFTER kq padding (960+64 -> 1024 == n) so
        the dispatch actually takes the DMA path — a spy asserts it
        (the original 512x256 shape fell through to fused-vs-fused
        once the square gate landed in round 3)."""
        from arcquant_tpu.kernels import autotune
        m, n, k, ke = 4, 1024, 960, 64
        x = synthetic_outlier_x(jax.random.PRNGKey(31), m, k)
        w = jax.random.normal(jax.random.PRNGKey(32), (n, k)) * 0.05
        b = (jax.random.normal(jax.random.PRNGKey(33), (n,))
             if bias else None)
        ridx = jnp.argsort(jnp.max(jnp.abs(w), axis=0)).astype(jnp.int32)
        pw = packing.pack_weight_arc(w, ridx, ke, bias=b, fmt="w8")
        assert pw.kq == pw.n == 1024
        xa, gx = qk.quantize_x_arc(x, ridx, ke, kq=pw.kq,
                                   per_row=per_row)

        # no autotune table -> gate falls back to the square heuristic
        monkeypatch.setenv("ARC_AUTOTUNE_FILE",
                           str(tmp_path / "missing.json"))
        autotune.invalidate_cache()
        calls = []
        real = gemm._gemm_dma
        monkeypatch.setattr(
            gemm, "_gemm_dma",
            lambda *a, **kw: calls.append(1) or real(*a, **kw))

        monkeypatch.setenv(gemm._DMA_M_ENV, "0")
        y_fused = gemm.gemm_dequant(xa, pw, gx, out_dtype=jnp.float32)
        assert not calls
        monkeypatch.setenv(gemm._DMA_M_ENV, "64")
        y_dma = gemm.gemm_dequant(xa, pw, gx, out_dtype=jnp.float32)
        assert calls, "dispatch did not take the DMA path"
        monkeypatch.setenv(gemm._DMA_M_ENV, "0")
        autotune.invalidate_cache()

        # same bk => identical accumulation order
        assert bool(jnp.all(y_dma == y_fused))

    @pytest.mark.parametrize("bias", [False, True])
    def test_w4_dma_stream_matches_fused(self, bias, monkeypatch,
                                         tmp_path):
        """The w4 manual-DMA kernel (nibble stripes stay in HBM,
        e2m1x affine decode inside the DMA loop) must be BIT-exact vs
        the fused w4 kernel. w4 takes the DMA path only via an
        explicit table entry (no shape heuristic — VERDICT r4 next
        #4), so the test installs one."""
        import json as _json

        from arcquant_tpu.kernels import autotune
        m, n, k, ke = 4, 512, 960, 64
        x = synthetic_outlier_x(jax.random.PRNGKey(51), m, k)
        w = jax.random.normal(jax.random.PRNGKey(52), (n, k)) * 0.05
        b = (jax.random.normal(jax.random.PRNGKey(53), (n,))
             if bias else None)
        ridx = jnp.argsort(jnp.max(jnp.abs(w), axis=0)).astype(jnp.int32)
        pw = packing.pack_weight_arc(w, ridx, ke, bias=b, fmt="w4")
        assert pw.kq == 1024
        xa, gx = qk.quantize_x_arc(x, ridx, ke, kq=pw.kq)

        monkeypatch.setenv("ARC_AUTOTUNE_FILE",
                           str(tmp_path / "missing.json"))
        autotune.invalidate_cache()
        monkeypatch.setenv(gemm._DMA_M_ENV, "64")
        calls = []
        real = gemm._gemm_dma
        monkeypatch.setattr(
            gemm, "_gemm_dma",
            lambda *a, **kw: calls.append(1) or real(*a, **kw))
        y_fused = gemm.gemm_dequant(xa, pw, gx, out_dtype=jnp.float32)
        assert not calls      # no table, no heuristic -> fused

        table = tmp_path / "w4dma.json"
        table.write_text(_json.dumps({
            f"w4|4|{pw.kq}|{pw.n}": {"fused": 2e-6, "dma": 1e-6}}))
        monkeypatch.setenv("ARC_AUTOTUNE_FILE", str(table))
        autotune.invalidate_cache()
        y_dma = gemm.gemm_dequant(xa, pw, gx, out_dtype=jnp.float32)
        assert calls, "table entry did not route w4 to the DMA path"
        autotune.invalidate_cache()

        assert bool(jnp.all(y_dma == y_fused))


class TestW4BlockAlignment:
    def test_w4_gemm_at_qwen_moe_gateup_shape(self):
        """kq=5632 (qwen1.5-moe gateup: 2048 hidden, pad 5632 aug) has
        1408 as its largest 128-aligned k-divisor; the w4 kernel's x
        blocks are (bm, bk//2) so bk must be 256-aligned or Mosaic
        rejects the 704-wide block (round-4 moe_e2e crash). Interpret
        mode can't see the constraint, so pin the block choice AND run
        the GEMM."""
        from arcquant_tpu.quant.packing import best_k_block
        bk = best_k_block(5632, align=256)
        assert bk and bk % 256 == 0
        # 1408 would be chosen by the old 128-aligned rule
        assert best_k_block(5632) == 1408

        m, n, k = 300, 256, 5504      # pads to kq=5632
        x = synthetic_outlier_x(jax.random.PRNGKey(40), m, k)
        w = jax.random.normal(jax.random.PRNGKey(41), (n, k)) * 0.05
        ridx = jnp.arange(k, dtype=jnp.int32)
        pw = packing.pack_weight_arc(w, ridx, 128, fmt="w4")
        assert pw.kq == 5632
        xa, gx = qk.quantize_x_arc(x, ridx, 128, kq=pw.kq)
        y = gemm.gemm_dequant(xa, pw, gx, out_dtype=jnp.float32)
        golden = arc.arc_linear_fake(x, w, ridx, 128)
        np.testing.assert_allclose(np.asarray(y), np.asarray(golden),
                                   rtol=2e-2, atol=2e-2)
