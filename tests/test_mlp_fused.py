"""Decode MLP megakernel (kernels/mlp_fused.py): one Pallas program
must be BIT-exact vs the production three-op chain it replaces
(gemm bk=512 -> XLA silu*mul -> Pallas act-quantize -> gemm bk=512),
including the bf16 product round, the per-row global scale, the kq2
zero pad, and biases."""

import os as _os

import jax
import jax.numpy as jnp
import pytest

from arcquant_tpu.kernels import gemm, mlp_fused
from arcquant_tpu.kernels import quantize as qk
from arcquant_tpu.quant import packing

# hardware requires 128-token pages (tokens are lanes); interpret
# mode may use small pages (tests/test_spec.py pattern)
PAGE = 128 if _os.environ.get("ARC_TEST_TPU") else 16


def _mk(m, d, f, bias, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 6)
    x = jax.random.normal(ks[0], (m, d)) * (
        1.0 + 5.0 * (jax.random.uniform(ks[1], (1, d)) > 0.95))
    w_gu = jax.random.normal(ks[2], (2 * f, d)) * 0.05
    w_dn = jax.random.normal(ks[3], (d, f)) * 0.05
    b_gu = jax.random.normal(ks[4], (2 * f,)) if bias else None
    b_dn = jax.random.normal(ks[5], (d,)) if bias else None
    ridx1 = jnp.arange(d, dtype=jnp.int32)
    ridx2 = jnp.arange(f, dtype=jnp.int32)
    pw_gu = packing.pack_weight_arc(w_gu, ridx1, 0, bias=b_gu,
                                    fmt="w8", w_scale="channel")
    pw_dn = packing.pack_weight_arc(w_dn, ridx2, 0, bias=b_dn,
                                    fmt="w8", w_scale="channel")
    xa1, gs1 = qk.quantize_x_arc(x, ridx1, 0, kq=pw_gu.kq,
                                 per_row=True)
    return xa1, gs1, pw_gu, pw_dn


def _chain(xa1, gs1, pw_gu, pw_dn, f):
    """The de-fused production chain at the megakernel's k split."""
    gu = gemm_dequant_bk512(xa1, pw_gu, gs1)
    prod = (jax.nn.silu(gu[:, :f].astype(jnp.float32))
            * gu[:, f:].astype(jnp.float32)).astype(gu.dtype)
    ridx = jnp.arange(f, dtype=jnp.int32)
    xa2, gx2 = qk.quantize_x_arc(prod, ridx, 0, kq=pw_dn.kq,
                                 per_row=True)
    out = gemm_dequant_bk512(xa2, pw_dn, gx2)
    return out, gu, gx2


def gemm_dequant_bk512(xa, pw, gx):
    bn = mlp_fused._pick_bn(pw.n, 1024)
    return gemm.gemm_dequant(xa, pw, gx, bk=512, bn=bn)


@pytest.mark.parametrize("bias", [False, True])
@pytest.mark.parametrize("m", [4, 9])
def test_megakernel_matches_chain(m, bias):
    d, f = 256, 512          # kq1 pads 256 -> 512; kq2 = f = 512
    xa1, gs1, pw_gu, pw_dn = _mk(m, d, f, bias)
    assert pw_gu.kq % 512 == 0 and pw_dn.kq % 512 == 0
    ref_out, ref_gu, ref_gx2 = _chain(xa1, gs1, pw_gu, pw_dn, f)
    out, gu, gx2 = mlp_fused.mlp_w8_fused(xa1, gs1, pw_gu, pw_dn, f)
    assert bool(jnp.all(gu == ref_gu))
    assert bool(jnp.all(gx2 == ref_gx2))
    assert bool(jnp.all(out == ref_out))


def test_megakernel_with_padded_kq2():
    """f with a kq2 zero pad (pad_kq appends zero groups): the pad
    columns must contribute exact +0 in the reference's k order."""
    # f = 512*17: like 18944 (=512*37), no 128-aligned divisor in
    # [1024, 2048] exists, so pad_kq appends a 512 zero group -> 9216
    m, d, f = 4, 256, 8704
    xa1, gs1, pw_gu, pw_dn = _mk(m, d, f, bias=False, key=7)
    assert pw_dn.kq > f
    ref_out, ref_gu, ref_gx2 = _chain(xa1, gs1, pw_gu, pw_dn, f)
    out, gu, gx2 = mlp_fused.mlp_w8_fused(xa1, gs1, pw_gu, pw_dn, f)
    assert bool(jnp.all(gx2 == ref_gx2))
    assert bool(jnp.all(out == ref_out))


def test_dispatch_gate():
    m, d, f = 4, 256, 512
    xa1, gs1, pw_gu, pw_dn = _mk(m, d, f, bias=False)
    ok = lambda mm, **kw: mlp_fused.mlp_fused_ok(    # noqa: E731
        kw.get("gu", pw_gu), kw.get("dn", pw_dn), kw.get("m", m),
        kw.get("f", f), kw.get("per_row", True),
        kw.get("sel", 0))
    import os
    os.environ[mlp_fused._MLP_FUSED_M_ENV] = "16"
    mlp_fused.mlp_fused_dispatch_m.cache_clear()
    try:
        assert ok(16)
        assert not ok(16, m=32)          # above the M gate
        assert not ok(16, per_row=False)  # tensor scales unsupported
        assert not ok(16, sel=64)        # ARC down_in -> 3-op path
        w4 = packing.pack_weight_arc(
            jax.random.normal(jax.random.PRNGKey(9), (2 * f, d)) * 0.05,
            jnp.arange(d, dtype=jnp.int32), 0, fmt="w4")
        assert not ok(16, gu=w4)         # w8 only
    finally:
        os.environ.pop(mlp_fused._MLP_FUSED_M_ENV)
        mlp_fused.mlp_fused_dispatch_m.cache_clear()



def _assert_engine_close(base, fused):
    """Engine-level flag A/B bound. Every SITE is bit-exact on chip
    (the parity tests + on-chip labs), but whole-graph logits are NOT
    exactly flag-invariant: surrounding f32 ops (lm-head dot, rope,
    attention) change tiling/fusion with the graph, and a 1-ulp input
    shift on an e2m1 rounding BOUNDARY flips a quantize code — an
    O(0.1) logit cliff (observed on hardware; CPU stays within f32
    ulps). Same amplification class the TP engine pins with cosine
    bounds (tests/test_parallel.py)."""
    import numpy as np
    a = base.astype(np.float64).ravel()
    b = fused.astype(np.float64).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))
    assert cos > 0.9995, cos
    import jax as _jax
    if _jax.default_backend() == "cpu":
        np.testing.assert_allclose(base, fused, rtol=0, atol=5e-6)


def test_engine_decode_flag_parity():
    """An engine decode step with ARC_MLP_FUSED_M on vs off must be
    LOGIT-identical (the megakernel is the same math in one launch);
    a spy pins that the flag actually flips the path."""
    import os

    import numpy as np

    from arcquant_tpu.config import QuantConfig, get_model_config
    from arcquant_tpu.engine import EngineConfig, InferenceEngine
    from arcquant_tpu.models import llama, quantized

    cfg = get_model_config("test-tiny")
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    qcfg = QuantConfig(quant_type="NVFP4", use_kernels=True,
                       kv_quant=False, act_scale="row",
                       w_scale="channel")
    calib = quantized.identity_calib(cfg, select_frac=0.0)
    ecfg = EngineConfig(max_batch=2, max_seq_len=2 * PAGE, page_size=PAGE)

    toks = jnp.asarray([[5, 17, 301, 42], [9, 2, 77, 30]], jnp.int32)
    lens = jnp.asarray([4, 4], jnp.int32)

    def run():
        # the dispatch flag is read at TRACE time and the engine's
        # jitted steps are cached at module level — drop every cached
        # trace so the flag is consulted again
        jax.clear_caches()
        eng = InferenceEngine(cfg, params, calib, qcfg, ecfg)
        state = eng.new_state()
        logits, state = eng.prefill(state, toks, lens)
        nxt = jnp.argmax(logits, -1).astype(jnp.int32)
        logits2, state = eng.decode_step(state, nxt,
                                         jnp.ones((2,), bool))
        return np.asarray(logits2)

    from arcquant_tpu.kernels import mlp_fused
    calls = []
    real = mlp_fused.mlp_w8_fused
    mlp_fused.mlp_w8_fused = (
        lambda *a, **k: calls.append(1) or real(*a, **k))
    try:
        os.environ[mlp_fused._MLP_FUSED_M_ENV] = "0"
        mlp_fused.mlp_fused_dispatch_m.cache_clear()
        base = run()
        assert not calls
        os.environ[mlp_fused._MLP_FUSED_M_ENV] = "16"
        mlp_fused.mlp_fused_dispatch_m.cache_clear()
        fused = run()
        assert calls, "flag did not engage the megakernel"
    finally:
        mlp_fused.mlp_w8_fused = real
        os.environ.pop(mlp_fused._MLP_FUSED_M_ENV, None)
        mlp_fused.mlp_fused_dispatch_m.cache_clear()
    _assert_engine_close(base, fused)


def test_partial_megakernel_matches_chain_with_arc():
    """gateup_silu_quantize + caller residual + down GEMM must be
    BIT-exact vs the de-fused chain when down_in is ARC-augmented
    (the full megakernel's unsupported case)."""
    m, d, f, ke = 4, 256, 512, 64
    ks = jax.random.split(jax.random.PRNGKey(21), 4)
    x = jax.random.normal(ks[0], (m, d))
    w_gu = jax.random.normal(ks[1], (2 * f, d)) * 0.05
    w_dn = jax.random.normal(ks[2], (d, f)) * 0.05
    ridx1 = jnp.arange(d, dtype=jnp.int32)
    # non-trivial importance order for the down_in ARC columns
    ridx2 = jnp.argsort(jnp.max(jnp.abs(w_dn), axis=0)).astype(
        jnp.int32)
    pw_gu = packing.pack_weight_arc(w_gu, ridx1, 0, fmt="w8",
                                    w_scale="channel")
    pw_dn = packing.pack_weight_arc(w_dn, ridx2, ke, fmt="w8",
                                    w_scale="channel")
    assert pw_dn.kq >= f + ke
    xa1, gs1 = qk.quantize_x_arc(x, ridx1, 0, kq=pw_gu.kq,
                                 per_row=True)

    # reference chain (defused production path)
    gu_ref = gemm_dequant_bk512(xa1, pw_gu, gs1)
    prod = (jax.nn.silu(gu_ref[:, :f].astype(jnp.float32))
            * gu_ref[:, f:].astype(jnp.float32)).astype(gu_ref.dtype)
    xa2_ref, gx2_ref = qk.quantize_x_arc(prod, ridx2, ke, kq=pw_dn.kq,
                                         per_row=True)
    out_ref = gemm_dequant_bk512(xa2_ref, pw_dn, gx2_ref)

    # partial megakernel + caller-side residual + down GEMM
    xa2, gu, gx2 = mlp_fused.gateup_silu_quantize(
        xa1, gs1, pw_gu, f, pw_dn.kq)
    assert bool(jnp.all(gu == gu_ref))
    assert bool(jnp.all(gx2 == gx2_ref))
    idx = ridx2[-ke:].astype(jnp.int32)
    g_cols = jnp.take(gu, idx, axis=1).astype(jnp.float32)
    u_cols = jnp.take(gu, idx + f, axis=1).astype(jnp.float32)
    prod_cols = (jax.nn.silu(g_cols) * u_cols).astype(gu.dtype)
    xa2 = qk._arc_residual_into(prod_cols, xa2, gx2, idx, f)
    assert bool(jnp.all(xa2 == xa2_ref))
    out = gemm_dequant_bk512(xa2, pw_dn, gx2)
    assert bool(jnp.all(out == out_ref))


def test_engine_decode_flag_parity_with_arc():
    """Engine decode with ARC-augmented down_in (select_frac > 0):
    the flag must route through the PARTIAL megakernel and stay
    logit-identical."""
    import os

    import numpy as np

    from arcquant_tpu.config import QuantConfig, get_model_config
    from arcquant_tpu.engine import EngineConfig, InferenceEngine
    from arcquant_tpu.models import llama, quantized

    cfg = get_model_config("test-tiny")
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    qcfg = QuantConfig(quant_type="NVFP4", use_kernels=True,
                       kv_quant=False, act_scale="row",
                       w_scale="channel")
    calib = quantized.identity_calib(cfg, select_frac=0.125)
    assert calib[0]["down_in"].select_num > 0
    ecfg = EngineConfig(max_batch=2, max_seq_len=2 * PAGE, page_size=PAGE)
    toks = jnp.asarray([[5, 17, 301, 42], [9, 2, 77, 30]], jnp.int32)
    lens = jnp.asarray([4, 4], jnp.int32)

    def run():
        jax.clear_caches()
        eng = InferenceEngine(cfg, params, calib, qcfg, ecfg)
        state = eng.new_state()
        logits, state = eng.prefill(state, toks, lens)
        nxt = jnp.argmax(logits, -1).astype(jnp.int32)
        logits2, state = eng.decode_step(state, nxt,
                                         jnp.ones((2,), bool))
        return np.asarray(logits2)

    from arcquant_tpu.kernels import mlp_fused
    calls = []
    real = mlp_fused.gateup_silu_quantize
    mlp_fused.gateup_silu_quantize = (
        lambda *a, **k: calls.append(1) or real(*a, **k))
    try:
        os.environ[mlp_fused._MLP_FUSED_M_ENV] = "0"
        mlp_fused.mlp_fused_dispatch_m.cache_clear()
        base = run()
        assert not calls
        os.environ[mlp_fused._MLP_FUSED_M_ENV] = "16"
        mlp_fused.mlp_fused_dispatch_m.cache_clear()
        fused = run()
        assert calls, "flag did not engage the partial megakernel"
    finally:
        mlp_fused.gateup_silu_quantize = real
        os.environ.pop(mlp_fused._MLP_FUSED_M_ENV, None)
        mlp_fused.mlp_fused_dispatch_m.cache_clear()
    _assert_engine_close(base, fused)


def test_norm_mode_matches_external_norm_quantize():
    """Phase-A (rmsnorm+quantize inside the megakernel) must be
    BIT-exact vs the external fused rmsnorm quantize feeding the
    quantized-input megakernel."""
    m, d, f = 4, 256, 512
    ks = jax.random.split(jax.random.PRNGKey(31), 3)
    x2 = (jax.random.normal(ks[0], (m, d)) * 2.0).astype(jnp.bfloat16)
    w_gu = jax.random.normal(ks[1], (2 * f, d)) * 0.05
    w_dn = jax.random.normal(ks[2], (d, f)) * 0.05
    ridx1 = jnp.arange(d, dtype=jnp.int32)
    ridx2 = jnp.arange(f, dtype=jnp.int32)
    pw_gu = packing.pack_weight_arc(w_gu, ridx1, 0, fmt="w8",
                                    w_scale="channel")
    pw_dn = packing.pack_weight_arc(w_dn, ridx2, 0, fmt="w8",
                                    w_scale="channel")
    norm_w = (1.0 + 0.1 * jax.random.normal(
        jax.random.PRNGKey(5), (d,))).astype(jnp.bfloat16)
    eps = 1e-6

    xa1, gs1 = qk.rmsnorm_quantize_x(x2, norm_w, eps, ridx1, 0,
                                     kq=pw_gu.kq, per_row=True)
    ref = mlp_fused.mlp_w8_fused(xa1, gs1, pw_gu, pw_dn, f)
    got = mlp_fused.mlp_w8_fused(x2, None, pw_gu, pw_dn, f,
                                 norm_w=norm_w, norm_eps=eps)
    for a, b in zip(got, ref):
        assert bool(jnp.all(a == b))


def test_engine_decode_norm_mode_parity():
    """Engine decode (select-free calib): flag on routes the WHOLE
    norm+MLP through one launch and stays logit-identical."""
    import os

    import numpy as np

    from arcquant_tpu.config import QuantConfig, get_model_config
    from arcquant_tpu.engine import EngineConfig, InferenceEngine
    from arcquant_tpu.models import llama, quantized

    cfg = get_model_config("test-tiny")
    params = llama.init_params(cfg, jax.random.PRNGKey(0),
                               jnp.bfloat16)
    qcfg = QuantConfig(quant_type="NVFP4", use_kernels=True,
                       kv_quant=False, act_scale="row",
                       w_scale="channel")
    calib = quantized.identity_calib(cfg, select_frac=0.0)
    ecfg = EngineConfig(max_batch=2, max_seq_len=2 * PAGE, page_size=PAGE)
    toks = jnp.asarray([[5, 17, 301, 42], [9, 2, 77, 30]], jnp.int32)
    lens = jnp.asarray([4, 4], jnp.int32)

    def run():
        jax.clear_caches()
        eng = InferenceEngine(cfg, params, calib, qcfg, ecfg)
        state = eng.new_state()
        logits, state = eng.prefill(state, toks, lens)
        nxt = jnp.argmax(logits, -1).astype(jnp.int32)
        logits2, state = eng.decode_step(state, nxt,
                                         jnp.ones((2,), bool))
        return np.asarray(logits2)

    from arcquant_tpu.kernels import mlp_fused
    import os as _os
    try:
        _os.environ[mlp_fused._MLP_FUSED_M_ENV] = "0"
        mlp_fused.mlp_fused_dispatch_m.cache_clear()
        base = run()
        _os.environ[mlp_fused._MLP_FUSED_M_ENV] = "16"
        mlp_fused.mlp_fused_dispatch_m.cache_clear()
        fused = run()
    finally:
        _os.environ.pop(mlp_fused._MLP_FUSED_M_ENV, None)
        mlp_fused.mlp_fused_dispatch_m.cache_clear()
    _assert_engine_close(base, fused)


def test_megakernel_follows_tabled_bk1024(tmp_path, monkeypatch):
    """When the dispatch table says bk=1024 for a weight (the
    llama-3.1-8b gateup case), the megakernel must split at 1024 and
    stay bit-exact vs the chain AT THAT SPLIT."""
    import json as _json

    from arcquant_tpu.kernels import autotune
    m, d, f = 4, 1024, 1024    # kq1 = kq2 = 1024
    ks = jax.random.split(jax.random.PRNGKey(41), 3)
    x = jax.random.normal(ks[0], (m, d))
    w_gu = jax.random.normal(ks[1], (2 * f, d)) * 0.05
    w_dn = jax.random.normal(ks[2], (d, f)) * 0.05
    ridx1 = jnp.arange(d, dtype=jnp.int32)
    ridx2 = jnp.arange(f, dtype=jnp.int32)
    pw_gu = packing.pack_weight_arc(w_gu, ridx1, 0, fmt="w8",
                                    w_scale="channel")
    pw_dn = packing.pack_weight_arc(w_dn, ridx2, 0, fmt="w8",
                                    w_scale="channel")
    assert pw_gu.kq == 1024 and pw_dn.kq == 1024
    table = tmp_path / "bk1024.json"
    table.write_text(_json.dumps({
        f"w8|4|{pw_gu.kq}|{pw_gu.n}": {"fused": 1e-6, "dma": 2e-6,
                                       "bk": 1024, "bn": 512},
        f"w8|4|{pw_dn.kq}|{pw_dn.n}": {"fused": 1e-6, "dma": 2e-6,
                                       "bk": 1024, "bn": 512},
    }))
    monkeypatch.setenv("ARC_AUTOTUNE_FILE", str(table))
    autotune.invalidate_cache()
    try:
        assert mlp_fused._engine_bk(pw_gu, m) == 1024
        xa1, gs1 = qk.quantize_x_arc(x, ridx1, 0, kq=pw_gu.kq,
                                     per_row=True)
        # chain at bk=1024 (what gemm_dequant does with this table)
        gu = gemm.gemm_dequant(xa1, pw_gu, gs1)
        prod = (jax.nn.silu(gu[:, :f].astype(jnp.float32))
                * gu[:, f:].astype(jnp.float32)).astype(gu.dtype)
        xa2, gx2 = qk.quantize_x_arc(prod, ridx2, 0, kq=pw_dn.kq,
                                     per_row=True)
        ref = gemm.gemm_dequant(xa2, pw_dn, gx2)
        out, _, _ = mlp_fused.mlp_w8_fused(xa1, gs1, pw_gu, pw_dn, f)
        assert bool(jnp.all(out == ref))
    finally:
        autotune.invalidate_cache()


@pytest.mark.parametrize("mode", ["norm", "plain"])
@pytest.mark.parametrize("bias", [False, True])
def test_single_gemm_megakernel_matches_chain(mode, bias):
    """gemm_w8_actq_fused ([rmsnorm+]quantize + one streamed GEMM in
    a single launch) must be BIT-exact vs the external quantize +
    gemm_dequant chain (the attn_in / o_in sites)."""
    m, d, n = 4, 256, 512
    ks = jax.random.split(jax.random.PRNGKey(61), 3)
    x2 = (jax.random.normal(ks[0], (m, d)) * 2.0).astype(jnp.bfloat16)
    w = jax.random.normal(ks[1], (n, d)) * 0.05
    b = jax.random.normal(ks[2], (n,)) if bias else None
    ridx = jnp.arange(d, dtype=jnp.int32)
    pw = packing.pack_weight_arc(w, ridx, 0, bias=b, fmt="w8",
                                 w_scale="channel")
    norm_w = (1.0 + 0.1 * jax.random.normal(
        jax.random.PRNGKey(6), (d,))).astype(jnp.bfloat16)
    eps = 1e-6
    if mode == "norm":
        xa, gx = qk.rmsnorm_quantize_x(x2, norm_w, eps, ridx, 0,
                                       kq=pw.kq, per_row=True)
        got, ggx = mlp_fused.gemm_w8_actq_fused(
            x2, pw, d, norm_w=norm_w, norm_eps=eps)
    else:
        xa, gx = qk.quantize_x_arc(x2, ridx, 0, kq=pw.kq,
                                   per_row=True)
        got, ggx = mlp_fused.gemm_w8_actq_fused(x2, pw, d)
    ref = gemm.gemm_dequant(xa, pw, gx)
    assert bool(jnp.all(ggx == gx))
    assert bool(jnp.all(got == ref))
