"""Calibration pipeline tests: stats, reorder indices, select counts,
artifact roundtrip, and end-to-end accuracy improvement."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arcquant_tpu.config import get_model_config, QuantConfig
from arcquant_tpu.calib import (compute_calibration, save_calibration,
                                load_calibration)
from arcquant_tpu.models import llama, quantized
from arcquant_tpu.evals import synthetic_stream, eval_ppl


@pytest.fixture(scope="module")
def setup():
    cfg = get_model_config("test-tiny")
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    tokens = jnp.asarray(
        synthetic_stream(cfg.vocab_size, 4 * 64, seed=1).reshape(4, 64))
    return cfg, params, tokens


def test_calibration_shapes_and_validity(setup):
    cfg, params, tokens = setup
    calib, stats, avg_bits = compute_calibration(cfg, params, tokens,
                                                 metric="max")
    assert len(calib) == cfg.num_layers
    for layer in calib:
        for site, sc in layer.items():
            k = sc.reorder_index.shape[0]
            # valid permutation
            assert jnp.all(jnp.sort(sc.reorder_index)
                           == jnp.arange(k, dtype=jnp.int32))
            assert sc.select_num % 64 == 0
            assert 0 <= sc.select_num <= k
    assert 4.5 <= avg_bits < 9.0


@pytest.mark.parametrize("metric", ["max", "hessian", "score"])
def test_metrics_run(setup, metric):
    cfg, params, tokens = setup
    calib, stats, _ = compute_calibration(cfg, params, tokens[:2],
                                          metric=metric)
    s = stats[0]["attn_in"]
    assert s.shape == (cfg.hidden_size,)
    assert bool(jnp.all(jnp.isfinite(s))) and float(s.max()) > 0


def test_reorder_index_ascending(setup):
    cfg, params, tokens = setup
    calib, stats, _ = compute_calibration(cfg, params, tokens[:2])
    st = stats[0]["attn_in"]
    order = calib[0]["attn_in"].reorder_index
    sorted_stat = st[order]
    assert bool(jnp.all(sorted_stat[1:] >= sorted_stat[:-1]))


def test_artifact_roundtrip(tmp_path, setup):
    cfg, params, tokens = setup
    calib, _, _ = compute_calibration(cfg, params, tokens[:2])
    path = os.path.join(tmp_path, "calib.npz")
    save_calibration(path, calib, meta={"model": cfg.name,
                                        "metric": "max"})
    loaded = load_calibration(path)
    assert len(loaded) == len(calib)
    for a, b in zip(calib, loaded):
        for site in a:
            assert jnp.all(a[site].reorder_index == b[site].reorder_index)
            assert a[site].select_num == b[site].select_num


def test_calibrated_arc_reduces_logits_error(setup):
    """End-to-end: NVFP4+ARC with calibrated channel selection must
    recover quantization error vs plain NVFP4 (select 0) — the core ARC
    claim. Measured as logits MSE against the bf16 model on inputs with
    planted outlier channels (the regime ARC exists for; reference
    kernels/main.py:14-18 uses the same synthetic-outlier protocol —
    on outlier-free random weights the ordering is statistical noise)."""
    cfg, params, _ = setup
    # Plant activation outliers: scale a fixed set of embedding channels
    # so every layer's input has a genuine outlier tail.
    out_ch = jnp.arange(0, cfg.hidden_size, 7)
    embed = params["embed"].at[:, out_ch].multiply(8.0)
    params = dict(params, embed=embed)

    toks = jnp.asarray(
        synthetic_stream(cfg.vocab_size, 4 * 64, seed=7).reshape(4, 64))
    logits_ref = llama.model_forward(cfg, params, toks)

    def q_logits(calib):
        qcfg = QuantConfig(quant_type="NVFP4", use_kernels=False)
        qp = quantized.quantize_model_params(cfg, params, calib, qcfg)
        return quantized.quant_model_forward(cfg, qp, calib, qcfg, toks)

    calib0 = quantized.identity_calib(cfg, select_frac=0.0)
    calib_real, _, _ = compute_calibration(cfg, params, toks)
    # calibration must actually select channels for ARC to act
    assert any(sc.select_num > 0
               for layer in calib_real for sc in layer.values())

    mse0 = float(jnp.mean((q_logits(calib0) - logits_ref) ** 2))
    mse_arc = float(jnp.mean((q_logits(calib_real) - logits_ref) ** 2))
    assert np.isfinite(mse0) and np.isfinite(mse_arc)
    assert mse_arc < mse0, (mse0, mse_arc)


def test_outlier_count_ignores_zero_rows():
    """MoE site taps carry unrouted slots as all-zero rows; the outlier
    fraction must not be diluted by them (calibrate._site_outlier_count
    excludes zero rows from the mean)."""
    from arcquant_tpu.calib.calibrate import _site_outlier_count
    rows = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 32))
    dense = _site_outlier_count(rows)
    padded = jnp.concatenate(
        [rows, jnp.zeros((1, 24, 32), rows.dtype)], axis=1)
    np.testing.assert_allclose(np.asarray(_site_outlier_count(padded)),
                               np.asarray(dense), atol=1e-6)


def test_moe_calibration_end_to_end():
    """compute_calibration on a shared-expert MoE config: per-layer
    calib carries all five sites (incl. sdown_in) with the right
    channel dims, and the computed calib drives a finite quantized
    forward through quantize_model_params."""
    cfg = get_model_config("test-tiny-moe")
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    tokens = jnp.asarray(
        synthetic_stream(cfg.vocab_size, 2 * 32, seed=3).reshape(2, 32))
    calib, stats, avg_bits = compute_calibration(cfg, params, tokens)
    assert len(calib) == cfg.num_layers
    expect_dims = {"attn_in": cfg.hidden_size, "o_in": cfg.q_size,
                   "mlp_in": cfg.hidden_size,
                   "down_in": cfg.moe_intermediate_size,
                   "sdown_in": cfg.shared_expert_size}
    for layer in calib:
        assert set(layer) == set(expect_dims)
        for site, sc in layer.items():
            k = sc.reorder_index.shape[0]
            assert k == expect_dims[site], site
            assert jnp.all(jnp.sort(sc.reorder_index)
                           == jnp.arange(k, dtype=jnp.int32))
            assert sc.select_num % 64 == 0
    assert 4.5 <= avg_bits < 9.0
    # artifact roundtrip must preserve the extra MoE site
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/c.npz"
        save_calibration(path, calib)
        calib = load_calibration(path)
    assert all(set(layer) == set(expect_dims) for layer in calib)
    qcfg = QuantConfig(quant_type="NVFP4", use_kernels=False,
                       w_scale="channel")
    qp = quantized.quantize_model_params(cfg, params, calib, qcfg)
    out = quantized.quant_model_forward(cfg, qp, calib, qcfg, tokens)
    assert bool(jnp.all(jnp.isfinite(out)))
