"""Tensor-parallel tests on the virtual 8-device CPU mesh: sharded
quantized forward must match the single-device packed forward
(no-ARC exactly-ish; with ARC, must still recover error)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arcquant_tpu.config import get_model_config, QuantConfig
from arcquant_tpu.models import llama, quantized
from arcquant_tpu.parallel import (make_mesh, shard_model_params_tp,
                                   tp_quant_model_forward)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multi-device mesh")


@pytest.fixture(scope="module")
def setup():
    cfg = get_model_config("test-tiny")     # Hkv=2 → tp=2
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    tokens = jnp.asarray(
        np.random.RandomState(3).randint(0, cfg.vocab_size, (2, 16)),
        jnp.int32)
    return cfg, params, tokens


def test_tp_matches_single_device_no_arc(setup):
    cfg, params, tokens = setup
    qcfg = QuantConfig(quant_type="NVFP4", use_kernels=True)
    calib = quantized.identity_calib(cfg, select_frac=0.0)

    ref_qp = quantized.quantize_model_params(cfg, params, calib, qcfg)
    ref = quantized.quant_model_forward(cfg, ref_qp, calib, qcfg, tokens)

    mesh = make_mesh(dp=len(jax.devices()) // 2, tp=2)
    qp = shard_model_params_tp(cfg, params, calib, qcfg, mesh)
    got = tp_quant_model_forward(cfg, qp, calib, qcfg, mesh, tokens)

    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_tp_arc_runs_and_recovers_error(setup):
    cfg, params, tokens = setup
    # plant outliers so ARC matters
    out_ch = jnp.arange(0, cfg.hidden_size, 5)
    params = dict(params, embed=params["embed"].at[:, out_ch]
                  .multiply(6.0))
    base = llama.model_forward(cfg, params, tokens)
    qcfg = QuantConfig(quant_type="NVFP4", use_kernels=True)
    mesh = make_mesh(dp=len(jax.devices()) // 2, tp=2)

    mses = {}
    for frac in (0.0, 0.5):
        calib = quantized.identity_calib(cfg, select_frac=frac)
        qp = shard_model_params_tp(cfg, params, calib, qcfg, mesh)
        got = tp_quant_model_forward(cfg, qp, calib, qcfg, mesh, tokens)
        mses[frac] = float(jnp.mean((got - base) ** 2))
    assert np.isfinite(mses[0.5])
    assert mses[0.5] < mses[0.0], mses
