"""Expert-parallel MoE tests on the 8-device virtual CPU mesh:
ep sharding must reproduce the single-device MoE block exactly
(routing is global; only f32 summation order changes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from arcquant_tpu.config import get_model_config, QuantConfig
from arcquant_tpu.models import llama, moe, quantized
from arcquant_tpu.parallel import ep


@pytest.fixture(scope="module")
def moe_layer():
    cfg = get_model_config("test-tiny-moe")
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    return cfg, params.copy()


def _mesh(dp, epn):
    devs = np.array(jax.devices()[:dp * epn]).reshape(dp, epn)
    return Mesh(devs, ("dp", "ep"))


@pytest.mark.parametrize("dp,epn", [(1, 2), (1, 4), (2, 4)])
def test_ep_matches_single_device_bf16(moe_layer, dp, epn):
    cfg, params = moe_layer
    p = params["layers"][0]["moe"]
    x = jax.random.normal(jax.random.PRNGKey(3),
                          (2 * dp, 8, cfg.hidden_size), jnp.bfloat16)
    ref = moe.moe_block(cfg, p, x)
    mesh = _mesh(dp, epn)
    ps = ep.shard_moe_params(p, mesh)
    fwd = ep.make_ep_moe_forward(cfg, mesh)
    out = fwd(ps, x)
    np.testing.assert_allclose(np.asarray(ref, np.float32),
                               np.asarray(out, np.float32),
                               atol=5e-2, rtol=5e-2)


def test_ep_dispatch_mode_matches_single_device(moe_layer):
    """Force dispatch mode on both paths (threshold=0): the ep shards
    each run a local-expert capacity dispatch."""
    cfg, params = moe_layer
    p = params["layers"][0]["moe"]
    x = jax.random.normal(jax.random.PRNGKey(4),
                          (2, 8, cfg.hidden_size), jnp.bfloat16)
    old = moe.DENSE_MODE_MAX_T
    try:
        moe.DENSE_MODE_MAX_T = 0
        ref = moe.moe_block(cfg, p, x, capacity=16)
        mesh = _mesh(1, 4)
        ps = ep.shard_moe_params(p, mesh)
        fwd = ep.make_ep_moe_forward(cfg, mesh, capacity=16)
        out = fwd(ps, x)
    finally:
        moe.DENSE_MODE_MAX_T = old
    np.testing.assert_allclose(np.asarray(ref, np.float32),
                               np.asarray(out, np.float32),
                               atol=5e-2, rtol=5e-2)


def test_ep_quantized_matches_single_device(moe_layer):
    cfg, params = moe_layer
    qcfg = QuantConfig(quant_type="NVFP4", use_kernels=False,
                       w_scale="channel", act_scale="row")
    calib = quantized.identity_calib(cfg, select_frac=0.1)
    qp = quantized.quantize_layer_params(params["layers"][0], calib[0],
                                         qcfg)["moe"]
    x = jax.random.normal(jax.random.PRNGKey(5),
                          (2, 8, cfg.hidden_size), jnp.bfloat16)
    ref = moe.moe_block(cfg, qp, x, calib[0], qcfg)
    mesh = _mesh(1, 4)
    ps = ep.shard_moe_params(qp, mesh)
    fwd = ep.make_ep_moe_forward(cfg, mesh, layer_calib=calib[0],
                                 qcfg=qcfg)
    out = fwd(ps, x)
    np.testing.assert_allclose(np.asarray(ref, np.float32),
                               np.asarray(out, np.float32),
                               atol=5e-2, rtol=5e-2)


def test_ep_collective_bill(moe_layer):
    """The EP formulation promises exactly ONE all-reduce over ep per
    MoE block (plus none for routing/shared expert) — pin it."""
    cfg, params = moe_layer
    p = params["layers"][0]["moe"]
    mesh = _mesh(1, 4)
    ps = ep.shard_moe_params(p, mesh)
    fwd = ep.make_ep_moe_forward(cfg, mesh)
    x = jnp.zeros((2, 8, cfg.hidden_size), jnp.bfloat16)
    txt = jax.jit(fwd).lower(ps, x).compile().as_text()
    n_ar = txt.count("all-reduce-start") or txt.count("all-reduce(")
    assert n_ar == 1, f"expected 1 all-reduce, HLO has {n_ar}"
