"""Pipeline-parallel tests: the GPipe-style staged forward must equal
the single-device quantized forward to f32 ulps (stage outputs are
disjoint so the merging psum adds only zeros; the only difference is
XLA matmul tiling at microbatch vs full-batch shapes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from arcquant_tpu.config import get_model_config, QuantConfig
from arcquant_tpu.models import llama, quantized
from arcquant_tpu.parallel.pp import (stack_stage_params,
                                      pp_quant_model_forward)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multi-device mesh")


@pytest.mark.parametrize("microbatches", [2, 4])
def test_pp_matches_single_device(microbatches):
    cfg = get_model_config("test-tiny")          # 2 layers -> pp=2
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    qcfg = QuantConfig(quant_type="NVFP4", use_kernels=False,
                       act_scale="row")
    calib = quantized.identity_calib(cfg, select_frac=0.25)
    qparams = quantized.quantize_model_params(cfg, params, calib, qcfg)
    tokens = jnp.asarray(
        np.random.RandomState(1).randint(0, cfg.vocab_size, (4, 12)),
        jnp.int32)

    ref = quantized.quant_model_forward(cfg, qparams, calib, qcfg,
                                        tokens)
    mesh = Mesh(np.array(jax.devices()[:2]), ("pp",))
    pparams = stack_stage_params(cfg, qparams, calib, 2, mesh)
    got = pp_quant_model_forward(cfg, pparams, calib, qcfg, mesh,
                                 tokens, microbatches=microbatches)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pp_rejects_nonuniform_select():
    cfg = get_model_config("test-tiny")
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    qcfg = QuantConfig(quant_type="NVFP4", use_kernels=False,
                       act_scale="row")
    calib = quantized.identity_calib(cfg, select_frac=0.25)
    # perturb one layer's select count
    sc = calib[1]["attn_in"]
    calib[1]["attn_in"] = quantized.SiteCalib(sc.reorder_index, 0)
    qparams = quantized.quantize_model_params(cfg, params, calib, qcfg)
    mesh = Mesh(np.array(jax.devices()[:2]), ("pp",))
    with pytest.raises(AssertionError):
        stack_stage_params(cfg, qparams, calib, 2, mesh)
