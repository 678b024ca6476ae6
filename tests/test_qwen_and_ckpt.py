"""Qwen2-family coverage (qkv biases, its own rope/theta) and packed
quantized-checkpoint persistence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arcquant_tpu.config import get_model_config, QuantConfig
from arcquant_tpu.models import llama, quantized


@pytest.fixture(scope="module")
def qwen():
    cfg = get_model_config("test-qwen-tiny")
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    return cfg, params


def test_qwen_has_qkv_bias(qwen):
    cfg, params = qwen
    assert cfg.qkv_bias
    assert "b" in params["layers"][0]["q"]
    assert "b" not in params["layers"][0]["o"]


def test_qwen_quantized_forward(qwen):
    cfg, params = qwen
    toks = jnp.asarray(
        np.random.RandomState(0).randint(0, cfg.vocab_size, (2, 16)))
    base = llama.model_forward(cfg, params, toks)
    qcfg = QuantConfig(quant_type="NVFP4", use_kernels=False,
                       kv_group_size=128)  # Qwen KV group (SURVEY §6)
    calib = quantized.identity_calib(cfg, select_frac=0.25)
    qp = quantized.quantize_model_params(cfg, params, calib, qcfg)
    ql = quantized.quant_model_forward(cfg, qp, calib, qcfg, toks)
    assert ql.shape == base.shape
    rel = float(jnp.linalg.norm(ql - base) / jnp.linalg.norm(base))
    assert rel < 0.7, rel


def test_qwen_engine_generates(qwen):
    cfg, params = qwen
    from arcquant_tpu.engine import InferenceEngine, EngineConfig
    qcfg = QuantConfig(quant_type="NVFP4", use_kernels=False,
                       act_scale="row", w_scale="channel")
    calib = quantized.identity_calib(cfg, select_frac=0.125)
    eng = InferenceEngine(cfg, params, calib, qcfg,
                          EngineConfig(max_batch=2, max_seq_len=64,
                                       page_size=16))
    out = eng.generate([[3, 7, 11]], max_new_tokens=4)
    assert len(out[0]) == 4
    assert all(0 <= t < cfg.vocab_size for t in out[0])


@pytest.mark.parametrize("fmt", ["w4", "w8"])
def test_quantized_checkpoint_roundtrip(tmp_path, fmt):
    from arcquant_tpu.utils import save_quantized, load_quantized
    cfg = get_model_config("test-tiny")
    params = llama.init_params(cfg, jax.random.PRNGKey(1), jnp.float32)
    qcfg = QuantConfig(quant_type="NVFP4", use_kernels=True,
                       weight_fmt=fmt)
    calib = quantized.identity_calib(cfg, select_frac=0.125)
    qp = quantized.quantize_model_params(cfg, params, calib, qcfg)

    path = str(tmp_path / "ckpt")
    save_quantized(path, qp)
    back = load_quantized(path)

    toks = jnp.asarray([[5, 10, 15, 20]], jnp.int32)
    a = quantized.quant_model_forward(cfg, qp, calib, qcfg, toks)
    b = quantized.quant_model_forward(cfg, back, calib, qcfg, toks)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_moe_engine_checkpoint_roundtrip(tmp_path):
    """Fused ENGINE params — including packed MoE expert stacks
    (gate/up as one big-N PackedWeight, down as a stacked [E, ...]
    batch) — must round-trip through the orbax packed checkpoint
    bit-exactly."""
    from arcquant_tpu.utils import save_quantized, load_quantized
    cfg = get_model_config("test-tiny-moe")
    params = llama.init_params(cfg, jax.random.PRNGKey(2), jnp.float32)
    qcfg = QuantConfig(quant_type="NVFP4", use_kernels=True,
                       act_scale="row", w_scale="channel")
    calib = quantized.identity_calib(cfg, select_frac=0.0)
    qlayers = [quantized.quantize_layer_params_fused(lp, calib[i],
                                                     qcfg)
               for i, lp in enumerate(params["layers"])]
    qp = {"embed": params["embed"], "final_norm": params["final_norm"],
          "layers": qlayers}
    path = str(tmp_path / "moe_ckpt")
    save_quantized(path, qp)
    back = load_quantized(path)
    flat_a, _ = jax.tree.flatten(qp)
    flat_b, _ = jax.tree.flatten(back)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
