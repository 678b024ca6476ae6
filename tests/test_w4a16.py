"""W4A16 (weight-only) mode: act_bits=16 keeps activations exact
bf16 with a unit global scale while weights stay NVFP4-packed —
numerics must equal a weight-only fake-quant oracle, the kernel and
qdq paths must agree, and W4A16 must sit strictly closer to bf16
than W4A4 on the same model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arcquant_tpu.config import get_model_config, QuantConfig
from arcquant_tpu.engine import InferenceEngine, EngineConfig
from arcquant_tpu.models import llama, quantized
from arcquant_tpu.quant import arc


@pytest.fixture(scope="module")
def setup():
    cfg = get_model_config("test-tiny")
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    tokens = jnp.asarray(
        np.random.RandomState(5).randint(0, cfg.vocab_size, (2, 12)),
        jnp.int32)
    return cfg, params, tokens


def _qcfg(**kw):
    base = dict(quant_type="NVFP4", use_kernels=False, kv_quant=False,
                act_scale="row", w_scale="channel")
    base.update(kw)
    return QuantConfig(**base)


def test_w4a16_matches_weight_only_oracle(setup):
    """act_bits=16 forward == llama forward with each weight replaced
    by its qdq (ARC residual columns contribute exactly zero)."""
    cfg, params, tokens = setup
    calib = quantized.identity_calib(cfg, select_frac=0.125)
    qcfg = _qcfg(act_bits=16)
    qp = quantized.quantize_model_params(cfg, params, calib, qcfg)
    got = quantized.quant_model_forward(cfg, qp, calib, qcfg, tokens)

    # oracle: hand-qdq every weight (plain part only), raw activations
    wq_params = jax.tree.map(lambda x: x, params)
    site = {"q": "attn_in", "k": "attn_in", "v": "attn_in",
            "o": "o_in", "gate": "mlp_in", "up": "mlp_in",
            "down": "down_in"}
    for li, lp in enumerate(wq_params["layers"]):
        for name, s in site.items():
            c = calib[li][s]
            w_aug, gs = arc.arc_quantize_w_qdq(
                lp[name]["w"], c.reorder_index, c.select_num,
                "NVFP4", per_channel=True)
            k = lp[name]["w"].shape[1]
            lp[name]["w"] = (w_aug[:, :k]
                             * gs[:, None]).astype(jnp.float32)
    ref = llama.model_forward(cfg, wq_params, tokens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("fmt", ["w8", "w4"])
def test_w4a16_engine_matches_accuracy_path(setup, fmt):
    """The packed-kernel engine at act_bits=16 reproduces the
    unfused qdq accuracy path (prefill logits), both weight formats."""
    cfg, params, tokens = setup
    calib = quantized.identity_calib(cfg, select_frac=0.125)
    q_acc = _qcfg(act_bits=16)
    qp = quantized.quantize_model_params(cfg, params, calib, q_acc)
    ref = quantized.quant_model_forward(cfg, qp, calib, q_acc,
                                        tokens[:1])

    q_eng = _qcfg(act_bits=16, use_kernels=True, weight_fmt=fmt)
    eng = InferenceEngine(cfg, params, calib, q_eng,
                          EngineConfig(max_batch=2, max_seq_len=32,
                                       page_size=16))
    toks = np.zeros((2, tokens.shape[1]), np.int32)
    toks[0] = np.asarray(tokens[0])
    lens = jnp.asarray([tokens.shape[1], 0], jnp.int32)
    logits, _ = eng.prefill(eng.new_state(), jnp.asarray(toks), lens)
    np.testing.assert_allclose(np.asarray(logits[0]),
                               np.asarray(ref[0, -1]),
                               rtol=2e-2, atol=2e-2)


def test_w4a16_closer_to_bf16_than_w4a4(setup):
    """Weight-only quantization must beat W4A4 in logit error vs the
    bf16 model (the entire activation-quant error disappears)."""
    cfg, params, tokens = setup
    calib = quantized.identity_calib(cfg, select_frac=0.125)
    base = llama.model_forward(cfg, params, tokens)

    def err(act_bits):
        q = _qcfg(act_bits=act_bits)
        qp = quantized.quantize_model_params(cfg, params, calib, q)
        out = quantized.quant_model_forward(cfg, qp, calib, q, tokens)
        return float(jnp.mean((out - base) ** 2))

    e16, e4 = err(16), err(4)
    assert e16 < e4, (e16, e4)


def test_w4a16_generate_and_tp_guard(setup):
    """Engine generation runs under W4A16; the TP engine (A4-only for
    now) rejects it with a clear error."""
    cfg, params, tokens = setup
    calib = quantized.identity_calib(cfg, select_frac=0.0)
    q_eng = _qcfg(act_bits=16, use_kernels=True)
    eng = InferenceEngine(cfg, params, calib, q_eng,
                          EngineConfig(max_batch=2, max_seq_len=64,
                                       page_size=16))
    out = eng.generate([[5, 17, 301, 42]], max_new_tokens=5)
    assert len(out[0]) == 5
    assert all(0 <= t < cfg.vocab_size for t in out[0])

    if len(jax.devices()) >= 2:
        from arcquant_tpu.parallel import make_mesh
        from arcquant_tpu.parallel.tp_engine import TPInferenceEngine
        with pytest.raises(AssertionError, match="A4"):
            TPInferenceEngine(
                cfg, params, calib, _qcfg(act_bits=16,
                                          use_kernels=True),
                EngineConfig(max_batch=2, max_seq_len=32,
                             page_size=16),
                make_mesh(dp=len(jax.devices()) // 2, tp=2))


def test_w4a16_moe(setup):
    """MoE under W4A16: the qdq accuracy path is closer to bf16 than
    W4A4, and the packed-expert engine serves it (both weight
    formats' layouts honored — split-half w4 pairing included)."""
    cfg = get_model_config("test-tiny-moe")
    params = llama.init_params(cfg, jax.random.PRNGKey(1), jnp.float32)
    tokens = jnp.asarray(
        np.random.RandomState(6).randint(0, cfg.vocab_size, (2, 12)),
        jnp.int32)
    calib = quantized.identity_calib(cfg, select_frac=0.125)
    base = llama.model_forward(cfg, params, tokens)

    def err(act_bits):
        q = _qcfg(act_bits=act_bits)
        qp = quantized.quantize_model_params(cfg, params, calib, q)
        out = quantized.quant_model_forward(cfg, qp, calib, q, tokens)
        return float(jnp.mean((out - base) ** 2))

    e16, e4 = err(16), err(4)
    assert e16 < e4, (e16, e4)

    for fmt in ("w8", "w4"):
        q_eng = _qcfg(act_bits=16, use_kernels=True, weight_fmt=fmt)
        eng = InferenceEngine(cfg, params, calib, q_eng,
                              EngineConfig(max_batch=2, max_seq_len=64,
                                           page_size=16))
        out = eng.generate([[5, 17, 301, 42]], max_new_tokens=4)
        assert len(out[0]) == 4, fmt
        assert all(0 <= t < cfg.vocab_size for t in out[0]), fmt
