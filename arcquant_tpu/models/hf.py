"""HuggingFace checkpoint loading (Llama / Qwen2 families) without
torch: reads safetensors shards directly into the functional param
pytree (reference analog: model/main.py:20-45 get_llama/get_qwen via
transformers AutoModelForCausalLM — here we skip torch entirely and
map tensors name-by-name).

Zero-egress note: this loads from a LOCAL model directory (a cloned
HF repo or cache dir); no network access is attempted.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig, config_from_hf


def _load_shards(model_dir: str) -> Dict[str, np.ndarray]:
    from safetensors import safe_open
    files = sorted(glob.glob(os.path.join(model_dir, "*.safetensors")))
    if not files:
        raise FileNotFoundError(
            f"no .safetensors files in {model_dir!r}")
    out: Dict[str, np.ndarray] = {}
    for f in files:
        with safe_open(f, framework="numpy") as sf:
            for k in sf.keys():
                out[k] = sf.get_tensor(k)
    return out


def load_hf_config(model_dir: str) -> ModelConfig:
    with open(os.path.join(model_dir, "config.json")) as f:
        raw = json.load(f)

    class _Cfg:
        def __init__(self, d):
            self.__dict__.update(d)

        def __getattr__(self, k):        # missing keys -> None
            return None

    hf = _Cfg(raw)
    if hf.model_type is None:
        hf.model_type = "llama"
    return config_from_hf(hf)


def load_hf_params(model_dir: str, cfg: Optional[ModelConfig] = None,
                   dtype=jnp.bfloat16):
    """Load a local HF Llama/Qwen2 checkpoint into the functional
    param pytree used by models/llama.py."""
    if cfg is None:
        cfg = load_hf_config(model_dir)
    t = _load_shards(model_dir)

    def get(name):
        if name in t:
            return jnp.asarray(t[name]).astype(dtype)
        # some checkpoints prefix with "model."
        alt = name[6:] if name.startswith("model.") else "model." + name
        return jnp.asarray(t[alt]).astype(dtype)

    def linear(prefix, bias):
        p = {"w": get(prefix + ".weight")}
        if bias:
            p["b"] = get(prefix + ".bias")
        return p

    def moe_params(pre):
        """Stacked-expert MoE block from either HF layout:
        Mixtral  — {pre}.block_sparse_moe.gate / .experts.{e}.w1/w3/w2
        Qwen-MoE — {pre}.mlp.gate / .mlp.experts.{e}.gate|up|down_proj
                   (+ .mlp.shared_expert.* and .mlp.shared_expert_gate)
        Expert weights stack to [E, F, D] / [E, D, F] (models/moe.py
        init_moe_params layout: E is the ep-sharding/einsum batch
        axis)."""
        mixtral = any(".block_sparse_moe." in k
                      and k.split(".block_sparse_moe.")[0]
                      .endswith(pre.split("model.")[-1]) for k in t)
        mpre = pre + (".block_sparse_moe" if mixtral else ".mlp")
        names = (("w1", "w3", "w2") if mixtral
                 else ("gate_proj", "up_proj", "down_proj"))
        stacks = {dst: jnp.stack(
            [get(f"{mpre}.experts.{e}.{src}.weight")
             for e in range(cfg.num_experts)])
            for dst, src in zip(("gate", "up", "down"), names)}
        p = {"router": {"w": get(mpre + ".gate.weight")},
             **{k: {"w": v} for k, v in stacks.items()}}
        if cfg.shared_expert_size:
            p["sgate"] = linear(mpre + ".shared_expert.gate_proj", False)
            p["sup"] = linear(mpre + ".shared_expert.up_proj", False)
            p["sdown"] = linear(mpre + ".shared_expert.down_proj", False)
            p["shared_gate"] = linear(mpre + ".shared_expert_gate",
                                      False)
        return p

    layers = []
    qb = cfg.qkv_bias
    for i in range(cfg.num_layers):
        pre = f"model.layers.{i}"
        lp = {
            "attn_norm": get(pre + ".input_layernorm.weight"),
            "mlp_norm": get(pre + ".post_attention_layernorm.weight"),
            "q": linear(pre + ".self_attn.q_proj", qb),
            "k": linear(pre + ".self_attn.k_proj", qb),
            "v": linear(pre + ".self_attn.v_proj", qb),
            "o": linear(pre + ".self_attn.o_proj", False),
        }
        if cfg.num_experts:
            lp["moe"] = moe_params(pre)
        else:
            lp.update(
                gate=linear(pre + ".mlp.gate_proj", False),
                up=linear(pre + ".mlp.up_proj", False),
                down=linear(pre + ".mlp.down_proj", False),
            )
        layers.append(lp)
    params: Dict[str, Any] = {
        "embed": get("model.embed_tokens.weight"),
        "final_norm": get("model.norm.weight"),
        "layers": layers,
    }
    if not cfg.tie_embeddings:
        try:
            params["lm_head"] = get("lm_head.weight")
        except KeyError:
            pass  # tied after all
    return cfg, params


def load_tokenizer(model_dir: str):
    """Tokenizer via transformers (local files only)."""
    from transformers import AutoTokenizer
    return AutoTokenizer.from_pretrained(model_dir,
                                         local_files_only=True)
