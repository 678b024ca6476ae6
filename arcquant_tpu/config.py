"""Central configuration for ARCQuant-TPU.

The reference scatters its constants across files (FP4_MAX=6,
FP8_MAX=448 in reorder.cu:17-19; outlier threshold 0.125 in
utilize.py:472; 64-channel rounding utilize.py:475; page_len=128 in
modeling_arc.py:155; MODEL_CFGS in benchmark_e2e_arc.py:14-77). This
module centralizes all of them (SURVEY.md §5 config note).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional

# ---------------------------------------------------------------------------
# Quantization constants (see quant/numerics.py for the formats themselves)
# ---------------------------------------------------------------------------

FP4_MAX = 6.0                 # reference reorder.cu:17
FP8_MAX = 448.0               # reference reorder.cu:18
OUTLIER_THRESHOLD = 0.125     # fraction of row-max (utilize.py:472)
SELECT_NUM_MULTIPLE = 64      # channel-count rounding (utilize.py:475)
KV_PAGE_SIZE = 128            # tokens per KV page (modeling_arc.py:155)
KV_GROUP_LLAMA = 64           # KV fake-quant group (qLlamaLayer.py:312)
KV_GROUP_QWEN = 128           # KV fake-quant group (qQwenLayer.py:299)

QUANT_TYPES = ("NVFP4", "MXFP4", "MXFP6", "INT4", "BF16")


@dataclass(frozen=True)
class QuantConfig:
    """How to quantize a model."""
    quant_type: str = "NVFP4"
    use_arc: bool = True                # append residual channels
    kv_quant: bool = False              # int4 asym group KV quantization
    kv_group_size: int = KV_GROUP_LLAMA
    kv_bits: int = 4
    # Pallas kernel path vs pure-jnp fake-quant path.
    use_kernels: bool = True
    # Packed weight storage: "w8" (i8 codes, fastest decode) or
    # "w4" (nibble-packed, max compression). Same NVFP4 numerics.
    weight_fmt: str = "w8"
    # Activation precision: 4 = NVFP4 activations (+ ARC residuals,
    # the reference's W4A4 design); 16 = WEIGHT-ONLY quantization
    # (W4A16): activations stay bf16 with a unit global scale — the
    # same trick the quantized LM head uses. The ARC residual slots
    # carry exact zeros (ARC corrects ACTIVATION quantization error,
    # which W4A16 does not incur), so packed weights are reused
    # unchanged and the GEMM is bit-defined either way.
    act_bits: int = 4
    # Per-PHASE activation precision override for the serving engines:
    # 0 = use act_bits everywhere; 16 = hybrid serving mode (W4A16
    # prefill + act_bits decode). Rationale: v5e has no fp4 MXU, so
    # A4 prefill pays the quantize sites + ARC width for zero MXU
    # speedup (round-3 profile: 3.95 ms/layer at bs=4x1024 against a
    # 12.2 ms/layer bf16 floor) — W4A16 prefill is strictly more
    # accurate AND faster on TPU; decode is weight-bound either way.
    # Packed weights are shared between phases (the W4A16 path feeds
    # exact activations with zero ARC residual into the same GEMM).
    prefill_act_bits: int = 0
    # Activation global-scale granularity: "tensor" (reference parity,
    # qLlamaLayer.py:73-77) or "row" (per-token scales — finer, and
    # sequences in a batch quantize independently; the serving engine
    # default).
    act_scale: str = "tensor"
    # Weight global-scale granularity: "tensor" (reference parity,
    # qLinearLayer.py:26) or "channel" (per-output-channel, finer;
    # required for the engine's fused QKV / gate-up packs).
    w_scale: str = "tensor"
    # Quantize the LM head (W4A16-style: packed NVFP4 weight, exact
    # bf16 activations). The reference keeps the head bf16
    # (model_utils.py swaps only decoder layers); at decode the bf16
    # head is ~8% of the whole step's HBM traffic on 150k-vocab
    # models, so the engine can opt in.
    quantize_lm_head: bool = False
    # Exact-ARC under tensor parallelism: row-parallel sites keep the
    # GLOBAL top-KE residual channel set and grouping (residual block
    # partitioned group-aligned across shards; the activation residual
    # is rebuilt exactly via a scatter + psum), so TP numerics match
    # the single-device engine bit-for-bit with ARC on. Requires
    # (select_num/tp) % 16 == 0 per row site. Default False = the
    # cheaper per-shard re-balanced selection (different, usually
    # equally good, numerics).
    tp_exact_arc: bool = False

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


# ---------------------------------------------------------------------------
# Model configs
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ModelConfig:
    """Decoder-only transformer config (Llama/Qwen2 families).

    Mirrors the reference's MODEL_CFGS registry
    (benchmarks/benchmark_e2e_arc.py:14-77) plus the HF config fields
    the accuracy path needs.
    """
    name: str
    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int = 0
    rope_theta: float = 10000.0
    rms_eps: float = 1e-5
    qkv_bias: bool = False          # Qwen2: True
    tie_embeddings: bool = False
    max_position_embeddings: int = 4096
    # Llama-3.1 rope scaling ("llama3" style) — None disables.
    rope_scaling_factor: Optional[float] = None
    rope_low_freq_factor: float = 1.0
    rope_high_freq_factor: float = 4.0
    rope_original_max_pos: int = 8192
    # Mixture-of-experts (0 experts = dense FFN). Covers the
    # Mixtral-style pure-MoE FFN and the Qwen-MoE variant (shared
    # expert + sigmoid shared gate); all deltas are config-driven,
    # like the Llama/Qwen2 split above.
    num_experts: int = 0
    num_experts_per_tok: int = 2
    moe_intermediate_size: int = 0
    shared_expert_size: int = 0     # Qwen-MoE shared expert width
    norm_topk_prob: bool = False    # renormalize top-k router weights

    def __post_init__(self):
        if self.head_dim == 0:
            object.__setattr__(self, "head_dim",
                               self.hidden_size // self.num_heads)

    @property
    def num_kv_groups(self) -> int:
        return self.num_heads // self.num_kv_heads

    @property
    def q_size(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def kv_size(self) -> int:
        return self.num_kv_heads * self.head_dim

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


def _qwen2(name, hidden, inter, layers, heads, kv_heads, vocab=152064,
           theta=1000000.0, max_pos=32768):
    return ModelConfig(
        name=name, vocab_size=vocab, hidden_size=hidden,
        intermediate_size=inter, num_layers=layers, num_heads=heads,
        num_kv_heads=kv_heads, rope_theta=theta, rms_eps=1e-6,
        qkv_bias=True, max_position_embeddings=max_pos)


MODEL_CONFIGS = {
    # --- reference MODEL_CFGS parity (benchmark_e2e_arc.py:26-77) ---
    "qwen2.5-7b": _qwen2("qwen2.5-7b", 3584, 18944, 28, 28, 4),
    "qwen2.5-14b": _qwen2("qwen2.5-14b", 5120, 13824, 48, 40, 8),
    "qwen2.5-32b": _qwen2("qwen2.5-32b", 5120, 27648, 64, 40, 8),
    "llama-2-7b": ModelConfig(
        name="llama-2-7b", vocab_size=32000, hidden_size=4096,
        intermediate_size=11008, num_layers=32, num_heads=32,
        num_kv_heads=32, rope_theta=10000.0, rms_eps=1e-5,
        max_position_embeddings=4096),
    "llama-3.1-8b": ModelConfig(
        name="llama-3.1-8b", vocab_size=128256, hidden_size=4096,
        intermediate_size=14336, num_layers=32, num_heads=32,
        num_kv_heads=8, rope_theta=500000.0, rms_eps=1e-5,
        max_position_embeddings=131072, rope_scaling_factor=8.0),
    # --- scale-out target (BASELINE.md) ---
    "qwen2.5-72b": _qwen2("qwen2.5-72b", 8192, 29568, 80, 64, 8),
    # --- small same-tokenizer companions: EngineDrafter draft models
    # for speculative decoding (qwen2.5-0.5b drafts for 7b/14b/32b/
    # 72b; llama-3.2-1b for llama-3.1-8b) ---
    "qwen2.5-0.5b": _qwen2("qwen2.5-0.5b", 896, 4864, 24, 14, 2,
                           vocab=151936),
    "qwen2.5-1.5b": _qwen2("qwen2.5-1.5b", 1536, 8960, 28, 12, 2,
                           vocab=151936),
    "llama-3.2-1b": ModelConfig(
        name="llama-3.2-1b", vocab_size=128256, hidden_size=2048,
        intermediate_size=8192, num_layers=16, num_heads=32,
        num_kv_heads=8, rope_theta=500000.0, rms_eps=1e-5,
        max_position_embeddings=131072, rope_scaling_factor=32.0),
    # --- MoE families (beyond the reference, which is dense-only;
    # expert weights dominate memory -> the natural W4 + ep target) ---
    "mixtral-8x7b": ModelConfig(
        name="mixtral-8x7b", vocab_size=32000, hidden_size=4096,
        intermediate_size=14336, num_layers=32, num_heads=32,
        num_kv_heads=8, rope_theta=1000000.0, rms_eps=1e-5,
        max_position_embeddings=32768, num_experts=8,
        num_experts_per_tok=2, moe_intermediate_size=14336,
        norm_topk_prob=True),
    "qwen1.5-moe-a2.7b": ModelConfig(
        name="qwen1.5-moe-a2.7b", vocab_size=151936, hidden_size=2048,
        intermediate_size=5632, num_layers=24, num_heads=16,
        num_kv_heads=16, rope_theta=1000000.0, rms_eps=1e-6,
        qkv_bias=True, max_position_embeddings=8192, num_experts=60,
        num_experts_per_tok=4, moe_intermediate_size=1408,
        shared_expert_size=5632, norm_topk_prob=False),
    # --- small configs for tests/CI (random weights) ---
    "tinyllama-1.1b": ModelConfig(
        name="tinyllama-1.1b", vocab_size=32000, hidden_size=2048,
        intermediate_size=5632, num_layers=22, num_heads=32,
        num_kv_heads=4, rope_theta=10000.0, rms_eps=1e-5,
        max_position_embeddings=2048),
    "test-tiny": ModelConfig(
        name="test-tiny", vocab_size=512, hidden_size=256,
        intermediate_size=512, num_layers=2, num_heads=4,
        num_kv_heads=2, rope_theta=10000.0, rms_eps=1e-5,
        max_position_embeddings=512),
    "test-qwen-tiny": _qwen2("test-qwen-tiny", 256, 512, 2, 4, 2,
                             vocab=512, max_pos=512),
    "test-tiny-moe": ModelConfig(
        name="test-tiny-moe", vocab_size=512, hidden_size=128,
        intermediate_size=256, num_layers=2, num_heads=4,
        num_kv_heads=2, rope_theta=10000.0, rms_eps=1e-5,
        max_position_embeddings=512, num_experts=4,
        num_experts_per_tok=2, moe_intermediate_size=128,
        shared_expert_size=128, norm_topk_prob=True),
}


def get_model_config(name: str) -> ModelConfig:
    if name not in MODEL_CONFIGS:
        raise KeyError(
            f"unknown model {name!r}; known: {sorted(MODEL_CONFIGS)}")
    return MODEL_CONFIGS[name]


def config_from_hf(hf_config) -> ModelConfig:
    """Build a ModelConfig from a HuggingFace transformers config
    (Llama or Qwen2), for loading real checkpoints."""
    mt = getattr(hf_config, "model_type", "llama")
    rope_scaling = getattr(hf_config, "rope_scaling", None) or {}
    is_llama3 = (rope_scaling.get("rope_type", rope_scaling.get("type"))
                 == "llama3")
    # MoE fields: Mixtral uses num_local_experts, Qwen-MoE num_experts;
    # dense checkpoints have neither (-> 0, dense path).
    n_exp = (getattr(hf_config, "num_local_experts", None)
             or getattr(hf_config, "num_experts", None) or 0)
    return ModelConfig(
        name=getattr(hf_config, "name_or_path", mt) or mt,
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        intermediate_size=hf_config.intermediate_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        num_kv_heads=getattr(hf_config, "num_key_value_heads",
                             hf_config.num_attention_heads),
        head_dim=getattr(hf_config, "head_dim", 0) or 0,
        rope_theta=getattr(hf_config, "rope_theta", 10000.0),
        rms_eps=hf_config.rms_norm_eps,
        qkv_bias=(mt in ("qwen2", "qwen2_moe")),
        tie_embeddings=getattr(hf_config, "tie_word_embeddings", False),
        max_position_embeddings=hf_config.max_position_embeddings,
        rope_scaling_factor=(rope_scaling.get("factor")
                             if is_llama3 else None),
        rope_low_freq_factor=rope_scaling.get("low_freq_factor", 1.0),
        rope_high_freq_factor=rope_scaling.get("high_freq_factor", 4.0),
        rope_original_max_pos=rope_scaling.get(
            "original_max_position_embeddings", 8192),
        num_experts=n_exp,
        num_experts_per_tok=getattr(
            hf_config, "num_experts_per_tok", None) or 2,
        moe_intermediate_size=(getattr(
            hf_config, "moe_intermediate_size", None)
            or (hf_config.intermediate_size if n_exp else 0)),
        shared_expert_size=getattr(
            hf_config, "shared_expert_intermediate_size", None) or 0,
        norm_topk_prob=bool(getattr(hf_config, "norm_topk_prob", None)
                            if getattr(hf_config, "norm_topk_prob",
                                       None) is not None
                            else mt == "mixtral"),
    )
