"""Model families: functional Llama/Qwen2 decoders, quantized layers,
and HF checkpoint loading."""

from . import llama, quantized
