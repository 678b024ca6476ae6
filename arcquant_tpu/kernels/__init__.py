"""Pallas TPU kernels: fused dequant-GEMM, activation quantization,
flash attention, and paged quantized KV decode."""

from . import gemm, quantize, attention, paged_decode
from .gemm import gemm_dequant
from .attention import flash_attention
from .paged_decode import paged_decode
