"""Pallas TPU kernels: fused dequant-GEMM, activation quantization,
flash attention, and paged quantized KV decode."""

from . import gemm, quantize
