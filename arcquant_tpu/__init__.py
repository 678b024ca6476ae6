"""ARCQuant-TPU: a TPU-native W4A4 quantized-inference framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
pdh930105/ARCQuant (NVFP4 block quantization with Augmented Residual
Channels) for TPU hardware: fused Pallas dequant-GEMM and quantize
kernels, paged quantized KV caches with Pallas flash-decode,
tensor-parallel sharding over jax.sharding meshes, calibration,
accuracy eval, and e2e serving benchmarks.
"""

__version__ = "0.1.0"
