"""ARCQuant-TPU: a TPU-native W4A4 quantized-inference framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
pdh930105/ARCQuant (NVFP4 block quantization with Augmented Residual
Channels) for TPU hardware: fused Pallas dequant-GEMM and quantize
kernels, paged quantized KV caches with Pallas flash-decode,
tensor-parallel sharding over jax.sharding meshes, calibration,
accuracy eval, and e2e serving benchmarks.
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: this host has ONE cpu core and
# jit compiles of the decode scans run minutes — a cross-process
# cache turns repeat runs (benchmarks, the measurement queue, child
# bench processes) from minutes into seconds. Measured round 4:
# 73.7 s -> 0.72 s for a fresh process re-running a cached compile.
# Opt out with ARC_NO_COMPILE_CACHE=1.
import os as _os

if not _os.environ.get("ARC_NO_COMPILE_CACHE"):
    try:
        import jax as _jax
        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get("ARC_COMPILE_CACHE_DIR",
                            "/tmp/arc_jax_cache"))
        _jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:           # pragma: no cover - cache is optional
        pass
