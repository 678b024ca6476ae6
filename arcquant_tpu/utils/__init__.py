"""Utilities: packed-checkpoint persistence (orbax), timing/profiling
harnesses."""

from .checkpoint import save_quantized, load_quantized
from .timing import bench_op, measure_roundtrip, profile_trace
