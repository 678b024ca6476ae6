"""Paged quantized KV cache: int4 page pools, append ops, and the
Pallas flash-decode kernel's host-side plumbing."""

from .paged import (PagedKVCache, init_cache, append_kv, gather_kv,
                    quantize_kv, dequantize_kv)
