"""Device-memory accounting that works through the axon TPU tunnel.

``device.memory_stats()`` returns ``None`` on this backend (probed
round 4), so allocator peak-bytes are unavailable. The honest
fallback is live-buffer accounting: sum ``nbytes`` over
``jax.live_arrays()``. For a steady-state inference engine this
captures the dominant terms (weights + KV pool + engine state);
transient executable workspace is NOT included, so the number is a
lower bound on true peak.

Reference parity: benchmark_e2e_arc.py:106-111 reports
``torch.cuda.max_memory_allocated`` (allocator peak).
"""

from __future__ import annotations

import jax


def live_device_bytes() -> int:
    """Total bytes of live jax.Arrays (committed device buffers)."""
    total = 0
    for a in jax.live_arrays():
        try:
            total += a.nbytes
        except Exception:       # deleted/donated buffers race
            pass
    return total


def device_mem_gb() -> float | None:
    """Best-available device memory figure in GiB.

    Prefers the allocator's peak (when the platform exposes it);
    falls back to live-buffer accounting (lower bound on peak).
    """
    try:
        ms = jax.devices()[0].memory_stats()
        if ms:
            peak = ms.get("peak_bytes_in_use", ms.get("bytes_in_use"))
            if peak:
                return peak / 2**30
    except Exception:
        pass
    b = live_device_bytes()
    return b / 2**30 if b else None
