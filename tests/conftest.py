"""Test configuration: run everything on a virtual 8-device CPU mesh.

XLA_FLAGS must be set before jax initializes its backends, hence the
os.environ writes at import time (SURVEY.md §4 testing note). The
environment's TPU plugin ("axon") force-prepends itself to
jax_platforms at import, so JAX_PLATFORMS env alone is NOT enough —
we must override the config after import.

Set ARC_TEST_TPU=1 to run the suite on the real TPU chip instead
(kernels compile via Mosaic rather than interpret mode; matmul
tolerances are looser there because the MXU contracts bf16).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

if not os.environ.get("ARC_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_default_prng_impl", "rbg")

# Keep GEMM path dispatch deterministic under test: never read a
# stale measured-autotune table from /tmp (tests that exercise the
# table monkeypatch ARC_AUTOTUNE_FILE themselves).
os.environ.setdefault("ARC_AUTOTUNE_FILE",
                      "/nonexistent/arc_autotune_tests.json")
