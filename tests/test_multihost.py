"""Multi-host runtime test: TWO separate processes join through
jax.distributed (parallel.mesh.multihost_init), form one global mesh,
and run cross-process collectives — the DCN-simulated validation of
the multi-controller story (no TPU pod available here; CPU processes
with gloo collectives stand in for hosts; VERDICT round-1 §2.3)."""

import os
import subprocess
import sys
import socket

import pytest

_WORKER = r"""
import sys, os
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__)))) if False else sys.path.insert(0, %(repo)r)

from arcquant_tpu.parallel.mesh import multihost_init

pid = int(sys.argv[1])
multihost_init(coordinator=%(coord)r, num_processes=2, process_id=pid)

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

devs = jax.devices()
assert len(devs) == 8, len(devs)           # 4 local x 2 processes
assert jax.process_count() == 2
mesh = Mesh(np.array(devs).reshape(2, 4), ("dp", "tp"))

# cross-process psum over BOTH axes: every device contributes its
# global index; the result must be sum(range(8)) everywhere
def body(x):
    return jax.lax.psum(jax.lax.psum(x, "tp"), "dp")

xs = jnp.arange(8.0)
sh = NamedSharding(mesh, P(("dp", "tp")))
x_sharded = jax.device_put(xs, sh).reshape(2, 4)
f = shard_map(lambda x: body(x.sum()).reshape(1, 1), mesh=mesh,
              in_specs=P("dp", "tp"), out_specs=P("dp", "tp"),
              check_vma=False)
out = jax.jit(f)(x_sharded)
got = float(np.asarray(jax.device_get(out[0, 0])))
assert got == 28.0, got

# row-parallel psum matmul across hosts (the TP engine's pattern)
w = jnp.arange(32.0).reshape(8, 4)         # K=8 sharded over 8 devices
xv = jnp.ones((1, 8))
wsh = jax.device_put(w, NamedSharding(mesh, P(("dp", "tp"), None)))
xsh = jax.device_put(xv, NamedSharding(mesh, P(None, ("dp", "tp"))))
g = shard_map(
    lambda xl, wl: jax.lax.psum(
        jax.lax.psum(xl @ wl, "tp"), "dp"),
    mesh=mesh, in_specs=(P(None, ("dp", "tp")), P(("dp", "tp"), None)),
    out_specs=P(), check_vma=False)
y = jax.jit(g)(xsh, wsh)
want = np.ones((1, 8)) @ np.arange(32.0).reshape(8, 4)
np.testing.assert_allclose(np.asarray(jax.device_get(y)), want)
print(f"proc {pid} ok", flush=True)
"""


@pytest.mark.skipif(os.environ.get("ARC_SKIP_MULTIHOST") == "1",
                    reason="multihost test disabled")
def test_two_process_mesh_collectives(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = _WORKER % {"repo": repo, "coord": coord}
    path = tmp_path / "worker.py"
    path.write_text(script)
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=4",
               JAX_PLATFORMS="cpu")
    procs = [subprocess.Popen(
        [sys.executable, str(path), str(i)], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"proc {i} ok" in out
