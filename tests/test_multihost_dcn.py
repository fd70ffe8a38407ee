"""Two-process DCN validation for `parallel/multihost.py` (VERDICT r03 item
6): a real `jax.distributed` pair (CPU backend, 2 virtual devices per
process = 4 global) builds `make_multihost_mesh`, asserts tp groups stay
intra-process (ICI-local by construction), and runs a psum over the dp axis
that MUST cross the process boundary — the capability the reference's
multi-node Mapping flags claim (`convert_checkpoint.py:252-274`) but never
exercise in-repo."""

import os
import socket
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]

CHILD = r"""
import sys

import jax
jax.config.update("jax_platforms", "cpu")

coord, pid = sys.argv[1], int(sys.argv[2])

from sparktts_tpu.parallel.multihost import initialize_distributed, make_multihost_mesh

initialize_distributed(coordinator_address=coord, num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.local_device_count() == 2, jax.local_device_count()
assert jax.device_count() == 4, jax.device_count()

mesh = make_multihost_mesh(tp=2)
assert mesh.shape == {"dp": 2, "tp": 2}, mesh.shape

# tp groups (mesh rows) must be intra-process: tp collectives ride ICI only
for row in mesh.devices:
    procs = {d.process_index for d in row}
    assert len(procs) == 1, f"tp group spans processes: {procs}"
# the dp axis must SPAN the two processes (that's the DCN dimension)
dp_procs = {d.process_index for d in mesh.devices[:, 0]}
assert dp_procs == {0, 1}, dp_procs

# a psum over dp crosses the process boundary; over the full (dp, tp) grid
# each device contributes its GLOBAL mesh position, so the reduction result
# proves every device (both processes) participated
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

with mesh:
    def f(x):
        return jax.lax.psum(x, ("dp", "tp"))

    shard_f = jax.shard_map(f, mesh=mesh, in_specs=P("dp", "tp"), out_specs=P())
    # globally x = [[1,2],[3,4]]: psum = 10 only if the remote process's
    # shard (rows it owns) is included
    x = jax.make_array_from_callback(
        (2, 2),
        NamedSharding(mesh, P("dp", "tp")),
        lambda idx: np.asarray([[1.0, 2.0], [3.0, 4.0]])[idx],
    )
    out = jax.jit(shard_f)(x)
    assert float(np.asarray(out)) == 10.0, np.asarray(out)

print(f"proc {pid}: ok")
"""


def test_two_process_dcn_mesh_and_psum(tmp_path):
    script = tmp_path / "child.py"
    script.write_text(CHILD)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = str(ROOT)
    # the conftest pins this process's JAX config; children start clean
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=240) for p in procs]
    for i, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}\n{err}"
        assert f"proc {i}: ok" in out
