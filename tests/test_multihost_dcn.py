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

# ---- sharded GENERATE over the 2-process mesh (VERDICT r04 item 6): a tiny
# Qwen decode with tp-sharded params and the batch dp-sharded ACROSS the
# process boundary, token-parity-checked against the single-device forward.
# This is the reference's multi-node sharded-inference claim
# (`convert_checkpoint.py:252-274`) actually executed over two processes.
from sparktts_tpu.config import QwenConfig
from sparktts_tpu.lm.generate import generate
from sparktts_tpu.lm.qwen import init_qwen
from sparktts_tpu.parallel.shardings import batch_spec, qwen_param_specs

CFG = QwenConfig(
    vocab_size=128, hidden_size=32, intermediate_size=64,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    head_dim=8, eos_token_id=0, pad_token_id=1,
)
params = init_qwen(jax.random.PRNGKey(0), CFG)  # same values in both procs
ids = np.asarray([[5, 9, 17, 3], [21, 7, 11, 2]], np.int32)
mask = np.ones((2, 4), bool)
kwargs = dict(max_new_tokens=4, cache_len=16, eos_ids=(), pad_id=1, greedy=True)

# single-device reference on this process's local device
tokens_ref, _ = generate(
    params, CFG, jnp.asarray(ids), jnp.asarray(mask), jax.random.PRNGKey(1), **kwargs
)
tokens_ref = np.asarray(tokens_ref)

specs = qwen_param_specs(CFG)
with mesh:
    def put(x, s):
        sh = NamedSharding(mesh, s)
        return jax.make_array_from_callback(x.shape, sh, lambda idx: np.asarray(x)[idx])

    params_sh = jax.tree.map(put, params, specs)
    ids_sh = put(ids, batch_spec())
    mask_sh = put(mask, batch_spec())
    tokens_sh, _ = generate(
        params_sh, CFG, ids_sh, mask_sh, jax.random.PRNGKey(1), **kwargs
    )
    # replicate the dp-sharded result so every process can read all rows
    tokens_rep = jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))(
        tokens_sh
    )
    np.testing.assert_array_equal(tokens_ref, np.asarray(tokens_rep))

print(f"proc {pid}: generate ok")
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
        assert f"proc {i}: generate ok" in out
        assert f"proc {i}: ok" in out
