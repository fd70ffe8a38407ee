"""Mesh / sharding tests on the 8-device virtual CPU mesh (SURVEY.md §4:
CPU-device mesh is the multi-chip stand-in)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from sparktts_tpu.config import QwenConfig
from sparktts_tpu.lm.generate import generate
from sparktts_tpu.lm.qwen import init_qwen
from sparktts_tpu.lm.train import init_train_state, make_optimizer, train_step
from sparktts_tpu.parallel.mesh import make_mesh
from sparktts_tpu.parallel.shardings import batch_spec, qwen_param_specs

CFG = QwenConfig(
    vocab_size=256,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=16,
    eos_token_id=0,
    pad_token_id=1,
)


def _sharded_params(mesh):
    params = init_qwen(jax.random.PRNGKey(0), CFG)
    specs = qwen_param_specs(CFG)
    return jax.tree.map(lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def test_mesh_construction():
    assert len(jax.devices()) == 8, "conftest should provide 8 virtual CPU devices"
    mesh = make_mesh()
    assert mesh.shape == {"dp": 4, "tp": 2, "pp": 1}
    mesh3 = make_mesh(dp=2, tp=2, pp=2)
    assert mesh3.shape == {"dp": 2, "tp": 2, "pp": 2}


def test_tp_sharded_forward_matches_single_device():
    mesh = make_mesh(dp=4, tp=2)
    params = init_qwen(jax.random.PRNGKey(0), CFG)
    sharded = _sharded_params(mesh)

    ids = np.random.default_rng(0).integers(5, 250, size=(4, 8)).astype(np.int32)
    mask = jnp.ones((4, 8), bool)

    kwargs = dict(
        max_new_tokens=4, cache_len=16, eos_ids=(), pad_id=1, greedy=True
    )
    tokens_ref, _ = generate(params, CFG, jnp.asarray(ids), mask, jax.random.PRNGKey(1), **kwargs)
    with mesh:
        ids_sh = jax.device_put(jnp.asarray(ids), NamedSharding(mesh, batch_spec()))
        tokens_sh, _ = generate(sharded, CFG, ids_sh, mask, jax.random.PRNGKey(1), **kwargs)
    np.testing.assert_array_equal(np.asarray(tokens_ref), np.asarray(tokens_sh))


def test_pp_sharded_forward_matches_single_device():
    """dp=2/tp=2/pp=2: stage-sliced layer stacking must be bit-identical to
    the single-device forward (reference capability: TRT-LLM --pp_size,
    `convert_checkpoint.py:25-28`)."""
    mesh = make_mesh(dp=2, tp=2, pp=2)
    params = init_qwen(jax.random.PRNGKey(0), CFG)
    specs = qwen_param_specs(CFG, pp=True)
    sharded = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )

    ids = np.random.default_rng(3).integers(5, 250, size=(4, 8)).astype(np.int32)
    mask = jnp.ones((4, 8), bool)
    kwargs = dict(max_new_tokens=4, cache_len=16, eos_ids=(), pad_id=1, greedy=True)
    tokens_ref, _ = generate(params, CFG, jnp.asarray(ids), mask, jax.random.PRNGKey(1), **kwargs)
    with mesh:
        ids_sh = jax.device_put(jnp.asarray(ids), NamedSharding(mesh, batch_spec()))
        tokens_sh, _ = generate(sharded, CFG, ids_sh, mask, jax.random.PRNGKey(1), **kwargs)
    np.testing.assert_array_equal(np.asarray(tokens_ref), np.asarray(tokens_sh))


def test_pp_train_step_runs():
    mesh = make_mesh(dp=2, tp=2, pp=2)
    params = init_qwen(jax.random.PRNGKey(0), CFG)
    specs = qwen_param_specs(CFG, pp=True)
    sharded = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
    optimizer = make_optimizer()
    state = init_train_state(sharded, optimizer)
    ids = jax.device_put(jnp.ones((4, 16), jnp.int32), NamedSharding(mesh, batch_spec()))
    mask = jax.device_put(jnp.ones((4, 16), bool), NamedSharding(mesh, batch_spec()))
    step = jax.jit(functools.partial(train_step, cfg=CFG, optimizer=optimizer))
    with mesh:
        _, loss = step(state, input_ids=ids, loss_mask=mask)
    assert np.isfinite(float(loss))


def test_train_step_runs_on_mesh():
    mesh = make_mesh(dp=4, tp=2)
    sharded = _sharded_params(mesh)
    optimizer = make_optimizer()
    state = init_train_state(sharded, optimizer)
    ids = jax.device_put(
        jnp.ones((8, 16), jnp.int32), NamedSharding(mesh, batch_spec())
    )
    mask = jax.device_put(jnp.ones((8, 16), bool), NamedSharding(mesh, batch_spec()))
    step = jax.jit(functools.partial(train_step, cfg=CFG, optimizer=optimizer))
    with mesh:
        new_state, loss = step(state, input_ids=ids, loss_mask=mask)
    assert np.isfinite(float(loss))
    assert int(new_state.step) == 1
    # params changed
    delta = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), new_state.params, state.params)
    assert max(jax.tree.leaves(delta)) > 0


def test_dryrun_multichip_entry():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_multihost_mesh_single_host():
    """On one (virtual) host the multihost mesh reduces to the local mesh."""
    from sparktts_tpu.parallel.multihost import make_multihost_mesh

    mesh = make_multihost_mesh(tp=2)
    assert mesh.shape == {"dp": 4, "tp": 2}
    # tp groups must be contiguous device ids (ICI-local by construction)
    devs = mesh.devices
    for row in devs:
        ids = [d.id for d in row]
        assert ids == sorted(ids)


def test_tp_sharded_continuous_engine_serves(params_fixture=None):
    """The continuous-batching SERVING engine runs end-to-end over a tp mesh
    (megatron-sharded params, GSPMD collectives inside admit/decode) with
    token identity to the single-device engine — the multi-chip deployment
    story is the same engine the single-chip server uses, not a separate
    code path (reference capability: TRT-LLM tp_size under Triton)."""
    from sparktts_tpu.lm.continuous import ContinuousBatchingEngine

    mesh = make_mesh(dp=4, tp=2)
    params = init_qwen(jax.random.PRNGKey(0), CFG)
    sharded = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params,
        qwen_param_specs(CFG),
    )
    rng = np.random.default_rng(11)
    p0 = rng.integers(5, 250, size=10).tolist()
    p1 = rng.integers(5, 250, size=7).tolist()

    def run(prm):
        eng = ContinuousBatchingEngine(
            prm, CFG, max_slots=4, cache_len=64, prompt_pad=16,
            eos_ids=(), pad_id=1, greedy=True, cache_dtype=jnp.float32,
        )
        r0 = eng.submit(p0, max_new_tokens=12)
        eng.step(4)
        r1 = eng.submit(p1, max_new_tokens=12)  # staggered mid-flight join
        eng.run_until_done(6)
        return eng.finished[r0], eng.finished[r1]

    ref0, ref1 = run(params)
    sh0, sh1 = run(sharded)
    np.testing.assert_array_equal(ref0, sh0)
    np.testing.assert_array_equal(ref1, sh1)


def test_tp_sharded_full_server_end_to_end():
    """The FULL asyncio serving stack (ContinuousTTSServer: device-chained
    admission, adaptive dispatch, vocode worker, streaming chunks) runs over
    megatron-sharded LM params with audio identical to the single-device
    server.  Multi-chip serving is a device_put of the params — no separate
    server code path (reference capability: TRT-LLM tp_size under Triton,
    convert_checkpoint.py:252-274)."""
    import asyncio

    from sparktts_tpu.config import tiny_test_config
    from sparktts_tpu.pipeline import SparkTTSPipeline
    from sparktts_tpu.serve.continuous_server import ContinuousTTSServer

    sr = 16000
    wav = 0.3 * np.sin(2 * np.pi * 320.0 * np.arange(sr) / sr)

    def run(shard):
        pipe = SparkTTSPipeline(
            config=tiny_test_config(), max_new_tokens=16, prompt_bucket=32
        )
        if shard:
            # shard_llm: LM params sharded, codec replicated, engine decode
            # state committed to the mesh — the FUSED admission program then
            # lowers under GSPMD (asserted below)
            pipe.shard_llm(make_mesh(dp=4, tp=2))
        # greedy: tp psum reorders fp reductions, so sampled draws may flip
        # on epsilon logit shifts; greedy argmax at tiny dims is stable and
        # makes audio bit-comparable (same policy as the engine-level test)
        # vocode_batch off: batching is timing-dependent float noise; this
        # test asserts BIT equality of sharded vs single-device serving
        server = ContinuousTTSServer(
            pipe, max_slots=4, steps_per_dispatch=4, greedy=True,
            vocode_batch=False, fused_warm="sync",
        )

        async def go():
            await server.start()
            offline = await server.synthesize("hello sharded world", prompt_wav=wav)
            chunks = []
            async for c in server.synthesize_streaming("stream me", prompt_wav=wav):
                chunks.append(c)
            await server.stop()
            return offline, np.concatenate(chunks) if chunks else np.zeros(0)

        out = asyncio.new_event_loop().run_until_complete(go())
        # both admissions (offline + stream) must take the one-dispatch fused
        # path — sharded params included
        assert server.stats.get("fused_admissions", 0) == 2, server.stats
        return out

    ref_off, ref_stream = run(False)
    sh_off, sh_stream = run(True)
    np.testing.assert_array_equal(ref_off, sh_off)
    np.testing.assert_array_equal(ref_stream, sh_stream)
