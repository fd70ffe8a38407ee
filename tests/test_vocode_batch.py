"""Cross-stream batched vocode: same-shape chunk windows from different
streams (and offline finals) run as ONE vocoder program, with per-row output
identical to the scalar path.  Cold batch shapes never run inline — the drain
stays scalar while the signature warms on a background thread."""

import time

import numpy as np
import pytest

from sparktts_tpu.pipeline import SparkTTSPipeline
from sparktts_tpu.serve.continuous_server import (
    ContinuousTTSServer,
    _Pending,
    _voc_state,
    warm_vocode_batch,
)
from sparktts_tpu.utils.profiling import StageStats


@pytest.fixture(scope="module")
def pipe():
    return SparkTTSPipeline(max_new_tokens=16, prompt_bucket=32)


def _bare_server(pipe, vocode_batch=True, max_slots=4):
    """A server shell with just the vocode-path state — no LM engine, so the
    batching logic is exercised without decode compiles."""
    server = object.__new__(ContinuousTTSServer)
    server.pipe = pipe
    server.stream_ctx = pipe.vocode_bucket  # small fixed window for the test
    server.max_vocode_window = 10**9  # splitting not under test here
    server.vocode_batch = vocode_batch
    server._voc_batch_sizes = [b for b in (2, 4, 8) if b <= max_slots]
    server.stats = {}
    server.stage_stats = StageStats()
    return server


def _stream_pending(pipe, n_sem, seed):
    """A streaming _Pending due exactly one window of n_sem tokens."""
    rng = np.random.default_rng(seed)
    tok = pipe.tokenizer
    n_glob = pipe.config.bicodec.speaker_encoder.token_num
    p = _Pending(
        text="", prompt_wav=None, prompt_text=None, gender=None, pitch=None,
        speed=None, max_new_tokens=0, future=None,
    )
    p.chunk_queue = object()
    p.stream_target = n_sem
    p.stream_schedule = iter([10**9])  # no further chunks due
    p.global_tokens = rng.integers(0, 4, size=(1, n_glob)).astype(np.int32)
    ids = rng.integers(0, tok.n_semantic, size=n_sem).astype(np.int32)
    return p, (tok.semantic_base + ids).astype(np.int32)


def _offline_pending(pipe, n_sem, seed):
    rng = np.random.default_rng(seed)
    tok = pipe.tokenizer
    n_glob = pipe.config.bicodec.speaker_encoder.token_num
    p = _Pending(
        text="", prompt_wav=None, prompt_text=None, gender=None, pitch=None,
        speed=None, max_new_tokens=0, future=None,
    )
    p.global_tokens = rng.integers(0, 4, size=(1, n_glob)).astype(np.int32)
    ids = rng.integers(0, tok.n_semantic, size=n_sem).astype(np.int32)
    return p, (tok.semantic_base + ids).astype(np.int32)


def _jobs(pipe, n_sem):
    s1, t1 = _stream_pending(pipe, n_sem, 1)
    s2, t2 = _stream_pending(pipe, n_sem, 2)
    off, t3 = _offline_pending(pipe, n_sem, 3)
    return [
        [s1, t1, False, False],
        [s2, t2, True, False],
        [off, t3, True, True],
    ]


def test_batched_vocode_matches_scalar(pipe):
    n_sem = pipe.vocode_bucket  # one bucket: all three windows share t_pad
    warm_vocode_batch(pipe, 2, n_sem)
    warm_vocode_batch(pipe, 4, n_sem)

    batched = _bare_server(pipe, vocode_batch=True)
    scalar = _bare_server(pipe, vocode_batch=False)
    res_b = batched._run_vocode_jobs(_jobs(pipe, n_sem))
    res_s = scalar._run_vocode_jobs(_jobs(pipe, n_sem))

    # three same-shape windows → one b=4 call (1 duplicate pad row)
    assert batched.stats.get("vocode_batched_calls", 0) == 1
    assert batched.stats.get("vocode_batched_rows", 0) == 3
    assert "vocode_batched_calls" not in scalar.stats

    for rb, rs in zip(res_b, res_s):
        assert rb["error"] is None and rs["error"] is None
        if rb["offline"]:
            np.testing.assert_allclose(rb["wav"], rs["wav"], atol=1e-6, rtol=0)
        else:
            assert len(rb["chunks"]) == len(rs["chunks"]) == 1
            np.testing.assert_allclose(
                rb["chunks"][0], rs["chunks"][0], atol=1e-6, rtol=0
            )
            assert rb["final"] == rs["final"]


def test_cold_batch_shape_stays_scalar_then_warms(pipe):
    n_sem = 2 * pipe.vocode_bucket  # a t_pad no other test warms
    t_pad = n_sem
    warm = _voc_state(pipe)["warm"]
    assert not any(k[1] == t_pad for k in warm)

    server = _bare_server(pipe, vocode_batch=True)
    res = server._run_vocode_jobs(_jobs(pipe, n_sem))
    # cold signature at drain start: at least the first window ran scalar
    # (never an inline batch compile); the warm may land mid-drain and pick
    # up the tail, so < 3 rows batched is the invariant, not zero
    assert server.stats.get("vocode_batched_rows", 0) < 3
    assert all(r["error"] is None for r in res)

    deadline = time.time() + 120
    while time.time() < deadline:
        if (4, t_pad) in warm:
            break
        time.sleep(0.2)
    assert (4, t_pad) in warm, "background warm never landed"

    server2 = _bare_server(pipe, vocode_batch=True)
    res2 = server2._run_vocode_jobs(_jobs(pipe, n_sem))
    assert server2.stats.get("vocode_batched_calls", 0) == 1
    assert server2.stats.get("vocode_batched_rows", 0) == 3
    assert all(r["error"] is None for r in res2)


def test_poisoned_row_contained_to_its_job(pipe, monkeypatch):
    """A batch-level failure falls back to scalar; only the poisoned job
    errors, its batch neighbors still deliver."""
    n_sem = pipe.vocode_bucket
    warm_vocode_batch(pipe, 4, n_sem)
    server = _bare_server(pipe, vocode_batch=True)

    real_batch = pipe.detokenize_batch
    real_scalar = pipe.detokenize

    def bad_batch(globs, sems):
        raise RuntimeError("batch blew up")

    calls = {"scalar": 0}

    def scalar_spy(g, s):
        calls["scalar"] += 1
        if calls["scalar"] == 2:  # second window is the poisoned one
            raise RuntimeError("poisoned row")
        return real_scalar(g, s)

    monkeypatch.setattr(pipe, "detokenize_batch", bad_batch)
    monkeypatch.setattr(pipe, "detokenize", scalar_spy)
    res = server._run_vocode_jobs(_jobs(pipe, n_sem))
    monkeypatch.setattr(pipe, "detokenize_batch", real_batch)
    monkeypatch.setattr(pipe, "detokenize", real_scalar)

    errors = [r["error"] is not None for r in res]
    assert errors.count(True) == 1
    ok = [r for r in res if r["error"] is None]
    for r in ok:
        assert (r["wav"] is not None) or r["chunks"]


def test_streaming_end_to_end_with_batching(pipe):
    """Full server path with batching enabled: outputs match the
    batching-disabled server to float tolerance (greedy decode — token
    streams are identical; a b>1 vocoder program is XLA-scheduled
    differently from b=1, so rows differ by ~1e-10 float noise, measured
    ~4e-7 relative on CPU)."""
    import asyncio

    def run(vocode_batch):
        async def go():
            server = ContinuousTTSServer(
                pipe, max_slots=4, steps_per_dispatch=4, greedy=True,
                fused_warm="sync", vocode_batch=vocode_batch,
            )
            await server.start()
            sr = 16000
            t = np.arange(sr) / sr
            texts = ["one stream", "two streams", "three streams"]

            async def consume(i):
                chunks = []
                async for c in server.synthesize_streaming(
                    texts[i],
                    prompt_wav=0.3 * np.sin(2 * np.pi * (220 + 50 * i) * t),
                    max_new_tokens=14,
                ):
                    chunks.append(c)
                return np.concatenate(chunks) if chunks else np.zeros(0, np.float32)

            wavs = await asyncio.gather(*[consume(i) for i in range(3)])
            await server.stop()
            return wavs

        return asyncio.new_event_loop().run_until_complete(go())

    a = run(True)
    b = run(False)
    for wa, wb in zip(a, b):
        assert wa.shape == wb.shape
        np.testing.assert_allclose(wa, wb, atol=1e-6, rtol=0)


def test_incremental_delivery_first_audio_first(pipe):
    """_run_vocode_jobs hands each job to `deliver` the moment its last
    window lands — and a stream waiting for FIRST audio is vocoded (hence
    delivered) before steady-state jobs, even when the drain-order puts it
    last."""
    n_sem = pipe.vocode_bucket
    server = _bare_server(pipe, vocode_batch=False)

    tok = pipe.tokenizer
    rng = np.random.default_rng(11)
    steady, t1 = _stream_pending(pipe, n_sem, 11)
    # mid-stream state: 3 chunks emitted, buffer trimmed to the ctx window
    steady.stream_emitted = 3 * n_sem
    steady.stream_base = 2 * n_sem  # = floor_bucket(emitted - stream_ctx)
    steady.stream_buf = rng.integers(0, tok.n_semantic, n_sem).astype(np.int32).tolist()
    fresh, t2 = _stream_pending(pipe, 2 * n_sem, 12)  # different t_pad group

    order = []
    res = server._run_vocode_jobs(
        [[steady, t1, False, False], [fresh, t2, True, False]],
        deliver=lambda r: order.append(r["pending"]),
    )
    assert all(r["error"] is None for r in res)
    assert order[0] is fresh and order[1] is steady


def test_stream_buf_trimmed_to_context(pipe):
    """A long-lived stream's host-side token buffer stays O(stream_ctx):
    the dead prefix below the bucket-aligned context window is dropped and
    stream_base keeps window indices absolute."""
    tok = pipe.tokenizer
    server = _bare_server(pipe, vocode_batch=False)
    n = pipe.vocode_bucket
    p, _ = _stream_pending(pipe, n, 21)
    import itertools

    p.stream_schedule = itertools.repeat(n)
    rng = np.random.default_rng(21)
    for _ in range(6):  # six chunks of one bucket each
        ids = (tok.semantic_base + rng.integers(0, tok.n_semantic, n)).astype(np.int32)
        res = server._run_vocode_jobs([[p, ids, False, False]])[0]
        assert res["error"] is None and len(res["chunks"]) == 1
    assert p.stream_emitted == 6 * n
    assert p.stream_base == max(6 * n - server.stream_ctx, 0) // n * n
    assert p.stream_base + len(p.stream_buf) == 6 * n
    assert len(p.stream_buf) <= server.stream_ctx + n


def test_warm_seen_sizes_follow_current_bucket(pipe, monkeypatch):
    """warm_vocode_batches_seen re-pads RAW seen window sizes with the
    pipeline's CURRENT bucket (warming the shapes upcoming runs actually
    produce) and never re-warms an already-warm signature."""
    import sparktts_tpu.serve.continuous_server as mod

    st = _voc_state(pipe)
    saved = {k: set(v) for k, v in st.items()}
    calls = []

    def fake_warm(p, b, t_pad):
        t_pad = -(-t_pad // p.vocode_bucket) * p.vocode_bucket
        calls.append((b, t_pad))
        _voc_state(p)["warm"].add((b, t_pad))

    monkeypatch.setattr(mod, "warm_vocode_batch", fake_warm)
    try:
        st["warm"].clear()
        st["sizes_seen"].clear()
        st["sizes_seen"].update({30, 70})  # raw window lengths
        real_bucket = pipe.vocode_bucket

        pipe.vocode_bucket = 50
        n = mod.warm_vocode_batches_seen(pipe, max_batch=4)
        assert n == 4 and set(calls) == {(2, 50), (4, 50), (2, 100), (4, 100)}

        calls.clear()
        pipe.vocode_bucket = 100  # bucket change re-pads the SAME raw sizes
        n = mod.warm_vocode_batches_seen(pipe, max_batch=4)
        # 30 and 70 both pad to 100 now — already warm from the 50-bucket
        # pass, so nothing recompiles (the old code looped forever here)
        assert n == 0 and not calls
    finally:
        pipe.vocode_bucket = real_bucket
        for k in st:
            st[k].clear()
            st[k].update(saved[k])
