"""Bench harness smoke tests with the tiny pipeline."""

import numpy as np
import pytest

from sparktts_tpu.bench.harness import BenchTask, run_offline_benchmark, run_streaming_benchmark
from sparktts_tpu.config import StreamingConfig
from sparktts_tpu.pipeline import SparkTTSPipeline


@pytest.fixture(scope="module")
def pipe():
    return SparkTTSPipeline(max_new_tokens=16, prompt_bucket=32)


def _wav():
    sr = 16000
    t = np.arange(sr) / sr
    return 0.2 * np.sin(2 * np.pi * 200 * t)


def test_offline_benchmark(pipe):
    tasks = [BenchTask(text=f"text {i}", prompt_wav=_wav()) for i in range(2)]
    stats = run_offline_benchmark(pipe, tasks, concurrency=2)
    assert stats["num_tasks"] == 2
    assert stats["rtf"] is not None and stats["rtf"] > 0
    assert stats["p50_latency_ms"] > 0


def test_streaming_benchmark(pipe):
    scfg = StreamingConfig(audio_chunk_duration=0.1, audio_chunk_overlap_duration=0.02)
    tasks = [BenchTask(text="hello", prompt_wav=_wav())]
    stats = run_streaming_benchmark(pipe, tasks, scfg)
    assert stats["num_tasks"] == 1
    assert stats["first_chunk_p50_ms"] >= 0


def test_continuous_benchmark_offline_and_streaming(pipe):
    from sparktts_tpu.bench.harness import run_continuous_benchmark

    tasks = [
        BenchTask(text=f"text {i}", prompt_wav=_wav(), max_new_tokens=8 + 4 * (i % 2))
        for i in range(3)
    ]
    stats = run_continuous_benchmark(pipe, tasks, concurrency=2, max_slots=4)
    assert stats["mode"] == "continuous_offline"
    assert stats["num_tasks"] == 3
    assert stats["rtf"] > 0 and stats["total_audio_s"] > 0

    stats_s = run_continuous_benchmark(
        pipe, tasks, concurrency=2, streaming=True, max_slots=4
    )
    assert stats_s["mode"] == "continuous_streaming"
    assert stats_s["num_tasks"] == 3
    assert stats_s["first_chunk_p50_ms"] > 0


def test_load_hf_dataset_tasks(tmp_path):
    """seed_tts-protocol dataset loading (reference client_grpc.py:641-658
    field mapping) from a local save_to_disk dataset — no network needed."""
    datasets = pytest.importorskip("datasets")
    import numpy as np

    sr = 8000
    rows = {
        "id": ["a", "b"],
        "prompt_text": ["ref one", "ref two"],
        "target_text": ["say one", "say two"],
        "prompt_audio": [
            {"array": np.ones(sr, np.float32) * 0.1, "sampling_rate": sr},
            {"array": np.ones(2 * sr, np.float32) * 0.2, "sampling_rate": sr},
        ],
    }
    ds = datasets.Dataset.from_dict(rows)
    path = str(tmp_path / "seed_like")
    ds.save_to_disk(path)

    from sparktts_tpu.bench.harness import load_hf_dataset_tasks

    tasks = load_hf_dataset_tasks(path, sample_rate=16000)
    assert [t.text for t in tasks] == ["say one", "say two"]
    assert [t.prompt_text for t in tasks] == ["ref one", "ref two"]
    # resampled 8 kHz -> 16 kHz doubles the sample counts
    assert abs(len(tasks[0].prompt_wav) - 16000) <= 4
    assert abs(len(tasks[1].prompt_wav) - 32000) <= 4


@pytest.mark.parametrize("transport", ["framed", "grpcio"])
def test_grpc_streaming_benchmark(pipe, transport):
    """Streaming bench through the gRPC front-end (role of the reference's
    decoupled-gRPC benchmark, client_grpc.py:332-433), both transports."""
    if transport == "grpcio":
        pytest.importorskip("grpc")
    from sparktts_tpu.bench.harness import run_grpc_streaming_benchmark

    tasks = [
        BenchTask(text=f"grpc bench {i}", prompt_wav=_wav(), max_new_tokens=8)
        for i in range(2)
    ]
    stats = run_grpc_streaming_benchmark(
        pipe, tasks, concurrency=2, transport=transport,
        max_slots=2, steps_per_dispatch=4,
    )
    assert stats["mode"] == "grpc_streaming"
    assert stats["transport"] == transport
    assert stats["num_tasks"] == 2
    assert stats["rtf"] > 0 and stats["total_audio_s"] > 0
    assert stats["first_chunk_p50_ms"] >= 0
