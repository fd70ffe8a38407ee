import sys

sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

from sparktts_tpu.config import SparkTTSConfig
from sparktts_tpu.lm.quant import quantize_qwen_int8
from sparktts_tpu.pipeline import SparkTTSPipeline
from sparktts_tpu.serve.streaming import StreamingSynthesizer

cfg = SparkTTSConfig()
pipe = SparkTTSPipeline(config=cfg, max_new_tokens=500, prompt_bucket=128)
tok = pipe.tokenizer
emb = np.asarray(pipe.llm_params["embed"], np.float32)
mask = np.full((emb.shape[0], 1), 0.02, np.float32)
mask[tok.semantic_base : tok.semantic_base + tok.n_semantic] = 1.0
pipe.llm_params["embed"] = jnp.asarray(emb * mask)
pipe.llm_params = jax.tree.map(jnp.asarray, quantize_qwen_int8(pipe.llm_params))
pipe.bicodec_params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), pipe.bicodec_params)

sr = 16000
t = np.arange(3 * sr) / sr
wav = 0.3 * np.sin(2 * np.pi * 220 * t)
syn = StreamingSynthesizer(pipe, steps_per_dispatch=50)


def run(seed):
    t0 = time.perf_counter()
    first = None
    total = 0
    for chunk in syn.stream(
        "stream latency test", prompt_speech_path=wav, seed=seed, max_new_tokens=500
    ):
        if first is None:
            first = time.perf_counter() - t0
        total += len(chunk)
    return first, time.perf_counter() - t0, total / sr


f, w, a = run(0)
print(f"warmup: first {f*1000:.0f} ms wall {w:.1f}s audio {a:.1f}s", flush=True)
firsts, rtfs = [], []
for s in (1, 2, 3):
    f, w, a = run(s)
    firsts.append(f)
    rtfs.append(w / a)
    print(f"run: first-chunk {f*1000:.0f} ms, RTF {w/a:.4f}, audio {a:.1f}s", flush=True)
print(
    f"best first-chunk {min(firsts)*1000:.0f} ms (ref P50 210.42 ms), best RTF {min(rtfs):.4f} (ref 0.1501)"
)
