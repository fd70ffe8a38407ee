import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from sparktts_tpu.config import SparkTTSConfig
from sparktts_tpu.lm.quant import quantize_qwen_int8
from sparktts_tpu.pipeline import SparkTTSPipeline
from sparktts_tpu.serve.streaming import StreamingSynthesizer
from sparktts_tpu.utils.profiling import GLOBAL_STATS, stage

cfg = SparkTTSConfig()
pipe = SparkTTSPipeline(config=cfg, max_new_tokens=500, prompt_bucket=128)
tok = pipe.tokenizer
emb = np.asarray(pipe.llm_params["embed"], np.float32)
m = np.full((emb.shape[0], 1), 0.02, np.float32)
m[tok.semantic_base : tok.semantic_base + tok.n_semantic] = 1.0
pipe.llm_params["embed"] = jnp.asarray(emb * m)
pipe.llm_params = jax.tree.map(jnp.asarray, quantize_qwen_int8(pipe.llm_params))
pipe.bicodec_params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), pipe.bicodec_params)

import sparktts_tpu.serve.streaming as S
orig_prefill = S.prefill
def timed_prefill(*a, **k):
    with stage("prefill"):
        r = orig_prefill(*a, **k)
        np.asarray(r.cur_token)
        return r
S.prefill = timed_prefill
orig_dc = S.decode_chunk
def timed_dc(*a, **k):
    with stage("decode_chunk"):
        s2, t2 = orig_dc(*a, **k)
        np.asarray(t2)
        return s2, t2
S.decode_chunk = timed_dc

sr = 16000
wav = 0.3*np.sin(2*np.pi*220*np.arange(3*sr)/sr)
syn = StreamingSynthesizer(pipe, steps_per_dispatch=50)
list(syn.stream("warm", prompt_speech_path=wav, seed=0, max_new_tokens=500))
GLOBAL_STATS.reset()

t0=time.perf_counter()
chunks=[]
for c in syn.stream("timed", prompt_speech_path=wav, seed=1, max_new_tokens=500):
    chunks.append((time.perf_counter()-t0, len(c)))
print("chunk times:", [(round(t,2), n) for t,n in chunks[:4]], flush=True)
print(GLOBAL_STATS.report(), flush=True)
