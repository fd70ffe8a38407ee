"""Parameter / activation PartitionSpecs for the Qwen LM.

Megatron-style tensor parallelism expressed as GSPMD sharding annotations
(SURVEY.md §2.3: the reference only exposes tp/pp as TensorRT-LLM flags; here
TP is a first-class mesh axis):

  * attention q/k/v and MLP gate/up: output-dim sharded on 'tp'
    (column-parallel)
  * attention o and MLP down: input-dim sharded on 'tp' (row-parallel —
    XLA inserts the psum)
  * embedding: vocab-sharded on 'tp' (parallel embedding; the reference
    exposes this as --use_parallel_embedding, `convert_checkpoint.py:116-132`)
  * KV cache: batch on 'dp', kv-heads on 'tp'
  * norms / small biases: replicated
"""

from __future__ import annotations

from jax.sharding import PartitionSpec as P

from sparktts_tpu.config import QwenConfig


def qwen_layer_specs() -> dict:
    """Specs for the STACKED layer params (leading L dim unsharded)."""
    return {
        "ln1": {"gamma": P()},
        "qkv": {"w": P(None, None, "tp"), "b": P(None, "tp")},
        "o": {"w": P(None, "tp", None)},
        "ln2": {"gamma": P()},
        "gateup": {"w": P(None, None, "tp")},
        "down": {"w": P(None, "tp", None)},
    }


def qwen_param_specs(cfg: QwenConfig) -> dict:
    specs = {
        "embed": P("tp", None),
        "layers": qwen_layer_specs(),
        "final_ln": {"gamma": P()},
    }
    if not cfg.tie_word_embeddings:
        specs["lm_head"] = {"w": P(None, "tp")}
    return specs


def kv_cache_specs() -> P:
    """(L, B, S, n_kv, hd): batch over dp, kv heads over tp."""
    return P(None, "dp", None, "tp", None)


def batch_spec() -> P:
    """(B, T) token batches: data-parallel over 'dp'."""
    return P("dp", None)
