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


def qwen_layer_specs(pp: bool = False) -> dict:
    """Specs for the STACKED layer params.

    pp=True shards the leading L (layer) dim over the 'pp' mesh axis —
    stage-sliced layer stacking: mesh group pp=s owns layers
    [s*L/pp, (s+1)*L/pp).  The scan-over-layers forward then streams each
    stage's weights from its owner while activations stay resident (the
    reference exposes the same axis as TRT-LLM --pp_size,
    `convert_checkpoint.py:25-28`).  Requires num_hidden_layers % pp == 0."""
    lp = "pp" if pp else None
    return {
        "ln1": {"gamma": P(lp, None)},
        "qkv": {"w": P(lp, None, "tp"), "b": P(lp, "tp")},
        "o": {"w": P(lp, "tp", None)},
        "ln2": {"gamma": P(lp, None)},
        "gateup": {"w": P(lp, None, "tp")},
        "down": {"w": P(lp, "tp", None)},
    }


def qwen_param_specs(cfg: QwenConfig, pp: bool = False) -> dict:
    specs = {
        "embed": P("tp", None),
        "layers": qwen_layer_specs(pp),
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
