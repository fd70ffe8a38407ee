#!/usr/bin/env python
"""Ablation attribution of the decode step's per-token time budget.

The measured decode step (batch 1, int8 weights, guided) runs ~1.08 ms/token
on v5e while its matmul weight traffic bounds it at ~0.5 ms — the profiler
shows ~0.37 ms/step of inter-iteration gap that layer-scan unrolling made
WORSE (see BENCH_NOTES).  This script isolates where the time goes by timing
128-iteration scans of progressively stripped step bodies at production dims:

  full       exact decode layer stack (qkv+rope+kv-write+attention+o+mlp)
             + guided head + sampling — the production step
  layers     transformer stack only: constant next token, no head/sampler/rng
  no_attn    layers, but attention core replaced by a broadcast of v
             (same weight streaming, no cache read / softmax)
  mm_only    just the 4 weight matmuls per layer (pure weight-stream roofline)
  sampler    guided head matmul + top-k/top-p sampling + rng chain only
  empty      scan overhead floor

Times are per-token; every variant is one jitted program so the relay
dispatch cost amortizes out.
"""
import argparse
import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from sparktts_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_steps", type=int, default=128)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--cache_len", type=int, default=2048)
    ap.add_argument("--variants", default="full,layers,no_attn,mm_only,sampler,empty")
    ap.add_argument("--tiny", action="store_true", help="tiny dims (CPU smoke)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp


    from sparktts_tpu.config import QwenConfig
    from sparktts_tpu.lm.quant import quantize_qwen_int8
    from sparktts_tpu.lm.qwen import (
        KVCache,
        _attention_block,
        init_kv_cache,
        init_qwen,
        mlp_block,
        project_qkv,
    )
    from sparktts_tpu.lm.sample import sample_token
    from sparktts_tpu.nn.layers import linear_apply, rms_norm_apply

    if args.tiny:
        from sparktts_tpu.config import tiny_test_config

        cfg = tiny_test_config().llm
        args.cache_len = min(args.cache_len, 128)
        SEM_BASE, N_SEM = 0, cfg.vocab_size
    else:
        cfg = QwenConfig()
        SEM_BASE, N_SEM = 151665, 8192
    key = jax.random.PRNGKey(0)
    params = jax.device_put(quantize_qwen_int8(init_qwen(key, cfg, dtype=jnp.bfloat16)))
    S = args.cache_len
    B = 1

    # guided head slice (embed rows for the semantic range), as in qwen_forward
    embed = params["embed"]
    if isinstance(embed, dict):  # int8-quantized embedding {w_q, scale}
        head_w = (
            embed["w_q"][SEM_BASE : SEM_BASE + N_SEM].astype(jnp.bfloat16)
            * embed["scale"][SEM_BASE : SEM_BASE + N_SEM]
        )
    else:
        head_w = embed[SEM_BASE : SEM_BASE + N_SEM]
    head_w = head_w.astype(jnp.bfloat16)

    def layer_full(carry_x, ck, cv, layer, li, pos, wp, start):
        h = rms_norm_apply(layer["ln1"], carry_x)
        att, ck, cv = _attention_block(
            layer, h, pos, ck, cv, li, wp, None, cfg,
            decode_window=(start, wp),
        )
        x = carry_x + att
        x = x + mlp_block(layer, rms_norm_apply(layer["ln2"], x))
        return x, ck, cv

    def layer_no_attn(carry_x, layer, pos, cfg=cfg):
        h = rms_norm_apply(layer["ln1"], carry_x)
        q, k, v = project_qkv(layer, h, pos, cfg)
        group = cfg.num_attention_heads // cfg.num_key_value_heads
        out = jnp.repeat(v, group, axis=2).reshape(
            B, 1, cfg.num_attention_heads * cfg.head_dim
        ).astype(carry_x.dtype)
        x = carry_x + linear_apply(layer["o"], out)
        x = x + mlp_block(layer, rms_norm_apply(layer["ln2"], x))
        return x

    def layer_mm_only(carry_x, layer):
        q_dim = cfg.num_attention_heads * cfg.head_dim
        y = linear_apply(layer["qkv"], carry_x)
        z = linear_apply(layer["o"], y[..., :q_dim])
        g = linear_apply(layer["gateup"], z)
        d = linear_apply(layer["down"], g[..., : cfg.intermediate_size])
        return carry_x + d * 1e-3

    def make_step(variant, params, head_w):
        # params/head_w arrive as jit ARGUMENTS (closing over them would
        # embed them as constants in the serialized module — the relay's
        # remote-compile endpoint rejects multi-hundred-MB bodies with 413)
        def step_full(state, _):
            x, cache, wp, pos, rng = state
            start = jnp.zeros((B,), jnp.int32)

            def lay(c, layer):
                h, ck, cv, li = c
                h, ck, cv = layer_full(h, ck, cv, layer, li, pos[:, None], wp, start)
                return (h, ck, cv, li + 1), None

            (h, ck, cv, _), _ = jax.lax.scan(
                lay, (x, cache.k, cache.v, jnp.zeros((), jnp.int32)), params["layers"]
            )
            h = rms_norm_apply(params["final_ln"], h)
            logits = (h[:, -1].astype(jnp.float32) @ head_w.T.astype(jnp.float32))
            rng, sub = jax.random.split(rng)
            tok = sample_token(sub, logits, 0.8, 50, 0.95)
            x_next = x + tok[:, None, None].astype(x.dtype) * 0.0  # keep dep
            return (x_next, KVCache(ck, cv), wp + 1, pos + 1, rng), None

        def step_layers(state, _):
            x, cache, wp, pos, rng = state
            start = jnp.zeros((B,), jnp.int32)

            def lay(c, layer):
                h, ck, cv, li = c
                h, ck, cv = layer_full(h, ck, cv, layer, li, pos[:, None], wp, start)
                return (h, ck, cv, li + 1), None

            (h, ck, cv, _), _ = jax.lax.scan(
                lay, (x, cache.k, cache.v, jnp.zeros((), jnp.int32)), params["layers"]
            )
            x_next = x + h * 1e-6
            return (x_next, KVCache(ck, cv), wp + 1, pos + 1, rng), None

        def step_no_attn(state, _):
            x, cache, wp, pos, rng = state

            def lay(h, layer):
                return layer_no_attn(h, layer, pos[:, None]), None

            h, _ = jax.lax.scan(lay, x, params["layers"])
            return (x + h * 1e-6, cache, wp + 1, pos + 1, rng), None

        def step_mm_only(state, _):
            x, cache, wp, pos, rng = state

            def lay(h, layer):
                return layer_mm_only(h, layer), None

            h, _ = jax.lax.scan(lay, x, params["layers"])
            return (x + h * 1e-6, cache, wp + 1, pos + 1, rng), None

        def step_sampler(state, _):
            x, cache, wp, pos, rng = state
            logits = (x[:, -1].astype(jnp.float32) @ head_w.T.astype(jnp.float32))
            rng, sub = jax.random.split(rng)
            tok = sample_token(sub, logits, 0.8, 50, 0.95)
            return (x + tok[:, None, None].astype(x.dtype) * 0.0, cache, wp + 1, pos + 1, rng), None

        def step_empty(state, _):
            x, cache, wp, pos, rng = state
            return (x * 1.0000001, cache, wp + 1, pos + 1, rng), None

        return {
            "full": step_full,
            "layers": step_layers,
            "no_attn": step_no_attn,
            "mm_only": step_mm_only,
            "sampler": step_sampler,
            "empty": step_empty,
        }[variant]

    @functools.partial(jax.jit, static_argnames=("variant",), donate_argnums=(0,))
    def run(state, p, hw, variant):
        state, _ = jax.lax.scan(
            make_step(variant, p, hw), state, None, length=args.n_steps
        )
        return state

    results = {}
    for variant in args.variants.split(","):
        def fresh():
            return (
                # rebuilt every call: `run` donates its input buffers
                jnp.zeros((B, 1, cfg.hidden_size), jnp.bfloat16) + 0.01,
                init_kv_cache(cfg, B, S, jnp.bfloat16),
                jnp.asarray(700, jnp.int32),
                jnp.full((B,), 700, jnp.int32),
                jax.random.PRNGKey(1),
            )

        state = run(fresh(), params, head_w, variant)
        jax.device_get(state[0])  # force completion (relay: block is advisory)
        times = []
        for _ in range(args.iters):
            state = fresh()
            t0 = time.perf_counter()
            state = run(state, params, head_w, variant)
            jax.device_get(state[0])
            times.append(time.perf_counter() - t0)
        ms_tok = min(times) / args.n_steps * 1e3
        results[variant] = round(ms_tok, 4)
        print(variant, ms_tok, flush=True)

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
