#!/usr/bin/env python
"""Speculative-decoding benchmark on the real chip (VERDICT r2 item 3).

Measures tok/s and draft acceptance for self-speculative decode
(`lm/speculative.py`: first-n-layers draft, exact verification) against the
vanilla guided decode loop at batch 1, full Qwen2.5-0.5B dims.  Random
weights mean a shallow draft's acceptance reflects chance, so the sweep
brackets reality:

  * draft_layers=24 (draft == target): acceptance is 1.0 by construction —
    the UPPER bound on what the speculative machinery can deliver (pure
    mechanics: k accepted tokens per draft-k + verify-1 round)
  * draft_layers in {4, 6}: the production draft shapes; on random weights
    their acceptance is the FLOOR (a distilled draft lands in between —
    lm/distill.py trains one)

    python scripts/bench_speculative.py --out /tmp/spec_bench.json
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from sparktts_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

PROMPT_LEN = 128
NEW_TOKENS = 500
SEM_BASE, N_SEM, EOS = 151665, 8192, 151645


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default=None)
    parser.add_argument("--new_tokens", type=int, default=NEW_TOKENS)
    parser.add_argument("--int8", action="store_true", default=True)
    parser.add_argument("--no_int8", dest="int8", action="store_false")
    parser.add_argument("--repeats", type=int, default=3)
    parser.add_argument("--tiny", action="store_true", help="tiny dims CPU smoke")
    parser.add_argument(
        "--distill", type=int, default=0, metavar="STEPS",
        help="also distill a 4-layer draft for STEPS optimizer steps "
        "(lm/distill.py) and measure its acceptance/tok_s",
    )
    parser.add_argument(
        "--sanity", action="store_true",
        help="run the deterministic distillation sanity task (narrow-vocab "
        "teacher, 2-layer draft; in-domain acceptance must clear 0.5)",
    )
    parser.add_argument("--sanity_steps", type=int, default=300)
    parser.add_argument(
        "--only_sanity", action="store_true",
        help="skip the production-dims sweep (implies --sanity)",
    )
    args = parser.parse_args()

    import jax


    import jax.numpy as jnp
    import numpy as np

    from sparktts_tpu.config import SparkTTSConfig
    from sparktts_tpu.lm.generate import generate
    from sparktts_tpu.lm.qwen import init_qwen
    from sparktts_tpu.lm.speculative import (
        draft_config,
        draft_from_layers,
        speculative_generate_greedy,
    )

    cfg = SparkTTSConfig().llm
    global PROMPT_LEN, SEM_BASE, N_SEM, EOS
    if args.tiny:
        from sparktts_tpu.config import QwenConfig

        cfg = QwenConfig(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=8, num_attention_heads=4, num_key_value_heads=2,
            head_dim=16, eos_token_id=0, pad_token_id=1,
        )
        PROMPT_LEN, SEM_BASE, N_SEM, EOS = 16, 100, 100, 0
        args.new_tokens = min(args.new_tokens, 32)
        args.int8 = False
    print(f"devices: {jax.devices()}", file=sys.stderr)

    params = init_qwen(jax.random.PRNGKey(0), cfg, dtype=jnp.float32 if args.tiny else jnp.bfloat16)
    if args.int8:
        from sparktts_tpu.lm.quant import quantize_qwen_int8

        params = jax.tree.map(jnp.asarray, quantize_qwen_int8(params))

    ids = jnp.asarray(
        np.random.default_rng(0).integers(100, 5000, size=(1, PROMPT_LEN)), jnp.int32
    )
    mask = jnp.ones((1, PROMPT_LEN), bool)
    new = args.new_tokens
    vocab_slice, extra = (SEM_BASE, SEM_BASE + N_SEM), (EOS,)

    results = []
    if args.only_sanity:
        args.sanity = True

    def timed(label, fn):
        out = fn()  # compile + warm
        t_best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            out = fn()
            # force host transfer — block_until_ready is advisory on this relay
            np.asarray(out[0])
            t_best = min(t_best, time.perf_counter() - t0)
        return out, t_best

    # vanilla greedy baseline (guided decode, fixed budget)
    def vanilla():
        return generate(
            params, cfg, ids, mask, jax.random.PRNGKey(1),
            max_new_tokens=new, cache_len=PROMPT_LEN + new,
            eos_ids=(), pad_id=0, greedy=True,
            vocab_slice=vocab_slice, extra_ids=extra,
        )

    if not args.only_sanity:
        (_, _), t = timed("vanilla", vanilla)
        base = {"config": "vanilla_greedy", "tok_s": round(new / t, 1),
                "ms_total": round(t * 1000, 1)}
        print(json.dumps(base), file=sys.stderr)
        results.append(base)

    full_layers = cfg.num_hidden_layers
    sweep = () if args.only_sanity else (
        (full_layers, (4,)), (6, (4,)), (4, (2, 4, 8)))
    for draft_layers, ks in sweep:
        draft = draft_from_layers(params, draft_layers)
        dcfg = draft_config(cfg, draft_layers)
        for k in ks:
            def spec():
                return speculative_generate_greedy(
                    params, draft, cfg, dcfg, ids, mask,
                    max_new_tokens=new, cache_len=PROMPT_LEN + new + k, k=k,
                    eos_ids=(), pad_id=0,
                    vocab_slice=vocab_slice, extra_ids=extra,
                )

            (tokens, lengths, accepted), t = timed(f"spec L{draft_layers} k{k}", spec)
            n_out = int(np.asarray(lengths)[0])
            rec = {
                "config": f"self_spec_draft{draft_layers}_k{k}",
                "tok_s": round(n_out / t, 1),
                "ms_total": round(t * 1000, 1),
                "acceptance": round(float(np.asarray(accepted)) / max(n_out, 1), 3),
                "tokens_out": n_out,
            }
            print(json.dumps(rec), file=sys.stderr)
            results.append(rec)

    if args.distill and not args.only_sanity:
        # a DISTILLED 4-layer draft (trained on target-sampled sequences,
        # lm/distill.py) — realistic acceptance between the random floor and
        # the self-draft ceiling.  Round-3 postmortem (VERDICT r03 item 3):
        # the greedy random-weight teacher collapses onto a near-constant
        # sequence, so the distill loss hits ~0 while proving nothing, AND the
        # old eval prompted from ids 100-5000 — OUT of the semantic range the
        # corpus was drawn from.  Now: (a) record the teacher-corpus
        # degeneracy stats, (b) record the loss CURVE, (c) measure acceptance
        # IN-domain (prompts drawn from the same semantic range, via
        # measure_acceptance) alongside the old OOD prompt.
        from sparktts_tpu.lm.distill import (
            corpus_stats,
            distill_draft,
            measure_acceptance,
            sample_target_corpus,
        )

        dcfg = draft_config(cfg, 4)
        stats_corpus = sample_target_corpus(
            params, cfg, jax.random.PRNGKey(7), 32, 8, 56,
            greedy=True, vocab_slice=vocab_slice, extra_ids=extra,
        )
        teacher_stats = corpus_stats(stats_corpus, prompt_len=8)
        print(f"teacher corpus stats: {teacher_stats}", file=sys.stderr)

        t0 = time.perf_counter()
        draft, losses = distill_draft(
            params, cfg, dcfg, steps=args.distill, batch=8,
            prompt_len=8, gen_len=56, corpus_seqs=128,
            vocab_slice=vocab_slice, extra_ids=extra,
        )
        train_s = time.perf_counter() - t0
        curve = [round(losses[i], 4) for i in
                 sorted({0, 1, len(losses) // 4, len(losses) // 2,
                         3 * len(losses) // 4, len(losses) - 1})]
        print(f"distilled draft: {args.distill} steps, loss curve {curve}, "
              f"{train_s:.0f}s", file=sys.stderr)
        draft = jax.tree.map(lambda x: x.astype(jnp.bfloat16), draft)
        acc_in_domain = measure_acceptance(
            params, draft, cfg, dcfg, n_prompts=4, prompt_len=8,
            gen_len=64, k=4, seed=3, vocab_slice=vocab_slice, extra_ids=extra,
        )
        for k in (4,):
            def spec_d():
                return speculative_generate_greedy(
                    params, draft, cfg, dcfg, ids, mask,
                    max_new_tokens=new, cache_len=PROMPT_LEN + new + k, k=k,
                    eos_ids=(), pad_id=0,
                    vocab_slice=vocab_slice, extra_ids=extra,
                )

            (tokens, lengths, accepted), t = timed(f"distilled k{k}", spec_d)
            n_out = int(np.asarray(lengths)[0])
            rec = {
                "config": f"distilled_draft4_k{k}_steps{args.distill}",
                "tok_s": round(n_out / t, 1),
                "ms_total": round(t * 1000, 1),
                "acceptance_ood_prompt": round(
                    float(np.asarray(accepted)) / max(n_out, 1), 3),
                "acceptance_in_domain": round(acc_in_domain, 3),
                "tokens_out": n_out,
                "distill_loss_curve": curve,
                "teacher_corpus": teacher_stats,
                "distill_train_s": round(train_s, 1),
            }
            print(json.dumps(rec), file=sys.stderr)
            results.append(rec)

    if args.sanity:
        # Deterministic sanity task (VERDICT r03 item 3 'done' criterion):
        # the hand-built CYCLER teacher (greedy map i -> i+1 mod h; see
        # lm/distill.py make_cycler_teacher) — non-constant and fully
        # predictable, so a distilled 1-layer draft must clear 0.5 in-domain
        # acceptance while a random draft scores ~the 1/k floor.  (A random
        # fp32 transformer teacher is unusable here: it collapses to a
        # DIFFERENT constant per prompt — constant_seq_share 1.0 — which a
        # random draft can match by luck; measured 0.35-0.75 across
        # platforms.)  True-fp32 matmuls: the pass criterion rides greedy
        # argmax agreement, and TPU's default downgraded fp32 matmul
        # precision flips near-tie argmaxes.
        from sparktts_tpu.lm.distill import (
            corpus_stats,
            distill_draft,
            make_cycler_teacher,
            measure_acceptance,
            sample_target_corpus,
        )

        with jax.default_matmul_precision("highest"):
            steacher, scfg = make_cycler_teacher(32, shift=1)
            sdcfg = draft_config(scfg, 1)
            s_corpus = sample_target_corpus(
                steacher, scfg, jax.random.PRNGKey(12), 32, 4, 28, greedy=True,
            )
            s_stats = corpus_stats(s_corpus, prompt_len=4)
            t0 = time.perf_counter()
            sdraft, s_losses = distill_draft(
                steacher, scfg, sdcfg, steps=args.sanity_steps, batch=8,
                prompt_len=4, gen_len=24, corpus_seqs=128, learning_rate=5e-3,
                seed=5,
            )
            s_train_s = time.perf_counter() - t0
            srand = init_qwen(jax.random.PRNGKey(13), sdcfg, dtype=jnp.float32)
            acc_rand = measure_acceptance(
                steacher, srand, scfg, sdcfg, n_prompts=8, prompt_len=4,
                gen_len=32, k=4, seed=6,
            )
            acc_dist = measure_acceptance(
                steacher, sdraft, scfg, sdcfg, n_prompts=8, prompt_len=4,
                gen_len=32, k=4, seed=6,
            )
        s_curve = [round(s_losses[i], 4) for i in
                   sorted({0, 1, len(s_losses) // 2, len(s_losses) - 1})]
        rec = {
            "config": f"sanity_distill_cycler32_L1_steps{args.sanity_steps}",
            "acceptance_random_draft": round(acc_rand, 3),
            "acceptance_distilled": round(acc_dist, 3),
            "distill_loss_curve": s_curve,
            "teacher_corpus": s_stats,
            "distill_train_s": round(s_train_s, 1),
            "pass": acc_dist > 0.5 and acc_rand < 0.25,
        }
        print(json.dumps(rec), file=sys.stderr)
        results.append(rec)

    doc = {"new_tokens": new, "int8": args.int8, "batch": 1, "results": results}
    print(json.dumps(doc, indent=2))
    if args.out:
        Path(args.out).write_text(json.dumps(doc, indent=2) + "\n")


if __name__ == "__main__":
    main()
