"""Draft self-distillation: a trained draft must raise the speculative
acceptance rate from ~0 to near-perfect on a target with a learnable,
NON-constant greedy function (the cycler from test_speculative)."""

import jax
import jax.numpy as jnp
import numpy as np

from sparktts_tpu.config import QwenConfig
from sparktts_tpu.lm.distill import distill_draft, measure_acceptance
from sparktts_tpu.lm.qwen import init_qwen

from tests.test_speculative import _cycler_cfg, _cycler_params


def _draft_cfg():
    # 1-layer student, same dims (the i -> i+1 map is easily learnable)
    base = _cycler_cfg()
    import dataclasses

    return dataclasses.replace(base, num_hidden_layers=1)


def test_distilled_draft_beats_random_draft():
    cfg = _cycler_cfg()
    target = _cycler_params(1)
    dcfg = _draft_cfg()

    random_draft = init_qwen(jax.random.PRNGKey(3), dcfg, dtype=jnp.float32)
    base_rate = measure_acceptance(target, random_draft, cfg, dcfg, k=4, seed=0)

    draft, losses = distill_draft(
        target, cfg, dcfg, steps=150, batch=8, prompt_len=4, gen_len=24,
        corpus_seqs=128, learning_rate=5e-3, seed=0,
    )
    rate = measure_acceptance(target, draft, cfg, dcfg, k=4, seed=0)

    # the cycle is deterministic: a trained 1-layer student should accept the
    # bulk of its proposals; an untrained one almost none
    assert rate > 0.5, f"distilled acceptance too low: {rate} (loss {losses[-1]})"
    assert rate > base_rate + 0.3, (rate, base_rate)


def test_distillation_reduces_loss():
    cfg = _cycler_cfg()
    target = _cycler_params(1)
    dcfg = _draft_cfg()
    _, losses = distill_draft(
        target, cfg, dcfg, steps=120, corpus_seqs=64, seed=1
    )
    # the curve must actually DESCEND (VERDICT r03 item 3: a flat-zero curve
    # means the experiment exercised nothing) and start from a real nonzero CE
    assert losses[0] > 0.5, losses[0]
    assert losses[-1] < losses[4] * 0.5, (losses[4], losses[-1])


def test_corpus_stats_flags_degenerate_teacher():
    from sparktts_tpu.lm.distill import corpus_stats
    import numpy as np

    # constant generation region -> top_token_share 1.0
    corpus = np.concatenate(
        [np.arange(32).reshape(8, 4) % 7, np.full((8, 16), 3)], axis=1
    )
    s = corpus_stats(corpus, prompt_len=4)
    assert s["top_token_share"] == 1.0 and s["unique_tokens"] == 1

    # cycling generation region -> share ~ 1/8
    corpus2 = np.concatenate(
        [np.zeros((8, 4), int), np.tile(np.arange(8), (8, 2))], axis=1
    )
    s2 = corpus_stats(corpus2, prompt_len=4)
    assert s2["unique_tokens"] == 8 and abs(s2["top_token_share"] - 0.125) < 1e-6
