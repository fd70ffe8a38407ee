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

    draft, loss = distill_draft(
        target, cfg, dcfg, steps=150, batch=8, prompt_len=4, gen_len=24,
        corpus_seqs=128, learning_rate=5e-3, seed=0,
    )
    rate = measure_acceptance(target, draft, cfg, dcfg, k=4, seed=0)

    # the cycle is deterministic: a trained 1-layer student should accept the
    # bulk of its proposals; an untrained one almost none
    assert rate > 0.5, f"distilled acceptance too low: {rate} (loss {loss})"
    assert rate > base_rate + 0.3, (rate, base_rate)


def test_distillation_reduces_loss():
    cfg = _cycler_cfg()
    target = _cycler_params(1)
    dcfg = _draft_cfg()
    _, loss_short = distill_draft(
        target, cfg, dcfg, steps=5, corpus_seqs=64, seed=1
    )
    _, loss_long = distill_draft(
        target, cfg, dcfg, steps=120, corpus_seqs=64, seed=1
    )
    assert loss_long < loss_short * 0.5, (loss_short, loss_long)
