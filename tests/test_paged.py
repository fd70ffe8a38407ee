"""Paged KV cache: Pallas kernel parity, engine equivalence vs the dense
continuous engine, and page-pool accounting (reference capability:
TRT-LLM paged KV, runtime/triton_trtllm/run.sh:65)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparktts_tpu.config import QwenConfig
from sparktts_tpu.kernels.paged_attention import (
    paged_decode_attention,
    reference_paged_attention,
)
from sparktts_tpu.lm.continuous import ContinuousBatchingEngine
from sparktts_tpu.lm.paged import PagedContinuousEngine
from sparktts_tpu.lm.qwen import init_qwen

VOCAB = 128
EOS = 5
PAD = 3


def test_kernel_matches_gather_reference():
    rng = np.random.default_rng(0)
    B, Hq, Hkv, D, P, NP, PPS, L = 3, 14, 2, 64, 16, 12, 4, 2
    q = jnp.asarray(rng.standard_normal((B, Hq, D)), jnp.float32)
    kp = jnp.asarray(rng.standard_normal((L, Hkv, NP, P, D)), jnp.float32)
    vp = jnp.asarray(rng.standard_normal((L, Hkv, NP, P, D)), jnp.float32)
    pt = jnp.asarray([[1, 2, 3, 4], [5, 6, 0, 0], [7, 8, 9, 0]], jnp.int32)
    lens = jnp.asarray([60, 17, 33], jnp.int32)
    for li in range(L):
        out = paged_decode_attention(
            q, kp, vp, pt, lens, layer=li, sm_scale=0.125, interpret=True
        )
        ref = reference_paged_attention(q, kp, vp, pt, lens, layer=li, sm_scale=0.125)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )


def test_kernel_bf16_pools():
    rng = np.random.default_rng(1)
    B, Hq, Hkv, D, P, NP, PPS, L = 2, 4, 2, 64, 8, 6, 3, 1
    q = jnp.asarray(rng.standard_normal((B, Hq, D)), jnp.float32)
    kp = jnp.asarray(rng.standard_normal((L, Hkv, NP, P, D)), jnp.bfloat16)
    vp = jnp.asarray(rng.standard_normal((L, Hkv, NP, P, D)), jnp.bfloat16)
    pt = jnp.asarray([[1, 2, 3], [4, 5, 0]], jnp.int32)
    lens = jnp.asarray([20, 9], jnp.int32)
    out = paged_decode_attention(q, kp, vp, pt, lens, interpret=True)
    ref = reference_paged_attention(q, kp, vp, pt, lens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2)


@pytest.fixture(scope="module")
def lm():
    cfg = QwenConfig(
        vocab_size=VOCAB,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        eos_token_id=EOS,
        pad_token_id=PAD,
    )
    params = init_qwen(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    return cfg, params


def _engines(cfg, params, **overrides):
    kw = dict(
        eos_ids=(EOS,), pad_id=PAD, greedy=True, seed=0, cache_dtype=jnp.float32,
    )
    kw.update(overrides)
    dense = ContinuousBatchingEngine(
        params, cfg, max_slots=4, cache_len=160, prompt_pad=16, **kw
    )
    paged = PagedContinuousEngine(
        params, cfg, max_slots=4, n_pages=40, page_size=16,
        pages_per_slot=10, prompt_pad=16, **kw
    )
    return dense, paged


def test_paged_engine_matches_dense_greedy(lm):
    """Greedy decode must be token-identical between the paged and dense
    engines (same admission order, same budgets)."""
    cfg, params = lm
    dense, paged = _engines(cfg, params)
    rng = np.random.default_rng(2)
    prompts = [rng.integers(10, VOCAB, size=n).tolist() for n in (7, 13, 5)]
    for p in prompts:
        dense.submit(p, max_new_tokens=24)
        paged.submit(p, max_new_tokens=24)
    dense.run_until_done(n_steps=8)
    paged.run_until_done(n_steps=8)
    assert set(dense.finished) == set(paged.finished)
    for req in dense.finished:
        np.testing.assert_array_equal(dense.finished[req], paged.finished[req])


@pytest.mark.parametrize("greedy", [True, False])
def test_dispatch_partition_invariance(lm, greedy):
    """Token streams must be invariant to how decode work is split into
    dispatches (many small rungs vs one big one): the sampling rng, the
    on-device budget stop, and the KV writes all live in the carried
    SlotState, so the server's adaptive ladder sizing (including the 256/512
    top rungs) can never change outputs — only when they land.  Holds for
    SAMPLED decode too: the rng advances exactly once per step regardless of
    dispatch boundaries."""
    cfg, params = lm
    rng = np.random.default_rng(4)
    prompts = [rng.integers(10, VOCAB, size=n).tolist() for n in (9, 5)]
    outs = []
    for plan in ([3, 5, 7, 11, 64], [64]):
        eng = ContinuousBatchingEngine(
            params, cfg, max_slots=4, cache_len=160, prompt_pad=16,
            eos_ids=(EOS,), pad_id=PAD, greedy=greedy, seed=0,
            cache_dtype=jnp.float32, max_dispatch=512,
        )
        for p in prompts:
            eng.submit(p, max_new_tokens=40)
        for n in plan:
            eng.step(n_steps=n)
        eng.run_until_done(n_steps=8)
        outs.append(dict(eng.finished))
    assert set(outs[0]) == set(outs[1])
    for req in outs[0]:
        np.testing.assert_array_equal(outs[0][req], outs[1][req])


def test_paged_engine_midflight_admission(lm):
    """A request admitted while others decode must not disturb them, and
    pages must be recycled after completion."""
    cfg, params = lm
    _, paged = _engines(cfg, params)
    rng = np.random.default_rng(3)
    baseline = PagedContinuousEngine(
        params, cfg, max_slots=4, n_pages=40, page_size=16, pages_per_slot=10,
        prompt_pad=16, eos_ids=(EOS,), pad_id=PAD, greedy=True, seed=0,
        cache_dtype=jnp.float32,
    )
    p0 = rng.integers(10, VOCAB, size=9).tolist()
    p1 = rng.integers(10, VOCAB, size=6).tolist()

    # solo run of p0 for the reference output
    r_ref = baseline.submit(p0, max_new_tokens=16)
    baseline.run_until_done(n_steps=4)

    r0 = paged.submit(p0, max_new_tokens=16)
    paged.step(n_steps=4)
    r1 = paged.submit(p1, max_new_tokens=16)  # admitted mid-flight
    paged.run_until_done(n_steps=4)

    np.testing.assert_array_equal(paged.finished[r0], baseline.finished[r_ref])
    assert r1 in paged.finished
    # all pages returned to the pool
    assert paged.pages_in_use() == 0
    assert len(paged.free_pages) == 39  # n_pages - trash page


def test_page_pool_overcommit_defers_admission(lm):
    """Worst-case pages are reserved AT ADMISSION: a request the pool cannot
    guarantee is deferred (backpressure) instead of being admitted and then
    exhausting the pool mid-decode (which would fail the whole batch)."""
    from sparktts_tpu.lm.continuous import AdmissionDeferred

    cfg, params = lm
    paged = PagedContinuousEngine(
        params, cfg, max_slots=4, n_pages=4, page_size=16, pages_per_slot=10,
        prompt_pad=16, eos_ids=(EOS,), pad_id=PAD, greedy=True,
        cache_dtype=jnp.float32,
    )
    # 10-token prompt + 16-token budget = 2 pages worst case; pool has 3
    # usable pages, so the first request fits but the second cannot be
    # guaranteed (1 outstanding growth + 2 needed > 2 free after its prompt)
    r0 = paged.submit(list(range(10, 20)), max_new_tokens=16)
    with pytest.raises(AdmissionDeferred):
        paged.submit(list(range(10, 20)), max_new_tokens=16)
    # the admitted request still runs to completion through page growth
    paged.run_until_done(n_steps=16)
    assert r0 in paged.finished
    # ... after which the deferred request fits
    r1 = paged.submit(list(range(10, 20)), max_new_tokens=16)
    paged.run_until_done(n_steps=16)
    assert r1 in paged.finished


def test_paged_memory_footprint_smaller(lm):
    """The headline property: pool memory is bounded by expected load (pages
    in use), not by max_slots x worst-case cache_len.  A pool holding half
    the dense capacity still serves the same workload because requests only
    occupy ceil(written / page_size) pages."""
    cfg, params = lm
    dense = ContinuousBatchingEngine(
        params, cfg, max_slots=4, cache_len=160, prompt_pad=16,
        eos_ids=(EOS,), pad_id=PAD, greedy=True, cache_dtype=jnp.float32,
    )
    paged = PagedContinuousEngine(
        params, cfg, max_slots=4, n_pages=20, page_size=16, pages_per_slot=10,
        prompt_pad=16, eos_ids=(EOS,), pad_id=PAD, greedy=True,
        cache_dtype=jnp.float32,
    )
    dense_bytes = dense.slots.cache.k.size + dense.slots.cache.v.size
    paged_bytes = paged.slots.k_pages.size + paged.slots.v_pages.size
    assert paged_bytes < dense_bytes / 2 + 1

    # the halved pool still serves 4 concurrent 24-token requests (dense
    # would reserve 4 x 160 = 640 token-slots; actual peak here is
    # 4 x ceil(40/16) pages = 12 pages = 192)
    rng = np.random.default_rng(5)
    reqs = [paged.submit(rng.integers(10, VOCAB, size=9).tolist(), 24) for _ in range(4)]
    paged.run_until_done(n_steps=8)
    assert all(r in paged.finished for r in reqs)
    assert paged.pages_in_use() == 0
