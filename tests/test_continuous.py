"""Continuous batching engine tests: greedy parity with aligned generate,
staggered admission, slot recycling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparktts_tpu.config import QwenConfig
from sparktts_tpu.lm.continuous import ContinuousBatchingEngine
from sparktts_tpu.lm.generate import generate
from sparktts_tpu.lm.qwen import init_qwen

CFG = QwenConfig(
    vocab_size=256,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=16,
    eos_token_id=0,
    pad_token_id=1,
)
PAD = 1


@pytest.fixture(scope="module")
def params():
    return init_qwen(jax.random.PRNGKey(0), CFG)


def _prompt(seed, n):
    return np.random.default_rng(seed).integers(5, 250, size=n).astype(np.int32).tolist()


def test_greedy_matches_aligned_generate(params):
    prompt = _prompt(0, 12)
    n_new = 10

    # aligned-batch reference (left-padded path)
    t_pad = 16
    ids = np.full((1, t_pad), PAD, np.int32)
    mask = np.zeros((1, t_pad), bool)
    ids[0, t_pad - len(prompt) :] = prompt
    mask[0, t_pad - len(prompt) :] = True
    ref_tokens, _ = generate(
        params, CFG, jnp.asarray(ids), jnp.asarray(mask), jax.random.PRNGKey(0),
        max_new_tokens=n_new, cache_len=t_pad + n_new, eos_ids=(), pad_id=PAD, greedy=True,
        cache_dtype=jnp.float32,
    )

    eng = ContinuousBatchingEngine(
        params, CFG, max_slots=4, cache_len=64, prompt_pad=16,
        eos_ids=(), pad_id=PAD, greedy=True, cache_dtype=jnp.float32,
    )
    rid = eng.submit(prompt, max_new_tokens=n_new)
    eng.run_until_done(n_steps=5)
    got = eng.finished[rid][:n_new]
    np.testing.assert_array_equal(got, np.asarray(ref_tokens)[0])


def test_staggered_admission_isolation(params):
    """A request admitted mid-flight must not change an in-progress greedy
    sequence, and both must equal their solo runs."""
    p1, p2 = _prompt(1, 8), _prompt(2, 14)
    n_new = 12

    def solo(prompt):
        eng = ContinuousBatchingEngine(
            params, CFG, max_slots=4, cache_len=64, prompt_pad=16,
            eos_ids=(), pad_id=PAD, greedy=True, cache_dtype=jnp.float32,
        )
        rid = eng.submit(prompt, max_new_tokens=n_new)
        eng.run_until_done(n_steps=4)
        return eng.finished[rid][:n_new]

    ref1, ref2 = solo(p1), solo(p2)

    eng = ContinuousBatchingEngine(
        params, CFG, max_slots=4, cache_len=64, prompt_pad=16,
        eos_ids=(), pad_id=PAD, greedy=True, cache_dtype=jnp.float32,
    )
    r1 = eng.submit(p1, max_new_tokens=n_new)
    eng.step(n_steps=4)  # r1 advances alone
    r2 = eng.submit(p2, max_new_tokens=n_new)  # joins mid-flight
    eng.run_until_done(n_steps=4)

    np.testing.assert_array_equal(eng.finished[r1][:n_new], ref1)
    np.testing.assert_array_equal(eng.finished[r2][:n_new], ref2)


def test_slot_recycling(params):
    eng = ContinuousBatchingEngine(
        params, CFG, max_slots=2, cache_len=64, prompt_pad=16,
        eos_ids=(), pad_id=PAD, greedy=True, cache_dtype=jnp.float32,
    )
    r1 = eng.submit(_prompt(3, 6), max_new_tokens=4)
    r2 = eng.submit(_prompt(4, 6), max_new_tokens=4)
    assert eng.free_slots() == 0
    with pytest.raises(RuntimeError):
        eng.submit(_prompt(5, 6), max_new_tokens=4)
    eng.run_until_done(n_steps=4)
    assert eng.free_slots() == 2
    r3 = eng.submit(_prompt(5, 6), max_new_tokens=4)
    eng.run_until_done(n_steps=4)
    assert r3 in eng.finished
    assert len(eng.finished) == 3


def test_pad_id_as_legal_token_not_dropped(params):
    """VERDICT item 7: emissions must survive even when pad_id is a token the
    model legitimately generates — liveness comes from the explicit valid
    mask, not in-band token filtering."""
    prompt = _prompt(3, 12)
    n_new = 8

    # discover what greedy emits, then rebuild the engine with pad_id set to
    # one of those very tokens
    eng = ContinuousBatchingEngine(
        params, CFG, max_slots=2, cache_len=64, prompt_pad=16,
        eos_ids=(), pad_id=PAD, greedy=True, cache_dtype=jnp.float32,
    )
    rid = eng.submit(prompt, max_new_tokens=n_new)
    eng.run_until_done(n_steps=4)
    ref = eng.finished.pop(rid)
    assert ref.size == n_new

    evil_pad = int(ref[0])  # a token guaranteed to be emitted
    eng2 = ContinuousBatchingEngine(
        params, CFG, max_slots=2, cache_len=64, prompt_pad=16,
        eos_ids=(), pad_id=evil_pad, greedy=True, cache_dtype=jnp.float32,
    )
    rid2 = eng2.submit(prompt, max_new_tokens=n_new)
    eng2.run_until_done(n_steps=4)
    out = eng2.finished.pop(rid2)
    np.testing.assert_array_equal(out, ref)  # nothing eaten, nothing reordered


def test_dispatch_ladder_no_budget_overshoot(params):
    """A dispatch far larger than the remaining budget is safe: the slot
    stops ON DEVICE at its token limit, emits exactly max_new tokens, and
    the requested size snaps to the fixed ladder (no per-value compiles)."""
    from sparktts_tpu.lm.continuous import DISPATCH_LADDER, snap_to_ladder

    assert snap_to_ladder(1, 128) == DISPATCH_LADDER[0]
    assert snap_to_ladder(9, 128) == 16
    assert snap_to_ladder(10_000, 128) == 128
    assert snap_to_ladder(50, 6) == 6  # capped by max_dispatch

    eng = ContinuousBatchingEngine(
        params, CFG, max_slots=2, cache_len=64, prompt_pad=16,
        eos_ids=(), pad_id=PAD, greedy=True, cache_dtype=jnp.float32,
    )
    rid = eng.submit(_prompt(2, 12), max_new_tokens=10)
    out = eng.step(64)  # snapped to 64 >> budget 10
    assert rid in eng.finished or len(out.get(rid, [])) == 10
    eng.run_until_done()
    assert len(eng.finished[rid]) == 10

    # and the result matches a tightly-stepped run exactly
    eng2 = ContinuousBatchingEngine(
        params, CFG, max_slots=2, cache_len=64, prompt_pad=16,
        eos_ids=(), pad_id=PAD, greedy=True, cache_dtype=jnp.float32,
    )
    rid2 = eng2.submit(_prompt(2, 12), max_new_tokens=10)
    eng2.run_until_done(n_steps=4)
    np.testing.assert_array_equal(eng.finished[rid], eng2.finished[rid2])


def test_per_slot_mode_constraint(params):
    """Clone-mode slots must sample only from clone_slice + clone_extras even
    though the engine compiles with the control superset constraint; control
    slots keep the full superset.  (ADVICE r2: one shared engine previously
    let clone requests sample control-only ids.)"""
    vocab_slice = (100, 200)        # superset: "semantic" 100-150, "global" 150-200
    clone_slice = (100, 150)
    eos = 3
    eng = ContinuousBatchingEngine(
        params, CFG, max_slots=4, cache_len=64, prompt_pad=16,
        eos_ids=(eos,), pad_id=PAD, cache_dtype=jnp.float32,
        vocab_slice=vocab_slice, extra_ids=(eos,),
        clone_slice=clone_slice, clone_extras=(eos,),
        temperature=4.0,  # flatten the distribution so the range gets covered
    )
    r_clone = eng.submit(_prompt(3, 10), max_new_tokens=40, mode="clone")
    r_ctrl = eng.submit(_prompt(4, 10), max_new_tokens=40, mode="control")
    eng.run_until_done(n_steps=16)

    clone_toks = set(eng.finished[r_clone].tolist())
    ctrl_toks = set(eng.finished[r_ctrl].tolist())
    allowed_clone = set(range(*clone_slice)) | {eos}
    allowed_ctrl = set(range(*vocab_slice)) | {eos}
    assert clone_toks <= allowed_clone, clone_toks - allowed_clone
    assert ctrl_toks <= allowed_ctrl, ctrl_toks - allowed_ctrl
    # the flattened sampler must actually exercise ids outside the clone
    # range on the control slot — otherwise this test proves nothing
    assert ctrl_toks - allowed_clone, "control slot never left the clone range"


def test_per_slot_sampling_params(params):
    """Per-request temperature/top_p are honored PER SLOT within one shared
    batch: a near-zero-temperature slot reproduces the greedy sequence while
    its neighbor samples at the engine default."""
    prompt = _prompt(6, 12)
    ref = ContinuousBatchingEngine(
        params, CFG, max_slots=4, cache_len=64, prompt_pad=16,
        eos_ids=(), pad_id=PAD, greedy=True, cache_dtype=jnp.float32,
    )
    r = ref.submit(prompt, max_new_tokens=12)
    ref.run_until_done(n_steps=6)
    greedy_toks = ref.finished[r]

    eng = ContinuousBatchingEngine(
        params, CFG, max_slots=4, cache_len=64, prompt_pad=16,
        eos_ids=(), pad_id=PAD, cache_dtype=jnp.float32,
        temperature=2.0,  # engine default: hot sampling
    )
    r_cold = eng.submit(prompt, max_new_tokens=12, temperature=1e-4)
    r_hot = eng.submit(_prompt(7, 12), max_new_tokens=12)
    eng.run_until_done(n_steps=6)

    np.testing.assert_array_equal(eng.finished[r_cold], greedy_toks)
    assert len(eng.finished[r_hot]) == 12
