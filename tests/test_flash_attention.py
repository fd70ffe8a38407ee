"""Flash attention kernel parity vs XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparktts_tpu.kernels.flash_attention import (
    flash_attention_prefill,
    reference_attention,
)


@pytest.mark.parametrize(
    "b,hq,hkv,t,d,block",
    [
        (1, 4, 2, 128, 64, 128),
        (2, 4, 2, 256, 64, 128),
        (1, 2, 2, 128, 32, 64),   # MHA case, smaller blocks
        (2, 8, 2, 128, 64, 64),   # GQA group 4
    ],
)
def test_flash_matches_reference(b, hq, hkv, t, d, block):
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, hq, t, d), jnp.float32)
    k = jax.random.normal(kk, (b, hkv, t, d), jnp.float32)
    v = jax.random.normal(kv, (b, hkv, t, d), jnp.float32)
    start = jnp.asarray(np.random.default_rng(0).integers(0, t // 2, size=(b,)), jnp.int32)

    scale = d**-0.5
    out = flash_attention_prefill(
        q, k, v, start, sm_scale=scale, block_q=block, block_k=block, interpret=True
    )
    ref = reference_attention(q, k, v, start, sm_scale=scale)
    # compare only non-pad query rows (row >= start[b]); pad rows are junk in
    # both implementations and never read downstream
    valid = (np.arange(t)[None, :] >= np.asarray(start)[:, None])  # (b, t)
    mask = np.broadcast_to(valid[:, None, :, None], out.shape)
    np.testing.assert_allclose(
        np.asarray(out)[mask], np.asarray(ref)[mask], rtol=2e-3, atol=2e-3
    )


def test_flash_fully_masked_rows_are_finite():
    """Rows before `start` (left-pad queries) see no valid keys below the
    diagonal only when start > row; ensure output stays finite."""
    b, hq, hkv, t, d = 1, 2, 2, 128, 64
    q = jnp.ones((b, hq, t, d))
    k = jnp.ones((b, hkv, t, d))
    v = jnp.ones((b, hkv, t, d))
    start = jnp.asarray([64], jnp.int32)  # first 64 queries have zero valid keys
    out = flash_attention_prefill(q, k, v, start, interpret=True)
    assert np.isfinite(np.asarray(out)).all()
