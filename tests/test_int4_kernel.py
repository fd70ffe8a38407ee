"""Pallas int4 matvec kernel: exactness vs the XLA unpack formulation at
every model shape (interpret mode on CPU; verified bit-level on v5e)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparktts_tpu.kernels.int4_matmul import int4_matvec, reference_int4_matvec
from sparktts_tpu.lm.quant import quantize_linear_int4


@pytest.mark.parametrize(
    "d_in,d_out,group,b",
    [
        (896, 1152, 128, 1),   # qkv
        (896, 9728, 128, 1),   # gateup
        (4864, 896, 128, 2),   # down
        (896, 896, 128, 8),    # o, batched slots
        (64, 512, 16, 3),      # tiny/odd batch
    ],
)
def test_kernel_matches_reference(d_in, d_out, group, b):
    rng = np.random.default_rng(d_in + d_out)
    w = {"w": jnp.asarray(rng.standard_normal((d_in, d_out)), jnp.float32)}
    q = quantize_linear_int4(w, group=group)
    x = jnp.asarray(rng.standard_normal((b, d_in)), jnp.bfloat16)
    out = int4_matvec(x, q["w_p4"], q["gscale"], interpret=True)
    ref = reference_int4_matvec(x, q["w_p4"], q["gscale"])
    rel = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
    rel /= float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
    assert rel < 5e-3, rel


def test_bias_passthrough_linear_apply():
    """linear_apply int4 path applies bias and matches the reference + bias."""
    from sparktts_tpu.nn.layers import linear_apply

    rng = np.random.default_rng(1)
    w = {
        "w": jnp.asarray(rng.standard_normal((64, 128)), jnp.float32),
        "b": jnp.asarray(rng.standard_normal((128,)), jnp.float32),
    }
    q = quantize_linear_int4(w, group=16)
    x = jnp.asarray(rng.standard_normal((2, 3, 64)), jnp.float32)
    y = linear_apply(q, x)
    ref = reference_int4_matvec(x.reshape(6, 64), q["w_p4"], q["gscale"]).reshape(2, 3, 128)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref + w["b"]), rtol=1e-4, atol=1e-4)
