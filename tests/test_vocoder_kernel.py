"""Parity: fused vocoder ResidualUnit Pallas kernel vs the XLA formulation.

The kernel (kernels/vocoder_fusion.py) must match
`codec/wave_generator._residual_unit_apply` (snake → dilated k7 conv → snake
→ 1x1 conv → residual, reference `sparktts/modules/blocks/layers.py:51-67`)
to round-off at every dilation the WaveGenerator uses, across tile-boundary
and edge-padding cases (halo assembly from neighbor tiles, zeroed sequence
edges, ragged T padding).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparktts_tpu.codec.wave_generator import (
    DILATIONS,
    _init_residual_unit,
    _residual_unit_apply,
)
from sparktts_tpu.kernels.vocoder_fusion import fused_residual_unit


def _unit(c, key=0, dtype=jnp.float32):
    p = _init_residual_unit(jax.random.PRNGKey(key), c)
    # non-trivial alphas/biases so snake and bias terms actually matter
    p["snake1"]["alpha"] = 0.5 + jax.random.uniform(jax.random.PRNGKey(key + 1), (c,))
    p["snake2"]["alpha"] = 0.5 + jax.random.uniform(jax.random.PRNGKey(key + 2), (c,))
    p["conv1"]["b"] = 0.1 * jax.random.normal(jax.random.PRNGKey(key + 3), (c,))
    p["conv2"]["b"] = 0.1 * jax.random.normal(jax.random.PRNGKey(key + 4), (c,))
    return jax.tree.map(lambda v: v.astype(dtype), p)


@pytest.mark.parametrize("variant", ("tiles", "carry"))
@pytest.mark.parametrize("dilation", DILATIONS)
def test_parity_f32(dilation, variant):
    c, t = 16, 96
    p = _unit(c)
    x = jax.random.normal(jax.random.PRNGKey(9), (2, t, c))
    ref = _residual_unit_apply(p, x, dilation)
    # block_t 32 → multiple interior tiles plus both edges exercise the halo
    # (and, for 'carry', the cross-step strip shifts + per-batch-row reinit)
    out = fused_residual_unit(p, x, dilation, block_t=32, interpret=True, variant=variant)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("variant", ("tiles", "carry"))
def test_parity_ragged_t_and_single_tile(variant):
    """T not a multiple of block_t (padded tail sliced off) and T smaller
    than one tile (n_t == 1: both edges in the same grid step)."""
    c = 8
    p = _unit(c, key=7)
    for t, bt in ((50, 32), (20, 64)):
        x = jax.random.normal(jax.random.PRNGKey(t), (1, t, c))
        ref = _residual_unit_apply(p, x, 3)
        out = fused_residual_unit(p, x, 3, block_t=bt, interpret=True, variant=variant)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )


def test_env_gate_routes_residual_units(monkeypatch):
    """SPARKTTS_VOCODER_KERNEL=1 routes every ResidualUnit in the full
    WaveGenerator through the fused kernel (interpret mode on CPU) with
    unchanged output."""
    from sparktts_tpu.codec import wave_generator as wg
    from sparktts_tpu.config import WaveGeneratorConfig

    cfg = WaveGeneratorConfig(
        input_channel=8, channels=16, rates=(2, 2), kernel_sizes=(4, 4)
    )
    p = wg.init_wave_generator(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 24, 8))
    ref = wg.wave_generator_apply(p, x, cfg)

    calls = []
    import sparktts_tpu.kernels.vocoder_fusion as vf

    real = vf.fused_residual_unit
    monkeypatch.setattr(
        vf,
        "fused_residual_unit",
        lambda p_, x_, d, **kw: (
            calls.append(d),
            real(p_, x_, d, interpret=True),
        )[1],
    )
    monkeypatch.setenv("SPARKTTS_VOCODER_KERNEL", "1")
    out = wg.wave_generator_apply(p, x, cfg)
    assert calls == list(DILATIONS) * len(cfg.rates)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_parity_bf16():
    """bf16 params/activations (the production codec dtype): the kernel's
    fp32-accumulating dots vs XLA's bf16-output einsum chain agree to bf16
    tolerance."""
    c, t = 16, 64
    p = _unit(c, key=3, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, t, c), jnp.bfloat16)
    ref = _residual_unit_apply(p, x, 1).astype(jnp.float32)
    out = fused_residual_unit(p, x, 1, block_t=32, interpret=True).astype(jnp.float32)
    assert out.dtype == ref.dtype
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-2, atol=3e-2)
