"""Parity tests for the functional NN primitives vs torch (CPU) semantics.

These pin down the layout conversions (NWC vs NCW, transposed-conv padding)
that the checkpoint converter depends on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from sparktts_tpu.nn import layers as L


def _t2j_conv_w(w: torch.Tensor) -> jnp.ndarray:
    """torch Conv1d weight (Cout, Cin/g, K) → lax WIO (K, Cin/g, Cout)."""
    return jnp.asarray(w.detach().numpy().transpose(2, 1, 0))


def _t2j_convT_w(w: torch.Tensor, groups: int) -> jnp.ndarray:
    """torch ConvTranspose1d weight (Cin, Cout/g, K) → equivalent forward-conv
    WIO kernel (K, Cin/g, Cout): flip K, swap in/out within each group."""
    w = w.detach().numpy()  # (Cin, Cout_g, K)
    cin, cout_g, k = w.shape
    cin_g = cin // groups
    w = w.reshape(groups, cin_g, cout_g, k)[..., ::-1]  # flip kernel
    # target: (K, Cin/g, G, Cout_g) -> (K, Cin/g, Cout)
    w = w.transpose(3, 1, 0, 2).reshape(k, cin_g, groups * cout_g)
    return jnp.asarray(np.ascontiguousarray(w))


@pytest.mark.parametrize("stride,pad,dil,groups", [(1, 3, 1, 1), (2, 1, 1, 1), (1, 9, 3, 1), (2, 2, 1, 8)])
def test_conv1d_matches_torch(stride, pad, dil, groups):
    torch.manual_seed(0)
    cin, cout, k, t = 16, 24, 7, 50
    if groups > 1:
        cout = cin
    conv = nn.Conv1d(cin, cout, k, stride=stride, padding=pad, dilation=dil, groups=groups)
    x = torch.randn(2, cin, t)
    ref = conv(x).detach().numpy()

    p = {"w": _t2j_conv_w(conv.weight), "b": jnp.asarray(conv.bias.detach().numpy())}
    y = L.conv1d_apply(
        p, jnp.asarray(x.numpy().transpose(0, 2, 1)), stride=stride, padding=pad, dilation=dil, groups=groups
    )
    np.testing.assert_allclose(np.transpose(np.asarray(y), (0, 2, 1)), ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize(
    "stride,pad,outpad,groups,k",
    [(2, 1, 0, 1, 4), (8, 4, 0, 1, 16), (3, 2, 1, 1, 6), (2, 1, 0, 16, 4), (5, 3, 1, 1, 11)],
)
def test_conv_transpose1d_matches_torch(stride, pad, outpad, groups, k):
    torch.manual_seed(1)
    cin = cout = 16
    conv = nn.ConvTranspose1d(cin, cout, k, stride=stride, padding=pad, output_padding=outpad, groups=groups)
    x = torch.randn(2, cin, 30)
    ref = conv(x).detach().numpy()

    p = {"w": _t2j_convT_w(conv.weight, groups), "b": jnp.asarray(conv.bias.detach().numpy())}
    y = L.conv_transpose1d_apply(
        p,
        jnp.asarray(x.numpy().transpose(0, 2, 1)),
        stride=stride,
        padding=pad,
        output_padding=outpad,
        groups=groups,
    )
    np.testing.assert_allclose(np.transpose(np.asarray(y), (0, 2, 1)), ref, rtol=1e-4, atol=1e-5)


def test_layer_norm_matches_torch():
    torch.manual_seed(2)
    ln = nn.LayerNorm(32, eps=1e-6)
    nn.init.normal_(ln.weight)
    nn.init.normal_(ln.bias)
    x = torch.randn(2, 10, 32)
    ref = ln(x).detach().numpy()
    p = {"gamma": jnp.asarray(ln.weight.detach().numpy()), "beta": jnp.asarray(ln.bias.detach().numpy())}
    y = L.layer_norm_apply(p, jnp.asarray(x.numpy()), eps=1e-6)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-5)


def test_batch_norm_eval_matches_torch():
    torch.manual_seed(3)
    bn = nn.BatchNorm1d(8)
    bn.running_mean.normal_()
    bn.running_var.uniform_(0.5, 2.0)
    nn.init.normal_(bn.weight)
    nn.init.normal_(bn.bias)
    bn.eval()
    x = torch.randn(2, 8, 20)
    ref = bn(x).detach().numpy()
    p = {
        "gamma": jnp.asarray(bn.weight.detach().numpy()),
        "beta": jnp.asarray(bn.bias.detach().numpy()),
        "mean": jnp.asarray(bn.running_mean.numpy()),
        "var": jnp.asarray(bn.running_var.numpy()),
    }
    y = L.batch_norm_apply(p, jnp.asarray(x.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(np.transpose(np.asarray(y), (0, 2, 1)), ref, rtol=1e-4, atol=1e-5)


def test_snake_matches_torch_script():
    # reference layers.py:33-39
    x = torch.randn(2, 8, 16)
    alpha = torch.rand(1, 8, 1) + 0.5
    ref = (x + (alpha + 1e-9).reciprocal() * torch.sin(alpha * x).pow(2)).numpy()
    y = L.snake(jnp.asarray(x.numpy().transpose(0, 2, 1)), jnp.asarray(alpha.numpy().squeeze()))
    np.testing.assert_allclose(np.transpose(np.asarray(y), (0, 2, 1)), ref, rtol=1e-5, atol=1e-6)


def test_gelu_matches_torch():
    x = torch.randn(128)
    ref = nn.GELU()(x).numpy()
    y = L.gelu(jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-6)


def test_weight_norm_fold():
    """Folding weight-norm g*v/||v|| equals the weight-normalized conv."""
    torch.manual_seed(4)
    conv = nn.Conv1d(8, 12, 5, padding=2)
    wn = nn.utils.weight_norm(conv)
    x = torch.randn(2, 8, 20)
    ref = wn(x).detach().numpy()
    folded = nn.utils.remove_weight_norm(wn)
    p = {"w": _t2j_conv_w(folded.weight), "b": jnp.asarray(folded.bias.detach().numpy())}
    y = L.conv1d_apply(p, jnp.asarray(x.numpy().transpose(0, 2, 1)), padding=2)
    np.testing.assert_allclose(np.transpose(np.asarray(y), (0, 2, 1)), ref, rtol=1e-4, atol=1e-5)
