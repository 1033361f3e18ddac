"""NN building-block parity tests vs freshly-built torch oracles.

Each test builds the torch equivalent of one of our flax blocks, copies the
torch weights into the flax params (using the same layout transforms the
checkpoint importer applies), and asserts forward parity in eval mode.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from diffmvs_tpu.nn.layers import (
    ConvBnAct,
    Conv3dBnAct,
    Deconv3dBnAct,
    SepConvGRU,
)
from diffmvs_tpu.nn.unet import Block, WSConv, DiffusionUNet, sinusoidal_pos_emb

from diffmvs_tpu.tools.torch_import import (
    conv2d_kernel,
    conv3d_kernel,
    deconv3d_kernel,
    linear_kernel,
)


def t2n(t):
    return t.detach().numpy()


def test_conv_bn_act_parity(rng):
    """Conv2d(k5,s2,p2)+BN+ReLU eval parity (module.py:24-58)."""
    torch.manual_seed(0)
    conv_t = nn.Conv2d(6, 8, 5, stride=2, padding=2, bias=False)
    bn_t = nn.BatchNorm2d(8, momentum=0.1)
    bn_t.running_mean.normal_(); bn_t.running_var.uniform_(0.5, 2.0)
    bn_t.weight.data.normal_(); bn_t.bias.data.normal_()
    conv_t.eval(); bn_t.eval()

    x = rng.randn(2, 11, 14, 6).astype(np.float32)
    x_t = torch.from_numpy(x).permute(0, 3, 1, 2)
    with torch.no_grad():
        ref = F.relu(bn_t(conv_t(x_t))).permute(0, 2, 3, 1).numpy()

    mod = ConvBnAct(8, 5, 2, 2)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    params = jax.tree_util.tree_map(lambda p: p, params)
    params["params"]["conv"]["kernel"] = conv2d_kernel(t2n(conv_t.weight))
    params["params"]["bn"]["scale"] = t2n(bn_t.weight)
    params["params"]["bn"]["bias"] = t2n(bn_t.bias)
    params["batch_stats"]["bn"]["mean"] = t2n(bn_t.running_mean)
    params["batch_stats"]["bn"]["var"] = t2n(bn_t.running_var)

    out = jax.jit(lambda p, x: mod.apply(p, x, train=False))(
        params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_conv3d_parity(rng):
    """Conv3d(k3,s2,p1)+BN+ReLU eval parity."""
    torch.manual_seed(1)
    conv_t = nn.Conv3d(4, 8, 3, stride=2, padding=1, bias=False)
    bn_t = nn.BatchNorm3d(8)
    bn_t.running_mean.normal_(); bn_t.running_var.uniform_(0.5, 2.0)
    bn_t.weight.data.normal_(); bn_t.bias.data.normal_()
    conv_t.eval(); bn_t.eval()

    x = rng.randn(1, 6, 10, 12, 4).astype(np.float32)
    x_t = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
    with torch.no_grad():
        ref = F.relu(bn_t(conv_t(x_t))).permute(0, 2, 3, 4, 1).numpy()

    mod = Conv3dBnAct(8, 3, 2, 1)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    params["params"]["conv"]["kernel"] = conv3d_kernel(t2n(conv_t.weight))
    params["params"]["bn"]["scale"] = t2n(bn_t.weight)
    params["params"]["bn"]["bias"] = t2n(bn_t.bias)
    params["batch_stats"]["bn"]["mean"] = t2n(bn_t.running_mean)
    params["batch_stats"]["bn"]["var"] = t2n(bn_t.running_var)

    out = jax.jit(lambda p, x: mod.apply(p, x, train=False))(
        params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_deconv3d_parity(rng):
    """ConvTranspose3d(k3,s2,p1,op1) parity — exact doubling (module.py:110-144)."""
    torch.manual_seed(2)
    deconv_t = nn.ConvTranspose3d(6, 4, 3, stride=2, padding=1,
                                  output_padding=1, bias=False)
    bn_t = nn.BatchNorm3d(4)
    bn_t.running_mean.normal_(); bn_t.running_var.uniform_(0.5, 2.0)
    bn_t.weight.data.normal_(); bn_t.bias.data.normal_()
    deconv_t.eval(); bn_t.eval()

    x = rng.randn(1, 5, 6, 7, 6).astype(np.float32)
    x_t = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
    with torch.no_grad():
        ref = F.relu(bn_t(deconv_t(x_t))).permute(0, 2, 3, 4, 1).numpy()
    assert ref.shape[1:4] == (10, 12, 14)

    mod = Deconv3dBnAct(4, 3)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    params["params"]["kernel"] = deconv3d_kernel(t2n(deconv_t.weight))
    params["params"]["bn"]["scale"] = t2n(bn_t.weight)
    params["params"]["bn"]["bias"] = t2n(bn_t.bias)
    params["batch_stats"]["bn"]["mean"] = t2n(bn_t.running_mean)
    params["batch_stats"]["bn"]["var"] = t2n(bn_t.running_var)

    out = jax.jit(lambda p, x: mod.apply(p, x, train=False))(
        params, jnp.asarray(x))
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


class TorchSepConvGRU(nn.Module):
    """Oracle replica of RAFT's separable GRU (module.py:152-179)."""

    def __init__(self, hidden_dim, input_dim):
        super().__init__()
        self.convz1 = nn.Conv2d(hidden_dim + input_dim, hidden_dim, (1, 5),
                                padding=(0, 2))
        self.convr1 = nn.Conv2d(hidden_dim + input_dim, hidden_dim, (1, 5),
                                padding=(0, 2))
        self.convq1 = nn.Conv2d(hidden_dim + input_dim, hidden_dim, (1, 5),
                                padding=(0, 2))
        self.convz2 = nn.Conv2d(hidden_dim + input_dim, hidden_dim, (5, 1),
                                padding=(2, 0))
        self.convr2 = nn.Conv2d(hidden_dim + input_dim, hidden_dim, (5, 1),
                                padding=(2, 0))
        self.convq2 = nn.Conv2d(hidden_dim + input_dim, hidden_dim, (5, 1),
                                padding=(2, 0))

    def forward(self, h, x):
        hx = torch.cat([h, x], dim=1)
        z = torch.sigmoid(self.convz1(hx))
        r = torch.sigmoid(self.convr1(hx))
        q = torch.tanh(self.convq1(torch.cat([r * h, x], dim=1)))
        h = (1 - z) * h + z * q
        hx = torch.cat([h, x], dim=1)
        z = torch.sigmoid(self.convz2(hx))
        r = torch.sigmoid(self.convr2(hx))
        q = torch.tanh(self.convq2(torch.cat([r * h, x], dim=1)))
        return (1 - z) * h + z * q


def test_sepconv_gru_parity(rng):
    torch.manual_seed(3)
    hdim, idim = 8, 6
    gru_t = TorchSepConvGRU(hdim, idim).eval()

    h = rng.randn(2, 9, 10, hdim).astype(np.float32)
    x = rng.randn(2, 9, 10, idim).astype(np.float32)
    with torch.no_grad():
        ref = gru_t(torch.from_numpy(h).permute(0, 3, 1, 2),
                    torch.from_numpy(x).permute(0, 3, 1, 2))
    ref = ref.permute(0, 2, 3, 1).numpy()

    mod = SepConvGRU(hdim)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(h), jnp.asarray(x))
    for name in ["convz1", "convr1", "convq1", "convz2", "convr2", "convq2"]:
        conv_t = getattr(gru_t, name)
        params["params"][name]["kernel"] = conv2d_kernel(t2n(conv_t.weight))
        params["params"][name]["bias"] = t2n(conv_t.bias)

    out = jax.jit(mod.apply)(params, jnp.asarray(h), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


class TorchWSConv(nn.Conv2d):
    """Oracle weight-standardized conv (update.py:81-94)."""

    def forward(self, x):
        eps = 1e-5
        w = self.weight
        mean = w.mean(dim=(1, 2, 3), keepdim=True)
        var = w.var(dim=(1, 2, 3), unbiased=False, keepdim=True)
        w = (w - mean) * (var + eps).rsqrt()
        return F.conv2d(x, w, self.bias, self.stride, self.padding)


def test_wsconv_parity(rng):
    torch.manual_seed(4)
    conv_t = TorchWSConv(5, 7, 3, padding=1).eval()
    x = rng.randn(2, 8, 9, 5).astype(np.float32)
    with torch.no_grad():
        ref = conv_t(torch.from_numpy(x).permute(0, 3, 1, 2))
    ref = ref.permute(0, 2, 3, 1).numpy()

    mod = WSConv(7, 3)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params["params"]["kernel"] = conv2d_kernel(t2n(conv_t.weight))
    params["params"]["bias"] = t2n(conv_t.bias)

    out = jax.jit(mod.apply)(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_sinusoidal_pos_emb_parity():
    """update.py:50-62."""
    import math
    dim = 16
    t = np.array([0.0, 3.0, 999.0], np.float32)
    ours = np.asarray(sinusoidal_pos_emb(jnp.asarray(t), dim))

    half = dim // 2
    emb = math.log(10000) / (half - 1)
    emb = torch.exp(torch.arange(half) * -emb)
    emb = torch.from_numpy(t)[:, None] * emb[None, :]
    ref = torch.cat((emb.sin(), emb.cos()), dim=-1).numpy()
    # f32 sin/cos at t=999 amplifies frequency rounding; 1e-3 is plenty for
    # a time embedding
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_unet_shapes():
    """Stage-2 UNet: dims (1,2,4), hidden at 1/4 of input resolution."""
    mod = DiffusionUNet(dim=8, hidden_dim=20, dim_mults=(1, 2, 4))
    x = jnp.zeros((1, 16, 24, 32))        # input features
    hidden = jnp.zeros((1, 4, 6, 20))     # bottleneck res = /4
    t = jnp.zeros((1,), jnp.int32)
    params = mod.init(jax.random.PRNGKey(0), x, hidden, t)
    h2, delta, conf = jax.jit(mod.apply)(params, x, hidden, t)
    assert h2.shape == hidden.shape
    assert delta.shape == (1, 16, 24)
    assert conf.shape == (1, 16, 24)
    assert float(jnp.min(conf)) >= 0.0 and float(jnp.max(conf)) <= 1.0
