"""Conv wrappers, GRU, residual blocks (parity: models/module.py:24-179,279-319).

Conventions
-----------
* NHWC / NDHWC layouts (TPU-native); kernels are HWIO / DHWIO.
* Explicit symmetric padding replicating torch's integer `padding=` —
  flax 'SAME' distributes padding differently for stride 2, which would
  break checkpoint parity.
* torch default initialization (kaiming_uniform(a=sqrt(5)) + uniform bias)
  so that training-from-scratch matches the reference's conditioning.
* BatchNorm: torch momentum 0.1 == flax momentum 0.9; eps 1e-5. Under
  jit-with-sharding the batch statistics are computed over the *global*
  batch (XLA partitions the mean), i.e. sync-BN for free.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# torch Conv/Linear default: kaiming_uniform(a=sqrt(5)) == U(+-sqrt(1/fan_in))
torch_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(fan_in: int) -> Callable:
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _pad_tuple(padding: Union[int, Sequence[int]], ndim: int):
    if isinstance(padding, int):
        return tuple((padding, padding) for _ in range(ndim))
    return tuple((p, p) for p in padding)


class Conv(nn.Module):
    """nn.Conv with torch-style padding & init (2D or 3D by kernel length)."""

    features: int
    kernel_size: Tuple[int, ...]
    strides: Union[int, Tuple[int, ...]] = 1
    padding: Union[int, Tuple[int, ...]] = 0
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        fan_in = int(x.shape[-1]) * math.prod(self.kernel_size)
        return nn.Conv(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding=_pad_tuple(self.padding, len(self.kernel_size)),
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(fan_in),
            dtype=self.dtype,
            name="conv",
        )(x)


def conv(features, kernel_size, strides=1, padding=0, use_bias=True,
         dtype=None, name=None):
    """Inline helper building a torch-initialized nn.Conv (no extra scope)."""
    ks = (kernel_size,) * 2 if isinstance(kernel_size, int) else tuple(kernel_size)
    return nn.Conv(
        features=features,
        kernel_size=ks,
        strides=strides,
        padding=_pad_tuple(padding, len(ks)),
        use_bias=use_bias,
        kernel_init=torch_kernel_init,
        dtype=dtype,
        name=name,
    )


class ConvBnAct(nn.Module):
    """Conv2d(+BN)(+ReLU) — parity: models/module.py:24-58.

    Bias is disabled when BN is on (module.py:43).
    """

    features: int
    kernel_size: int = 3
    strides: int = 1
    padding: int = 0
    relu: bool = True
    bn: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ks = (self.kernel_size, self.kernel_size)
        fan_in = int(x.shape[-1]) * self.kernel_size * self.kernel_size
        x = nn.Conv(
            self.features, ks, strides=self.strides,
            padding=_pad_tuple(self.padding, 2),
            use_bias=not self.bn,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(fan_in),
            dtype=self.dtype, name="conv",
        )(x)
        if self.bn:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="bn",
            )(x)
        if self.relu:
            x = nn.relu(x)
        return x


class Conv3dBnAct(nn.Module):
    """Conv3d(+BN)(+ReLU) over NDHWC — parity: models/module.py:66-102."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    padding: int = 0
    relu: bool = True
    bn: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ks = (self.kernel_size,) * 3
        fan_in = int(x.shape[-1]) * self.kernel_size ** 3
        x = nn.Conv(
            self.features, ks, strides=self.strides,
            padding=_pad_tuple(self.padding, 3),
            use_bias=not self.bn,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(fan_in),
            dtype=self.dtype, name="conv",
        )(x)
        if self.bn:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="bn",
            )(x)
        if self.relu:
            x = nn.relu(x)
        return x


class Deconv3dBnAct(nn.Module):
    """ConvTranspose3d(stride 2, k3, pad 1, output_padding 1)+BN+ReLU.

    Parity: models/module.py:110-144. torch's transposed conv with
    (k=3, s=2, p=1, op=1) doubles each spatial dim. Implemented directly as
    lax.conv_general_dilated with lhs_dilation=2 and asymmetric padding
    (k-1-p, k-1-p+op) = (1, 2): identical arithmetic, full layout control.
    The kernel is stored IO-transposed+flipped relative to torch's
    ConvTranspose weight — the checkpoint importer handles the transform.
    """

    features: int
    kernel_size: int = 3
    relu: bool = True
    bn: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel_size
        in_ch = int(x.shape[-1])
        kernel = self.param(
            "kernel", torch_kernel_init, (k, k, k, in_ch, self.features),
            jnp.float32)
        dtype = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), kernel.astype(dtype),
            window_strides=(1, 1, 1),
            padding=((1, 2), (1, 2), (1, 2)),
            lhs_dilation=(2, 2, 2),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        if self.bn:
            y = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="bn",
            )(y)
        if self.relu:
            y = nn.relu(y)
        return y


class ConvBnReLU(nn.Module):
    """Conv2d+BN+ReLU with bias-free conv — parity: module.py:279-289."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    padding: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features, (self.kernel_size,) * 2, strides=self.strides,
            padding=_pad_tuple(self.padding, 2), use_bias=False,
            kernel_init=torch_kernel_init, dtype=self.dtype, name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn",
        )(x)
        return nn.relu(x)


class ConvBn(nn.Module):
    """Conv2d+BN (no activation) — parity: module.py:291-301."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    padding: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features, (self.kernel_size,) * 2, strides=self.strides,
            padding=_pad_tuple(self.padding, 2), use_bias=False,
            kernel_init=torch_kernel_init, dtype=self.dtype, name="conv",
        )(x)
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn",
        )(x)


class ResidualBlock(nn.Module):
    """Two 3x3 convs with additive skip — parity: module.py:303-319."""

    features: int
    strides: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBnReLU(self.features, 3, self.strides, 1,
                       dtype=self.dtype, name="conv1")(x, train)
        y = ConvBn(self.features, 3, 1, 1,
                   dtype=self.dtype, name="conv2")(y, train)
        if self.strides != 1:
            x = ConvBn(self.features, 3, self.strides, 1,
                       dtype=self.dtype, name="downsample")(x, train)
        return nn.relu(x + y)


class SepConvGRU(nn.Module):
    """RAFT separable conv GRU — parity: models/module.py:152-179.

    Horizontal (1x5) gated update, then vertical (5x1).
    """

    hidden_dim: int
    dtype: Optional[Dtype] = None

    def _gate(self, name, hx, ksize, pad):
        fan_in = int(hx.shape[-1]) * ksize[0] * ksize[1]
        return nn.Conv(
            self.hidden_dim, ksize, padding=(pad[0], pad[1]),
            kernel_init=torch_kernel_init, bias_init=torch_bias_init(fan_in),
            dtype=self.dtype, name=name,
        )(hx)

    @nn.compact
    def __call__(self, h, x):
        for axis, (ks, pad) in enumerate(
                [((1, 5), ((0, 0), (2, 2))), ((5, 1), ((2, 2), (0, 0)))]):
            tag = str(axis + 1)
            hx = jnp.concatenate([h, x], axis=-1)
            z = nn.sigmoid(self._gate(f"convz{tag}", hx, ks, pad))
            r = nn.sigmoid(self._gate(f"convr{tag}", hx, ks, pad))
            q = jnp.tanh(self._gate(
                f"convq{tag}", jnp.concatenate([r * h, x], axis=-1), ks, pad))
            h = (1.0 - z) * h + z * q
        return h
