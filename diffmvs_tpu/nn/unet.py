"""Conditional diffusion UNet with a recurrent (GRU) bottleneck.

Parity target: /root/reference/models/update.py:38-297 (`Unet`, `Block`,
`ResnetBlock`, `WeightStandardizedConv2d`, `SinusoidalPosEmb`, `Upsample`,
`Downsample`, `ConditionEncoder`).

Structure per refinement stage s (dim = unet_dim[s], mults = (1,2[,4])):
  init 7x7 conv -> ResnetBlock+Downsample ladder -> SepConvGRU carrying the
  hidden state across refinement iterations at 1/8 resolution -> ResnetBlock
  ladder up with skip concats -> heads: delta (1ch) and sigmoid confidence.
Time conditioning is FiLM (scale/shift) from a sinusoidal embedding MLP.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffmvs_tpu.nn.layers import (
    SepConvGRU,
    torch_bias_init,
    torch_kernel_init,
)
from diffmvs_tpu.nn.s2d import (
    ConvS2D,
    GroupNormS2D,
    conv_s2d,
    from_s2d,
    prep_conv_s2d,
    prepared,
    repeat_channels,
    run_conv_s2d,
    s2d_change,
    to_s2d,
    upsample_nearest_s2d,
)

Dtype = Any


def sinusoidal_pos_emb(t, dim):
    """t: [B] (float) -> [B, dim]. Parity: update.py:50-62."""
    half = dim // 2
    freqs = jnp.exp(
        jnp.arange(half, dtype=jnp.float32) * (-math.log(10000.0) / (half - 1)))
    args = t[:, None].astype(jnp.float32) * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class Dense(nn.Module):
    """Linear layer with torch default init."""

    features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            self.features, kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(int(x.shape[-1])),
            dtype=self.dtype, name="linear",
        )(x)


class WSConv(nn.Module):
    """Weight-standardized 3x3 conv — parity: update.py:81-94.

    Kernel is standardized over (kh, kw, in) per output channel with biased
    variance; eps 1e-5 in float32 (1e-3 in lower precision).
    s > 1 runs the identical math on an s2d(s) input (nn/s2d.py).
    """

    features: int
    kernel_size: int = 3
    s: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        in_ch = int(x.shape[-1]) // (self.s * self.s)
        kernel = self.param("kernel", torch_kernel_init,
                            (k, k, in_ch, self.features), jnp.float32)
        bias = self.param("bias", torch_bias_init(in_ch * k * k),
                          (self.features,), jnp.float32)
        eps = 1e-5 if x.dtype == jnp.float32 else 1e-3
        dtype = self.dtype or x.dtype

        def standardize():
            mean = jnp.mean(kernel, axis=(0, 1, 2), keepdims=True)
            var = jnp.var(kernel, axis=(0, 1, 2), keepdims=True)
            return (kernel - mean) * jax.lax.rsqrt(var + eps)

        wex, bex = prepared(self, "wex", lambda: prep_conv_s2d(
            standardize(), bias, self.s, dtype=dtype))
        return run_conv_s2d(x, wex, bex, self.s, dtype=dtype)


class Conv7x7RowSum(nn.Module):
    """7x7 conv computed as a sum of 7 shifted 1x7 convs.

    Numerically the same convolution: each 1x7 partial conv emits f32
    (preferred_element_type) and the 7 partials are summed in f32 before
    one cast to the compute dtype — so even in bf16 the result carries a
    single output rounding, like a direct f32-accumulated 7x7 (only the
    f32 add order differs). Parameter names/shapes are identical to
    nn.Conv — the torch importer and checkpoints are unaffected. Why:
    XLA's direct 7x7 lowering at stage-3 resolution costs ~20 ms on v5e
    (vs ~0 for 3x3); the row decomposition measures 2.1x faster
    (tools/bench_tail.py).
    """

    features: int
    s: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        cin = int(x.shape[-1]) // (self.s * self.s)
        kernel = self.param("kernel", torch_kernel_init,
                            (7, 7, cin, self.features), jnp.float32)
        bias = self.param("bias", torch_bias_init(cin * 49),
                          (self.features,), jnp.float32)
        dtype = self.dtype or x.dtype
        if self.s > 1:
            # s2d: one structured small conv (3x3 at s=4, 5x5 at s=2)
            # replaces both the direct 7x7 AND the row decomposition —
            # measured ~0 ms vs 9.9 ms (tools/bench_layout.py). A single
            # conv carries one output rounding (MXU accumulates f32
            # internally), so the row-sum path's f32 partials are moot.
            wex, bex = prepared(self, "wex", lambda: prep_conv_s2d(
                kernel, bias, self.s, dtype=dtype))
            return run_conv_s2d(x, wex, bex, self.s, dtype=dtype)
        h = x.shape[1]
        # round operands to the compute dtype, then run the conv in f32:
        # every bf16 product is exact in f32, so this is bit-identical to
        # a bf16-operand conv with preferred_element_type=f32 — and
        # unlike preferred_element_type, its transpose (VJP) is
        # well-typed (an f32 cotangent against a bf16 kernel fails conv
        # dtype checks in the backward pass)
        xp = (jnp.pad(x, ((0, 0), (3, 3), (0, 0), (0, 0)))
              .astype(dtype).astype(jnp.float32))
        y = None
        for dy in range(7):
            part = jax.lax.conv_general_dilated(
                xp[:, dy:dy + h],
                kernel[dy:dy + 1].astype(dtype).astype(jnp.float32),
                (1, 1), ((0, 0), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = part if y is None else y + part
        return (y + bias).astype(dtype)


class Block(nn.Module):
    """WSConv -> GroupNorm -> (FiLM) -> SiLU — parity: update.py:117-133."""

    features: int
    groups: int = 8
    s: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, scale_shift=None):
        x = WSConv(self.features, 3, s=self.s, dtype=self.dtype, name="proj")(x)
        if self.s > 1:
            # norm-apply + FiLM + SiLU fused into one elementwise pass
            # (the FiLM affine folds into the norm affine — GroupNormS2D)
            return GroupNormS2D(num_groups=self.groups, s=self.s,
                                epsilon=1e-5, dtype=self.dtype,
                                name="norm")(x, scale_shift=scale_shift,
                                             silu=True)
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                         dtype=self.dtype, name="norm")(x)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1.0) + shift
        return nn.silu(x)


class ResnetBlock(nn.Module):
    """Two Blocks + residual 1x1 — parity: update.py:135-159."""

    features: int
    groups: int = 4
    time_conditioned: bool = True
    s: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, time_emb=None):
        scale_shift = None
        if self.time_conditioned and time_emb is not None:
            t = Dense(self.features * 2, dtype=self.dtype,
                      name="mlp")(nn.silu(time_emb))
            t = t[:, None, None, :]
            scale_shift = jnp.split(t, 2, axis=-1)

        h = Block(self.features, self.groups, s=self.s, dtype=self.dtype, name="block1")(x, scale_shift)
        h = Block(self.features, self.groups, s=self.s, dtype=self.dtype, name="block2")(h)

        cin = int(x.shape[-1]) // (self.s * self.s)
        if cin != self.features:
            if self.s > 1:
                x = ConvS2D(self.features, (1, 1), s=self.s,
                            kernel_init=torch_kernel_init,
                            bias_init=torch_bias_init(cin),
                            dtype=self.dtype, name="res_conv")(x)
            else:
                x = nn.Conv(self.features, (1, 1),
                            kernel_init=torch_kernel_init,
                            bias_init=torch_bias_init(cin),
                            dtype=self.dtype, name="res_conv")(x)
        return h + x


class Downsample(nn.Module):
    """Space-to-depth (2x2) + 1x1 conv — parity: update.py:44-48.

    Channel order matches einops 'b c (h p1) (w p2) -> b (c p1 p2) h w'
    translated to NHWC: index = c*4 + p1*2 + p2. With s > 1 the input is
    an s2d(s) repr and the op — equivalent to an unpadded 2x2/stride-2
    conv — emits the s2d(s//2) repr at the SAME physical resolution.
    """

    features: int
    s: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        b, h, w, cs = x.shape
        if self.s == 1:
            c = cs
            x = x.reshape(b, h // 2, 2, w // 2, 2, c)
            x = x.transpose(0, 1, 3, 5, 2, 4).reshape(b, h // 2, w // 2,
                                                      c * 4)
            return nn.Conv(self.features, (1, 1),
                           kernel_init=torch_kernel_init,
                           bias_init=torch_bias_init(c * 4),
                           dtype=self.dtype, name="conv")(x)
        return _DownsampleS2D(self.features, self.s, dtype=self.dtype, name="conv")(x)


class _DownsampleS2D(nn.Module):
    """The s2d(s) execution of Downsample. Param tree matches nn.Conv
    ('kernel' [1,1,4C,features], 'bias') under the same "conv" scope."""

    features: int
    s: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        c = int(x.shape[-1]) // (self.s * self.s)
        kernel = self.param("kernel", torch_kernel_init,
                            (1, 1, 4 * c, self.features), jnp.float32)
        bias = self.param("bias", torch_bias_init(4 * c),
                          (self.features,), jnp.float32)
        dtype = self.dtype or x.dtype

        def k2():
            # [1,1,(c*2+r1)*2+r2, out] -> 2x2 unpadded stride-2 kernel
            return kernel.reshape(c, 2, 2, self.features).transpose(
                1, 2, 0, 3)

        wex, bex = prepared(self, "wex", lambda: prep_conv_s2d(
            k2(), bias, self.s, stride=2, offset=0, dtype=dtype))
        return run_conv_s2d(x, wex, bex, self.s, stride=2, offset=0,
                            dtype=dtype)


class Upsample(nn.Module):
    """Nearest x2 + 3x3 conv — parity: update.py:38-42.

    In s2d mode the input is an s2d(s) repr (s=1 at the bottleneck);
    nearest x2 is a pure channel gather into the s2d(2s) repr at the
    SAME physical resolution, then the 3x3 conv runs expanded at 2s.
    """

    features: int
    s: int = 1                    # input repr factor
    s2d_mode: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        if self.s2d_mode:
            x = upsample_nearest_s2d(x, self.s)
            cin = int(x.shape[-1]) // (4 * self.s * self.s)
            return ConvS2D(self.features, (3, 3), s=2 * self.s,
                           kernel_init=torch_kernel_init,
                           bias_init=torch_bias_init(cin * 9),
                           dtype=self.dtype, name="conv")(x)
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                       kernel_init=torch_kernel_init,
                       bias_init=torch_bias_init(int(x.shape[-1]) * 9),
                       dtype=self.dtype, name="conv")(x)


class DiffusionUNet(nn.Module):
    """The per-stage denoiser — parity: update.py:161-274.

    s2d=True executes every level above the bottleneck in space-to-depth
    layout (level ind runs at s = 2^(L-1-ind), so the GRU bottleneck is
    always native): identical math and parameters, but the C=8-32 convs,
    norms and elementwise ops use all 128 TPU lanes — see nn/s2d.py and
    tools/bench_layout.py. Boundary conversions happen once at the input
    and once at the two heads.
    """

    dim: int                      # base feature dim (unet_dim[s])
    hidden_dim: int               # GRU hidden state channels
    dim_mults: Tuple[int, ...] = (1, 2)
    resnet_block_groups: int = 4
    s2d: bool = False
    s2d_in: bool = False          # x arrives already in s2d(s0) layout
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, hidden, time):
        """x: [B,H,W,Cin] (or its s2d(s0) repr when s2d_in);
        hidden: [B,H/2^(L-1),W/2^(L-1),hidden_dim];
        time: [B] int/float timestep. Returns (new_hidden, delta, confidence).
        """
        dt = self.dtype
        dims = [self.dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        g = self.resnet_block_groups
        nlvl = len(in_out)
        s0 = 2 ** (nlvl - 1) if self.s2d else 1

        def s_at(lvl):
            return max(s0 >> lvl, 1)

        # time embedding MLP (update.py:204-211)
        time_dim = self.dim * 4
        t = sinusoidal_pos_emb(time, self.dim)
        t = Dense(time_dim, dtype=dt, name="time_mlp_1")(t)
        t = nn.gelu(t, approximate=False)
        t = Dense(time_dim, dtype=dt, name="time_mlp_2")(t)

        if not (self.s2d_in and s0 > 1):
            x = to_s2d(x, s0)
        x = Conv7x7RowSum(self.dim, s=s0, dtype=dt, name="init_conv")(x)
        r = x

        skips = []
        for ind, (dim_in, dim_out) in enumerate(in_out):
            is_last = ind >= len(in_out) - 1
            s = s_at(ind)
            x = ResnetBlock(dim_in, g, s=s, dtype=dt, name=f"down_{ind}_block")(x, t)
            skips.append(x)
            if not is_last:
                x = Downsample(dim_out, s=s, dtype=dt,
                               name=f"down_{ind}_ds")(x)
            elif s > 1:
                x = ConvS2D(dim_out, (3, 3), s=s,
                            kernel_init=torch_kernel_init,
                            bias_init=torch_bias_init(dim_in * 9),
                            dtype=dt, name=f"down_{ind}_conv")(x)
            else:
                x = nn.Conv(dim_out, (3, 3), padding=((1, 1), (1, 1)),
                            kernel_init=torch_kernel_init,
                            bias_init=torch_bias_init(dim_in * 9),
                            dtype=dt, name=f"down_{ind}_conv")(x)

        # recurrent bottleneck (update.py:229,258-259) — always native
        # layout: s_at(nlvl - 1) == 1 by construction
        x = from_s2d(x, s_at(nlvl - 1))
        hidden = SepConvGRU(self.hidden_dim, dtype=dt, name="gru")(hidden, x)
        # mid block is NOT time-conditioned (update.py:230 passes no
        # time_emb_dim, so its forward ignores t)
        x = ResnetBlock(dims[-1], g, time_conditioned=False, dtype=dt, name="mid")(hidden)

        for ind, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = ind == len(in_out) - 1
            lvl = nlvl - 1 - ind
            s = s_at(lvl)
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ResnetBlock(dim_out, g, s=s, dtype=dt, name=f"up_{ind}_block")(x, t)
            if not is_last:
                x = Upsample(dim_in, s=s, s2d_mode=s0 > 1, dtype=dt, name=f"up_{ind}_us")(x)
            elif s > 1:
                x = ConvS2D(dim_in, (3, 3), s=s,
                            kernel_init=torch_kernel_init,
                            bias_init=torch_bias_init(dim_out * 9),
                            dtype=dt, name=f"up_{ind}_conv")(x)
            else:
                x = nn.Conv(dim_in, (3, 3), padding=((1, 1), (1, 1)),
                            kernel_init=torch_kernel_init,
                            bias_init=torch_bias_init(dim_out * 9),
                            dtype=dt, name=f"up_{ind}_conv")(x)

        x = jnp.concatenate([x, r], axis=-1)
        x = ResnetBlock(self.dim, g, s=s0, dtype=dt, name="final_res_block")(x, t)

        if s0 > 1:
            delta = ConvS2D(1, (1, 1), s=s0,
                            kernel_init=torch_kernel_init,
                            bias_init=torch_bias_init(self.dim),
                            dtype=dt, name="final_conv")(x)
            conf = ConvS2D(1, (1, 1), s=s0,
                           kernel_init=torch_kernel_init,
                           bias_init=torch_bias_init(self.dim),
                           dtype=dt, name="conf")(x)
            delta = from_s2d(delta, s0)
            conf = from_s2d(conf, s0)
        else:
            delta = nn.Conv(1, (1, 1), kernel_init=torch_kernel_init,
                            bias_init=torch_bias_init(self.dim),
                            dtype=dt, name="final_conv")(x)
            conf = nn.Conv(1, (1, 1), kernel_init=torch_kernel_init,
                           bias_init=torch_bias_init(self.dim),
                           dtype=dt, name="conf")(x)
        return hidden, delta[..., 0], nn.sigmoid(conf[..., 0])


class ConditionEncoder(nn.Module):
    """Encode (cost volume, depth samples) -> context feature.

    Parity: update.py:276-297. Output has out_chs-1 learned channels with the
    raw inverse depth concatenated as the last channel.

    s2d > 1 runs the five 3x3 convs in space-to-depth layout (the c-major
    channel order commutes with concatenation, so only the in/out
    boundaries convert — measured free, tools/bench_layout.py).
    """

    hidden_dim: int               # context_dim[s]
    out_chs: int                  # context_dim[s]
    s2d: int = 1
    s2d_out: bool = False         # emit an s2d repr (skip from_s2d)
    out_factor: int = 0           # s2d factor of the emitted repr
                                  # (0 = same as s2d; else one fused
                                  # s2d_change at the output)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, depth, depth_values, cost_volume):
        """depth: [B,H,W,1]; depth_values: [B,H,W,CostNum];
        cost_volume: [B,H,W,G*CostNum]."""
        s = self.s2d

        def c3(name, feats, x):
            """relu(conv3x3(x))."""
            cin = int(x.shape[-1]) // (s * s)
            if s > 1:
                conv = ConvS2D(feats, (3, 3), s=s,
                               kernel_init=torch_kernel_init,
                               bias_init=torch_bias_init(cin * 9),
                               dtype=self.dtype, name=name)
                return nn.relu(conv(x))
            return nn.relu(nn.Conv(
                feats, (3, 3), padding=((1, 1), (1, 1)),
                kernel_init=torch_kernel_init,
                bias_init=torch_bias_init(cin * 9),
                dtype=self.dtype, name=name)(x))

        cost_volume = to_s2d(cost_volume, s)
        depth_values = to_s2d(depth_values, s)
        c = c3("convc1", self.hidden_dim, cost_volume)
        c = c3("convc2", self.hidden_dim, c)
        d = c3("convd1", self.hidden_dim, depth_values)
        d = c3("convd2", self.hidden_dim, d)
        feat = jnp.concatenate([c, d], axis=-1)
        out = c3("output", self.out_chs - 1, feat)
        if self.s2d_out and max(s, self.out_factor) > 1:
            # stay in s2d: c-major concat commutes with the layout, so
            # appending to_s2d(depth) == to_s2d of the pixel concat
            cat = jnp.concatenate([out, to_s2d(depth, s)], axis=-1)
            # encoder may run at a smaller factor than the UNet wants
            # (s=2 halves the expanded convs' MXU waste at C=16); one
            # fused one-hot conv re-lays the seam
            return s2d_change(cat, s, self.out_factor or s)
        return jnp.concatenate([from_s2d(out, s), depth], axis=-1)
