"""FPN image feature extractor — parity: models/module.py:357-420.

4-level pyramid: strided 5x5 convs down (8->16->32->64 ch), nearest-upsample
+ 1x1 lateral merge up. Heads emit stage1 (1/8 res), stage2 (1/4 res) and —
for the cascade variant only — stage3 (1/2 res).

s2d=True runs the full- and half-resolution trunk (C=3-16, the measured
lane-bound floor: conv3x3 8ch at full res 9.5 ms -> 1.6 ms in s2d(4),
tools/bench_layout.py) in space-to-depth layout: to_s2d(4) at the input,
the two stride-2 convs step the repr down 4->2->1, so everything from
1/4 resolution on (C>=32) is native. Identical math and parameter tree
(nn/s2d.py).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffmvs_tpu.nn.layers import (
    ConvBnAct,
    conv,
    torch_bias_init,
    torch_kernel_init,
)
from diffmvs_tpu.nn.s2d import (
    BatchNormS2D,
    ConvS2D,
    expand_kernel,
    from_s2d,
    prepared,
    to_s2d,
    upsample_nearest_s2d,
    zero_px_border_s2d,
)
from diffmvs_tpu.ops.resize import upsample_nearest


class ConvBnActS2D(nn.Module):
    """ConvBnAct executing on an s2d(s) input; emits the s2d(s//strides)
    repr. Param tree matches ConvBnAct ("conv" + "bn").

    min_span/offset/clip: phase-optimized mode (FeatureNet.phase_opt) —
    the conv runs off-center with a trimmed (smaller) expanded kernel,
    and `clip` zeroes the stored pixel border (top, bottom, left, right)
    AFTER bn+relu so out-of-image positions stay exactly zero, matching
    the centered chain's padding semantics."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    s: int = 1
    dtype: Optional[Any] = None
    min_span: bool = False
    offset: int = 0
    clip: Tuple[int, int, int, int] = (0, 0, 0, 0)

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel_size
        cin = int(x.shape[-1]) // (self.s * self.s)
        conv = ConvS2D(
            self.features, (k, k), s=self.s, stride=self.strides,
            use_bias=False, kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(cin * k * k),
            min_span=self.min_span, offset=self.offset,
            dtype=self.dtype, name="conv")
        so = self.s // self.strides
        bn = BatchNormS2D(s=so, use_running_average=not train,
                          momentum=0.9, epsilon=1e-5,
                          dtype=self.dtype, name="bn")
        x = nn.relu(bn(conv(x)))
        if any(self.clip):
            x = zero_px_border_s2d(x, so, *self.clip)
        return x


class _ConvParams(nn.Module):
    """Parameter container matching ConvS2D's tree ('kernel' + optional
    'bias', ORIGINAL kernel shapes) for head convs whose math executes
    folded into a neighbouring conv (FeatureNet.fold_head) — checkpoints
    and the torch importer see the exact same parameters either way."""

    features: int
    kernel_size: Tuple[int, int]
    cin: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kh, kw = self.kernel_size
        k = self.param("kernel", torch_kernel_init,
                       (kh, kw, self.cin, self.features), jnp.float32)
        b = (self.param("bias", nn.initializers.zeros, (self.features,),
                        jnp.float32) if self.use_bias else None)
        return k, b


def _fold_stage3_kernel(w2, b2, w3, dtype):
    """Fold the s2d stage-3 FPN head — inner2 1x1 (on c1, s2d(2)) +
    nearest-upsample of intra (pure channel duplication in s2d) + add +
    out3 3x3 — into ONE conv kernel over concat([intra (C3 ch),
    c1 (4*C1 ch, s2d(2) c-major), ones (1 ch)]).

    Exact linear algebra on the expanded out3 kernel
    (wex3 [3,3,4*C3,4*oc], input channels (c,p) c-major):
      - the nearest-upsample duplicates intra[c] into all 4 phases, so
        the intra taps are the phase-sum  K_intra[d,c,o] = sum_p wex3[d,(c,p),o];
      - the 1x1 inner2 expansion is phase-diagonal
        (lat[(c,p)] = sum_i w2[i,c] * c1[(i,p)] + b2[c]), so
        K_c1[d,(i,p),o] = sum_c wex3[d,(c,p),o] * w2[i,c];
      - the inner2 bias rides a constant ones channel
        K_ones[d,o] = sum_{c,p} wex3[d,(c,p),o] * b2[c] — zero-padding
        the ones channel reproduces the zero-padded-merge border
        semantics exactly (no bias contribution outside the image).
    Removes the upsample's ~10 ms/forward of channel-duplication data
    movement and halves the out3 contraction width (256 -> 129 inputs).
    Same math as the unfolded path modulo one f32-product reassociation.
    """
    kh, kw, c3, _ = w3.shape
    wex3 = expand_kernel(w3, 2, 1)                 # [K,K, 4*c3, 4*oc]
    k2h, k2w, _, oc4 = wex3.shape
    wex3r = wex3.reshape(k2h, k2w, c3, 4, oc4)
    k_intra = wex3r.sum(axis=3)                    # [K,K,c3,4*oc]
    w2m = w2.reshape(w2.shape[2], w2.shape[3])     # [C1, c3]
    k_c1 = jnp.einsum("xycpo,ic->xyipo", wex3r, w2m)
    k_c1 = k_c1.reshape(k2h, k2w, w2m.shape[0] * 4, oc4)
    k_ones = jnp.einsum("xycpo,c->xyo", wex3r, b2)[:, :, None, :]
    kfold = jnp.concatenate([k_intra, k_c1, k_ones], axis=2)
    return kfold if dtype is None else kfold.astype(dtype)


class FeatureNet(nn.Module):
    base_channels: int = 8
    out_channels: Tuple[int, int, int] = (48, 32, 16)  # stage1..3; [2]==0 for DiffMVS
    s2d: bool = False
    # phase_opt (inference-only, needs s2d): run the trunk's stride-1
    # 3x3s and the first 5x5/2 at window alignment offset=0 with trimmed
    # expanded kernels — 2x2 instead of 3x3 on the s2d grid, 2.25x fewer
    # MXU MACs for identical math. The off-center windows shift the
    # stored maps; an 8 px top-left pre-pad + per-conv border masks +
    # one block crop restore exact centered-conv semantics (the shift
    # telescopes to 0 at c1). Falls back to the plain s2d trunk in
    # train mode (BN batch stats would see the pad rows).
    phase_opt: bool = False
    # fold_head (needs s2d): run the stage-3 head (inner2 + nearest-up
    # + add + out3) as ONE folded conv over concat([intra, c1, ones])
    # (_fold_stage3_kernel). Identical parameters; same math modulo one
    # f32 reassociation. Works in train mode too (the fold is plain
    # differentiable algebra on the params when no "wexp" is bound).
    fold_head: bool = False
    # (A fused Pallas conv+BN+ReLU kernel for these convs was measured
    # slower than XLA on every production shape and deleted —
    # docs/bench_r5.json conv_war_final; probe history in
    # docs/perf_breakdown.md "the conv war".)
    # (A tail_s2d variant — the 1/4-res tail on the s2d(2) grid —
    # measured a WASH end-to-end (17.90 vs 17.93 maps/s at B=8,
    # docs/bench_r4.json) and was removed: the probe-level cin==128
    # conv wins didn't survive the extra relayouts in situ.)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        bc, dt = self.base_channels, self.dtype

        def cba_nat(name, feats, k=3):
            """Native stride-1 centered ConvBnAct."""
            return ConvBnAct(feats, k, 1, k // 2, dtype=dt, name=name)

        def conv2_tail(c2):
            """conv2_1/conv2_2 over the native 1/4-res c2."""
            c2 = cba_nat("conv2_1", bc * 4)(c2, train)
            return cba_nat("conv2_2", bc * 4)(c2, train)

        if self.s2d and self.phase_opt and not train:
            def cba(name, feats, k, stride, s, offset, clip):
                return ConvBnActS2D(feats, k, stride, s=s, dtype=dt,
                                    min_span=True, offset=offset,
                                    clip=clip, name=name)
            h2, w2 = x.shape[1] // 2, x.shape[2] // 2
            xp = jnp.pad(x.astype(dt) if dt is not None else x,
                         ((0, 0), (8, 0), (8, 0), (0, 0)))
            xs = to_s2d(xp, 4)                           # delta = -8
            c0 = cba("conv0_0", bc, 3, 1, 4, 0, (7, 1, 7, 1))(xs, train)
            c0 = cba("conv0_1", bc, 3, 1, 4, 0, (6, 2, 6, 2))(c0, train)
            c1 = cba("conv1_0", bc * 2, 5, 2, 4, 0,
                     (2, 2, 2, 2))(c0, train)            # delta = -2
            c1 = cba("conv1_1", bc * 2, 3, 1, 2, 0, (1, 3, 1, 3))(c1, train)
            c1 = cba("conv1_2", bc * 2, 3, 1, 2, 0,
                     (0, 0, 0, 0))(c1, train)            # delta = 0
            c1 = c1[:, :h2 // 2, :w2 // 2]               # drop pad leftover
            c2 = ConvBnActS2D(bc * 4, 5, 2, s=2, dtype=dt, name="conv2_0")(c1, train)
            c2 = conv2_tail(c2)
        elif self.s2d:
            def cba(name, feats, k, stride, s):
                return ConvBnActS2D(feats, k, stride, s=s, dtype=dt, name=name)
            # cast to the compute dtype BEFORE the relayout: halves the
            # one-hot-conv to_s2d's traffic (the first ConvBnAct casts
            # to dt anyway, so only the relayout itself changes dtype)
            x = to_s2d(x.astype(dt) if dt is not None else x, 4)
            c0 = cba("conv0_0", bc, 3, 1, 4)(x, train)
            c0 = cba("conv0_1", bc, 3, 1, 4)(c0, train)

            c1 = cba("conv1_0", bc * 2, 5, 2, 4)(c0, train)   # -> s2d(2)
            c1 = cba("conv1_1", bc * 2, 3, 1, 2)(c1, train)
            c1 = cba("conv1_2", bc * 2, 3, 1, 2)(c1, train)

            c2 = cba("conv2_0", bc * 4, 5, 2, 2)(c1, train)   # -> native
            c2 = conv2_tail(c2)
        else:
            c0 = ConvBnAct(bc, 3, 1, 1, dtype=dt, name="conv0_0")(x, train)
            c0 = ConvBnAct(bc, 3, 1, 1, dtype=dt, name="conv0_1")(c0, train)

            c1 = ConvBnAct(bc * 2, 5, 2, 2, dtype=dt,
                           name="conv1_0")(c0, train)
            c1 = ConvBnAct(bc * 2, 3, 1, 1, dtype=dt,
                           name="conv1_1")(c1, train)
            c1 = ConvBnAct(bc * 2, 3, 1, 1, dtype=dt,
                           name="conv1_2")(c1, train)

            c2 = ConvBnAct(bc * 4, 5, 2, 2, dtype=dt,
                           name="conv2_0")(c1, train)
            c2 = ConvBnAct(bc * 4, 3, 1, 1, dtype=dt,
                           name="conv2_1")(c2, train)
            c2 = ConvBnAct(bc * 4, 3, 1, 1, dtype=dt,
                           name="conv2_2")(c2, train)

        c3 = ConvBnAct(bc * 8, 5, 2, 2, dtype=dt,
                       name="conv3_0")(c2, train)
        c3 = cba_nat("conv3_1", bc * 8)(c3, train)
        c3 = cba_nat("conv3_2", bc * 8)(c3, train)

        outputs = {}
        intra = c3
        outputs["stage1"] = conv(self.out_channels[0], 1, use_bias=False,
                                 dtype=dt, name="out1")(intra)

        intra = upsample_nearest(intra, 2) + conv(
            bc * 8, 1, use_bias=True, dtype=dt, name="inner1")(c2)
        outputs["stage2"] = conv(self.out_channels[1], 3, padding=1,
                                 use_bias=False, dtype=dt,
                                 name="out2")(intra)

        if self.out_channels[2] > 0:
            if self.s2d and self.fold_head:
                # one folded conv replaces inner2 + channel-dup upsample
                # + add + out3 (see _fold_stage3_kernel); params and
                # names identical to the unfolded path below
                w2, b2 = _ConvParams(bc * 8, (1, 1), bc * 2,
                                     name="inner2")()
                w3, _ = _ConvParams(self.out_channels[2], (3, 3), bc * 8,
                                    use_bias=False, name="out3")()
                kfold = prepared(self, "fold3", lambda: _fold_stage3_kernel(
                    w2, b2, w3, dt))
                # the ones-channel (inner2-bias) column runs as its own
                # batch-1 conv over a literal ones image: hardware
                # probes (tools/probe_conv.py) show XLA's conv fast
                # path requires cin == 128 exactly — 129 channels cost
                # 17.9 ms vs 7.3 ms at this shape. The tiny ones-conv
                # reproduces the zero-padded border clipping of the
                # bias exactly; its broadcast add fuses into the main
                # conv's epilogue.
                kmain, k1 = kfold[:, :, :-1], kfold[:, :, -1:]
                kk = (kfold.shape[0] // 2, kfold.shape[1] // 2)
                z = jnp.concatenate([intra, c1], axis=-1)
                ones = jnp.ones((1,) + intra.shape[1:3] + (1,), kfold.dtype)
                ones_map = jax.lax.conv_general_dilated(
                    ones, k1, (1, 1), ((kk[0], kk[0]), (kk[1], kk[1])),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                out3 = jax.lax.conv_general_dilated(
                    z.astype(kfold.dtype), kmain, (1, 1),
                    ((kk[0], kk[0]), (kk[1], kk[1])),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                outputs["stage3"] = from_s2d(out3 + ones_map, 2)
            elif self.s2d:
                # intra is native 1/4 res; c1 is the s2d(2) repr of 1/2
                # res (same physical resolution) — merge and run the
                # stage-3 head without leaving s2d
                lat = ConvS2D(bc * 8, (1, 1), s=2,
                              kernel_init=torch_kernel_init,
                              dtype=dt, name="inner2")(c1)
                intra = upsample_nearest_s2d(intra, 1) + lat
                out3 = ConvS2D(self.out_channels[2], (3, 3), s=2,
                               use_bias=False,
                               kernel_init=torch_kernel_init,
                               dtype=dt, name="out3")(intra)
                outputs["stage3"] = from_s2d(out3, 2)
            else:
                intra = upsample_nearest(intra, 2) + conv(
                    bc * 8, 1, use_bias=True, dtype=dt, name="inner2")(c1)
                outputs["stage3"] = conv(self.out_channels[2], 3, padding=1,
                                         use_bias=False, dtype=dt,
                                         name="out3")(intra)
        return outputs
