"""Bilinear image sampling with grid_sample parity.

Matches torch.nn.functional.grid_sample(mode='bilinear',
padding_mode='zeros', align_corners=True) as used by the reference's
plane-sweep warp (/root/reference/models/module.py:212-215), but operates in
pixel coordinates directly (the reference normalizes to [-1,1] and
grid_sample un-normalizes with align_corners=True; the two steps cancel).

Zero padding is corner-wise: each of the four bilinear corners contributes 0
when it falls outside the image, so samples straddling the border are
partially attenuated — bit-matching torch (verified in
tests/test_geometry.py against torch CPU).

TPU design: the sample is a row-gather from the feature map flattened to
[Hs*Ws, C]. The four corner gathers share one gather of the even/odd... —
kept as four jnp.take calls; XLA fuses the lerp arithmetic into the gather
consumers. A fused Pallas warp+correlation kernel lives in
diffmvs_tpu/ops/pallas/.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear_one(src, x, y):
    """src: [Hs, Ws, C]; x, y: [N] pixel coords. Returns [N, C]."""
    hs, ws, c = src.shape
    src_flat = src.reshape(hs * ws, c)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[:, None]
    wy = (y - y0)[:, None]

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def corner(xi, yi):
        valid = ((xi >= 0) & (xi < ws) & (yi >= 0) & (yi < hs))
        xc = jnp.clip(xi, 0, ws - 1)
        yc = jnp.clip(yi, 0, hs - 1)
        vals = jnp.take(src_flat, yc * ws + xc, axis=0)
        return vals * valid[:, None].astype(src.dtype)

    v00 = corner(x0i, y0i)
    v01 = corner(x0i + 1, y0i)
    v10 = corner(x0i, y0i + 1)
    v11 = corner(x0i + 1, y0i + 1)

    top = v00 + (v01 - v00) * wx.astype(src.dtype)
    bot = v10 + (v11 - v10) * wx.astype(src.dtype)
    return top + (bot - top) * wy.astype(src.dtype)


def bilinear_sample(src, x, y):
    """Batched bilinear sampling (naive 4-gather reference path).

    src: [B, Hs, Ws, C] feature maps.
    x, y: [B, ...] pixel coordinates (align_corners=True convention:
          integer coords hit pixel centers; (0,0) is the first pixel).
    Returns [B, ..., C]; out-of-bounds corners contribute zeros.
    """
    batch_shape = x.shape
    xf = x.reshape(x.shape[0], -1)
    yf = y.reshape(y.shape[0], -1)
    out = jax.vmap(_bilinear_one)(src, xf, yf)
    return out.reshape(*batch_shape, src.shape[-1])


def pack_corners(src):
    """[B, Hs, Ws, C] -> [B, 4C, (Hs+1)*(Ws+1)] corner-packed features.

    packed[:, y1*(Ws+1)+x1] stacks (src[y1-1, x1-1], src[y1-1, x1],
    src[y1, x1-1], src[y1, x1]) with zeros outside the image — i.e. the four
    bilinear corners of any sample whose ceil-index is (y1, x1). One gather
    then fetches all four corners at once (4x fewer gather ops than the
    naive path).

    Layout note: channels-major with the flattened spatial axis LAST — the
    gather runs along the minor (lane) axis (~1.5x faster than row gathers
    in isolation; end-to-end neutral once XLA fuses the lerp consumers, but
    this layout is the one the planned Pallas kernel needs).
    """
    b, hs, ws, c = src.shape
    pad = jnp.pad(src, ((0, 0), (1, 1), (1, 1), (0, 0)))
    packed = jnp.concatenate([
        pad[:, :-1, :-1], pad[:, :-1, 1:],
        pad[:, 1:, :-1], pad[:, 1:, 1:],
    ], axis=-1)                                  # [B, Hs+1, Ws+1, 4C]
    packed = packed.reshape(b, (hs + 1) * (ws + 1), 4 * c)
    return packed.transpose(0, 2, 1)             # [B, 4C, S]


def _bilinear_packed_one(packed, hs, ws, c, x, y):
    """packed: [4C, (Hs+1)*(Ws+1)]; x, y: [N]. Returns [N, C]."""
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[None, :].astype(packed.dtype)
    wy = (y - y0)[None, :].astype(packed.dtype)

    x1 = x0.astype(jnp.int32) + 1
    y1 = y0.astype(jnp.int32) + 1
    # a sample contributes iff its ceil-index lies in [0, Ws] x [0, Hs]
    valid = ((x1 >= 0) & (x1 <= ws) & (y1 >= 0) & (y1 <= hs))
    x1c = jnp.clip(x1, 0, ws)
    y1c = jnp.clip(y1, 0, hs)
    cols = jnp.take(packed, y1c * (ws + 1) + x1c, axis=1)   # [4C, N]

    v00 = cols[:c]
    v01 = cols[c:2 * c]
    v10 = cols[2 * c:3 * c]
    v11 = cols[3 * c:]
    top = v00 + (v01 - v00) * wx
    bot = v10 + (v11 - v10) * wx
    out = top + (bot - top) * wy                             # [C, N]
    out = out * valid[None, :].astype(packed.dtype)
    return out.T


def bilinear_sample_packed(packed, hs, ws, channels, x, y):
    """Batched packed-gather bilinear sampling; exact parity with
    bilinear_sample. packed from pack_corners; hs/ws/channels are the
    ORIGINAL feature dims."""
    batch_shape = x.shape
    xf = x.reshape(x.shape[0], -1)
    yf = y.reshape(y.shape[0], -1)
    out = jax.vmap(
        lambda p, xx, yy: _bilinear_packed_one(p, hs, ws, channels, xx, yy)
    )(packed, xf, yf)
    return out.reshape(*batch_shape, channels)
