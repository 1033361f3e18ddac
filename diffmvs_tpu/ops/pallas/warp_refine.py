"""Pallas banded warp kernel for the refinement stages.

Replaces the XLA row-gather in local cost volumes (the profiled hot path:
stage-3 warps are ~40% of the CasDiffMVS forward; XLA's TPU gather is
row-count-bound at ~63M rows/s). Refinement hypotheses are spatially local
— for a 64-px output tile, all D (4-6) hypotheses' bilinear corners fit a
[K source rows x 128 source cols] window — so each grid step:

  1. DMAs one window (contiguous row-block of the channel-interleaved
     padded source) into VMEM via a scalar-prefetched base;
  2. gathers BOTH x-corners of all K*C window rows with a single
     take_along_axis lane-gather (left corners on lanes 0..63, right
     corners on lanes 64..127);
  3. y-interpolates with a K-way masked sum, x-interpolates with a
     lane roll, masks invalid samples to zero (matching the XLA path's
     zero-padding semantics), and writes the warped [D, C, 64] tile.

Pixels whose corners fall outside the window (extreme perspective stretch)
are zeroed; `window_miss_fraction` measures this — callers should fall back
to the XLA path when it is non-negligible for their geometry (DTU-style
rigs measure 0).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diffmvs_tpu.geometry.warp import plane_sweep_coords
from diffmvs_tpu.geometry.transforms import relative_projection

TILE = 64          # output pixels per grid step (lanes 0..63)
WIN_W = 256        # source window width (two 128-lane gather halves);
                   # the window base is 128-aligned (DMA lane-offset rule)
GATHER_W = 128     # Mosaic lane-gather width limit
WIN_K = 16         # source window rows


def _warp_kernel(bx_ref, by_ref,            # scalar prefetch [H, T]
                 xi_ref, yi_ref, fx_ref, fy_ref, vmask_ref,  # [D,1,TILE]
                 src_hbm,                    # ANY [(Hs+2)*C, Ws+2]
                 out_ref,                    # [D, 1, C, TILE]
                 win_ref, sem):              # scratch VMEM + DMA sem
    h = pl.program_id(0)
    t = pl.program_id(1)
    _, d_total, c, _ = out_ref.shape
    kc = win_ref.shape[0]
    k = kc // c

    bxv = pl.multiple_of(bx_ref[h, t], GATHER_W)   # 128-aligned by build
    byv = by_ref[h, t]

    copy = pltpu.make_async_copy(
        src_hbm.at[pl.ds(byv * c, kc), pl.ds(bxv, WIN_W)],
        win_ref, sem)
    copy.start()
    copy.wait()

    window = win_ref[:]                                   # [K*C, WIN_W]

    for d in range(d_total):
        # local integer corners + fractions for this depth's tile ([1,TILE])
        xi = xi_ref[:, d, :]                               # [1, TILE] int32
        yi = yi_ref[:, d, :]
        fx = fx_ref[:, d, :]
        fy = fy_ref[:, d, :]
        valid_in = vmask_ref[:, d, :] != 0

        lx = xi - bxv
        ly = yi - byv
        in_win = ((lx >= 0) & (lx <= WIN_W - 2)
                  & (ly >= 0) & (ly <= k - 2))
        valid = (valid_in & in_win)

        lxc = jnp.clip(lx, 0, WIN_W - 2)
        lyc = jnp.clip(ly, 0, k - 2)

        # both x-corners in one gather pass: lanes [0,TILE) -> x0,
        # lanes [TILE, 2*TILE) -> x0+1 of pixel (lane - TILE). The window is
        # 256 wide but lane-gathers are 128-wide, so gather each half and
        # select.
        lx2 = jnp.concatenate([lxc, lxc + 1], axis=1)      # [1, GATHER_W]
        idx = jnp.broadcast_to(lx2, (kc, GATHER_W))
        g_lo = jnp.take_along_axis(
            window[:, :GATHER_W], jnp.clip(idx, 0, GATHER_W - 1), axis=1)
        g_hi = jnp.take_along_axis(
            window[:, GATHER_W:], jnp.clip(idx - GATHER_W, 0,
                                           GATHER_W - 1), axis=1)
        g = jnp.where(idx < GATHER_W, g_lo, g_hi)          # [K*C, GATHER_W]
        g = g.reshape(k, c, GATHER_W)

        # y-interp: rows lyc and lyc+1 weighted (1-fy, fy); per-lane row ids
        ly2 = jnp.concatenate([lyc, lyc], axis=1)          # [1, WIN_W]
        fy2 = jnp.concatenate([fy, fy], axis=1)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (k, 1, GATHER_W), 0)
        wk = (jnp.where(row_ids == ly2[None], 1.0 - fy2[None], 0.0)
              + jnp.where(row_ids == ly2[None] + 1, fy2[None], 0.0))
        s = jnp.sum(g * wk.astype(g.dtype), axis=0)        # [C, WIN_W]

        # x-interp: left corners on lanes [0,TILE), right on [TILE,2*TILE)
        left = s[:, :TILE]
        right = s[:, TILE:]
        outv = left + (right - left) * fx.astype(s.dtype)
        outv = outv * valid.astype(s.dtype)
        out_ref[0, d, :, :] = outv


def _pad_to(x, size, axis, value=0):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def warp_refine_pallas(src_fea, src_pair, ref_pair, depth_values,
                       interpret: bool = False):
    """Banded-kernel plane-sweep warp for refinement stages.

    src_fea: [1, Hs, Ws, C]; src_pair/ref_pair: [1, 2, 4, 4];
    depth_values: [1, D, H, W]. Returns [1, D, H, W, C] (zero-padding
    bilinear semantics; window misses also produce zeros).
    """
    b, hs, ws, c = src_fea.shape
    assert b == 1, "kernel path is per-sample; vmap/batch outside"
    _, d, h, w = depth_values.shape

    rot, trans = relative_projection(src_pair, ref_pair)
    x, y = plane_sweep_coords(rot, trans, depth_values)    # [1,D,H,W]
    x = x[0]
    y = y[0]

    # integer corners into the 1-padded source (+1 offset)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0).astype(jnp.float32)
    fy = (y - y0).astype(jnp.float32)
    xi = x0.astype(jnp.int32) + 1                           # padded coords
    yi = y0.astype(jnp.int32) + 1
    # corner-validity exactly like the packed XLA path: the sample
    # contributes iff its ceil-index lies inside [0, Ws] x [0, Hs]
    valid = ((xi >= 0) & (xi <= ws) & (yi >= 0) & (yi <= hs))
    xi = jnp.clip(xi, 0, ws)                                # [0, Ws]
    yi = jnp.clip(yi, 0, hs)

    # pad W to tile multiple
    t_tiles = -(-w // TILE)
    w_pad = t_tiles * TILE
    xi_p = _pad_to(xi, w_pad, axis=2)
    yi_p = _pad_to(yi, w_pad, axis=2)
    fx_p = _pad_to(fx, w_pad, axis=2)
    fy_p = _pad_to(fy, w_pad, axis=2)
    valid_p = _pad_to(valid, w_pad, axis=2, value=False)

    # window bases per (h, tile): min over all depths + the tile's VALID
    # pixels (W-padding lanes carry a large sentinel so they don't drag the
    # base), clipped so the window stays inside the padded source
    big = jnp.int32(10 ** 8)
    xi_t = jnp.where(valid_p, xi_p, big).reshape(d, h, t_tiles, TILE)
    yi_t = jnp.where(valid_p, yi_p, big).reshape(d, h, t_tiles, TILE)
    ws2 = ws + 2
    hs2 = hs + 2
    # lane dimension of the source padded to a 128 multiple >= WIN_W so an
    # aligned window always fits
    ws_pad = max(-(-ws2 // GATHER_W) * GATHER_W, WIN_W)
    bx = jnp.clip(jnp.min(xi_t, axis=(0, 3)), 0, ws_pad - WIN_W)
    # DMA lane offsets must be 128-aligned: align the base down (the extra
    # 128 window columns guarantee coverage of the tile's span)
    bx = (bx // GATHER_W) * GATHER_W
    by = jnp.clip(jnp.min(yi_t, axis=(0, 3)), 0, max(hs2 - WIN_K, 0))
    bx = bx.astype(jnp.int32)
    by = by.astype(jnp.int32)

    # channel-interleaved padded source rows: src_t[y*C + c, x]
    src_p = jnp.pad(src_fea[0], ((1, 1), (1, 1), (0, 0)))
    src_t = src_p.transpose(0, 2, 1).reshape(hs2 * c, ws2)
    src_t = _pad_to(src_t, ws_pad, axis=1)

    # reshape per-tile inputs to [H*T, D, TILE] for block mapping (the
    # grid-mapped axis leads so the last two block dims stay full-size,
    # as Mosaic requires)
    def tile_view(a, dtype):
        return a.reshape(d, h * t_tiles, TILE).transpose(1, 0, 2) \
            .astype(dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(h, t_tiles),
        in_specs=[
            pl.BlockSpec((1, d, TILE), lambda hh, tt, bx_r, by_r:
                         (hh * t_tiles + tt, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, TILE), lambda hh, tt, bx_r, by_r:
                         (hh * t_tiles + tt, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, TILE), lambda hh, tt, bx_r, by_r:
                         (hh * t_tiles + tt, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, TILE), lambda hh, tt, bx_r, by_r:
                         (hh * t_tiles + tt, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, TILE), lambda hh, tt, bx_r, by_r:
                         (hh * t_tiles + tt, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, d, c, TILE),
            lambda hh, tt, bx_r, by_r: (hh * t_tiles + tt, 0, 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((WIN_K * c, WIN_W), src_t.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )

    out = pl.pallas_call(
        _warp_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((h * t_tiles, d, c, TILE),
                                       src_t.dtype),
        interpret=interpret,
    )(bx, by,
      tile_view(xi_p, jnp.int32), tile_view(yi_p, jnp.int32),
      tile_view(fx_p, jnp.float32), tile_view(fy_p, jnp.float32),
      tile_view(valid_p, jnp.int32) != 0,
      src_t)

    # [H*T, D, C, TILE] -> [1, D, H, W, C]
    out = out.reshape(h, t_tiles, d, c, TILE).transpose(2, 0, 1, 4, 3)
    out = out.reshape(d, h, w_pad, c)[:, :, :w]
    return out[None]


def window_miss_fraction(src_fea, src_pair, ref_pair, depth_values):
    """Fraction of valid samples whose corners fall outside the [WIN_K,
    WIN_W] window — the kernel zeroes those; callers should fall back to
    the XLA path when this is non-negligible."""
    b, hs, ws, _ = src_fea.shape
    _, d, h, w = depth_values.shape
    rot, trans = relative_projection(src_pair, ref_pair)
    x, y = plane_sweep_coords(rot, trans, depth_values)
    xi = jnp.clip(jnp.floor(x[0]).astype(jnp.int32) + 1, 0, ws)
    yi = jnp.clip(jnp.floor(y[0]).astype(jnp.int32) + 1, 0, hs)
    valid = ((jnp.floor(x[0]) + 1 >= 0) & (xi <= ws)
             & (jnp.floor(y[0]) + 1 >= 0) & (yi <= hs))

    t_tiles = -(-w // TILE)
    w_pad = t_tiles * TILE
    xi_p = _pad_to(xi, w_pad, axis=2).reshape(d, h, t_tiles, TILE)
    yi_p = _pad_to(yi, w_pad, axis=2).reshape(d, h, t_tiles, TILE)
    valid_p = _pad_to(valid, w_pad, axis=2).reshape(d, h, t_tiles, TILE)

    big = jnp.int32(10 ** 8)
    xs = jnp.where(valid_p, xi_p, big)
    ys = jnp.where(valid_p, yi_p, big)
    bx = jnp.clip(jnp.min(xs, axis=(0, 3)), 0, max(ws + 2 - WIN_W, 0))
    by = jnp.clip(jnp.min(ys, axis=(0, 3)), 0, max(hs + 2 - WIN_K, 0))
    in_win = ((xi_p - bx[None, :, :, None] <= WIN_W - 2)
              & (yi_p - by[None, :, :, None] <= WIN_K - 2))
    miss = valid_p & ~in_win
    return jnp.sum(miss) / jnp.maximum(jnp.sum(valid_p), 1)
