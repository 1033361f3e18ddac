"""Pallas banded warp kernel for the refinement stages.

Replaces the XLA row-gather in local cost volumes (the profiled hot path:
stage-3 warps are ~40% of the CasDiffMVS forward; XLA's TPU gather is
row-count-bound at ~63M rows/s). Refinement hypotheses are spatially local
— for a ROWS x 64-px output block, all D (4-6) hypotheses' bilinear corners
fit a [WIN_K source rows x 256 source cols] window — so each grid step:

  1. DMAs one window (contiguous row-block of the channel-interleaved
     padded source; 128-aligned lane base) into VMEM via scalar-prefetched
     bases;
  2. per (depth, row) gathers BOTH x-corners of all WIN_K*C window rows
     with take_along_axis lane-gathers (left corners on lanes 0..63, right
     corners on lanes 64..127; the 256-wide window is gathered as two
     128-lane halves);
  3. y-interpolates with a WIN_K-way masked sum, x-interpolates across the
     lane halves, masks invalid samples to zero (matching the XLA path's
     zero-padding semantics), and writes the warped [D, ROWS, C, 64] block.

Pixels whose corners fall outside the window (extreme perspective stretch)
are zeroed; `window_miss_fraction` measures this — callers should fall back
to the XLA path when it is non-negligible for their geometry (DTU-style
rigs measure 0).

Measured (v5e, stage-3 shape D=4 H=576 W=800 C=16, f32): 1-row/step version
20.6 ms vs 36.2 ms XLA row-gather; this ROWS=8 version amortizes the
per-step overhead further. bf16 sources are upcast to f32 (Mosaic
dynamic_gather is 32-bit only); the kernel is not bandwidth-bound so this
costs little.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diffmvs_tpu.geometry.warp import plane_sweep_coords
from diffmvs_tpu.geometry.transforms import relative_projection

TILE = 64          # output pixels per tile (lanes 0..63)
ROWS = 8           # output rows per grid step
WIN_W = 256        # source window width (two 128-lane gather halves);
                   # the window base is 128-aligned (DMA lane-offset rule)
GATHER_W = 128     # Mosaic lane-gather width limit
WIN_K = 24         # source window rows (covers ROWS output rows + spread)


def _warp_kernel(base_ref,                  # scalar prefetch [DW, N*HB, T]
                 xi_ref, yi_ref, fx_ref, fy_ref, vmask_ref,
                 src_hbm,                    # ANY [N, (Hs+2)*C, ws_pad]
                 out_ref,                    # [1, D, ROWS, C, TILE]
                 win_ref, sem):              # scratch VMEM + DMA sem
    n = pl.program_id(0)
    hb = pl.program_id(1)
    t = pl.program_id(2)
    nhb = n * pl.num_programs(1) + hb
    _, d_total, rows, c, _ = out_ref.shape
    kc = win_ref.shape[1]
    k = kc // c
    # bases are per window group: one shared window (refinement: close
    # hypotheses) or one window per depth (full sweeps)
    n_windows = base_ref.shape[0]
    per_depth = n_windows == d_total

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (k, 1, GATHER_W), 0)

    def load_window(wi, slot):
        # bases are packed (by << 16 | bx); layout [DW, T, N*HB] keeps the
        # large axis last (SMEM pads the minor dim to 128 lanes)
        packed = base_ref[wi, t, nhb]
        bxv = pl.multiple_of(packed % 65536, GATHER_W)
        byv = packed // 65536
        copy = pltpu.make_async_copy(
            src_hbm.at[n, pl.ds(byv * c, kc), pl.ds(bxv, WIN_W)],
            win_ref.at[slot], sem)
        copy.start()
        copy.wait()
        return bxv, byv

    bxv, byv = load_window(0, 0)
    window = win_ref[0]                                   # [K*C, WIN_W]
    win_lo = window[:, :GATHER_W]
    win_hi = window[:, GATHER_W:]

    for d in range(d_total):
        if per_depth and d > 0:
            bxv, byv = load_window(d, 0)
            window = win_ref[0]
            win_lo = window[:, :GATHER_W]
            win_hi = window[:, GATHER_W:]
        for r in range(rows):
            xi = xi_ref[:, d, r, :]                        # [1, TILE] int32
            yi = yi_ref[:, d, r, :]
            fx = fx_ref[:, d, r, :]
            fy = fy_ref[:, d, r, :]
            valid_in = vmask_ref[:, d, r, :] != 0

            lx = xi - bxv
            ly = yi - byv
            in_win = ((lx >= 0) & (lx <= WIN_W - 2)
                      & (ly >= 0) & (ly <= k - 2))
            valid = (valid_in & in_win)

            lxc = jnp.clip(lx, 0, WIN_W - 2)
            lyc = jnp.clip(ly, 0, k - 2)

            # both x-corners in one gather pass: lanes [0,TILE) -> x0,
            # lanes [TILE,2*TILE) -> x0+1 of pixel (lane - TILE)
            lx2 = jnp.concatenate([lxc, lxc + 1], axis=1)  # [1, GATHER_W]
            idx = jnp.broadcast_to(lx2, (kc, GATHER_W))
            g_lo = jnp.take_along_axis(
                win_lo, jnp.clip(idx, 0, GATHER_W - 1), axis=1)
            g_hi = jnp.take_along_axis(
                win_hi, jnp.clip(idx - GATHER_W, 0, GATHER_W - 1), axis=1)
            g = jnp.where(idx < GATHER_W, g_lo, g_hi)
            g = g.reshape(k, c, GATHER_W)

            # y-interp: rows lyc, lyc+1 weighted (1-fy, fy)
            ly2 = jnp.concatenate([lyc, lyc], axis=1)      # [1, GATHER_W]
            fy2 = jnp.concatenate([fy, fy], axis=1)
            wk = (jnp.where(row_ids == ly2[None], 1.0 - fy2[None], 0.0)
                  + jnp.where(row_ids == ly2[None] + 1, fy2[None], 0.0))
            s = jnp.sum(g * wk.astype(g.dtype), axis=0)    # [C, GATHER_W]

            # x-interp: left corners on lanes [0,TILE), right on the rest
            left = s[:, :TILE]
            right = s[:, TILE:]
            outv = left + (right - left) * fx.astype(s.dtype)
            outv = outv * valid.astype(s.dtype)
            out_ref[0, d, r, :, :] = outv


def _pad_to(x, size, axis, value=0):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def warp_refine_pallas(src_fea, src_pair, ref_pair, depth_values,
                       interpret: bool = False,
                       per_depth_windows: bool = False):
    """Banded-kernel plane-sweep warp.

    src_fea: [1, Hs, Ws, C]; src_pair/ref_pair: [1, 2, 4, 4];
    depth_values: [1, D, H, W]. Returns [1, D, H, W, C] float32
    (zero-padding bilinear semantics; window misses also produce zeros).

    per_depth_windows=False shares one window across the D hypotheses
    (refinement stages: hypotheses are spatially close). =True DMAs one
    window per depth plane — required for full sweeps (stage 1), where
    planes land far apart along the epipolar line.
    """
    n, hs, ws, c = src_fea.shape
    _, d, h, w = depth_values.shape

    # the Pallas TPU lowering needs a TPU; fall back to the interpreter on
    # CPU so the same model config runs everywhere (tests, dry runs)
    if not interpret and jax.default_backend() != "tpu":
        interpret = True

    # large full sweeps: chunk the depth axis (a 48-deep unrolled kernel
    # body overflows SMEM); each chunk is its own pallas_call
    max_d = 8
    if per_depth_windows and d > max_d:
        chunks = [
            warp_refine_pallas(src_fea, src_pair, ref_pair,
                               depth_values[:, i:i + max_d],
                               interpret=interpret, per_depth_windows=True)
            for i in range(0, d, max_d)
        ]
        return jnp.concatenate(chunks, axis=1)

    rot, trans = relative_projection(src_pair, ref_pair)
    x, y = plane_sweep_coords(rot, trans, depth_values)    # [N,D,H,W]

    # integer corners into the 1-padded source (+1 offset); all [N,D,H,W]
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

    # pad W to tile multiple and H to row-block multiple
    t_tiles = -(-w // TILE)
    w_pad = t_tiles * TILE
    hb = -(-h // ROWS)
    h_pad = hb * ROWS

    def pad_hw(a, value=0):
        return _pad_to(_pad_to(a, w_pad, axis=3, value=value),
                       h_pad, axis=2, value=value)

    xi_p = pad_hw(xi)                                       # [N,D,Hp,Wp]
    yi_p = pad_hw(yi)
    fx_p = pad_hw(fx)
    fy_p = pad_hw(fy)
    valid_p = pad_hw(valid, value=False)

    # window bases per (sample, row-block, tile): min over depths + the
    # block's VALID pixels (padding lanes carry a large sentinel), clipped
    # so the window stays inside the padded source
    big = jnp.int32(10 ** 8)
    xi_t = jnp.where(valid_p, xi_p, big).reshape(
        n, d, hb, ROWS, t_tiles, TILE)
    yi_t = jnp.where(valid_p, yi_p, big).reshape(
        n, d, hb, ROWS, t_tiles, TILE)
    ws2 = ws + 2
    hs2 = hs + 2
    ws_pad = max(-(-ws2 // GATHER_W) * GATHER_W, WIN_W)
    win_k = min(WIN_K, hs2)          # window cannot exceed the source
    min_axes = (3, 5) if per_depth_windows else (1, 3, 5)
    bx = jnp.clip(jnp.min(xi_t, axis=min_axes), 0, ws_pad - WIN_W)
    # DMA lane offsets must be 128-aligned: align the base down (the extra
    # window columns guarantee coverage of the block's span)
    bx = (bx // GATHER_W) * GATHER_W
    by = jnp.clip(jnp.min(yi_t, axis=min_axes), 0, hs2 - win_k)
    bx = bx.astype(jnp.int32)
    by = by.astype(jnp.int32)
    packed = by * 65536 + bx      # SMEM-prefetch packing (by << 16 | bx)
    if per_depth_windows:
        # [N, D, HB, T] -> [D, T, N*HB]
        packed = packed.transpose(1, 3, 0, 2).reshape(d, t_tiles, n * hb)
    else:
        # [N, HB, T] -> [1, T, N*HB]
        packed = packed.transpose(2, 0, 1).reshape(1, t_tiles, n * hb)

    # channel-interleaved padded source rows: src_t[n, y*C + c, x]; f32
    # (the Mosaic lane-gather is 32-bit only)
    src_p = jnp.pad(src_fea.astype(jnp.float32),
                    ((0, 0), (1, 1), (1, 1), (0, 0)))
    src_t = src_p.transpose(0, 1, 3, 2).reshape(n, hs2 * c, ws2)
    src_t = _pad_to(src_t, ws_pad, axis=2)

    # per-tile inputs as [N*HB*T, D, ROWS, TILE]: the grid-mapped axis
    # leads so the last two block dims stay (8, 64)-shaped
    def tile_view(a, dtype):
        return (a.reshape(n, d, hb, ROWS, t_tiles, TILE)
                .transpose(0, 2, 4, 1, 3, 5)
                .reshape(n * hb * t_tiles, d, ROWS, TILE)
                .astype(dtype))

    spec = pl.BlockSpec((1, d, ROWS, TILE),
                        lambda nn, hh, tt, base_r:
                        ((nn * hb + hh) * t_tiles + tt, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, hb, t_tiles),
        in_specs=[spec, spec, spec, spec, spec,
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, d, ROWS, c, TILE),
            lambda nn, hh, tt, base_r:
            ((nn * hb + hh) * t_tiles + tt, 0, 0, 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((1, win_k * c, WIN_W), src_t.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )

    out = pl.pallas_call(
        _warp_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n * hb * t_tiles, d, ROWS, c, TILE), src_t.dtype),
        interpret=interpret,
    )(packed,
      tile_view(xi_p, jnp.int32), tile_view(yi_p, jnp.int32),
      tile_view(fx_p, jnp.float32), tile_view(fy_p, jnp.float32),
      tile_view(valid_p, jnp.int32) != 0,
      src_t)

    # [N*HB*T, D, ROWS, C, TILE] -> [N, D, H, W, C]
    out = out.reshape(n, hb, t_tiles, d, ROWS, c, TILE)
    out = out.transpose(0, 3, 1, 4, 2, 6, 5)    # [N,D,HB,ROWS,T,TILE,C]
    out = out.reshape(n, d, h_pad, w_pad, c)[:, :, :h, :w]
    return out


def window_miss_fraction(src_fea, src_pair, ref_pair, depth_values,
                         per_depth_windows: bool = False):
    """Fraction of valid samples whose corners fall outside the kernel's
    window — the kernel zeroes those; callers should fall back to the XLA
    path when this is non-negligible (DTU-style rigs measure 0)."""
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
    hb = -(-h // ROWS)
    h_pad = hb * ROWS

    def pad_hw(a, value=0):
        return _pad_to(_pad_to(a, w_pad, axis=2, value=value),
                       h_pad, axis=1, value=value)

    xi_p = pad_hw(xi).reshape(d, hb, ROWS, t_tiles, TILE)
    yi_p = pad_hw(yi).reshape(d, hb, ROWS, t_tiles, TILE)
    valid_p = pad_hw(valid, value=False).reshape(d, hb, ROWS, t_tiles, TILE)

    big = jnp.int32(10 ** 8)
    xs = jnp.where(valid_p, xi_p, big)
    ys = jnp.where(valid_p, yi_p, big)
    ws_pad = max(-(-(ws + 2) // GATHER_W) * GATHER_W, WIN_W)
    win_k = min(WIN_K, hs + 2)
    axes = (2, 4) if per_depth_windows else (0, 2, 4)
    kd = (slice(None),) if per_depth_windows else (None,)
    bx = jnp.clip(jnp.min(xs, axis=axes), 0, ws_pad - WIN_W)
    bx = (bx // GATHER_W) * GATHER_W
    by = jnp.clip(jnp.min(ys, axis=axes), 0, hs + 2 - win_k)
    bxe = bx[kd + (slice(None), None, slice(None), None)]
    bye = by[kd + (slice(None), None, slice(None), None)]
    in_win = ((xi_p - bxe <= WIN_W - 2) & (yi_p - bye <= win_k - 2)
              & (yi_p - bye >= 0) & (xi_p - bxe >= 0))
    miss = valid_p & ~in_win
    return jnp.sum(miss) / jnp.maximum(jnp.sum(valid_p), 1)
