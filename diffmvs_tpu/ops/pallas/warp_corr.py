"""Fused Pallas warp + group-correlation kernel (v2 of the banded warp).

Replaces the round-1 warp-only kernel (deleted; see git history and
docs/pallas_warp_plan.md) on the hot path. Differences
(each measured individually on v5e, see docs/perf_breakdown.md):

  1. **Fused group correlation**: the reference-feature tile rides along as
     a VMEM block and the kernel emits [D, ROWS, G, TILE] group-mean
     correlations directly (G = C/Cg, 4-12x smaller than the warped
     feature block), removing the HBM round-trip of the warped volume and
     the XLA fusion barrier behind it
     (parity: /root/reference/models/module.py:529-531,644-646).
  2. **Row-band sub-slicing**: per (depth, output-row) the bilinear
     corners of a 64-px tile span only a few source rows; an
     XLA-precomputed per-(d,r) row offset (scalar-prefetched) dynamic-
     slices a BAND_ROWS-row band out of the window, so the lane gather
     and the y-interpolation masked-sum run on [BAND_ROWS*C, 128]
     instead of [WIN_K*C, 128] (6x less VPU work at the defaults).
  3. **Double-buffered window DMAs**: windows stream through a 2-slot
     VMEM scratch; window w+1's copy is issued before w is consumed
     (the v1 kernel stalled on copy.start(); copy.wait() per step).
  4. **Parametric depth grouping** (`window_group`): one window per
     `window_group` consecutive depth planes. Refinement stages use one
     shared window (hypotheses are spatially close); full sweeps group
     adjacent planes (they advance gradually along the epipolar line),
     amortizing one DMA over the group.

Window/band misses are zeroed (the XLA path's zero-padding semantics
apply only to out-of-image samples — use `warp_corr_miss_fraction` /
the model's runtime guard to fall back to XLA on geometries where the
banding assumption fails; DTU-style rigs measure 0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diffmvs_tpu.geometry.transforms import relative_projection
from diffmvs_tpu.geometry.warp import plane_sweep_coords

TILE = 64          # output pixels per tile (lanes 0..63)
ROWS = 16          # output rows per grid step (16 measured best for the
                   # rowbatch kernel; the per-(d,r) kernels are neutral)
WIN_W = 256        # source window width (two 128-lane gather halves)
GATHER_W = 128     # Mosaic lane-gather width limit
WIN_K = 24         # source window rows per DMA
BAND_ROWS = 4      # rows gathered per (depth, output-row) band


def _corr_kernel(base_ref,      # scalar prefetch [NW, T, N*HB] (by<<16|bx)
                 rstart_ref,    # scalar prefetch [D, ROWS, T, N*HB]
                 xi_ref, yi_ref, fx_ref, fy_ref, vmask_ref,  # [1,D,ROWS,TILE]
                 ref_ref,       # [1, ROWS, C, TILE] reference-feature tile
                 src_hbm,       # ANY [N, (Hs+2)*CP, ws_pad]
                 out_ref,       # [1, D, ROWS, G, TILE]
                 win_ref, sem,  # VMEM (2*WIN_K*CP, WIN_W) + DMA sem (2,)
                 *, wg: int, win_k: int, groups: int, band: int,
                 packed: bool = False, skip: str = ""):
    """packed=True: source rows hold bf16 channel PAIRS bitcast to f32
    (CP = C/2 rows per source y) — half the gather rows and window DMA
    bytes; pairs are unpacked arithmetically (shift/mask + same-width
    bitcast) after the gather. ref_ref is then ordered evens||odds.
    skip: PERF-DEBUG ONLY (tools/bench_kernel.py) — 'gather' replaces the
    lane gather with a raw band read, 'interp' skips y/x interpolation;
    outputs are then WRONG, used to attribute kernel time."""
    n = pl.program_id(0)
    hb = pl.program_id(1)
    t = pl.program_id(2)
    num_hb = pl.num_programs(1)
    num_t = pl.num_programs(2)
    nhb = n * num_hb + hb
    step = nhb * num_t + t
    _, d_total, rows, g_total, _ = out_ref.shape
    c = ref_ref.shape[2]
    cp = c // 2 if packed else c               # source rows per image y
    cg = c // g_total
    kc = win_k * cp
    nw = -(-d_total // wg)                     # windows per grid step
    total_windows = pl.num_programs(0) * num_hb * num_t * nw

    def window_base(widx):
        """(n', bx, by) for global window index widx."""
        wi = widx % nw
        s = widx // nw
        tt = s % num_t
        nhb2 = s // num_t
        nn2 = nhb2 // num_hb
        packed = base_ref[wi, tt, nhb2]
        bx = pl.multiple_of(packed % 65536, GATHER_W)
        by = packed // 65536
        return nn2, bx, by

    def copy_for(widx):
        nn2, bx, by = window_base(widx)
        slot = jax.lax.rem(widx, 2)
        dst = win_ref.at[pl.ds(pl.multiple_of(slot * kc, 8), kc), :]
        return pltpu.make_async_copy(
            src_hbm.at[nn2, pl.ds(by * cp, kc), pl.ds(bx, WIN_W)],
            dst, sem.at[slot])

    @pl.when(step == 0)
    def _():
        copy_for(0).start()

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (band, 1, GATHER_W), 0)

    for d in range(d_total):
        wi = d // wg
        if d % wg == 0:
            widx = step * nw + wi
            @pl.when(widx + 1 < total_windows)
            def _():
                copy_for(widx + 1).start()
            copy_for(widx).wait()
            slot = jax.lax.rem(widx, 2)
            slot_base = pl.multiple_of(slot * kc, 8)
            _, bxv, byv = window_base(widx)

        for r in range(rows):
            xi = xi_ref[:, d, r, :]                        # [1, TILE] int32
            yi = yi_ref[:, d, r, :]
            fx = fx_ref[:, d, r, :]
            fy = fy_ref[:, d, r, :]
            valid_in = vmask_ref[:, d, r, :] != 0
            rs = rstart_ref[d, r, t, nhb]                  # band row offset

            lx = xi - bxv
            lyr = yi - byv - rs                            # band-relative y
            in_band = ((lx >= 0) & (lx <= WIN_W - 2)
                       & (lyr >= 0) & (lyr <= band - 2))
            valid = valid_in & in_band

            lxc = jnp.clip(lx, 0, WIN_W - 2)
            lyrc = jnp.clip(lyr, 0, band - 2)

            bandw = win_ref[pl.ds(
                pl.multiple_of(slot_base + rs * cp, 8), band * cp), :]
            band_lo = bandw[:, :GATHER_W]
            band_hi = bandw[:, GATHER_W:]

            # both x-corners in one gather pass: lanes [0,TILE) -> x0,
            # lanes [TILE,2*TILE) -> x0+1 of pixel (lane - TILE)
            lx2 = jnp.concatenate([lxc, lxc + 1], axis=1)  # [1, GATHER_W]
            idx = jnp.broadcast_to(lx2, (band * cp, GATHER_W))
            if skip == "gather":           # perf-debug: raw band read
                gv = band_lo + band_hi
            else:
                g_lo = jnp.take_along_axis(
                    band_lo, jnp.clip(idx, 0, GATHER_W - 1), axis=1)
                g_hi = jnp.take_along_axis(
                    band_hi, jnp.clip(idx - GATHER_W, 0, GATHER_W - 1),
                    axis=1)
                gv = jnp.where(idx < GATHER_W, g_lo, g_hi)

            # y-interp: band rows lyrc, lyrc+1 weighted (1-fy, fy)
            ly2 = jnp.concatenate([lyrc, lyrc], axis=1)    # [1, GATHER_W]
            fy2 = jnp.concatenate([fy, fy], axis=1)
            wk = (jnp.where(row_ids == ly2[None], 1.0 - fy2[None], 0.0)
                  + jnp.where(row_ids == ly2[None] + 1, fy2[None], 0.0))

            if packed:
                # unpack bf16 pairs: elem0 = low 16 bits shifted up,
                # elem1 = high 16 bits (masked) — both ARE valid f32s
                # (a bf16's f32 representation is its bits in the high
                # half); same-width bitcasts, cheap VPU int ops
                ints = jax.lax.bitcast_convert_type(gv, jnp.int32)
                gv_lo = jax.lax.bitcast_convert_type(
                    ints << 16, jnp.float32)
                gv_hi = jax.lax.bitcast_convert_type(
                    ints & jnp.int32(-65536), jnp.float32)
                gv_lo = gv_lo.reshape(band, cp, GATHER_W)
                gv_hi = gv_hi.reshape(band, cp, GATHER_W)
                wkv = wk.astype(gv_lo.dtype)
                s_lo = jnp.sum(gv_lo * wkv, axis=0)        # even channels
                s_hi = jnp.sum(gv_hi * wkv, axis=0)        # odd channels
                fxv = fx.astype(s_lo.dtype)
                vv = valid.astype(s_lo.dtype)
                out_lo = (s_lo[:, :TILE]
                          + (s_lo[:, TILE:] - s_lo[:, :TILE]) * fxv) * vv
                out_hi = (s_hi[:, :TILE]
                          + (s_hi[:, TILE:] - s_hi[:, :TILE]) * fxv) * vv
                # ref tile is ordered evens||odds along the channel dim;
                # pair j = channels (2j, 2j+1) stays inside group j//(cg/2)
                prod_lo = out_lo * ref_ref[0, r, :cp]
                prod_hi = out_hi * ref_ref[0, r, cp:]
                corr = (jnp.sum(prod_lo.reshape(g_total, cg // 2, TILE),
                                axis=1)
                        + jnp.sum(prod_hi.reshape(g_total, cg // 2, TILE),
                                  axis=1)) * (1.0 / cg)
            else:
                if skip == "interp":       # perf-debug: no y/x interp
                    outv = gv[:c, :TILE]
                else:
                    gv = gv.reshape(band, c, GATHER_W)
                    s = jnp.sum(gv * wk.astype(gv.dtype), axis=0)
                    left = s[:, :TILE]
                    right = s[:, TILE:]
                    outv = left + (right - left) * fx.astype(s.dtype)
                    outv = outv * valid.astype(s.dtype)    # [C, TILE]
                prod = outv * ref_ref[0, r]                # [C, TILE]
                corr = jnp.mean(prod.reshape(g_total, cg, TILE), axis=1)
            out_ref[0, d, r, :, :] = corr


def _corr_kernel_rowbatch(
        base_ref,      # scalar prefetch [NW, T, N*HB] (by<<16|bx)
        rstart_ref,    # scalar prefetch [T, N*HB, D*ROWS]
        rt_ref,        # scalar prefetch [N, 12] f32 (rot rows + trans)
        dv_ref,        # [1, D, ROWS, TILE] f32 metric depth hypotheses
        ref_ref,       # [1, ROWS, C, TILE]
        src_hbm,       # ANY [N, (Hs+2)*C, ws_pad]
        out_ref,       # [1, D, ROWS, G, TILE]
        win_ref, sem,
        *, wg: int, win_k: int, groups: int, band: int, hs: int, ws: int,
        h_out: int, w_out: int,
        dchunk: int = 1, win_w: int = WIN_W, packed: bool = False):
    """v2.2/v2.3: one fused tensor op chain per CHUNK of dchunk depth
    planes x all output rows, instead of per (depth, row). The v2 kernel
    issues ~15 small vector ops per (d, r) block; measurements
    (tools/bench_kernel.py: packed, band=2, rows=16 all ~neutral) show
    per-op issue overhead — not gather row count — dominates, so the
    bands of dchunk*ROWS blocks are concatenated into single
    [DCHUNK*ROWS*BAND*C, 128] gather / interp ops (fewer, larger).
    dchunk must divide the window group (all chunk members share one
    window); refinement shapes use dchunk=D (one window, one chain).
    win_w is WIN_W=256 everywhere (two aligned 128-lane gather halves).
    win_w=128 (single-gather narrow windows) is an EXPERIMENTAL/
    interpret-only mode: _window_geometry only 128-aligns the window
    base when win_w > GATHER_W, and Mosaic cannot DMA a window whose
    lane base is unaligned — warp_corr_pallas rejects win_w != WIN_W
    on hardware.
    Coordinates are computed IN-KERNEL from the depth block + the
    per-sample (rot, trans) scalars (same fma expression order as
    _tile_geometry's fusion inputs), then corners/fractions/validity
    derive as before — the only per-pixel operand is the depth tile,
    which is shared across all source views of a cost volume (the
    round-5 step after the tile-geometry fusion: the two f32 coord
    arrays were ~16.6 MB of per-launch DMA and ~1 GiB of HBM temps at
    B=16)."""
    n = pl.program_id(0)
    hb = pl.program_id(1)
    t = pl.program_id(2)
    num_hb = pl.num_programs(1)
    num_t = pl.num_programs(2)
    nhb = n * num_hb + hb
    step = nhb * num_t + t
    _, d_total, rows, g_total, _ = out_ref.shape
    c = ref_ref.shape[2]
    cg = c // g_total
    cp = c // 2 if packed else c       # source rows per image y
    kc = win_k * cp
    nw = -(-d_total // wg)
    total_windows = pl.num_programs(0) * num_hb * num_t * nw

    def window_base(widx):
        wi = widx % nw
        s = widx // nw
        tt = s % num_t
        nhb2 = s // num_t
        nn2 = nhb2 // num_hb
        packed = base_ref[wi, tt, nhb2]
        bx = packed % 65536
        if win_w > GATHER_W:
            bx = pl.multiple_of(bx, GATHER_W)
        by = packed // 65536
        return nn2, bx, by

    def copy_for(widx):
        nn2, bx, by = window_base(widx)
        slot = jax.lax.rem(widx, 2)
        dst = win_ref.at[pl.ds(pl.multiple_of(slot * kc, 8), kc), :]
        return pltpu.make_async_copy(
            src_hbm.at[nn2, pl.ds(by * cp, kc), pl.ds(bx, win_w)],
            dst, sem.at[slot])

    @pl.when(step == 0)
    def _():
        copy_for(0).start()

    bc = band * cp
    dk = max(1, min(dchunk, wg))
    tile = out_ref.shape[-1]

    for d0 in range(0, d_total, dk):
        dks = min(dk, d_total - d0)    # depths in this chunk
        wi = d0 // wg
        if d0 % wg == 0:
            widx = step * nw + wi
            @pl.when(widx + 1 < total_windows)
            def _():
                copy_for(widx + 1).start()
            copy_for(widx).wait()
            slot = jax.lax.rem(widx, 2)
            slot_base = pl.multiple_of(slot * kc, 8)
            _, bxv, byv = window_base(widx)

        nblk = dks * rows
        dr = [(d0 + i, r) for i in range(dks) for r in range(rows)]
        # in-register plane-sweep coords from the depth block + the
        # sample's projection scalars (mirrors _tile_geometry /
        # plane_sweep_coords' fma order); padded pixels are marked
        # explicitly invalid (-10), then corners/fractions/validity
        # derive exactly as _corner_split
        dv = dv_ref[0, d0:d0 + dks].reshape(nblk, tile)
        rr = jax.lax.broadcasted_iota(
            jnp.int32, (dks, rows, tile), 1).reshape(nblk, tile)
        ll = jax.lax.broadcasted_iota(
            jnp.int32, (dks, rows, tile), 2).reshape(nblk, tile)
        yi_px = hb * rows + rr
        xi_px = t * tile + ll
        xg = xi_px.astype(jnp.float32)
        yg = yi_px.astype(jnp.float32)
        px = ((rt_ref[n, 0] * xg + rt_ref[n, 1] * yg + rt_ref[n, 2])
              * dv + rt_ref[n, 9])
        py = ((rt_ref[n, 3] * xg + rt_ref[n, 4] * yg + rt_ref[n, 5])
              * dv + rt_ref[n, 10])
        pz = ((rt_ref[n, 6] * xg + rt_ref[n, 7] * yg + rt_ref[n, 8])
              * dv + rt_ref[n, 11])
        pz = jnp.where(pz == 0.0, 1e-8, pz)
        inb = (xi_px < w_out) & (yi_px < h_out)
        xf = jnp.where(inb, px / pz, -10.0)
        yf = jnp.where(inb, py / pz, -10.0)
        x0 = jnp.floor(xf)
        y0 = jnp.floor(yf)
        fx = xf - x0
        fy = yf - y0
        xi = x0.astype(jnp.int32) + 1
        yi = y0.astype(jnp.int32) + 1
        valid_in = ((xi >= 0) & (xi <= ws) & (yi >= 0) & (yi <= hs))
        xi = jnp.clip(xi, 0, ws)
        yi = jnp.clip(yi, 0, hs)

        # rowbatch rstart layout [T, N*HB, D*ROWS]: the large D*ROWS dim
        # is minor, so SMEM's pad-minor-to-128 doesn't blow the budget
        # at sweep depths (the [D,ROWS,T,N*HB] layout exceeded 1 MB SMEM
        # at D=48, rows=16)
        rsv = [rstart_ref[t, nhb, d * rows + r] for d, r in dr]

        # per-(d,r) band slices, concatenated into one [NBLK*BAND*CP, .]
        bands = jnp.concatenate([
            win_ref[pl.ds(pl.multiple_of(
                slot_base + rs * cp, 8), bc), :]
            for rs in rsv])                            # [NBLK*BC, win_w]

        rs_col = jnp.concatenate(
            [jnp.full((1, tile), rs, jnp.int32) for rs in rsv])

        lx = xi - bxv
        lyr = yi - byv - rs_col
        in_band = ((lx >= 0) & (lx <= win_w - 2)
                   & (lyr >= 0) & (lyr <= band - 2))
        valid = valid_in & in_band
        lxc = jnp.clip(lx, 0, win_w - 2)
        lyrc = jnp.clip(lyr, 0, band - 2)

        def gat(ii):
            """Lane-gather the bands at [NBLK, GATHER_W] indices."""
            idx = jnp.broadcast_to(ii[:, None, :],
                                   (nblk, bc, GATHER_W)).reshape(
                                       nblk * bc, GATHER_W)
            if win_w == GATHER_W:
                return jnp.take_along_axis(
                    bands, jnp.clip(idx, 0, GATHER_W - 1), axis=1
                ).reshape(nblk, band, cp, GATHER_W)
            g_lo = jnp.take_along_axis(
                bands[:, :GATHER_W],
                jnp.clip(idx, 0, GATHER_W - 1), axis=1)
            g_hi = jnp.take_along_axis(
                bands[:, GATHER_W:],
                jnp.clip(idx - GATHER_W, 0, GATHER_W - 1), axis=1)
            return jnp.where(idx < GATHER_W, g_lo, g_hi).reshape(
                nblk, band, cp, GATHER_W)

        def unpack(gv):
            """bf16 channel pairs bitcast in f32 words -> (even, odd)
            f32 planes: elem0 = low 16 bits shifted up, elem1 = high 16
            bits masked (a bf16's f32 representation is its bits in the
            high half) — same-width bitcasts, cheap VPU int ops."""
            iv = jax.lax.bitcast_convert_type(gv, jnp.int32)
            lo = jax.lax.bitcast_convert_type(
                jax.lax.shift_left(iv, jnp.int32(16)), jnp.float32)
            hi = jax.lax.bitcast_convert_type(
                jax.lax.bitwise_and(iv, jnp.int32(-65536)), jnp.float32)
            return lo, hi

        if tile == GATHER_W and packed:
            # packed full-width tiles: half the gather rows, band-slice
            # rows and window DMA bytes; pairs unpack AFTER the gather
            # (the y/x interp then runs per channel as usual). Channels
            # are ordered evens||odds (matching ref_ref's prep); group
            # sums recombine as evens-of-group + odds-of-group.
            rid = jax.lax.broadcasted_iota(
                jnp.int32, (nblk, band, 1, tile), 1)
            wk = (jnp.where(rid == lyrc[:, None, None, :],
                            1.0 - fy[:, None, None, :], 0.0)
                  + jnp.where(rid == lyrc[:, None, None, :] + 1,
                              fy[:, None, None, :], 0.0))
            wkv = wk.astype(jnp.float32)
            e0, o0 = unpack(gat(lxc))
            e1, o1 = unpack(gat(lxc + 1))
            fxv = fx[:, None, :]
            vmul = valid[:, None, :]
            s0 = jnp.sum(e0 * wkv, axis=1)             # [NBLK, CP, tile]
            s1 = jnp.sum(e1 * wkv, axis=1)
            outv_e = (s0 + (s1 - s0) * fxv) * vmul
            s0 = jnp.sum(o0 * wkv, axis=1)
            s1 = jnp.sum(o1 * wkv, axis=1)
            outv_o = (s0 + (s1 - s0) * fxv) * vmul
            refv = ref_ref[0].astype(jnp.float32)      # evens||odds
            if dks > 1:
                refv = jnp.concatenate([refv] * dks)
            pe = (outv_e * refv[:, :cp]).reshape(
                nblk, g_total, cg // 2, tile)
            po = (outv_o * refv[:, cp:]).reshape(
                nblk, g_total, cg // 2, tile)
            corr = (jnp.sum(pe, axis=2) + jnp.sum(po, axis=2)) / cg
            out_ref[0, d0:d0 + dks] = corr.reshape(dks, rows, g_total,
                                                   tile)
            continue

        if tile == GATHER_W:
            # full-width tiles: one gather per x-corner (same gathers
            # per pixel as the packed-corner layout, but every tail op
            # runs on all 128 lanes and windows serve 2x the pixels)
            rid = jax.lax.broadcasted_iota(
                jnp.int32, (nblk, band, 1, tile), 1)
            wk = (jnp.where(rid == lyrc[:, None, None, :],
                            1.0 - fy[:, None, None, :], 0.0)
                  + jnp.where(rid == lyrc[:, None, None, :] + 1,
                              fy[:, None, None, :], 0.0))
            wkv = wk.astype(jnp.float32)
            s0 = jnp.sum(gat(lxc) * wkv, axis=1)       # [NBLK, C, tile]
            s1 = jnp.sum(gat(lxc + 1) * wkv, axis=1)
            outv = s0 + (s1 - s0) * fx[:, None, :].astype(s0.dtype)
            outv = outv * valid[:, None, :].astype(s0.dtype)
        else:
            # packed corners: lanes [0,tile) -> x0, [tile,2*tile) -> x0+1
            lx2 = jnp.concatenate([lxc, lxc + 1], axis=1)
            gv = gat(lx2)
            ly2 = jnp.concatenate([lyrc, lyrc], axis=1)
            fy2 = jnp.concatenate([fy, fy], axis=1)
            rid = jax.lax.broadcasted_iota(
                jnp.int32, (nblk, band, 1, GATHER_W), 1)
            wk = (jnp.where(rid == ly2[:, None, None, :],
                            1.0 - fy2[:, None, None, :], 0.0)
                  + jnp.where(rid == ly2[:, None, None, :] + 1,
                              fy2[:, None, None, :], 0.0))
            s = jnp.sum(gv * wk.astype(gv.dtype), axis=1)
            left = s[..., :tile]
            right = s[..., tile:]
            outv = left + (right - left) * fx[:, None, :].astype(s.dtype)
            outv = outv * valid[:, None, :].astype(s.dtype)

        refv = ref_ref[0].astype(jnp.float32)          # [ROWS, C, tile]
        if dks > 1:
            refv = jnp.concatenate([refv] * dks)       # [NBLK, C, tile]
        prod = outv * refv
        corr = jnp.mean(prod.reshape(nblk, g_total, cg, tile), axis=2)
        out_ref[0, d0:d0 + dks] = corr.reshape(dks, rows, g_total, tile)


def _pad_to(x, size, axis, value=0):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _window_geometry(xi, yi, valid, d, h, w, hs, ws, wg, win_k, rows=ROWS,
                     band=BAND_ROWS, win_w=WIN_W, tile=TILE):
    """Window bases + per-(d,row) band offsets from padded integer corners.

    xi/yi/valid: [N, D, H, W] (already +1 padded-coord ints / bool).
    Returns (packed_bases [NW, T, N*HB], rstarts [D, rows, T, N*HB],
             dims (hb, t_tiles, ws_pad, nw)).
    """
    n = xi.shape[0]
    t_tiles = -(-w // tile)
    w_pad = t_tiles * tile
    hb = -(-h // rows)
    h_pad = hb * rows
    nw = -(-d // wg)

    def pad_hw(a, value=0):
        return _pad_to(_pad_to(a, w_pad, axis=3, value=value),
                       h_pad, axis=2, value=value)

    big = jnp.int32(10 ** 8)
    xi_p = pad_hw(xi)
    yi_p = pad_hw(yi)
    valid_p = pad_hw(valid, value=False)
    xs = jnp.where(valid_p, xi_p, big)
    ys = jnp.where(valid_p, yi_p, big)
    # group the depth axis into nw chunks of wg (sentinel-padded)
    xs = _pad_to(xs, nw * wg, axis=1, value=10 ** 8)
    ys = _pad_to(ys, nw * wg, axis=1, value=10 ** 8)
    xs = xs.reshape(n, nw, wg, hb, rows, t_tiles, tile)
    ys = ys.reshape(n, nw, wg, hb, rows, t_tiles, tile)

    ws2, hs2 = ws + 2, hs + 2
    ws_pad = max(-(-ws2 // GATHER_W) * GATHER_W, win_w)
    bx = jnp.clip(jnp.min(xs, axis=(2, 4, 6)), 0, ws_pad - win_w)
    if win_w > GATHER_W:
        # two-half windows gather each 128-lane half separately; the DMA
        # lane base must be 128-aligned so the halves split cleanly
        bx = (bx // GATHER_W) * GATHER_W
    by = jnp.clip(jnp.min(ys, axis=(2, 4, 6)), 0, hs2 - win_k)
    # [N, NW, HB, T] int32
    packed = (by * 65536 + bx).astype(jnp.int32)
    packed_t = packed.transpose(1, 3, 0, 2).reshape(nw, t_tiles, n * hb)

    # per-(d, row) band offset inside the window: min valid y of the
    # row's tile, relative to the group's by, clipped to the window
    ys_row = jnp.where(valid_p, yi_p, big).reshape(
        n, d, hb, rows, t_tiles, tile)
    row_min = jnp.min(ys_row, axis=5)                  # [N, D, HB, rows, T]
    by_full = jnp.repeat(by, wg, axis=1)[:, :d]        # [N, D, HB, T]
    rstart = jnp.clip(row_min - by_full[:, :, :, None, :], 0,
                      win_k - band).astype(jnp.int32)
    # [N, D, HB, rows, T] -> [D, rows, T, N*HB]
    rstart_t = rstart.transpose(1, 3, 4, 0, 2).reshape(
        d, rows, t_tiles, n * hb)
    return packed_t, rstart_t, (hb, t_tiles, w_pad, h_pad, ws_pad, nw)


def _tile_geometry(rot, trans, depth_values, hs, ws, wg, win_k,
                   rows=ROWS, band=BAND_ROWS, win_w=WIN_W, tile=TILE):
    """Plane-sweep coords + window geometry, directly in tile layout.

    Replaces plane_sweep_coords + _corner_split + _window_geometry on
    the rowbatch path. Those computed full-res coords in [N, D, H, W]
    layout, materialized padded int corner tensors, ran the window/band
    min-reductions over reshuffled axes, and finally 6-D-transposed the
    coords into the kernel's tile layout — measured ~95 ms of XLA glue
    + ~43 ms of coord prep per stage-3 refinement call at B=8 vs the
    kernel's own 139 ms (hwlogs/trace_stage3_b8.txt, round-5 trace
    attribution). Here everything is emitted in the kernel-native
    [N, HB, T, D, rows, tile] layout from broadcasted iotas + the
    per-sample affine projection, so the window/band minima reduce over
    MINOR axes of the producer loop and no transpose or padded int
    tensor ever materializes. Outputs are value-identical to the old
    path (same valid/min/clip semantics; coords differ only by the
    fma rounding of the 3x3 matmul, and padded pixels are marked
    invalid instead of carrying 0.0 coords — both discarded by the
    epilogue's [:h, :w] slice).

    rot: [N, 3, 3], trans: [N, 3]; depth_values: [N, D, H, W].
    Returns (dv_t [N*HB*T, D, rows, tile] f32 depth-tile kernel operand,
             packed bases [NW, T, N*HB] int32,
             rstarts [T, N*HB, D*rows] int32 (rowbatch layout),
             dims (hb, t_tiles, w_pad, h_pad, ws_pad, nw)).

    The per-pixel float coords are NOT returned: the rowbatch kernel
    recomputes them in-register from dv_t + the per-sample (rot, trans)
    scalars (the same fma expression order — a handful of VPU ops per
    element), so the two [N*HB*T, D, rows, tile] f32 coordinate arrays
    never materialize in HBM and never ride a per-launch DMA. Here they
    exist only as fusion inputs to the window/band min-reductions.
    """
    n, d, h, w = depth_values.shape
    t_tiles = -(-w // tile)
    w_pad = t_tiles * tile
    hb = -(-h // rows)
    h_pad = hb * rows
    nw = -(-d // wg)
    ws2, hs2 = ws + 2, hs + 2
    ws_pad = max(-(-ws2 // GATHER_W) * GATHER_W, win_w)

    # depth hypotheses in tile layout (shared across all source views of
    # a cost volume through XLA CSE — ONE relayout per call, where the
    # old path paid two [x, y] relayouts per view)
    dv = _pad_to(_pad_to(depth_values, w_pad, axis=3), h_pad, axis=2)
    dv_t = (dv.reshape(n, d, hb, rows, t_tiles, tile)
            .transpose(0, 2, 4, 1, 3, 5))    # [N, HB, T, D, rows, tile]

    shape6 = (n, hb, t_tiles, d, rows, tile)
    yi6 = (jax.lax.broadcasted_iota(jnp.int32, shape6, 1) * rows
           + jax.lax.broadcasted_iota(jnp.int32, shape6, 4))
    xi6 = (jax.lax.broadcasted_iota(jnp.int32, shape6, 2) * tile
           + jax.lax.broadcasted_iota(jnp.int32, shape6, 5))
    inb = (xi6 < w) & (yi6 < h)
    xg = xi6.astype(jnp.float32)
    yg = yi6.astype(jnp.float32)

    def bcast(v):                       # [N] -> [N,1,1,1,1,1]
        return v.reshape((n,) + (1,) * 5)

    # proj = (rot @ [X, Y, 1]) * depth + trans  (plane_sweep_coords)
    px = (bcast(rot[:, 0, 0]) * xg + bcast(rot[:, 0, 1]) * yg
          + bcast(rot[:, 0, 2])) * dv_t + bcast(trans[:, 0])
    py = (bcast(rot[:, 1, 0]) * xg + bcast(rot[:, 1, 1]) * yg
          + bcast(rot[:, 1, 2])) * dv_t + bcast(trans[:, 1])
    pz = (bcast(rot[:, 2, 0]) * xg + bcast(rot[:, 2, 1]) * yg
          + bcast(rot[:, 2, 2])) * dv_t + bcast(trans[:, 2])
    pz = jnp.where(pz == 0.0, 1e-8, pz)                # module.py:206
    # padded pixels get an explicitly-invalid coordinate (in-kernel
    # valid derivation then zeroes them; the old path's 0.0-padded
    # coords could gather real samples — equally discarded, less tidy)
    x = jnp.where(inb, px / pz, -10.0)
    y = jnp.where(inb, py / pz, -10.0)

    # integer corners + validity (exactly _corner_split, minus the
    # clip that only mattered where valid anyway)
    xi = jnp.floor(x).astype(jnp.int32) + 1
    yi = jnp.floor(y).astype(jnp.int32) + 1
    valid = (xi >= 0) & (xi <= ws) & (yi >= 0) & (yi <= hs)
    big = jnp.int32(10 ** 8)
    xs = jnp.where(valid, xi, big)
    ys = jnp.where(valid, yi, big)

    # per-(d, row, tile) band row minimum -> rstarts
    row_min = jnp.min(ys, axis=5)                  # [N, HB, T, D, rows]

    # per-(window-group, row-block, tile) window bases
    if d % wg:
        pad6 = [(0, 0)] * 6
        pad6[3] = (0, nw * wg - d)
        xs = jnp.pad(xs, pad6, constant_values=10 ** 8)
        ys = jnp.pad(ys, pad6, constant_values=10 ** 8)
    xs = xs.reshape(n, hb, t_tiles, nw, wg, rows, tile)
    ys = ys.reshape(n, hb, t_tiles, nw, wg, rows, tile)
    bx = jnp.clip(jnp.min(xs, axis=(4, 5, 6)), 0, ws_pad - win_w)
    if win_w > GATHER_W:
        bx = (bx // GATHER_W) * GATHER_W           # 128-aligned DMA base
    by = jnp.clip(jnp.min(ys, axis=(4, 5, 6)), 0, hs2 - win_k)
    packed = (by * 65536 + bx).astype(jnp.int32)   # [N, HB, T, NW]
    bases = packed.transpose(3, 2, 0, 1).reshape(nw, t_tiles, n * hb)

    by_full = jnp.repeat(by, wg, axis=3)[:, :, :, :d]   # [N, HB, T, D]
    rstart = jnp.clip(row_min - by_full[..., None], 0,
                      win_k - band).astype(jnp.int32)
    rstarts = (rstart.transpose(2, 0, 1, 3, 4)
               .reshape(t_tiles, n * hb, d * rows))

    dv_flat = dv_t.reshape(n * hb * t_tiles, d, rows, tile)
    dims = (hb, t_tiles, w_pad, h_pad, ws_pad, nw)
    return dv_flat, bases, rstarts, dims


def _corner_split(x, y, hs, ws):
    """Integer corners into the 1-padded source + fractions + validity,
    exactly matching the packed XLA path's semantics."""
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0).astype(jnp.float32)
    fy = (y - y0).astype(jnp.float32)
    xi = x0.astype(jnp.int32) + 1
    yi = y0.astype(jnp.int32) + 1
    valid = (xi >= 0) & (xi <= ws) & (yi >= 0) & (yi <= hs)
    xi = jnp.clip(xi, 0, ws)
    yi = jnp.clip(yi, 0, hs)
    return xi, yi, fx, fy, valid


def warp_corr_pallas(src_fea, ref_fea, src_pair, ref_pair, depth_values,
                     groups: int, window_group: int = 0,
                     win_k: int = WIN_K, rows: int = ROWS,
                     band: int = BAND_ROWS, packed=None, skip: str = "",
                     batch_rows: bool = True, win_w: int = 0,
                     tile: int = 0, chunk_cap: int = 4096,
                     batch_glue: bool = True, bwd: str = "recompute",
                     native_out: bool = False,
                     interpret: bool = False):
    """Fused plane-sweep warp + group correlation for one source view.

    src_fea/ref_fea: [N, Hs, Ws, C] / [N, H, W, C]; src_pair/ref_pair:
    [N, 2, 4, 4]; depth_values: [N, D, H, W] metric hypotheses.
    window_group: depth planes per DMA window (0 = one shared window for
    all D — refinement stages; full sweeps want ~8).
    packed: gather bf16 channel pairs as one 32-bit word (half the
    gather rows + window DMA bytes; sources are rounded to bf16).
    MEASURED NEUTRAL on v5e (per-op issue overhead dominates, not gather
    rows — tools/bench_kernel.py), so it defaults OFF; it also only
    exists on the per-(d,r) kernel, not the faster rowbatch one.
    Returns [N, D, H, W, G] float32 group-mean correlations
    (out-of-image / out-of-band samples contribute zeros).
    With native_out=True it instead returns the kernel-native 7-D
    layout [N, HB, T, D, rows, G, tile] (HB*rows >= H row blocks,
    T*tile >= W column tiles) WITH the row/col padding still present;
    consumers must slice/zero-weight the pad region. The only
    supported consumer is ops/pallas/warp_corr.aggregate_native_cost,
    which does exactly that — the custom-vjp backward crops the
    cotangent to [:H, :W], which is gradient-correct only while
    padded positions carry zero cotangents (true for
    aggregate_native_cost; any new direct consumer of the native
    layout must preserve this invariant or route through the
    aggregator).

    DIFFERENTIABLE: a custom_vjp makes the training path usable — the
    backward recomputes through the exact XLA path
    (ops/correlation.warp_and_correlate) and emits cotangents for
    src_fea and ref_fea only, matching the XLA path's gradient seam
    (plane-sweep coords are stop_gradient'ed, geometry/warp.py:60-61;
    parity: torch grid_sample fwd+bwd under the reference's no_grad
    projection, /root/reference/models/module.py:181-218). Projection
    matrices and depth hypotheses receive zero cotangents, exactly like
    the XLA path.
    """
    kwargs = dict(window_group=window_group, win_k=win_k, rows=rows,
                  band=band, packed=packed, skip=skip,
                  batch_rows=batch_rows, win_w=win_w, tile=tile,
                  chunk_cap=chunk_cap, native_out=native_out,
                  interpret=interpret)

    def impl(src, ref, sp, rp, dv):
        if batch_glue or src.shape[0] == 1:
            return _warp_corr_impl(src, ref, sp, rp, dv, groups, **kwargs)
        # A/B mode: fully per-sample calls (separate operand prep /
        # window geometry / epilogue per sample — the pre-r3 shape)
        return jnp.concatenate([
            _warp_corr_impl(src[j:j + 1], ref[j:j + 1], sp[j:j + 1],
                            rp[j:j + 1], dv[j:j + 1], groups, **kwargs)
            for j in range(src.shape[0])])

    @jax.custom_vjp
    def run(src, ref, sp, rp, dv):
        return impl(src, ref, sp, rp, dv)

    def run_fwd(src, ref, sp, rp, dv):
        return run(src, ref, sp, rp, dv), (src, ref, sp, rp, dv)

    def run_bwd(res, g):
        src, ref, sp, rp, dv = res
        if native_out:
            # cotangent arrives in the kernel-native layout
            # [N, HB, T, D, rows, G, tile]; every backward below wants
            # the standard [N, D, H, W, G]. Padded rows/cols carry zero
            # cotangents (the forward's consumers slice them away), so
            # the crop loses nothing.
            h, w = dv.shape[2], dv.shape[3]
            nb, hb_, tt_, dd_, rr_, gg_, tl_ = g.shape
            g = (g.transpose(0, 3, 1, 4, 2, 6, 5)
                 .reshape(nb, dd_, hb_ * rr_, tt_ * tl_, gg_)[:, :, :h, :w])
        # the Pallas backward mirrors the DEFAULT rowbatch forward
        # geometry (tile=128, win_w=256, batch_rows); a forward run in
        # an experimental variant zeroes a (slightly) different miss set,
        # so those fall back to the recompute backward
        default_geom = (batch_rows and not skip
                        and tile in (0, GATHER_W) and win_w in (0, WIN_W))
        if bwd == "pallas" and default_geom:
            # banded Pallas backward (gather for d_ref + MXU one-hot-
            # matmul scatter for d_src — warp_corr_bwd.py). Gradient OF
            # THE BANDED FORWARD: missed samples get zero cotangents,
            # exactly matching what this kernel's forward computed.
            from diffmvs_tpu.ops.pallas.warp_corr_bwd import (
                warp_corr_backward_pallas)

            ds, dr = warp_corr_backward_pallas(
                src, ref, sp, rp, dv, g.astype(jnp.float32), groups,
                window_group=window_group, win_k=win_k, rows=rows,
                band=band, interpret=interpret)
            return (ds.astype(src.dtype), dr.astype(ref.dtype),
                    jnp.zeros_like(sp), jnp.zeros_like(rp),
                    jnp.zeros_like(dv))
        # default "recompute": re-run the exact XLA warp+corr under
        # jax.vjp. (An "analytic" XLA gather+scatter mode existed and
        # measured strictly worse in training — 0.68 vs 1.47 samples/s,
        # docs/bench_r4.json — so it was removed in round 5.)
        from diffmvs_tpu.ops.correlation import warp_and_correlate

        _, vjp = jax.vjp(
            lambda s, r: warp_and_correlate(
                s, r, sp, rp, dv, groups).astype(jnp.float32),
            src, ref)
        ds, dr = vjp(g.astype(jnp.float32))
        return (ds, dr, jnp.zeros_like(sp), jnp.zeros_like(rp),
                jnp.zeros_like(dv))

    run.defvjp(run_fwd, run_bwd)
    return run(src_fea, ref_fea, src_pair, ref_pair, depth_values)


def _warp_corr_impl(src_fea, ref_fea, src_pair, ref_pair, depth_values,
                    groups: int, window_group: int = 0,
                    win_k: int = WIN_K, rows: int = ROWS,
                    band: int = BAND_ROWS, packed=None, skip: str = "",
                    batch_rows: bool = True, win_w: int = 0,
                    tile: int = 0, chunk_cap: int = 4096,
                    native_out: bool = False,
                    interpret: bool = False):
    n, hs, ws, c = src_fea.shape
    _, d, h, w = depth_values.shape
    assert c % groups == 0
    assert c % 8 == 0, "band sub-slice offsets need C % 8 == 0"
    if packed is None:
        # auto: bf16 sources ride the packed channel-pair rowbatch path
        # (half the gather rows, band-slice rows and window DMA bytes;
        # stage-3 refine measured 0.07 vs 0.53 ms/call) whenever its
        # shape preconditions hold
        packed = (src_fea.dtype == jnp.bfloat16 and c % 16 == 0
                  and (c // groups) % 2 == 0
                  and batch_rows and not skip and tile in (0, GATHER_W))
    assert not packed or (src_fea.dtype == jnp.bfloat16 and c % 16 == 0)
    cp = c // 2 if packed else c
    wg = d if window_group in (0, None) else min(window_group, d)
    win_k = min(win_k, hs + 2)
    use_rowbatch = batch_rows and not skip
    if packed and use_rowbatch:
        # packed rowbatch recombines group sums as evens+odds of each
        # group — needs an even number of channels per group
        assert (c // groups) % 2 == 0,             "packed rowbatch needs even channels-per-group"
    if tile == 0:
        # full-width 128-px tiles on the rowbatch kernel: same gathers
        # per pixel (one per corner instead of one packed), but every
        # tail op uses all 128 lanes and each window serves 2x pixels;
        # the per-(d,r) kernels only implement packed 64-px corners
        tile = GATHER_W if use_rowbatch else TILE
    assert tile in (TILE, GATHER_W)
    assert use_rowbatch or tile == TILE
    if win_w == 0:
        # win_w=GATHER_W (narrow single-gather windows) would save one
        # take + select per chunk, but the HBM->VMEM window DMA requires
        # a 128-aligned lane base ("tile index divisible by the tiling")
        # — an unaligned 128 window cannot be DMA'd, and re-aligning via
        # an in-kernel dynamic lane roll costs about what it saves.
        # Default stays the aligned two-half 256 window.
        win_w = WIN_W

    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    # narrow (single-half) windows are interpret-only: _window_geometry
    # only 128-aligns the window base when win_w > GATHER_W, and Mosaic
    # cannot DMA a window with an unaligned lane base on hardware
    assert interpret or win_w == WIN_W, \
        "win_w != WIN_W is an interpret-only experimental mode"

    rot, trans = relative_projection(src_pair, ref_pair)
    if use_rowbatch:
        # coords + window geometry fused in tile layout (no full-res
        # transposes / padded int tensors — see _tile_geometry)
        dv_t, bases, rstarts, dims = _tile_geometry(
            rot, trans, depth_values, hs, ws, wg, win_k, rows, band,
            win_w, tile)
    else:
        x, y = plane_sweep_coords(rot, trans, depth_values)
        xi, yi, fx, fy, valid = _corner_split(x, y, hs, ws)
        bases, rstarts, dims = _window_geometry(
            xi, yi, valid, d, h, w, hs, ws, wg, win_k, rows, band,
            win_w, tile)
    hb, t_tiles, w_pad, h_pad, ws_pad, nw = dims

    def pad_hw(a, value=0):
        return _pad_to(_pad_to(a, w_pad, axis=3, value=value),
                       h_pad, axis=2, value=value)

    # channel-interleaved padded source rows: src_t[n, y*CP + cr, x]; the
    # Mosaic lane-gather is 32-bit only, so rows are either f32 channels
    # or (packed) bf16 channel pairs bitcast into one f32 word each
    if packed:
        src_p = jnp.pad(src_fea.astype(jnp.bfloat16),
                        ((0, 0), (1, 1), (1, 1), (0, 0)))
        src_p = jax.lax.bitcast_convert_type(
            src_p.reshape(n, hs + 2, ws + 2, cp, 2), jnp.float32)
    else:
        src_p = jnp.pad(src_fea.astype(jnp.float32),
                        ((0, 0), (1, 1), (1, 1), (0, 0)))
    src_t = src_p.transpose(0, 1, 3, 2).reshape(n, (hs + 2) * cp, ws + 2)
    src_t = _pad_to(src_t, ws_pad, axis=2)

    # reference tiles [N*HB*T, rows, C, TILE] matching the output layout;
    # packed mode orders channels evens||odds to align with pair rows.
    # bf16 sources stay bf16 through the DMA (the f32 upcast happens
    # in-kernel — exact, and it halves the fattest per-launch operand:
    # ~33 MB f32 -> 16.5 MB at stage-3 B=16); f32 sources keep f32 so
    # non-bf16 configs lose no precision.
    ref_hw = (ref_fea if ref_fea.dtype == jnp.bfloat16
              else ref_fea.astype(jnp.float32))
    if packed:
        ref_hw = jnp.concatenate([ref_hw[..., 0::2], ref_hw[..., 1::2]],
                                 axis=-1)
    ref_t = _pad_to(_pad_to(ref_hw, w_pad, axis=2), h_pad, axis=1)
    ref_t = (ref_t.reshape(n, hb, rows, t_tiles, tile, c)
             .transpose(0, 1, 3, 2, 5, 4)
             .reshape(n * hb * t_tiles, rows, c, tile))

    def tile_view(a, dtype):
        return (pad_hw(a).reshape(n, d, hb, rows, t_tiles, tile)
                .transpose(0, 2, 4, 1, 3, 5)
                .reshape(n * hb * t_tiles, d, rows, tile)
                .astype(dtype))

    spec = pl.BlockSpec((1, d, rows, tile),
                        lambda nn, hh, tt, *_:
                        ((nn * hb + hh) * t_tiles + tt, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    ref_spec = pl.BlockSpec((1, rows, c, tile),
                            lambda nn, hh, tt, *_:
                            ((nn * hb + hh) * t_tiles + tt, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (1, d, rows, groups, tile),
        lambda nn, hh, tt, *_:
        ((nn * hb + hh) * t_tiles + tt, 0, 0, 0, 0),
        memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((2 * win_k * cp, win_w), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    ]

    assert use_rowbatch or win_w == WIN_W, \
        "narrow windows are a rowbatch-kernel feature"
    if use_rowbatch:
        # fold as many depth planes per op chain as fit `chunk_cap`
        # gather rows (VMEM + vector-op size sweet spot); chunks must
        # divide the window group so a chunk never crosses a window
        # boundary. 4096 was tuned at C=16 (stage-3); C=48 sweeps get
        # dchunk=1 there — tools/bench_kernel.py sweeps this
        dk_cap = max(1, chunk_cap // (rows * band * cp))
        dchunk = max(x for x in range(1, wg + 1)
                     if wg % x == 0 and x <= dk_cap)
        kernel = functools.partial(_corr_kernel_rowbatch, wg=wg,
                                   win_k=win_k, groups=groups, band=band,
                                   hs=hs, ws=ws, h_out=h, w_out=w,
                                   dchunk=dchunk,
                                   win_w=win_w, packed=packed)
        # rstarts already in the rowbatch [T, N*HB, D*rows] layout
        # (large dim minor; see kernel docstring re SMEM padding).
        # Per-pixel operand = the depth tile only; coords (and then
        # corners/fractions/validity) derive in-kernel from the
        # per-sample projection scalars
        rt = jnp.concatenate(
            [rot.reshape(n, 9), trans.reshape(n, 3)],
            axis=1).astype(jnp.float32)              # [N, 12]
        scalars = (bases, rstarts, rt)
        operands = (dv_t,)
        in_specs = [spec, ref_spec,
                    pl.BlockSpec(memory_space=pl.ANY)]
    else:
        kernel = functools.partial(_corr_kernel, wg=wg, win_k=win_k,
                                   groups=groups, band=band,
                                   packed=packed, skip=skip)
        scalars = (bases, rstarts)
        operands = (tile_view(xi, jnp.int32),
                    tile_view(yi, jnp.int32),
                    tile_view(fx, jnp.float32),
                    tile_view(fy, jnp.float32),
                    tile_view(valid.astype(jnp.int32), jnp.int32) != 0)
        in_specs = [spec, spec, spec, spec, spec, ref_spec,
                    pl.BlockSpec(memory_space=pl.ANY)]

    def launch(n_launch, scalars_l, operands_l, ref_l, src_l):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=len(scalars_l),
            grid=(n_launch, hb, t_tiles),
            in_specs=in_specs,
            out_specs=out_spec,
            scratch_shapes=scratch,
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (n_launch * hb * t_tiles, d, rows, groups, tile),
                jnp.float32),
            interpret=interpret,
        )(*scalars_l, *operands_l, ref_l, src_l)

    if n == 1:
        # (An N-wide-grid single-launch variant was measured NEUTRAL
        # end-to-end at B=8 — docs/bench_r5.json warp_grid_launch row —
        # and removed; per-sample launches pipeline better in isolation,
        # stage-3 6.0 vs 9.2 ms, docs/perf_breakdown.md.)
        out = launch(n, scalars, operands, ref_t, src_t)
    else:
        # batched call: ONE shared operand prep / window geometry /
        # epilogue for all N samples, but one pallas_call per sample —
        # per-sample launches pipeline better than an N-wide grid
        # (stage-3: 6.0 vs 9.2 ms, docs/perf_breakdown.md), while the
        # per-(view,sample) XLA glue was ~6x the kernel time
        # (tools/bench_kernel.py packed=0.18 ms vs ~1.2 ms glue).
        outs = []
        for j in range(n):
            row = slice(j * hb, (j + 1) * hb)
            blk = slice(j * hb * t_tiles, (j + 1) * hb * t_tiles)
            bases_j = bases[:, :, row]
            rstarts_j = (rstarts[:, row, :] if use_rowbatch
                         else rstarts[:, :, :, row])
            scalars_j = ((bases_j, rstarts_j, rt[j:j + 1])
                         if use_rowbatch else (bases_j, rstarts_j))
            operands_j = tuple(o[blk] for o in operands)
            outs.append(launch(1, scalars_j, operands_j,
                               ref_t[blk], src_t[j:j + 1]))
        out = jnp.concatenate(outs)

    out = out.reshape(n, hb, t_tiles, d, rows, groups, tile)
    if native_out:
        # kernel-native layout [N, HB, T, D, rows, G, tile]: callers that
        # aggregate several views (local_cost_volume) weight-sum in this
        # layout and pay ONE relayout for the aggregate instead of one
        # 6-D transpose per view (aggregate_native_cost below). Padded
        # rows/cols ride along; the final cost relayout slices them off.
        return out
    # [N, HB, T, D, rows, G, tile] -> [N, D, H, W, G]
    out = out.transpose(0, 3, 1, 4, 2, 6, 5)
    out = out.reshape(n, d, h_pad, w_pad, groups)[:, :, :h, :w]
    return out


def aggregate_native_cost(cors, view_weights, h, w):
    """View-weighted cost tensor from kernel-native correlations.

    cors: [V, N, HB, T, D, rows, G, tile] stacked `native_out=True`
    results (cast to the compute dtype by the caller, matching the
    standard path's per-view cast). view_weights: [V, N, H, W].
    Returns cost [N, h, w, G*D] with channel = g*D + d — identical
    values to aggregate_views (ops/correlation.py:47) followed by the
    reference's [B, G*D, H, W] channel flattening (module.py:665-666),
    but computed in the kernel's native layout: one relayout AFTER the
    weighted mean instead of one 6-D transpose per source view before
    it (the per-view epilogue transposes were ~12 ms per stage-3 cost
    volume in the round-3 trace, docs/perf_breakdown.md)."""
    v, n, hb, tt, d, rows, g, tile = cors.shape
    h_pad, w_pad = hb * rows, tt * tile
    vw = _pad_to(_pad_to(view_weights, w_pad, axis=3), h_pad, axis=2)
    vw = (vw.reshape(v, n, hb, rows, tt, tile)
          .transpose(0, 1, 2, 4, 3, 5))            # [V,N,HB,T,rows,tile]
    wb = vw[:, :, :, :, None, :, None, :]       # [V,N,HB,T,1,rows,1,tile]
    num = jnp.sum(cors * wb, axis=0)
    den = jnp.sum(wb, axis=0) + 1e-8                   # module.py:515
    agg = num / den                             # [N,HB,T,D,rows,G,tile]
    return (agg.transpose(0, 1, 4, 2, 6, 5, 3)  # [N,HB,rows,T,tile,G,D]
            .reshape(n, h_pad, w_pad, g * d)[:, :h, :w])


def model_miss_fraction(proj_matrices, depth_values, height, width,
                        stage_iters=(1, 3, 3), numdepth_initial: int = 0):
    """Conservative banding-miss estimate for one view-set (sample 0).

    Checks, per refinement stage and source view, the window/band miss
    fraction of 8 hypothesis planes spanning the full depth range with
    2-plane shared windows — a strictly wider spread than any
    confidence-adaptive refinement window, so a 0 here implies the real
    kernel drops nothing. With numdepth_initial > 0 the stage-1 full
    sweep (8-plane window groups, the "pallas_full" path) is included.

    proj_matrices: {stageK: [B, V, 2, 4, 4]}; depth_values: [B, ND]
    inverse-depth linspace; height/width: full image resolution.
    Returns a scalar in [0, 1]; jit-friendly (coords math only). The
    caller (cli/test.py, DepthRunner) falls back to warp_kernel="xla"
    when this is non-negligible — the XLA path reproduces
    grid_sample's exact zero-padding semantics everywhere
    (/root/reference/models/module.py:212-215)."""
    checks = []
    if numdepth_initial:
        # sweep path: grouped two-half 256 windows
        checks.append(("stage1", 8, numdepth_initial, 8, WIN_W))
    for stage_idx, key, down in ((1, "stage2", 4), (2, "stage3", 2)):
        if stage_iters[stage_idx] > 0:
            checks.append((key, down, 8, 2, WIN_W))

    disp = depth_values[0].astype(jnp.float32)
    miss = jnp.float32(0.0)
    for key, down, n_planes, wgrp, ww in checks:
        h, w = height // down, width // down
        inv = jnp.linspace(disp[0], disp[-1], n_planes)
        planes = jnp.broadcast_to(
            (1.0 / inv).reshape(1, n_planes, 1, 1), (1, n_planes, h, w))
        dummy_src = jnp.zeros((1, h, w, 8), jnp.float32)
        projs = proj_matrices[key].astype(jnp.float32)
        v = projs.shape[1]
        for i in range(1, v):
            m = warp_corr_miss_fraction(
                dummy_src, projs[:1, i], projs[:1, 0], planes,
                window_group=wgrp, win_w=ww)
            miss = jnp.maximum(miss, m)
    return miss


def warp_corr_miss_fraction(src_fea, src_pair, ref_pair, depth_values,
                            window_group: int = 0, win_k: int = WIN_K,
                            rows: int = ROWS, band: int = BAND_ROWS,
                            win_w: int = 0, tile: int = 0):
    """Fraction of in-image bilinear samples the banded kernel would zero
    (outside its window OR outside the per-row band). Callers must fall
    back to the XLA path when this is non-negligible for their geometry
    (DTU-style rigs measure 0) — see CasDiffMVS's runtime guard."""
    n, hs, ws, _ = src_fea.shape
    _, d, h, w = depth_values.shape
    wg = d if window_group in (0, None) else min(window_group, d)
    win_k = min(win_k, hs + 2)
    if win_w == 0:      # mirror warp_corr_pallas's defaults
        win_w = WIN_W
    if tile == 0:
        tile = GATHER_W     # the rowbatch kernel's full-width tiles

    rot, trans = relative_projection(src_pair, ref_pair)
    x, y = plane_sweep_coords(rot, trans, depth_values)
    xi, yi, fx, fy, valid = _corner_split(x, y, hs, ws)
    packed, rstarts, dims = _window_geometry(
        xi, yi, valid, d, h, w, hs, ws, wg, win_k, rows, band, win_w,
        tile)
    hb, t_tiles, w_pad, h_pad, ws_pad, nw = dims

    def pad_hw(a, value=0):
        return _pad_to(_pad_to(a, w_pad, axis=3, value=value),
                       h_pad, axis=2, value=value)

    xi_p = pad_hw(xi).reshape(n, d, hb, rows, t_tiles, tile)
    yi_p = pad_hw(yi).reshape(n, d, hb, rows, t_tiles, tile)
    valid_p = pad_hw(valid, value=False).reshape(
        n, d, hb, rows, t_tiles, tile)

    bx = (packed % 65536).reshape(nw, t_tiles, n, hb)
    by = (packed // 65536).reshape(nw, t_tiles, n, hb)
    # [NW, T, N, HB] -> [N, NW, HB, T] -> repeat depth
    bx = jnp.repeat(bx.transpose(2, 0, 3, 1), wg, axis=1)[:, :d]
    by = jnp.repeat(by.transpose(2, 0, 3, 1), wg, axis=1)[:, :d]
    # rstarts [D, rows, T, N*HB] -> [N, D, HB, rows, T]
    rs = rstarts.reshape(d, rows, t_tiles, n, hb).transpose(3, 0, 4, 1, 2)

    lx = xi_p - bx[:, :, :, None, :, None]
    lyr = (yi_p - by[:, :, :, None, :, None]
           - rs[:, :, :, :, :, None])
    in_band = ((lx >= 0) & (lx <= win_w - 2)
               & (lyr >= 0) & (lyr <= band - 2))
    miss = valid_p & ~in_band
    return jnp.sum(miss) / jnp.maximum(jnp.sum(valid_p), 1)
