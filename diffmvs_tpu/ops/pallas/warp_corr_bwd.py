"""Banded Pallas BACKWARD for the fused warp+group-correlation kernel.

Emits the feature cotangents of warp_corr_pallas directly on the TPU
(parity: the VJP of torch F.grid_sample + group correlation,
/root/reference/models/module.py:181-218,529-531):

  d_ref[p,c] = (1/Cg) sum_d g[d,p,grp(c)] * warped[d,p,c]
  d_src[q,c] = sum_{d,p} bilinear_w(q; d,p) * (1/Cg) g[d,p,grp(c)] * ref[p,c]

Both ride the forward kernel's banded window structure (one grid step
per (sample, row-band, tile, depth-window); double-buffered window
DMAs; per-(d,row) band sub-slices):

  * d_ref reuses the forward's lane GATHER for the warped features and
    accumulates sum_d g*warped/Cg across the nw (innermost) grid steps
    into a resident [ROWS, C, TILE] output block.
  * d_src is a SCATTER, done on the MXU instead of lane-scatter (which
    Mosaic doesn't have): per depth plane, the bilinear corner weights
    become one-hot matrices and three matmuls place the cotangent
    values into the window —
      vb[b*c, t]   = wy(one-hot over band rows) * (g_exp * ref / Cg)
      C[nblk, b*c, w] = vb @ Bx          (Bx = x-corner one-hots, [t,w])
      D[win_k, c*w]   = P^T @ C          (P = band->window-row one-hots)
    and D accumulates into a per-window [WIN_K*C, WIN_W] output block.
    The caller adds the per-window blocks back into the padded source
    image with a sequential lax.fori_loop of dynamic-slice adds (the
    windows overlap, so the in-kernel blocks must stay disjoint).

Gradient semantics match the Pallas FORWARD: samples the banded forward
zeroes (window/band misses) get zero cotangents. On miss=0 geometries
(DTU-style rigs; the model's runtime guard checks this) this equals the
XLA path's gradient exactly — tests/test_gradients.py asserts it.

f32-only (inputs are cast); packed bf16 gather is a forward-bandwidth
optimization that doesn't pay here (the scatter matmuls dominate).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diffmvs_tpu.geometry.transforms import relative_projection
from diffmvs_tpu.geometry.warp import plane_sweep_coords
from diffmvs_tpu.ops.pallas.warp_corr import (
    BAND_ROWS,
    GATHER_W,
    ROWS,
    WIN_K,
    WIN_W,
    _corner_split,
    _pad_to,
    _window_geometry,
)


def _bwd_kernel(base_ref,      # scalar prefetch [NW, T, N*HB] (by<<16|bx)
                rstart_ref,    # scalar prefetch [T, N*HB, DP*ROWS]
                xf_ref, yf_ref,  # [1, 1, WG, ROWS, TILE] float sample coords
                g_ref,         # [1, 1, WG, ROWS, G, TILE] output cotangent
                ref_ref,       # [1, ROWS, C, TILE]
                src_hbm,       # ANY [N, (Hs+2)*C, ws_pad]
                dref_ref,      # out [1, ROWS, C, TILE] (resident over nw)
                dsrc_ref,      # out [1, WIN_K*C, WIN_W] (one per window)
                win_ref, sem,  # VMEM (2*WIN_K*C, WIN_W) + DMA sem (2,)
                *, wg: int, win_k: int, groups: int, band: int,
                hs: int, ws: int, win_w: int = WIN_W,
                batched_dot: bool = True):
    n = pl.program_id(0)
    hb = pl.program_id(1)
    t = pl.program_id(2)
    wi = pl.program_id(3)
    num_hb = pl.num_programs(1)
    num_t = pl.num_programs(2)
    nw = pl.num_programs(3)
    nhb = n * num_hb + hb
    step = (nhb * num_t + t) * nw + wi          # == global window index
    total_windows = pl.num_programs(0) * num_hb * num_t * nw

    _, _, _, rows, g_total, tile = g_ref.shape
    c = ref_ref.shape[2]
    cg = c // g_total
    kc = win_k * c

    def window_base(widx):
        wwi = widx % nw
        s = widx // nw
        tt = s % num_t
        nhb2 = s // num_t
        nn2 = nhb2 // num_hb
        packed = base_ref[wwi, tt, nhb2]
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
            src_hbm.at[nn2, pl.ds(by * c, kc), pl.ds(bx, win_w)],
            dst, sem.at[slot])

    @pl.when(step == 0)
    def _():
        copy_for(0).start()

    @pl.when(step + 1 < total_windows)
    def _():
        copy_for(step + 1).start()
    copy_for(step).wait()
    slot = jax.lax.rem(step, 2)
    slot_base = pl.multiple_of(slot * kc, 8)
    _, bxv, byv = window_base(step)

    @pl.when(wi == 0)
    def _():
        dref_ref[...] = jnp.zeros_like(dref_ref)
    dsrc_ref[...] = jnp.zeros_like(dsrc_ref)

    bc = band * c
    nblk = rows                                  # one depth plane at a time

    for i in range(wg):
        # depth plane i of THIS window's operand blocks (= global plane
        # wi*wg + i; padded planes carry g == 0, so they contribute
        # nothing to either cotangent)
        dslot = wi * wg + i                              # rstart index
        xf = xf_ref[0, 0, i].astype(jnp.float32)         # [rows, tile]
        yf = yf_ref[0, 0, i].astype(jnp.float32)
        x0 = jnp.floor(xf)
        y0 = jnp.floor(yf)
        fx = xf - x0
        fy = yf - y0
        xi = x0.astype(jnp.int32) + 1
        yi = y0.astype(jnp.int32) + 1
        valid_in = ((xi >= 0) & (xi <= ws) & (yi >= 0) & (yi <= hs))
        xi = jnp.clip(xi, 0, ws)
        yi = jnp.clip(yi, 0, hs)

        rsv = [rstart_ref[t, nhb, dslot * rows + r] for r in range(rows)]
        bands = jnp.concatenate([
            win_ref[pl.ds(pl.multiple_of(slot_base + rs * c, 8), bc), :]
            for rs in rsv])                              # [rows*BC, win_w]
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
            idx = jnp.broadcast_to(ii[:, None, :],
                                   (nblk, bc, GATHER_W)).reshape(
                                       nblk * bc, GATHER_W)
            g_lo = jnp.take_along_axis(
                bands[:, :GATHER_W],
                jnp.clip(idx, 0, GATHER_W - 1), axis=1)
            g_hi = jnp.take_along_axis(
                bands[:, GATHER_W:],
                jnp.clip(idx - GATHER_W, 0, GATHER_W - 1), axis=1)
            return jnp.where(idx < GATHER_W, g_lo, g_hi).reshape(
                nblk, band, c, GATHER_W)

        # y-interp weights over the band rows — shared by the gather
        # (d_ref) and the scatter values' placement (d_src)
        rid = jax.lax.broadcasted_iota(jnp.int32, (nblk, band, 1, tile), 1)
        wk = (jnp.where(rid == lyrc[:, None, None, :],
                        1.0 - fy[:, None, None, :], 0.0)
              + jnp.where(rid == lyrc[:, None, None, :] + 1,
                          fy[:, None, None, :], 0.0))    # [rows,band,1,t]

        # ---- d_ref: gather warped, weight by g ----
        s0 = jnp.sum(gat(lxc) * wk, axis=1)              # [rows, c, tile]
        s1 = jnp.sum(gat(lxc + 1) * wk, axis=1)
        warped = s0 + (s1 - s0) * fx[:, None, :]
        warped = warped * valid[:, None, :].astype(jnp.float32)

        gplane = g_ref[0, 0, i].astype(jnp.float32)      # [rows, G, tile]
        gexp = jnp.broadcast_to(
            gplane[:, :, None, :],
            (rows, g_total, cg, tile)).reshape(rows, c, tile) * (1.0 / cg)
        dref_ref[0] += gexp * warped

        # ---- d_src: scatter v = gexp * ref through the corner weights
        v = gexp * ref_ref[0]                            # [rows, c, tile]
        vb = (wk * v[:, None]).reshape(nblk, band * c, tile)

        wid = jax.lax.broadcasted_iota(jnp.int32, (nblk, tile, win_w), 2)
        vv = valid.astype(jnp.float32)
        bx_w = (jnp.where(wid == lxc[:, :, None], (1.0 - fx * 1.0)[..., None], 0.0)
                + jnp.where(wid == lxc[:, :, None] + 1, fx[..., None], 0.0))
        bx_w = bx_w * vv[:, :, None]                     # [rows, t, win_w]

        if batched_dot:
            cmat = jax.lax.dot_general(
                vb, bx_w, (((2,), (1,)), ((0,), (0,))),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)      # [rows, b*c, w]
        else:
            # fallback if Mosaic rejects batch dims on tpu.matmul: a
            # static python unroll of per-row 2D dots
            cmat = jnp.stack([
                jax.lax.dot_general(
                    vb[r], bx_w[r], (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
                for r in range(nblk)])

        # place band rows at window rows rs+b: P one-hot, D = P^T @ C.
        # pos is built directly at [nblk*band, 1] — a [nblk, band] ->
        # [nblk*band, 1] reshape is a cross-lane relayout Mosaic rejects
        # ("unsupported shape cast", seen on hardware)
        boff = jax.lax.broadcasted_iota(jnp.int32, (band, 1), 0)
        pos = jnp.concatenate([boff + rs for rs in rsv])
        kid = jax.lax.broadcasted_iota(
            jnp.int32, (nblk * band, win_k), 1)
        pmat = (kid == pos).astype(jnp.float32)

        c2 = cmat.reshape(nblk * band, c * win_w)
        # HIGHEST: the MXU's default f32 handling rounds operands to
        # bf16 (one pass), which costs ~3e-3 rel err in the gradients on
        # hardware; these dots are the d_src scatter's numeric core
        d_win = jax.lax.dot_general(
            pmat, c2, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)          # [win_k, c*w]
        dsrc_ref[0] += d_win.reshape(kc, win_w)


def warp_corr_backward_pallas(src_fea, ref_fea, src_pair, ref_pair,
                              depth_values, g, groups: int,
                              window_group: int = 0, win_k: int = WIN_K,
                              rows: int = ROWS, band: int = BAND_ROWS,
                              batched_dot: bool = True,
                              interpret: bool = False):
    """Feature cotangents (d_src, d_ref) of warp_corr_pallas, on-device.

    Same signature geometry as the forward; g is the [N, D, H, W, G]
    cotangent of the correlation output. Returns
    (d_src [N,Hs,Ws,C] f32, d_ref [N,H,W,C] f32). Gradient semantics
    match the banded forward (missed samples contribute zeros).
    """
    n, hs, ws, c = src_fea.shape
    _, d, h, w = depth_values.shape
    assert c % groups == 0 and c % 8 == 0
    wg = d if window_group in (0, None) else min(window_group, d)
    win_k = min(win_k, hs + 2)
    win_w = WIN_W
    tile = GATHER_W
    if not interpret and jax.default_backend() != "tpu":
        interpret = True

    rot, trans = relative_projection(src_pair, ref_pair)
    x, y = plane_sweep_coords(rot, trans, depth_values)
    xi, yi, fx, fy, valid = _corner_split(x, y, hs, ws)
    bases, rstarts, dims = _window_geometry(
        xi, yi, valid, d, h, w, hs, ws, wg, win_k, rows, band, win_w,
        tile)
    hb, t_tiles, w_pad, h_pad, ws_pad, nw = dims
    dp = nw * wg                                 # depth padded to windows

    def pad_hw(a, value=0.0):
        return _pad_to(_pad_to(a, w_pad, axis=3, value=value),
                       h_pad, axis=2, value=value)

    src_p = jnp.pad(src_fea.astype(jnp.float32),
                    ((0, 0), (1, 1), (1, 1), (0, 0)))
    src_t = src_p.transpose(0, 1, 3, 2).reshape(n, (hs + 2) * c, ws + 2)
    src_t = _pad_to(src_t, ws_pad, axis=2)

    ref_t = _pad_to(_pad_to(ref_fea.astype(jnp.float32), w_pad, axis=2),
                    h_pad, axis=1)
    ref_t = (ref_t.reshape(n, hb, rows, t_tiles, tile, c)
             .transpose(0, 1, 3, 2, 5, 4)
             .reshape(n * hb * t_tiles, rows, c, tile))

    def tile_view(a):
        # per-WINDOW depth blocking: only the active window's wg planes
        # are resident in VMEM (sweep shapes: 1/nw of the naive block)
        a = _pad_to(pad_hw(a), dp, axis=1)       # pad depth to nw*wg
        return (a.reshape(n, dp, hb, rows, t_tiles, tile)
                .transpose(0, 2, 4, 1, 3, 5)
                .reshape(n * hb * t_tiles, nw, wg, rows, tile)
                .astype(jnp.float32))

    # g tiles: [N, D, H, W, G] -> [N*HB*T, NW, WG, ROWS, G, TILE], depth-
    # padded with ZEROS (padded planes then contribute nothing in-kernel)
    gt = _pad_to(_pad_to(_pad_to(g.astype(jnp.float32), w_pad, axis=3),
                         h_pad, axis=2), dp, axis=1)
    gt = (gt.reshape(n, dp, hb, rows, t_tiles, tile, groups)
          .transpose(0, 2, 4, 1, 3, 6, 5)
          .reshape(n * hb * t_tiles, nw, wg, rows, groups, tile))

    # rstarts [D, rows, T, N*HB] -> depth-pad -> [T, N*HB, DP*rows]
    rstarts = _pad_to(rstarts, dp, axis=0)
    rstarts = rstarts.transpose(2, 3, 0, 1).reshape(t_tiles, -1, dp * rows)

    spec = pl.BlockSpec((1, 1, wg, rows, tile),
                        lambda nn, hh, tt, ww, *_:
                        ((nn * hb + hh) * t_tiles + tt, ww, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((1, 1, wg, rows, groups, tile),
                          lambda nn, hh, tt, ww, *_:
                          ((nn * hb + hh) * t_tiles + tt, ww, 0, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    ref_spec = pl.BlockSpec((1, rows, c, tile),
                            lambda nn, hh, tt, ww, *_:
                            ((nn * hb + hh) * t_tiles + tt, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    dref_spec = pl.BlockSpec((1, rows, c, tile),
                             lambda nn, hh, tt, ww, *_:
                             ((nn * hb + hh) * t_tiles + tt, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    kc = win_k * c
    dsrc_spec = pl.BlockSpec(
        (1, kc, win_w),
        lambda nn, hh, tt, ww, *_:
        (((nn * hb + hh) * t_tiles + tt) * nw + ww, 0, 0),
        memory_space=pltpu.VMEM)

    steps = n * hb * t_tiles * nw
    kernel = functools.partial(_bwd_kernel, wg=wg, win_k=win_k,
                               groups=groups, band=band, hs=hs, ws=ws,
                               win_w=win_w, batched_dot=batched_dot)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n, hb, t_tiles, nw),
        in_specs=[spec, spec, g_spec, ref_spec,
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[dref_spec, dsrc_spec],
        scratch_shapes=[
            pltpu.VMEM((2 * kc, win_w), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    dref_t, dsrc_win = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n * hb * t_tiles, rows, c, tile),
                                 jnp.float32),
            jax.ShapeDtypeStruct((steps, kc, win_w), jnp.float32),
        ],
        # the per-plane temporaries (bands gathers, bx_w, cmat) of the
        # unrolled wg-plane loop exceed the default 16 MB scoped-vmem
        # budget at sweep shapes (c=48, wg=8 measures 21.7 MB on v5e);
        # raise the cap — total VMEM is 128 MB and the operand blocks
        # are small ([wg, rows, tile] coords + one window)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(bases, rstarts, tile_view(x), tile_view(y), gt, ref_t, src_t)

    # d_ref: invert the ref-tile layout (each pixel in exactly one tile)
    d_ref = (dref_t.reshape(n, hb, t_tiles, rows, c, tile)
             .transpose(0, 1, 3, 2, 5, 4)
             .reshape(n, h_pad, w_pad, c)[:, :h, :w])

    # d_src: sequential dynamic-slice adds of the (overlapping) window
    # blocks into the padded channel-interleaved source image
    step_ids = jnp.arange(steps, dtype=jnp.int32)
    wi_s = step_ids % nw
    tt_s = (step_ids // nw) % t_tiles
    nhb_s = step_ids // (nw * t_tiles)
    nn_s = nhb_s // hb
    packed_s = bases[wi_s, tt_s, nhb_s]                  # [steps]
    bx_s = packed_s % 65536
    by_s = packed_s // 65536

    def add_window(i, acc):
        blk = jax.lax.dynamic_slice(
            acc, (nn_s[i], by_s[i] * c, bx_s[i]), (1, kc, win_w))
        return jax.lax.dynamic_update_slice(
            acc, blk + dsrc_win[i][None], (nn_s[i], by_s[i] * c, bx_s[i]))

    acc0 = jnp.zeros((n, (hs + 2) * c, ws_pad), jnp.float32)
    acc = jax.lax.fori_loop(0, steps, add_window, acc0)
    d_src = (acc[:, :, :ws + 2].reshape(n, hs + 2, c, ws + 2)
             .transpose(0, 1, 3, 2)[:, 1:hs + 1, 1:ws + 1, :])
    return d_src, d_ref
