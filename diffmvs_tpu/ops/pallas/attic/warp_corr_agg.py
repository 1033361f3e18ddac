"""Kernel v3 (fused view accumulation) — ATTIC, not shipping.

See attic/__init__.py: measured slower than independent per-(view,
sample) warp_corr_pallas calls on v5e because the resident output
block's read-modify-write serializes consecutive grid steps. Kept with
its parity test (tests/test_pallas_attic.py) as a documented negative
result; the model integrates v2 (models/stages.py).
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
    TILE,
    WIN_K,
    WIN_W,
    _corner_split,
    _pad_to,
    _window_geometry,
)


def _corr_agg_kernel(base_ref,      # scalar prefetch [NW, T, V*HB]
                     rstart_ref,    # scalar prefetch [D, ROWS, T, V*HB]
                     xi_ref, yi_ref, fx_ref, fy_ref, vmask_ref,
                     w_ref,         # [1, ROWS, TILE] per-view weight tile
                     ref_ref,       # [1, ROWS, C, TILE] (resident across v)
                     src_hbm,       # ANY [V, (Hs+2)*C, ws_pad]
                     out_ref,       # [1, D, ROWS, G, TILE] (resident)
                     win_ref, sem,
                     *, wg: int, win_k: int, groups: int, band: int):
    """v3: v2's fused warp+correlation with the view axis as the
    innermost grid dim and the output block resident across it — emits
    the view-weighted correlation SUM directly (the caller divides by
    the weight sum), removing the [V, ...] per-view stack + weighted
    aggregation from HBM entirely
    (parity: /root/reference/models/module.py:650-661).

    MEASURED SLOWER than v2 per-(view,sample) calls on v5e (stage-3 cost
    volume 203 vs 105 ms, stage-2 50 vs 40, bench 3.77 vs 5.51 maps/s):
    the out_ref read-modify-write between consecutive grid steps defeats
    Mosaic's cross-step pipelining. Kept (with its parity test) as a
    documented negative result; the model integrates v2."""
    hb = pl.program_id(0)
    t = pl.program_id(1)
    v = pl.program_id(2)
    num_hb = pl.num_programs(0)
    num_t = pl.num_programs(1)
    num_v = pl.num_programs(2)
    step = (hb * num_t + t) * num_v + v
    _, d_total, rows, g_total, _ = out_ref.shape
    c = ref_ref.shape[2]
    cg = c // g_total
    kc = win_k * c
    nw = -(-d_total // wg)
    total_windows = num_hb * num_t * num_v * nw

    def window_base(widx):
        wi = widx % nw
        s = widx // nw
        v2 = s % num_v
        t2 = (s // num_v) % num_t
        h2 = s // (num_v * num_t)
        packed = base_ref[wi, t2, v2 * num_hb + h2]
        bx = pl.multiple_of(packed % 65536, GATHER_W)
        by = packed // 65536
        return v2, bx, by

    def copy_for(widx):
        v2, bx, by = window_base(widx)
        slot = jax.lax.rem(widx, 2)
        dst = win_ref.at[pl.ds(pl.multiple_of(slot * kc, 8), kc), :]
        return pltpu.make_async_copy(
            src_hbm.at[v2, pl.ds(by * c, kc), pl.ds(bx, WIN_W)],
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
            xi = xi_ref[:, d, r, :]
            yi = yi_ref[:, d, r, :]
            fx = fx_ref[:, d, r, :]
            fy = fy_ref[:, d, r, :]
            valid_in = vmask_ref[:, d, r, :] != 0
            rs = rstart_ref[d, r, t, v * num_hb + hb]

            lx = xi - bxv
            lyr = yi - byv - rs
            in_band = ((lx >= 0) & (lx <= WIN_W - 2)
                       & (lyr >= 0) & (lyr <= band - 2))
            valid = valid_in & in_band

            lxc = jnp.clip(lx, 0, WIN_W - 2)
            lyrc = jnp.clip(lyr, 0, band - 2)

            bandw = win_ref[pl.ds(
                pl.multiple_of(slot_base + rs * c, 8), band * c), :]
            band_lo = bandw[:, :GATHER_W]
            band_hi = bandw[:, GATHER_W:]

            lx2 = jnp.concatenate([lxc, lxc + 1], axis=1)
            idx = jnp.broadcast_to(lx2, (band * c, GATHER_W))
            g_lo = jnp.take_along_axis(
                band_lo, jnp.clip(idx, 0, GATHER_W - 1), axis=1)
            g_hi = jnp.take_along_axis(
                band_hi, jnp.clip(idx - GATHER_W, 0, GATHER_W - 1), axis=1)
            gv = jnp.where(idx < GATHER_W, g_lo, g_hi)
            gv = gv.reshape(band, c, GATHER_W)

            ly2 = jnp.concatenate([lyrc, lyrc], axis=1)
            fy2 = jnp.concatenate([fy, fy], axis=1)
            wk = (jnp.where(row_ids == ly2[None], 1.0 - fy2[None], 0.0)
                  + jnp.where(row_ids == ly2[None] + 1, fy2[None], 0.0))
            s = jnp.sum(gv * wk.astype(gv.dtype), axis=0)

            left = s[:, :TILE]
            right = s[:, TILE:]
            outv = left + (right - left) * fx.astype(s.dtype)
            outv = outv * valid.astype(s.dtype)

            prod = outv * ref_ref[0, r]
            corr = jnp.mean(prod.reshape(g_total, cg, TILE), axis=1)
            contrib = corr * w_ref[0, r, :][None, :]

            @pl.when(v == 0)
            def _():
                out_ref[0, d, r, :, :] = contrib

            @pl.when(v > 0)
            def _():
                out_ref[0, d, r, :, :] = out_ref[0, d, r, :, :] + contrib


def warp_corr_agg_pallas(src_feas, ref_fea, view_weights, src_pairs,
                         ref_pair, depth_values, groups: int,
                         window_group: int = 0, win_k: int = WIN_K,
                         interpret: bool = False):
    """Fused warp + group correlation + weighted VIEW ACCUMULATION over
    all source views of ONE batch sample (kernel v3).

    src_feas: [V, Hs, Ws, C] source features; ref_fea: [H, W, C];
    view_weights: [V, H, W] frozen per-view weights; src_pairs:
    [V, 2, 4, 4]; ref_pair: [2, 4, 4]; depth_values: [D, H, W].
    Returns the weighted correlation SUM [D, H, W, G] (float32) — divide
    by (1e-8 + view_weights.sum(0)) for the reference's weighted mean
    (module.py:650-661). Window/band misses contribute zeros (see
    warp_corr_miss_fraction / the model's runtime guard)."""
    v, hs, ws, c = src_feas.shape
    d, h, w = depth_values.shape
    assert c % groups == 0
    assert c % 8 == 0, "band sub-slice offsets need C % 8 == 0"
    wg = d if window_group in (0, None) else min(window_group, d)
    win_k = min(win_k, hs + 2)

    if not interpret and jax.default_backend() != "tpu":
        interpret = True

    ref_pairs = jnp.broadcast_to(ref_pair[None], src_pairs.shape)
    rot, trans = relative_projection(src_pairs, ref_pairs)
    dvals = jnp.broadcast_to(depth_values[None], (v, d, h, w))
    x, y = plane_sweep_coords(rot, trans, dvals)
    xi, yi, fx, fy, valid = _corner_split(x, y, hs, ws)

    packed, rstarts, dims = _window_geometry(
        xi, yi, valid, d, h, w, hs, ws, wg, win_k)
    hb, t_tiles, w_pad, h_pad, ws_pad, nw = dims

    src_p = jnp.pad(src_feas.astype(jnp.float32),
                    ((0, 0), (1, 1), (1, 1), (0, 0)))
    src_t = src_p.transpose(0, 1, 3, 2).reshape(v, (hs + 2) * c, ws + 2)
    src_t = _pad_to(src_t, ws_pad, axis=2)

    ref_t = _pad_to(_pad_to(ref_fea.astype(jnp.float32)[None],
                            w_pad, axis=2), h_pad, axis=1)
    ref_t = (ref_t.reshape(1, hb, ROWS, t_tiles, TILE, c)
             .transpose(0, 1, 3, 2, 5, 4)
             .reshape(hb * t_tiles, ROWS, c, TILE))

    w_t = _pad_to(_pad_to(view_weights.astype(jnp.float32), w_pad, axis=2),
                  h_pad, axis=1)
    w_t = (w_t.reshape(v, hb, ROWS, t_tiles, TILE)
           .transpose(0, 1, 3, 2, 4)
           .reshape(v * hb * t_tiles, ROWS, TILE))

    def pad_hw(a, value=0):
        return _pad_to(_pad_to(a, w_pad, axis=3, value=value),
                       h_pad, axis=2, value=value)

    def tile_view(a, dtype):
        return (pad_hw(a).reshape(v, d, hb, ROWS, t_tiles, TILE)
                .transpose(0, 2, 4, 1, 3, 5)
                .reshape(v * hb * t_tiles, d, ROWS, TILE)
                .astype(dtype))

    spec = pl.BlockSpec((1, d, ROWS, TILE),
                        lambda hh, tt, vv, *_:
                        ((vv * hb + hh) * t_tiles + tt, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((1, ROWS, TILE),
                          lambda hh, tt, vv, *_:
                          ((vv * hb + hh) * t_tiles + tt, 0, 0),
                          memory_space=pltpu.VMEM)
    ref_spec = pl.BlockSpec((1, ROWS, c, TILE),
                            lambda hh, tt, vv, *_:
                            (hh * t_tiles + tt, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(hb, t_tiles, v),
        in_specs=[spec, spec, spec, spec, spec, w_spec, ref_spec,
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, d, ROWS, groups, TILE),
            lambda hh, tt, vv, *_: (hh * t_tiles + tt, 0, 0, 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2 * win_k * c, WIN_W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    kernel = functools.partial(_corr_agg_kernel, wg=wg, win_k=win_k,
                               groups=groups, band=BAND_ROWS)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (hb * t_tiles, d, ROWS, groups, TILE), jnp.float32),
        interpret=interpret,
    )(packed, rstarts,
      tile_view(xi, jnp.int32),
      tile_view(yi, jnp.int32),
      tile_view(fx, jnp.float32),
      tile_view(fy, jnp.float32),
      tile_view(valid.astype(jnp.int32), jnp.int32) != 0,
      w_t, ref_t, src_t)

    # [HB*T, D, ROWS, G, TILE] -> [D, H, W, G]
    out = out.reshape(hb, t_tiles, d, ROWS, groups, TILE)
    out = out.transpose(2, 0, 3, 1, 5, 4)
    out = out.reshape(d, h_pad, w_pad, groups)[:, :h, :w]
    return out
