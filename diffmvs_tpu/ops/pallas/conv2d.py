"""Fused stride-1 conv + affine + ReLU Pallas kernel (NHWC).

Why: the trace-level attribution of the judged forward (VERDICT r4,
tools/trace_op.py feature) shows the s2d trunk and FPN-head convolutions
running 3-7x off their max(MXU, HBM) roofline under XLA — ~37 ms for
five 2x2 s2d trunk convs whose dense floor is ~5 ms at bench scale.
This kernel owns the whole pipeline instead: double-buffered row-slab
DMA from HBM, one MXU matmul per kernel tap from VMEM (taps are free
row slices; column shifts are 32-bit rolls of the f32 partial
products, no im2col materialisation), f32 accumulation, and the
inference BatchNorm affine + ReLU fused into the epilogue. HBM traffic
is in + out plus an alignment tax: Mosaic manual DMAs require the
slice's minor two dims tile-aligned, so x is pre-padded (W to %16,
Cin to %128) by one XLA pad pass — still well under the XLA conv's
measured 3-7x overhead for cin >= 48.

Scope: stride-1 KxK (K in 1..3) convs at an arbitrary static window
offset (covers centered 3x3s, the phase-opt trunk's offset-0 trimmed
2x2s, and 1x1 heads), NHWC, bf16/f32 in, f32 accumulate, optional
per-channel affine (y*scale + shift: BatchNorm-inference folding) and
ReLU. Inference-only by construction (no custom_vjp: the training path
keeps the XLA convs — see config.ModelConfig.conv_kernel).

The reference's counterpart is cuDNN via torch Conv2d
(/root/reference/models/module.py:24-58); this design has no reference
counterpart — it exists because XLA:TPU lowers these non-standard
(asymmetric-pad, expanded-kernel) convs poorly.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _row_classes(nr: int, rh: int, th: int, off_h: int, h: int):
    """Static per-tile-class DMA row windows.

    Returns [(r2_match, dlo, dhi)]: tile class `r2_match` (an int, or
    ("mid", lo, hi) for the open middle range, or None == always) copies
    slab rows [dlo, dhi) from image rows [r2*th - off_h + dlo, ...).
    dlo skips rows above the image (first tile); dhi clamps rows below
    it — the bottom halo can cross into the last tile's rows (or past
    the image entirely when the last tile is shorter than the halo), so
    the second-to-last and first-of-two tiles clamp too.
    """
    last_hi = min(h - (nr - 1) * th + off_h, rh)
    if nr == 1:
        return [(None, off_h, last_hi)]
    out = [(0, off_h, min(rh, h + off_h))]
    if nr > 2:
        if nr > 3:
            out.append((("mid", 0, nr - 2), 0, rh))
        out.append((nr - 2, 0, min(rh, h - (nr - 2) * th + off_h)))
    out.append((nr - 1, 0, last_hi))
    return out


def _conv_kernel(x_hbm, w_ref, scale_ref, shift_ref, out_ref, slab, sems,
                 buf=None, *, nr: int, th: int, kh: int, kw: int,
                 off_h: int, off_w: int, h: int, w: int, wp: int,
                 relu: bool, out_dtype):
    """One grid step computes `th` output rows of one image.

    Flat-row layout: x arrives pre-padded (see _conv2d_pallas) to width
    wp (data at cols [0, w), zero tail) and channels cp, then reshaped
    to [N, H*wp, cp] — so a dy row tap is a flat offset of dy*wp, a
    MULTIPLE OF THE SUBLANE TILE. Hardware A/B showed the 4-D form's
    per-dy reads (sublane offset 1 of a bf16 value) dominating the
    kernel: all of rows {8,16} x variants {taps,im2col} measured
    7.3-7.6 ms on trunk1 where ~3 ms is the pass-count floor. The DMA
    alignment rules also shaped this layout: a memref_slice must be
    tile-aligned on the minor two dims (sublane %8, lane %128), even
    when a dim is copied whole, so slices here are (rows*wp, cp) with
    wp %16 and cp %128. slab: [2, (th+kh-1)*wp, cp] double-buffered
    flat rows; halo rows beyond the image are re-zeroed after the DMA
    lands.
    """
    n_i = pl.program_id(0)
    r_i = pl.program_id(1)
    step = n_i * nr + r_i
    total = pl.num_programs(0) * nr
    rh = th + kh - 1
    slot = jax.lax.rem(step, 2)
    classes = _row_classes(nr, rh, th, off_h, h)

    def guard_of(match, r2):
        if match is None:
            return None
        if isinstance(match, tuple):
            _, lo, hi = match
            return (r2 > lo) & (r2 < hi)
        return r2 == match

    def start_dma(step_v, slot_v):
        n2 = step_v // nr
        r2 = step_v - n2 * nr
        for match, dlo, dhi in classes:
            if dhi <= dlo:
                continue

            def _go(dlo=dlo, dhi=dhi):
                src_lo = (r2 * th - off_h + dlo) * wp
                pltpu.make_async_copy(
                    x_hbm.at[n2, pl.ds(src_lo, (dhi - dlo) * wp)],
                    slab.at[slot_v, pl.ds(dlo * wp, (dhi - dlo) * wp)],
                    sems.at[slot_v],
                ).start()

            g = guard_of(match, r2)
            if g is None:
                _go()
            else:
                pl.when(g)(_go)

    @pl.when(step == 0)
    def _():
        start_dma(step, slot)

    @pl.when(step + 1 < total)
    def _():
        start_dma(step + 1, 1 - slot)

    # wait for this step's slab (the copy size varies by tile class,
    # but every class lands on the same semaphore with a matching wait)
    def wait_dma(dlo, dhi):
        pltpu.make_async_copy(
            x_hbm.at[0, pl.ds(0, (dhi - dlo) * wp)],
            slab.at[slot, pl.ds(dlo * wp, (dhi - dlo) * wp)],
            sems.at[slot],
        ).wait()

    cp = slab.shape[-1]
    for match, dlo, dhi in classes:
        g = guard_of(match, r_i)

        def _fin(dlo=dlo, dhi=dhi):
            if dhi > dlo:
                wait_dma(dlo, dhi)
            # halo rows outside the image: zero what the DMA skipped
            # (middle tiles overwrite the full slab, so zeros from
            # earlier steps don't persist in this slot)
            if dlo > 0:
                slab[slot, 0:dlo * wp] = jnp.zeros((dlo * wp, cp),
                                                   slab.dtype)
            if dhi < rh:
                slab[slot, dhi * wp:rh * wp] = jnp.zeros(
                    ((rh - dhi) * wp, cp), slab.dtype)

        if g is None:
            _fin()
        else:
            pl.when(g)(_fin)

    cout = out_ref.shape[-1]
    # Tap shifts are applied to the f32 partial PRODUCTS, not the bf16
    # input rows: Mosaic's dynamic_rotate only supports 32-bit data
    # ("Rotate with non-32-bit data" is unimplemented as of this
    # toolchain), and out[j] += x[j+dx-ow]@w[dy,dx] is equivalent to
    # rolling q = x@w by ow-dx after the matmul. Wrapped-in values of
    # the flat [th*wp] roll are always zero: they come from a row tail
    # (cols >= w, where x is zero so q is zero) or from garbage that
    # lands at cols >= w, which out_ref's [:, :w] slice discards —
    # both need tail width wp - w >= kw - 1, which _conv2d_pallas
    # guarantees.
    nflat = th * wp
    if buf is None:
        # taps variant: kh*kw dots with K=cp, dy partials accumulated
        # across dots (extra f32 read-modify-write passes per dy)
        parts = [None] * kw
        for dy in range(kh):
            a = slab[slot, dy * wp:dy * wp + nflat]
            for dx in range(kw):
                p = jnp.dot(a, w_ref[dy, dx],
                            preferred_element_type=jnp.float32)
                parts[dx] = p if parts[dx] is None else parts[dx] + p
        acc = None
        for dx in range(kw):
            p = parts[dx]
            if dx != off_w:
                p = pltpu.roll(p, shift=(off_w - dx) % nflat, axis=0)
            acc = p if acc is None else acc + p
    else:
        # im2col-over-rows variant: the dy taps fold into the matmul's
        # K dim. buf[t, dy*cp:(dy+1)*cp] = slab flat rows [t + dy*wp]
        # is kh cheap copies (tile-aligned sublane-offset reads,
        # 128-aligned lane writes), then only kw dots with K=kh*cp and
        # kw-1 f32 rolls — removes the (kh-1)*kw f32 read-modify-write
        # passes of the taps variant. w_ref here is pre-reshaped
        # [kw, kh*cp, cout].
        for dy in range(kh):
            buf[:, dy * cp:(dy + 1) * cp] = slab[slot,
                                                 dy * wp:dy * wp + nflat]
        a = buf[...]
        acc = jnp.dot(a, w_ref[off_w], preferred_element_type=jnp.float32)
        for dx in range(kw):
            if dx == off_w:
                continue
            p = jnp.dot(a, w_ref[dx], preferred_element_type=jnp.float32)
            acc = acc + pltpu.roll(p, shift=(off_w - dx) % nflat, axis=0)
    if scale_ref is not None:
        acc = acc * scale_ref[0] + shift_ref[0]
    if relu:
        acc = jnp.maximum(acc, 0.0)
    y = acc.astype(out_dtype).reshape(th, wp, cout)
    out_ref[0] = y[:, :w]


def conv2d_fused(x, w, scale=None, shift=None, *, offset=None,
                 relu: bool = False, out_dtype=None, rows_per_step: int = 8,
                 variant: str = "im2col",
                 interpret: Optional[bool] = None):
    """y[n,i,j,o] = act(sum_{dy,dx,c} x[n, i+dy-oh, j+dx-ow, c]
                        * w[dy,dx,c,o] * scale[o] + shift[o])

    x: [N, H, W, Cin]; w: [KH, KW, Cin, Cout]; scale/shift: [Cout] f32
    (both or neither — the BatchNorm-inference affine; pass
    scale=ones, shift=bias for a plain biased conv). offset: (oh, ow)
    window alignment, default centered (kh//2, kw//2); (0, 0) is the
    phase-opt trunk's top-left-aligned trimmed window. Output
    [N, H, W, Cout], same spatial size (stride 1), zero padding.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kh, kw = w.shape[:2]
    oh, ow = (kh // 2, kw // 2) if offset is None else (
        offset if isinstance(offset, tuple) else (offset, offset))
    out_dtype = jnp.dtype(out_dtype or x.dtype)
    op = _fused_op(oh, ow, relu, out_dtype.name, rows_per_step, interpret,
                   scale is not None, variant)
    if scale is None:
        return op(x, w)
    cout = w.shape[-1]
    return op(x, w, jnp.asarray(scale, jnp.float32).reshape(1, cout),
              jnp.asarray(shift, jnp.float32).reshape(1, cout))


@functools.lru_cache(maxsize=None)
def _fused_op(oh, ow, relu, out_dtype_name, rows_per_step, interpret,
              has_affine, variant="im2col"):
    """custom_vjp wrapper per static config: forward = the Pallas
    kernel; backward = jax.vjp through the XLA reference (the
    "recompute" pattern the warp kernel uses) — so the fused path is
    safe under differentiation (remat re-forwards, train mode) without
    per-module train gating."""
    kwargs = dict(offset=(oh, ow), relu=relu,
                  out_dtype=jnp.dtype(out_dtype_name))

    def fwd_impl(x, w, scale, shift):
        return _conv2d_pallas(x, w, scale, shift,
                              rows_per_step=rows_per_step,
                              variant=variant,
                              interpret=interpret, **kwargs)

    def ref(x, w, scale, shift):
        return conv2d_fused_ref(x, w, scale, shift, **kwargs)

    if has_affine:
        @jax.custom_vjp
        def op(x, w, scale, shift):
            return fwd_impl(x, w, scale, shift)

        def vfwd(x, w, scale, shift):
            return op(x, w, scale, shift), (x, w, scale, shift)

        def vbwd(res, g):
            _, vjp = jax.vjp(ref, *res)
            return vjp(g)

        op.defvjp(vfwd, vbwd)
        return op

    @jax.custom_vjp
    def op2(x, w):
        return fwd_impl(x, w, None, None)

    def vfwd2(x, w):
        return op2(x, w), (x, w)

    def vbwd2(res, g):
        x, w = res
        _, vjp = jax.vjp(lambda a, b: ref(a, b, None, None), x, w)
        return vjp(g)

    op2.defvjp(vfwd2, vbwd2)
    return op2


def _conv2d_pallas(x, w, scale, shift, *, offset, relu, out_dtype,
                   rows_per_step, interpret, variant="im2col"):
    """The raw pallas_call (see conv2d_fused for semantics)."""
    n, h, wd, cin = x.shape
    kh, kw, wcin, cout = w.shape
    assert wcin == cin, (w.shape, x.shape)
    oh, ow = offset
    assert 0 <= oh < kh and 0 <= ow < kw
    th = min(rows_per_step, _round_up(h, 1))
    nr = -(-h // th)
    # Mosaic constraint (hardware-verified): a manually DMA'd
    # memref_slice must be tile-aligned on the minor two dims — slice
    # row count arbitrary, but dim -2 %8 (f32; %16 covers bf16) and
    # dim -1 %128, even when the slice covers the full dim. So x is
    # pre-padded once in XLA: width to wp (also >= w + kw - 1 so the
    # roll-wrapped columns stay inside the discarded/zero tail;
    # multiple of 16 additionally keeps the (th, wp, cp) -> (th*wp, cp)
    # reshape layout-free for bf16/f32) and channels to cp (%128).
    # Zero pad channels x zero weight rows contribute nothing; K <= 128
    # is one MXU pass either way, so the pad costs HBM traffic only.
    wp = _round_up(wd + kw - 1, 16)
    cp = _round_up(cin, 128)
    if wp != wd or cp != cin:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, wp - wd), (0, cp - cin)))
    # flat-row layout (free reshape): row taps become sublane-tile-
    # aligned flat offsets of dy*wp inside the kernel
    x = x.reshape(n, h * wp, cp)
    w = w.astype(x.dtype)
    if cp != cin:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, cp - cin), (0, 0)))

    has_affine = scale is not None
    use_imcol = variant == "im2col" and kh > 1
    if use_imcol:
        # fold the dy taps into the matmul K dim (see _conv_kernel)
        w = jnp.transpose(w, (1, 0, 2, 3)).reshape(kw, kh * cp, cout)
    base = functools.partial(
        _conv_kernel, nr=nr, th=th, kh=kh, kw=kw, off_h=oh, off_w=ow,
        h=h, w=wd, wp=wp, relu=relu, out_dtype=out_dtype)
    if has_affine:
        kern = base                     # buf rides as trailing scratch
    elif use_imcol:
        kern = lambda x_, w_, o_, s_, se_, b_: base(  # noqa: E731
            x_, w_, None, None, o_, s_, se_, b_)
    else:
        kern = lambda x_, w_, o_, s_, se_: base(  # noqa: E731
            x_, w_, None, None, o_, s_, se_)

    in_specs = [pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM)]
    operands = [x, w]
    if has_affine:
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM),
                     pl.BlockSpec(memory_space=pltpu.VMEM)]
        operands += [scale, shift]

    flops = 2 * n * h * wd * kh * kw * cp * cout
    bytes_accessed = (x.size * x.dtype.itemsize
                      + n * h * wd * cout * jnp.dtype(out_dtype).itemsize)
    return pl.pallas_call(
        kern,
        grid=(n, nr),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, th, wd, cout),
                               lambda n_i, r_i: (n_i, r_i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, wd, cout), out_dtype),
        scratch_shapes=(
            [pltpu.VMEM((2, (th + kh - 1) * wp, cp), x.dtype),
             pltpu.SemaphoreType.DMA((2,))]
            + ([pltpu.VMEM((th * wp, kh * cp), x.dtype)]
               if use_imcol else [])),
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=bytes_accessed,
                                      transcendentals=0),
        interpret=interpret,
    )(*operands)


def conv2d_fused_ref(x, w, scale=None, shift=None, *, offset=None,
                     relu: bool = False, out_dtype=None):
    """XLA reference implementation (same semantics, for parity tests
    and the microbench baseline)."""
    kh, kw = w.shape[:2]
    oh, ow = (kh // 2, kw // 2) if offset is None else (
        offset if isinstance(offset, tuple) else (offset, offset))
    out_dtype = out_dtype or x.dtype
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1),
        ((oh, kh - 1 - oh), (ow, kw - 1 - ow)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    if scale is not None:
        y = y * jnp.asarray(scale, jnp.float32) + jnp.asarray(
            shift, jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(out_dtype)
