"""Fused stride-1 conv + affine + ReLU Pallas kernel (NHWC).

Why: the trace-level attribution of the judged forward (VERDICT r4,
tools/trace_op.py feature) shows the s2d trunk and FPN-head convolutions
running 3-7x off their max(MXU, HBM) roofline under XLA — ~37 ms for
five 2x2 s2d trunk convs whose dense floor is ~5 ms at bench scale.
This kernel owns the whole pipeline instead: double-buffered row-slab
DMA from HBM, one MXU matmul per kernel tap from VMEM (taps are free
row slices + cheap sublane rolls, no im2col materialisation), f32
accumulation, and the inference BatchNorm affine + ReLU fused into the
epilogue — HBM traffic is exactly in + out, the roofline minimum.

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


def _conv_kernel(x_hbm, w_ref, scale_ref, shift_ref, out_ref, slab, sems,
                 *, nr: int, th: int, kh: int, kw: int, off_h: int,
                 off_w: int, h: int, w: int, wp: int, relu: bool,
                 out_dtype):
    """One grid step computes `th` output rows of one image.

    slab: [2, th+kh-1, wp, cin] double-buffered input rows; cols
    [off_w : off_w+w] hold image data, the rest stay zero (zeroed once
    at step 0; DMAs never write them). Row edges beyond the image are
    re-zeroed on boundary tiles after the DMA lands.
    """
    n_i = pl.program_id(0)
    r_i = pl.program_id(1)
    step = n_i * nr + r_i
    total = pl.num_programs(0) * nr
    rh = th + kh - 1
    slot = jax.lax.rem(step, 2)

    # row-copy geometry is static per (first?, last?) tile class:
    #   dst_lo = off_h on the first tile (rows above the image), else 0
    #   dst_hi = h - (nr-1)*th + off_h on the last tile, else rh
    dst_hi_last = min(h - (nr - 1) * th + off_h, rh)

    def start_dma(step_v, slot_v):
        n2 = step_v // nr
        r2 = step_v - n2 * nr
        cases = []
        if nr == 1:
            cases.append((None, off_h, dst_hi_last))
        else:
            cases.append((r2 == 0, off_h, min(rh, dst_hi_last
                                              if nr == 1 else rh)))
            if nr > 2:
                cases.append(((r2 > 0) & (r2 < nr - 1), 0, rh))
            cases.append((r2 == nr - 1, 0, dst_hi_last))
        for guard, dlo, dhi in cases:
            if dhi <= dlo:
                continue

            def _go(dlo=dlo, dhi=dhi):
                src_lo = r2 * th - off_h + dlo
                pltpu.make_async_copy(
                    x_hbm.at[n2, pl.ds(src_lo, dhi - dlo)],
                    slab.at[slot_v, pl.ds(dlo, dhi - dlo),
                            pl.ds(off_w, w)],
                    sems.at[slot_v],
                ).start()

            if guard is None:
                _go()
            else:
                pl.when(guard)(_go)

    @pl.when(step == 0)
    def _():
        slab[...] = jnp.zeros(slab.shape, slab.dtype)
        start_dma(step, slot)

    @pl.when(step + 1 < total)
    def _():
        start_dma(step + 1, 1 - slot)

    # wait for this step's slab (the copy size varies by tile class,
    # but every class lands on the same semaphore with a matching wait)
    def wait_dma(dlo, dhi):
        pltpu.make_async_copy(
            x_hbm.at[0, pl.ds(0, dhi - dlo)],
            slab.at[slot, pl.ds(dlo, dhi - dlo), pl.ds(off_w, w)],
            sems.at[slot],
        ).wait()

    if nr == 1:
        wait_dma(off_h, dst_hi_last)
    else:
        pl.when(r_i == 0)(lambda: wait_dma(off_h, rh))
        if nr > 2:
            pl.when((r_i > 0) & (r_i < nr - 1))(lambda: wait_dma(0, rh))
        pl.when(r_i == nr - 1)(lambda: wait_dma(0, dst_hi_last))

    # boundary tiles: re-zero the rows the DMA didn't write (middle
    # tiles overwrite the full slab, so earlier zeros don't persist)
    cin = slab.shape[-1]
    if off_h > 0 and nr > 1:
        @pl.when(r_i == 0)
        def _():
            slab[slot, 0:off_h] = jnp.zeros((off_h, wp, cin), slab.dtype)
    if dst_hi_last < rh and nr > 1:
        @pl.when(r_i == nr - 1)
        def _():
            slab[slot, dst_hi_last:rh] = jnp.zeros(
                (rh - dst_hi_last, wp, cin), slab.dtype)

    cout = out_ref.shape[-1]
    acc = jnp.zeros((th * wp, cout), jnp.float32)
    for dy in range(kh):
        rows = slab[slot, dy:dy + th]                  # [th, wp, cin]
        for dx in range(kw):
            # roll by wp-dx == index shift of +dx with wraparound; the
            # wrapped-in cols land at j >= wp-dx >= w and are discarded
            shifted = (pltpu.roll(rows, shift=wp - dx, axis=1)
                       if dx else rows)
            a = shifted.reshape(th * wp, cin)
            acc = acc + jnp.dot(a, w_ref[dy, dx],
                                preferred_element_type=jnp.float32)
    if scale_ref is not None:
        acc = acc * scale_ref[0] + shift_ref[0]
    if relu:
        acc = jnp.maximum(acc, 0.0)
    y = acc.astype(out_dtype).reshape(th, wp, cout)
    out_ref[0] = y[:, :w]


def conv2d_fused(x, w, scale=None, shift=None, *, offset=None,
                 relu: bool = False, out_dtype=None, rows_per_step: int = 8,
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
                   scale is not None)
    if scale is None:
        return op(x, w)
    cout = w.shape[-1]
    return op(x, w, jnp.asarray(scale, jnp.float32).reshape(1, cout),
              jnp.asarray(shift, jnp.float32).reshape(1, cout))


@functools.lru_cache(maxsize=None)
def _fused_op(oh, ow, relu, out_dtype_name, rows_per_step, interpret,
              has_affine):
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
                   rows_per_step, interpret):
    """The raw pallas_call (see conv2d_fused for semantics)."""
    n, h, wd, cin = x.shape
    kh, kw, wcin, cout = w.shape
    assert wcin == cin, (w.shape, x.shape)
    oh, ow = offset
    assert 0 <= oh < kh and 0 <= ow < kw
    th = min(rows_per_step, _round_up(h, 1))
    nr = -(-h // th)
    # wp: padded slab width. Multiple of 16 keeps the (th, wp, cin) ->
    # (th*wp, cin) reshape layout-free for bf16/f32; >= w + kw - 1
    # keeps the rolled-in wrap columns inside the discarded tail.
    wp = _round_up(wd + kw - 1, 16)

    has_affine = scale is not None
    kern = functools.partial(
        _conv_kernel, nr=nr, th=th, kh=kh, kw=kw, off_h=oh, off_w=ow,
        h=h, w=wd, wp=wp, relu=relu, out_dtype=out_dtype)
    if not has_affine:
        kern = lambda x_, w_, o_, s_, se_, *, _k=kern: _k(  # noqa: E731
            x_, w_, None, None, o_, s_, se_)

    in_specs = [pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM)]
    operands = [x, w.astype(x.dtype)]
    if has_affine:
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM),
                     pl.BlockSpec(memory_space=pltpu.VMEM)]
        operands += [scale, shift]

    flops = 2 * n * h * wd * kh * kw * cin * cout
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
        scratch_shapes=[
            pltpu.VMEM((2, th + kh - 1, wp, cin), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
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
