"""Space-to-depth (s2d) execution of small-channel conv stacks.

Why: on TPU, NHWC tensors with C = 8-32 waste the 128-wide lane axis in
every elementwise/norm op and force XLA into relayout copies between
convs — measured ~25 ms of a 37 ms stage-3 UNet call and ~140 ms/forward
of trace-level copies (docs/perf_breakdown.md, tools/bench_layout.py).
Running the same math on an s2d(s) view multiplies the channel axis by
s^2 (8ch -> 128ch at s=4) at 1/s^2 the spatial size: identical values,
full lanes, no relayouts. tools/bench_layout.py measured the s2d(4)
equivalents of every stage-3 UNet piece at ~0 ms (init 7x7: 9.9 -> ~0;
feature-net 3x3 8ch: 9.5 -> 1.6).

Representation: [B, H, W, C] -> [B, H/s, W/s, C*s*s] with channel index
(c*s + p1)*s + p2 ("c-major"). c-major makes channel concatenation and
contiguous GroupNorm groups commute with s2d.

A stride-t KxK conv on the original tensor is computed EXACTLY (same
multiply-accumulates, MXU f32 accumulation) as a small conv on the s2d
view whose kernel is the original weights scattered into a structured
(s^2*Cin -> (s/t)^2*Cout) kernel of mostly zeros — more MACs, but
small-C convs are lane-bound, not FLOP-bound. Parameters keep their
ORIGINAL shapes and names (the expansion happens at apply time), so
checkpoints and the torch importer are untouched.

No reference counterpart: the reference leaves layout to cuDNN
(/root/reference/models/update.py:38-274 runs plain NCHW convs).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


@functools.lru_cache(maxsize=None)
def _s2d_onehot(s: int, c: int):
    """One-hot [s, s, C, C*s*s] kernel whose stride-s VALID conv IS
    to_s2d (kernel[p1, p2, c, (c*s+p1)*s+p2] = 1)."""
    k = np.zeros((s, s, c, c * s * s), np.float32)
    for p1 in range(s):
        for p2 in range(s):
            for ci in range(c):
                k[p1, p2, ci, (ci * s + p1) * s + p2] = 1.0
    return k


def to_s2d(x, s: int):
    """[B,H,W,C] -> [B,H/s,W/s,C*s*s], channel index (c*s+p1)*s+p2.

    On TPU the relayout runs as a one-hot stride-s conv: the 6D
    sub-lane transpose costs ~175x the memory roofline (6.3 ms for a
    [4,576,800,16] bf16 tensor, tools/trace_op.py stage3) while the MXU
    does it at conv speed. One-hot products and single-term sums are
    exact in every dtype, so both paths are bit-identical
    (tests/test_s2d.py)."""
    if s == 1:
        return x
    if jax.default_backend() == "tpu":
        return _to_s2d_conv(x, s)
    b, h, w, c = x.shape
    y = x.reshape(b, h // s, s, w // s, s, c)
    return y.transpose(0, 1, 3, 5, 2, 4).reshape(b, h // s, w // s,
                                                 c * s * s)


def _to_s2d_conv(x, s: int):
    """to_s2d as a one-hot stride-s conv (exact; see to_s2d)."""
    c = x.shape[-1]
    k = jnp.asarray(_s2d_onehot(s, c), x.dtype)
    return jax.lax.conv_general_dilated(
        x, k, (s, s), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@functools.lru_cache(maxsize=None)
def _from_s2d_onehot(s: int, c: int):
    """One-hot [s, s, C*s*s, C] kernel whose stride-s VALID
    conv_transpose IS from_s2d (spatially flipped: conv_transpose
    mirrors the kernel)."""
    k = np.zeros((s, s, c * s * s, c), np.float32)
    for p1 in range(s):
        for p2 in range(s):
            for ci in range(c):
                k[s - 1 - p1, s - 1 - p2, (ci * s + p1) * s + p2, ci] = 1.0
    return k


def from_s2d(x, s: int):
    """Inverse of to_s2d. TPU: one-hot conv_transpose (exact — single
    one-hot tap per output pixel; same rationale as to_s2d)."""
    if s == 1:
        return x
    if jax.default_backend() == "tpu":
        return _from_s2d_conv(x, s)
    b, h, w, cs = x.shape
    c = cs // (s * s)
    y = x.reshape(b, h, w, c, s, s)
    return y.transpose(0, 1, 4, 2, 5, 3).reshape(b, h * s, w * s, c)


def _from_s2d_conv(x, s: int):
    """from_s2d as a one-hot stride-s conv_transpose (see from_s2d)."""
    c = x.shape[-1] // (s * s)
    k = jnp.asarray(_from_s2d_onehot(s, c), x.dtype)
    return jax.lax.conv_transpose(
        x, k, (s, s), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@functools.lru_cache(maxsize=None)
def _s2d_change_onehot(s_in: int, s_out: int, c: int):
    """One-hot [r, r, C*s_in^2, C*s_out^2] kernel (r = s_out // s_in)
    whose stride-r VALID conv converts the s2d(s_in) repr directly to
    the s2d(s_out) repr (channel order (c*s+dy)*s+dx both sides)."""
    r = s_out // s_in
    k = np.zeros((r, r, c * s_in * s_in, c * s_out * s_out), np.float32)
    for p in range(r):
        for q in range(r):
            for ci in range(c):
                for dy1 in range(s_in):
                    for dx1 in range(s_in):
                        cin = (ci * s_in + dy1) * s_in + dx1
                        cout = ((ci * s_out + p * s_in + dy1) * s_out
                                + q * s_in + dx1)
                        k[p, q, cin, cout] = 1.0
    return k


def s2d_change(x, s_in: int, s_out: int):
    """Convert an s2d(s_in) repr to the s2d(s_out) repr (s_out a multiple
    of s_in) — e.g. the ConditionEncoder's s=2 output into the UNet's
    s2d(4) input. Equals to_s2d(from_s2d(x, s_in), s_out); on TPU it is
    ONE fused one-hot stride-(s_out/s_in) conv instead of two relayouts
    (exact in every dtype — single one-hot tap per output element)."""
    if s_in == s_out:
        return x
    assert s_out % s_in == 0, (s_in, s_out)
    if jax.default_backend() == "tpu":
        r = s_out // s_in
        c = x.shape[-1] // (s_in * s_in)
        k = jnp.asarray(_s2d_change_onehot(s_in, s_out, c), x.dtype)
        return jax.lax.conv_general_dilated(
            x, k, (r, r), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return to_s2d(from_s2d(x, s_in), s_out)


@functools.lru_cache(maxsize=None)
def _axis_map(k: int, s_in: int, stride: int, offset: int
              ) -> Tuple[np.ndarray, int]:
    """One-hot placement along one spatial axis.

    Original conv: output index O reads input O*stride - offset + kappa,
    kappa in [0, k). In s2d coordinates (input repr s2d(s_in), output
    repr s2d(s_in//stride)), output s2d pixel j subpixel q reads input
    s2d pixel j+delta subpixel p where
        kappa = delta*s_in + p - q*stride + offset.
    Returns (S [K, s_in, so, k] with S[delta+R, p, q, kappa] = 1, R).
    """
    so = s_in // stride
    trips = []
    r_need = 0
    for d in range(-(k + s_in) // s_in - 1, (k + s_in) // s_in + 2):
        for p in range(s_in):
            for q in range(so):
                kap = d * s_in + p - q * stride + offset
                if 0 <= kap < k:
                    trips.append((d, p, q, kap))
                    r_need = max(r_need, abs(d))
    kk = 2 * r_need + 1
    s_mat = np.zeros((kk, s_in, so, k), np.float32)
    for d, p, q, kap in trips:
        s_mat[d + r_need, p, q, kap] = 1.0
    return s_mat, r_need


def expand_kernel(w, s_in: int, stride: int = 1,
                  offset: Optional[int] = None):
    """[kh,kw,Cin,Cout] -> structured s2d kernel
    [Kh,Kw, s_in^2*Cin, so^2*Cout] (so = s_in//stride), c-major channel
    order on both sides. offset defaults to k//2 ("same" conv); pass 0
    for an unpadded aligned conv (e.g. the 2x2/s2 space-to-depth)."""
    kh, kw, cin, cout = w.shape
    sh, _ = _axis_map(kh, s_in, stride,
                      kh // 2 if offset is None else offset)
    sw, _ = _axis_map(kw, s_in, stride,
                      kw // 2 if offset is None else offset)
    so = s_in // stride
    # out[x,y, i,p,r, o,q,t] = sum_{a,b} Sh[x,p,q,a] Sw[y,r,t,b] w[a,b,i,o]
    wex = jnp.einsum("xpqa,yrtb,abio->xyiproqt",
                     jnp.asarray(sh, w.dtype), jnp.asarray(sw, w.dtype), w)
    k2h, k2w = sh.shape[0], sw.shape[0]
    return wex.reshape(k2h, k2w, s_in * s_in * cin, so * so * cout)


@functools.lru_cache(maxsize=None)
def _axis_map_min(k: int, s_in: int, stride: int, offset: int
                  ) -> Tuple[np.ndarray, int]:
    """_axis_map trimmed to its nonzero d-range: (S [DK,...], d_min).

    The symmetric map materializes 2*r+1 planes; off-center offsets
    (e.g. 0 or 2 for k=3) put all placements in 2 consecutive planes —
    trimming turns the s2d(4) 3x3 expansion from a dense 3x3 into a
    dense 2x2 (2.25x fewer MXU MACs for the same math)."""
    s_mat, r = _axis_map(k, s_in, stride, offset)
    nz = [d for d in range(s_mat.shape[0]) if s_mat[d].any()]
    lo, hi = min(nz), max(nz)
    return s_mat[lo:hi + 1], lo - r


def _min_pads(k: int, s_in: int, stride: int, offset: int
              ) -> Tuple[int, int]:
    """Asymmetric conv padding (lo, hi) for the trimmed expansion: the
    output s2d pixel j reads input pixels j+d, d in [d_min, d_max]."""
    sm, d_min = _axis_map_min(k, s_in, stride, offset)
    return -d_min, d_min + sm.shape[0] - 1


def expand_kernel_min(w, s_in: int, stride: int = 1, offset: int = 0):
    """Minimal-span variant of expand_kernel (same channel order); the
    matching asymmetric pads come from _min_pads(k, s_in, stride,
    offset) — static ints, recomputed at run time so the prepared
    (wex, bex) cache stays a pure array pair."""
    kh, kw, cin, cout = w.shape
    sh, _ = _axis_map_min(kh, s_in, stride, offset)
    sw, _ = _axis_map_min(kw, s_in, stride, offset)
    so = s_in // stride
    wex = jnp.einsum("xpqa,yrtb,abio->xyiproqt",
                     jnp.asarray(sh, w.dtype), jnp.asarray(sw, w.dtype), w)
    return wex.reshape(sh.shape[0], sw.shape[0],
                       s_in * s_in * cin, so * so * cout)


def prep_conv_s2d_min(w, bias, s: int, stride: int = 1, offset: int = 0,
                      dtype=None):
    """prep_conv_s2d with the minimal-span (offset-phased) expansion."""
    so = s // stride
    wex = expand_kernel_min(w, s, stride, offset)
    if dtype is not None:
        wex = wex.astype(dtype)
    bex = None if bias is None else jnp.repeat(bias, so * so)
    return wex, bex


def run_conv_s2d_min(x, wex, bex, k: int, s: int, stride: int = 1,
                     offset: int = 0, dtype=None):
    """Execute a minimal-span s2d conv (kernel from prep_conv_s2d_min).

    Semantics: the ORIGINAL conv with window alignment `offset`
    (output O reads input O*stride - offset + kappa) — an off-center
    offset SHIFTS the output by (k//2 - offset)/stride original pixels
    relative to the centered conv. Callers track the shift and restore
    it with pre-padding/crops (see nn/feature.py phase_opt)."""
    dtype = dtype or x.dtype
    ph = _min_pads(k, s, stride, offset)
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), wex.astype(dtype), (1, 1), (ph, ph),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bex is not None:
        y = y + bex.astype(y.dtype)
    return y.astype(dtype)


def zero_px_border_s2d(y, s: int, top: int = 0, bottom: int = 0,
                       left: int = 0, right: int = 0):
    """Zero the first/last stored PIXEL rows/cols of an s2d(s) repr.

    Used by phase-optimized conv chains to reproduce the centered
    chain's intermediate-clipping semantics exactly: after each
    off-center conv, the stored pixels whose TRUE coordinates fall
    outside the unpadded image are zeroed, so the next conv reads the
    same zeros the reference's padding provides. Touches only the
    affected block rows/cols (dynamic_update_slice of <= ceil(n/s)
    blocks), not the whole tensor."""
    b, hb, wb, cc = y.shape
    c = cc // (s * s)

    def row_mask(npx, blocks, from_top):
        # mask[bi, channel] over the affected block rows; channel order
        # (ci*s + dy)*s + dx — row masks depend only on dy
        m = np.ones((blocks, s), np.float32)
        for bi in range(blocks):
            for dy in range(s):
                px = bi * s + dy
                if from_top:
                    m[bi, dy] = 0.0 if px < npx else 1.0
                else:
                    # bi counts from the LAST block upward
                    px_from_end = (blocks - 1 - bi) * s + (s - 1 - dy)
                    m[bi, dy] = 0.0 if px_from_end < npx else 1.0
        return m

    if top:
        nb = -(-top // s)
        m = row_mask(top, nb, True)
        mc = np.tile(np.repeat(m, s, axis=1), (1, c))       # [nb, C*s*s]
        seg = y[:, :nb] * jnp.asarray(mc, y.dtype)[None, :, None, :]
        y = jax.lax.dynamic_update_slice(y, seg, (0, 0, 0, 0))
    if bottom:
        nb = -(-bottom // s)
        m = row_mask(bottom, nb, False)
        mc = np.tile(np.repeat(m, s, axis=1), (1, c))
        seg = y[:, hb - nb:] * jnp.asarray(mc, y.dtype)[None, :, None, :]
        y = jax.lax.dynamic_update_slice(y, seg, (0, hb - nb, 0, 0))
    if left:
        nb = -(-left // s)
        m = row_mask(left, nb, True)
        mc = np.concatenate([np.tile(m[i], c * s)[None]
                             for i in range(nb)])           # dx pattern
        seg = y[:, :, :nb] * jnp.asarray(mc, y.dtype)[None, None, :, :]
        y = jax.lax.dynamic_update_slice(y, seg, (0, 0, 0, 0))
    if right:
        nb = -(-right // s)
        m = row_mask(right, nb, False)
        mc = np.concatenate([np.tile(m[i], c * s)[None]
                             for i in range(nb)])
        seg = y[:, :, wb - nb:] * jnp.asarray(mc, y.dtype)[None, None, :, :]
        y = jax.lax.dynamic_update_slice(y, seg, (0, 0, wb - nb, 0))
    return y


def prep_conv_s2d(w, bias, s: int, stride: int = 1,
                  offset: Optional[int] = None, dtype=None):
    """The input-independent half of conv_s2d: expand (s > 1) and cast
    the kernel/bias to their on-device form. Split out so inference can
    hoist it per checkpoint instead of per forward (see `prepared`)."""
    if s == 1:
        wex = w if dtype is None else w.astype(dtype)
        return wex, bias
    so = s // stride
    wex = expand_kernel(w, s, stride, offset)
    if dtype is not None:
        wex = wex.astype(dtype)
    bex = None if bias is None else jnp.repeat(bias, so * so)
    return wex, bex


def run_conv_s2d(x, wex, bex, s: int, stride: int = 1,
                 offset: Optional[int] = None, dtype=None,
                 preferred_f32: bool = False, kernel_size=None):
    """Execute conv_s2d given an already-prepared (wex, bex) pair."""
    dtype = dtype or x.dtype
    if s == 1:
        kh, kw = wex.shape[0], wex.shape[1]
        off = kh // 2 if offset is None else offset
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), wex.astype(dtype), (stride, stride),
            ((off, kh - 1 - off), (off, kw - 1 - off)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=(jnp.float32 if preferred_f32
                                    else None))
        if bex is not None:
            y = y + bex.astype(y.dtype)
        return y if preferred_f32 else y.astype(dtype)
    kk = wex.shape[0] // 2, wex.shape[1] // 2
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), wex.astype(dtype), (1, 1),
        ((kk[0], kk[0]), (kk[1], kk[1])),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32 if preferred_f32 else None)
    if bex is not None:
        y = y + bex.astype(y.dtype)
    return y if preferred_f32 else y.astype(dtype)


def conv_s2d(x, w, bias, s: int, stride: int = 1,
             offset: Optional[int] = None, dtype=None,
             preferred_f32: bool = False):
    """Run the original conv (w [kh,kw,Cin,Cout], bias [Cout] or None) on
    an s2d(s) input; returns the s2d(s//stride) output (same physical
    resolution)."""
    dtype = dtype or x.dtype
    wex, bex = prep_conv_s2d(w, bias, s, stride, offset, dtype=dtype)
    return run_conv_s2d(x, wex, bex, s, stride, offset, dtype=dtype,
                        preferred_f32=preferred_f32)


def prepared(module: nn.Module, name: str, compute: Callable[[], Any]):
    """Inference-time weight-prep cache (variable collection "wexp").

    Three modes, selected by the caller's `variables`/`mutable`:
      - normal apply (no "wexp" anywhere): compute() runs inline — the
        default, exactly the pre-cache behavior (training path).
      - prep pass (apply with mutable=["wexp"]): compute() runs and the
        result is recorded under the module's scope; the caller collects
        the new collection (see `prepare_variables`).
      - fast pass (variables include "wexp"): the recorded value is used
        directly — zero per-forward prep work (expansion einsums, casts,
        weight standardization all vanish from the forward HLO).
    Inference-only by construction: a training step never passes "wexp",
    so updated params always recompute their prep."""
    if module.has_variable("wexp", name):
        return module.get_variable("wexp", name)
    value = compute()
    if (module.scope is not None and not module.is_initializing()
            and module.scope.is_mutable_collection("wexp")):
        module.put_variable("wexp", name, value)
    return value


def prep_conv3d_s2d(w, bias, s: int, dtype=None):
    """Input-independent half of conv3d_s2d (see prep_conv_s2d)."""
    kd, kh, kw, cin, cout = w.shape
    if s == 1:
        return (w if dtype is None else w.astype(dtype)), bias
    sh, _ = _axis_map(kh, s, 1, kh // 2)
    sw, _ = _axis_map(kw, s, 1, kw // 2)
    wex = jnp.einsum("xpqa,yrtb,dabio->dxyiproqt",
                     jnp.asarray(sh, w.dtype), jnp.asarray(sw, w.dtype), w)
    k2h, k2w = sh.shape[0], sw.shape[0]
    wex = wex.reshape(kd, k2h, k2w, s * s * cin, s * s * cout)
    if dtype is not None:
        wex = wex.astype(dtype)
    bex = None if bias is None else jnp.repeat(bias, s * s)
    return wex, bex


def run_conv3d_s2d(x, wex, bex, s: int, dtype=None):
    """Execute conv3d_s2d given an already-prepared (wex, bex) pair."""
    dtype = dtype or x.dtype
    kd, k2h, k2w = wex.shape[0], wex.shape[1], wex.shape[2]
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), wex.astype(dtype), (1, 1, 1),
        ((kd // 2, kd // 2), (k2h // 2, k2h // 2), (k2w // 2, k2w // 2)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    if bex is not None:
        y = y + bex.astype(y.dtype)
    return y


def conv3d_s2d(x, w, bias, s: int, dtype=None):
    """Stride-1 3D conv ([kd,kh,kw,Cin,Cout], torch-style k//2 padding)
    on a volume whose H/W axes are in s2d(s) layout:
    x [B, D, H/s, W/s, Cin*s*s] -> [B, D, H/s, W/s, Cout*s*s].
    The depth axis stays native; only the spatial taps expand. Same
    MACs-per-lane as the direct conv at C=8 (the expansion factor equals
    the lane-waste factor) but every elementwise/norm op gets full
    lanes — the PixelViewWeight fix (docs/perf_breakdown.md r2 item 4:
    "the win needs channel widening")."""
    dtype = dtype or x.dtype
    wex, bex = prep_conv3d_s2d(w, bias, s, dtype=dtype)
    return run_conv3d_s2d(x, wex, bex, s, dtype=dtype)


def repeat_channels(v, s: int):
    """Per-original-channel vector -> s2d channels (c-major)."""
    if s == 1:
        return v
    return jnp.repeat(v, s * s, axis=-1)


def upsample_nearest_s2d(x, s_in: int):
    """Nearest x2 on the original tensor: s2d(s_in) repr -> s2d(2*s_in)
    repr at the SAME physical resolution (pure channel duplication:
    (c, p1, p2) <- (c, p1//2, p2//2)). Implemented as repeats on the
    (s, s) sub-axes of the c-major channel view — a jnp.take over the
    channel axis lowered to a ~1500-op while loop on TPU (~7 ms/forward
    in the feature net, tools/trace_op.py feature)."""
    cs = x.shape[-1]
    c = cs // (s_in * s_in)
    lead = x.shape[:-1]
    v = x.reshape(lead + (c, s_in, s_in))
    v = jnp.repeat(jnp.repeat(v, 2, axis=-2), 2, axis=-1)
    return v.reshape(lead + (c * 4 * s_in * s_in,))


class ConvS2D(nn.Module):
    """nn.Conv drop-in (same 'kernel'/'bias' param names and ORIGINAL
    shapes) that executes on an s2d(s) input and emits the
    s2d(s//stride) output."""

    features: int
    kernel_size: Tuple[int, int]
    s: int = 1
    stride: int = 1
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Union[Callable, Any] = nn.initializers.zeros
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    # minimal-span mode: run the conv at window alignment `offset` with
    # the trimmed expansion (2x2 instead of 3x3 for k=3 — 2.25x fewer
    # MACs). Off-center offsets shift the output; the caller owns the
    # shift bookkeeping (nn/feature.py phase_opt).
    min_span: bool = False
    offset: int = 0

    @nn.compact
    def __call__(self, x, return_prepped: bool = False):
        """return_prepped: declare params and return the prepared
        (wex, bex, (pad_lo_h, pad_lo_w)) WITHOUT running the conv —
        the hook callers use to execute the same math folded elsewhere
        (e.g. nn/feature.py fold_head). Identical param + "wexp" trees
        either way; pad_lo is the padding the XLA path would use."""
        kh, kw = self.kernel_size
        cin = int(x.shape[-1]) // (self.s * self.s)
        kernel = self.param("kernel", self.kernel_init,
                            (kh, kw, cin, self.features), jnp.float32)
        bias = (self.param("bias", self.bias_init, (self.features,),
                           jnp.float32) if self.use_bias else None)
        dtype = self.dtype or x.dtype
        if self.min_span:
            wex, bex = prepared(self, "wexm", lambda: prep_conv_s2d_min(
                kernel, bias, self.s, self.stride, self.offset,
                dtype=dtype))
            if return_prepped:
                lo = _min_pads(kh, self.s, self.stride, self.offset)[0]
                return wex, bex, (lo, lo)
            return run_conv_s2d_min(x, wex, bex, kh, self.s, self.stride,
                                    self.offset, dtype=dtype)
        wex, bex = prepared(self, "wex", lambda: prep_conv_s2d(
            kernel, bias, self.s, self.stride, dtype=dtype))
        if return_prepped:
            return wex, bex, (wex.shape[0] // 2, wex.shape[1] // 2)
        return run_conv_s2d(x, wex, bex, self.s, self.stride,
                            dtype=dtype)


def prepare_wexp(apply_fn, variables, *args, **kwargs):
    """Run one apply pass that records the "wexp" weight-prep collection
    and return `variables` extended with it. The pass is jitted to
    return ONLY the collection, so XLA dead-code-eliminates the actual
    forward compute — the cost is just the prep subgraph (kernel
    expansions + casts), once per loaded checkpoint.

    apply_fn(variables, *args, mutable=[...], **kwargs) must follow the
    flax Module.apply signature (pass `model.apply` or a lambda). Only
    array leaves are traced; Python scalars/functions in args stay
    closure constants (e.g. train=False flags)."""
    leaves, treedef = jax.tree_util.tree_flatten((args, kwargs))
    arr_idx = [i for i, leaf in enumerate(leaves)
               if isinstance(leaf, (jax.Array, np.ndarray))]

    @jax.jit
    def _prep(v, arr_leaves):
        full = list(leaves)
        for i, leaf in zip(arr_idx, arr_leaves):
            full[i] = leaf
        a, kw = jax.tree_util.tree_unflatten(treedef, full)
        return apply_fn(v, *a, mutable=["wexp"], **kw)[1]

    wexp = _prep(variables, [leaves[i] for i in arr_idx])
    return {**variables, **wexp}


def to_s2d_vol(x, s: int):
    """[B,D,H,W,C] -> [B,D,H/s,W/s,C*s*s] (H/W axes only)."""
    if s == 1:
        return x
    b, d, h, w, c = x.shape
    return to_s2d(x.reshape(b * d, h, w, c), s).reshape(
        b, d, h // s, w // s, c * s * s)


def from_s2d_vol(x, s: int):
    """Inverse of to_s2d_vol."""
    if s == 1:
        return x
    b, d, h, w, cs = x.shape
    return from_s2d(x.reshape(b * d, h, w, cs), s).reshape(
        b, d, h * s, w * s, cs // (s * s))


class Conv3DS2D(nn.Module):
    """3D nn.Conv drop-in (same 'kernel'/'bias' names, ORIGINAL shapes)
    executing on a volume with s2d(s) H/W axes (stride 1)."""

    features: int
    kernel_size: Tuple[int, int, int]
    s: int = 1
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Union[Callable, Any] = nn.initializers.zeros
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        kd, kh, kw = self.kernel_size
        cin = int(x.shape[-1]) // (self.s * self.s)
        kernel = self.param("kernel", self.kernel_init,
                            (kd, kh, kw, cin, self.features), jnp.float32)
        bias = (self.param("bias", self.bias_init, (self.features,),
                           jnp.float32) if self.use_bias else None)
        dtype = self.dtype or x.dtype
        wex, bex = prepared(self, "wex", lambda: prep_conv3d_s2d(
            kernel, bias, self.s, dtype=dtype))
        return run_conv3d_s2d(x, wex, bex, self.s, dtype=dtype)


class BatchNormS2D(nn.Module):
    """nn.BatchNorm drop-in on an s2d(s) input: same param tree
    ('scale'/'bias' in params, 'mean'/'var' in batch_stats, all of
    ORIGINAL channel length C). Per-original-channel statistics reduce
    over (B, h, w) and the s^2 sub-channel phases (c-major order), so
    train-mode stats equal the NHWC BatchNorm's. Matches flax semantics:
    biased variance, running = momentum*running + (1-momentum)*batch.
    """

    s: int = 1
    use_running_average: bool = True
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, return_affine: bool = False, channels: int = 0):
        """x: [..., C*s*s] (any number of leading batch/spatial dims).

        return_affine: declare params and return the prepared inference
        (mul, add) pair WITHOUT applying it (running-average mode only)
        `channels` supplies C*s*s when x is None."""
        cs = channels if x is None else x.shape[-1]
        ss = self.s * self.s
        c = cs // ss
        scale = self.param("scale", nn.initializers.ones, (c,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
            mul, add = prepared(self, "affine", lambda: (
                repeat_channels(
                    scale * jax.lax.rsqrt(var + self.epsilon), self.s),
                repeat_channels(
                    bias - mean * scale
                    * jax.lax.rsqrt(var + self.epsilon), self.s)))
            if return_affine:
                return mul, add
            y = x.astype(jnp.float32) * mul + add
            return y.astype(self.dtype or x.dtype)
        else:
            assert not return_affine, \
                "return_affine needs running-average mode"
            xf = x.astype(jnp.float32).reshape(x.shape[:-1] + (c, ss))
            red = tuple(range(x.ndim - 1)) + (x.ndim,)
            mean = xf.mean(axis=red)
            var = ((xf - mean[:, None]) ** 2).mean(axis=red)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum) * var)
        mul = repeat_channels(
            scale * jax.lax.rsqrt(var + self.epsilon), self.s)
        add = repeat_channels(bias - mean * scale
                              * jax.lax.rsqrt(var + self.epsilon), self.s)
        y = x.astype(jnp.float32) * mul + add
        return y.astype(self.dtype or x.dtype)


class GroupNormS2D(nn.Module):
    """nn.GroupNorm drop-in (same 'scale'/'bias' params, original C) on
    an s2d(s) input. c-major channel order keeps groups contiguous, so
    the statistics are identical to NHWC GroupNorm.

    scale_shift/silu: optional fused FiLM conditioning + SiLU epilogue.
    The FiLM affine folds into the per-channel norm affine (tiny [B,cs]
    algebra), so norm-apply + FiLM + SiLU run as ONE elementwise pass
    over the tensor instead of three — the separate passes measured
    ~10 ms per stage-3 call (tools/trace_op.py). Same math modulo f32
    reassociation (and the FiLM product now runs in f32 rather than the
    compute dtype — strictly tighter)."""

    num_groups: int
    s: int = 1
    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, scale_shift=None, silu: bool = False):
        b, h, w, cs = x.shape
        c = cs // (self.s * self.s)
        scale = self.param("scale", nn.initializers.ones, (c,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,),
                          jnp.float32)
        g = self.num_groups
        # lane-preserving statistics: reduce over (H, W) per s2d channel
        # first ([B, cs], full lanes), then group-sum the tiny
        # per-channel moments — never reshape the 128-wide lane axis
        # into (g, cs/g) (that relayout measured ~20 ms/forward)
        xf = x.astype(jnp.float32)
        m1 = xf.mean(axis=(1, 2))                      # [B, cs]
        m2 = (xf * xf).mean(axis=(1, 2))               # [B, cs]
        gm1 = m1.reshape(b, g, cs // g).mean(axis=2)   # [B, g] (tiny)
        gm2 = m2.reshape(b, g, cs // g).mean(axis=2)
        var = gm2 - gm1 * gm1
        mul = jax.lax.rsqrt(var + self.epsilon)        # [B, g]
        mean_ch = jnp.repeat(gm1, cs // g, axis=1)     # [B, cs] (tiny op)
        mul_ch = jnp.repeat(mul, cs // g, axis=1)
        sc, bi = prepared(self, "affine", lambda: (
            repeat_channels(scale, self.s),
            repeat_channels(bias, self.s)))
        a = (mul_ch[:, None, None, :] * sc)            # [B,1,1,cs]
        b0 = bi - mean_ch[:, None, None, :] * a
        if scale_shift is not None:
            film_scale, film_shift = scale_shift       # [B,1,1,C] each
            fs = repeat_channels(film_scale, self.s).astype(
                jnp.float32) + 1.0
            a = a * fs
            b0 = b0 * fs + repeat_channels(film_shift, self.s).astype(
                jnp.float32)
        y = xf * a + b0
        if silu:
            y = nn.silu(y)
        return y.astype(self.dtype or x.dtype)
