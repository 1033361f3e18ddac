"""Differentiable plane-sweep warping (the MVS hot path).

Parity target: /root/reference/models/module.py:181-218
(`differentiable_warping`): project the reference pixel grid at D depth
hypotheses into a source view and bilinearly sample its features.

Design notes (TPU):
  * The relative projection is built analytically from the (extrinsic,
    intrinsic) pairs (geometry/transforms.py:relative_projection) instead of
    LU-inverting the composed K·[R|t] like the reference — float32-stable.
  * Projection math is wrapped in stop_gradient exactly like the reference's
    no_grad block — gradients flow to the *source features* through the
    bilinear sample, never to the depth hypotheses through the coordinates.
  * Coordinates are produced in pixel units; see geometry/sampling.py for
    why that equals grid_sample(align_corners=True).
  * The warp itself is a row-gather; the correlation consumer is fused in
    ops/correlation.py (XLA) / ops/pallas/warp_corr.py (Pallas).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from diffmvs_tpu.geometry.sampling import (
    bilinear_sample,
    bilinear_sample_packed,
    pack_corners,
)
from diffmvs_tpu.geometry.transforms import relative_projection


def plane_sweep_coords(rot, trans, depth_values):
    """Source-view pixel coordinates for each ref pixel x depth hypothesis.

    rot: [B, 3, 3], trans: [B, 3] — relative projection src <- ref.
    depth_values: [B, D, H, W] metric depths of the hypotheses.
    Returns (x, y): each [B, D, H, W] float32, gradients stopped.
    """
    b, d, h, w = depth_values.shape

    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    # rot @ [X, Y, 1] written as explicit fused-multiply-adds instead of
    # a matmul: elementwise fuses with the depth scaling below, and the
    # SAME expression form is used by the Pallas kernel's tile-layout
    # geometry (ops/pallas/warp_corr._tile_geometry) so both paths round
    # coordinates identically (the MXU matmul rounded differently and
    # cost ~1.9e-4 pallas-vs-xla parity on TPU; fma form restores ~1e-6)
    xg = xs[None]                                          # [1, H, W]
    yg = ys[None]

    def row(i):
        r0 = rot[:, i, 0][:, None, None]
        r1 = rot[:, i, 1][:, None, None]
        r2 = rot[:, i, 2][:, None, None]
        lin = r0 * xg + r1 * yg + r2                       # [B, H, W]
        return (lin[:, None] * depth_values
                + trans[:, i][:, None, None, None])        # [B, D, H, W]

    z = row(2)
    z = jnp.where(z == 0.0, 1e-8, z)                       # module.py:206
    x = row(0) / z
    y = row(1) / z

    x = jax.lax.stop_gradient(x).reshape(b, d, h, w)
    y = jax.lax.stop_gradient(y).reshape(b, d, h, w)
    return x, y


def plane_sweep_warp(src_fea, src_pair, ref_pair, depth_values,
                     packed: bool = True):
    """Warp source features onto the reference plane-sweep volume.

    src_fea: [B, Hs, Ws, C] source-view features (NHWC).
    src_pair, ref_pair: [B, 2, 4, 4] (extrinsic, intrinsic) stacks.
    depth_values: [B, D, H, W] metric depth hypotheses at ref resolution.
    packed=True uses the corner-packed single-gather path (4x fewer gather
    rows; exact parity with the naive path — tests/test_geometry.py).
    Returns [B, D, H, W, C].
    """
    rot, trans = relative_projection(src_pair, ref_pair)
    x, y = plane_sweep_coords(rot, trans, depth_values)
    if packed:
        b, hs, ws, c = src_fea.shape
        return bilinear_sample_packed(pack_corners(src_fea), hs, ws, c, x, y)
    return bilinear_sample(src_fea, x, y)
