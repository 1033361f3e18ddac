"""RAFT-style learned convex upsampling of depth maps.

Parity target: /root/reference/models/module.py:237-248 (`upsample_depth`):
softmax over 9 neighbors x ratio^2 sub-pixel positions; the upsampled value
is a convex combination of the 3x3 neighborhood of the coarse map
(F.unfold zero-pads the border).

TPU design: F.unfold is replaced by 9 statically shifted, zero-padded views
of the depth map (pure slices — no gather), and the weighted sum is a single
einsum the compiler maps onto the VPU. All shapes static.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _shifted_stack(depth):
    """[B, H, W] -> [B, H, W, 9] of 3x3 zero-padded neighborhoods.

    Channel k = ky*3+kx holds depth[h+ky-1, w+kx-1] — matching F.unfold's
    row-major patch order (module.py:243).
    """
    padded = jnp.pad(depth, ((0, 0), (1, 1), (1, 1)))
    h, w = depth.shape[1], depth.shape[2]
    views = [
        padded[:, ky:ky + h, kx:kx + w]
        for ky in range(3)
        for kx in range(3)
    ]
    return jnp.stack(views, axis=-1)


def upsample_with_mask(depth, mask_logits, ratio):
    """Convex upsample.

    depth: [B, H, W] coarse map (inverse depth in the model).
    mask_logits: [B, H, W, 9*ratio*ratio] from the mask head, already scaled
      by 0.25 by callers (module.py:511, update.py:463).
    Returns [B, H*ratio, W*ratio].
    """
    b, h, w = depth.shape
    mask = mask_logits.reshape(b, h, w, 9, ratio * ratio)
    mask = jax.nn.softmax(mask, axis=3)                      # softmax over 9

    patches = _shifted_stack(depth)                          # [B,H,W,9]
    up = jnp.einsum("bhwk,bhwkr->bhwr", patches, mask,
                    precision=jax.lax.Precision.HIGHEST)     # [B,H,W,r*r]

    up = up.reshape(b, h, w, ratio, ratio)
    up = up.transpose(0, 1, 3, 2, 4)                         # [B,H,r,W,r]
    return up.reshape(b, h * ratio, w * ratio)
