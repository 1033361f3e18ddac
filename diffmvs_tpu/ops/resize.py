"""Nearest-neighbor power-of-two upsampling.

Parity target: F.interpolate(scale_factor=2**k, mode='nearest') as used at
/root/reference/models/diffusion.py:205,219-221,235,275 and module.py:409,415.
For integer scale factors torch nearest replicates each pixel s times, which
is a pure reshape/broadcast here — no gather, free for XLA to fuse.
"""

from __future__ import annotations

import jax.numpy as jnp


def upsample_nearest(x, scale: int, spatial_axes=(1, 2)):
    """Replicate-upsample by integer `scale` along `spatial_axes`.

    Works for [B, H, W], [B, H, W, C] and friends.
    """
    if scale == 1:
        return x
    for ax in spatial_axes:
        x = jnp.repeat(x, scale, axis=ax)
    return x
