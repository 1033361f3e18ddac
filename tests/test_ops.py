"""ops/ parity tests."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from diffmvs_tpu.ops.correlation import aggregate_views, group_correlation
from diffmvs_tpu.ops.resize import upsample_nearest
from diffmvs_tpu.ops.softargmax import depth_regression_with_confidence


def test_softargmax_confidence_matches_torch(rng):
    """Expectation + 4-bin windowed confidence vs the reference's padded
    avg_pool3d gather (module.py:553-571)."""
    b, d, h, w = 2, 16, 5, 6
    logits = (3 * rng.randn(b, d, h, w)).astype(np.float32)

    normalized, conf = jax.jit(depth_regression_with_confidence)(
        jnp.asarray(logits))

    prob = torch.softmax(torch.from_numpy(logits), dim=1)
    index = torch.arange(d, dtype=torch.float32).view(1, d, 1, 1)
    index = torch.sum(index * prob, dim=1, keepdim=True)
    ref_norm = (index / (d - 1.0))[:, 0].numpy()

    prob_sum4 = 4 * F.avg_pool3d(
        F.pad(prob.unsqueeze(1), pad=(0, 0, 0, 0, 1, 2)),
        (4, 1, 1), stride=1, padding=0).squeeze(1)
    idx = index.long().clamp(0, d - 1)
    ref_conf = torch.gather(prob_sum4, 1, idx)[:, 0].numpy()

    np.testing.assert_allclose(np.asarray(normalized), ref_norm,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(conf), ref_conf,
                               rtol=1e-4, atol=1e-5)


def test_group_correlation(rng):
    b, d, h, w, c, g = 1, 3, 4, 5, 8, 4
    warped = rng.randn(b, d, h, w, c).astype(np.float32)
    ref = rng.randn(b, h, w, c).astype(np.float32)
    out = np.asarray(jax.jit(group_correlation, static_argnums=2)(
        jnp.asarray(warped), jnp.asarray(ref), g))
    # manual check for one (g, d, pixel)
    expected = (warped[0, 1, 2, 3, 2:4] * ref[0, 2, 3, 2:4]).mean()
    np.testing.assert_allclose(out[0, 1, 2, 3, 1], expected, rtol=1e-5)
    assert out.shape == (b, d, h, w, g)


def test_aggregate_views_matches_weighted_mean(rng):
    v, b, d, h, w, g = 3, 1, 2, 4, 5, 2
    cors = rng.randn(v, b, d, h, w, g).astype(np.float32)
    weights = rng.rand(v, b, h, w).astype(np.float32)
    out = np.asarray(jax.jit(aggregate_views)(
        jnp.asarray(cors), jnp.asarray(weights)))
    wexp = weights[:, :, None, :, :, None]
    expected = (cors * wexp).sum(0) / (wexp.sum(0) + 1e-8)
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-6)


def test_upsample_nearest_matches_interpolate(rng):
    x = rng.randn(1, 4, 5).astype(np.float32)
    out = np.asarray(upsample_nearest(jnp.asarray(x), 4))
    ref = F.interpolate(torch.from_numpy(x).unsqueeze(1), scale_factor=4,
                        mode="nearest")[:, 0].numpy()
    np.testing.assert_allclose(out, ref)


def test_upsample_nearest_nhwc(rng):
    x = rng.randn(1, 3, 4, 2).astype(np.float32)
    out = np.asarray(upsample_nearest(jnp.asarray(x), 2))
    ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                        scale_factor=2, mode="nearest")
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(out, ref)
