"""L0 geometry parity tests (torch CPU as the oracle where applicable)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from diffmvs_tpu.geometry import (
    bilinear_sample,
    depth_range_samples,
    depth_to_disp,
    disp_to_depth,
    invert_rigid_4x4,
    plane_sweep_warp,
    upsample_with_mask,
)
from diffmvs_tpu.geometry.transforms import compose_projection


def test_disp_depth_roundtrip(rng):
    disp = rng.rand(2, 8, 8).astype(np.float32)
    dmin, dmax = 2.5, 100.0
    @jax.jit
    def roundtrip(d):
        _, depth = disp_to_depth(d, dmin, dmax)
        return depth_to_disp(depth, dmin, dmax)

    back = roundtrip(jnp.asarray(disp))
    np.testing.assert_allclose(np.asarray(back), disp, rtol=1e-5, atol=1e-6)


def test_invert_4x4(rng):
    # general invertible projections with last row (0,0,0,1)
    mats = rng.randn(4, 4, 4).astype(np.float32)
    mats[:, 3] = [0, 0, 0, 1]
    mats[:, :3, :3] += 3 * np.eye(3)
    inv = np.asarray(jax.jit(invert_rigid_4x4)(jnp.asarray(mats)))
    for m, mi in zip(mats, inv):
        np.testing.assert_allclose(m @ mi, np.eye(4), atol=1e-4)


def test_bilinear_sample_matches_grid_sample(rng):
    """Bit-level semantics vs torch grid_sample (bilinear/zeros/align_corners)."""
    b, hs, ws, c = 2, 13, 17, 5
    n = 400
    src = rng.randn(b, hs, ws, c).astype(np.float32)
    # cover interior, borders, and far out-of-bounds
    x = (rng.rand(b, n).astype(np.float32) * (ws + 8) - 4)
    y = (rng.rand(b, n).astype(np.float32) * (hs + 8) - 4)

    ours = np.asarray(jax.jit(bilinear_sample)(
        jnp.asarray(src), jnp.asarray(x), jnp.asarray(y)))

    src_t = torch.from_numpy(src).permute(0, 3, 1, 2)
    gx = torch.from_numpy(x) / ((ws - 1) / 2) - 1
    gy = torch.from_numpy(y) / ((hs - 1) / 2) - 1
    grid = torch.stack([gx, gy], dim=-1).unsqueeze(1)     # [B,1,N,2]
    ref = F.grid_sample(src_t, grid, mode="bilinear", padding_mode="zeros",
                        align_corners=True)
    ref = ref[:, :, 0].permute(0, 2, 1).numpy()           # [B,N,C]

    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def _random_cam_pairs(b):
    """(extrinsic, intrinsic) [B,2,4,4] stacks with plausible geometry."""
    def pair(tx):
        k = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
        e = np.eye(4)
        th = 0.05 * tx
        e[:3, :3] = [[np.cos(th), 0, np.sin(th)],
                     [0, 1, 0],
                     [-np.sin(th), 0, np.cos(th)]]
        e[:3, 3] = [0.3 * tx, 0.05 * tx, 0.0]
        p = np.zeros((2, 4, 4))
        p[0] = e
        p[1, :3, :3] = k
        return p.astype(np.float32)

    ref = np.stack([pair(0)] * b)
    src = np.stack([pair(1 + 0.1 * i) for i in range(b)])
    return ref, src


def test_plane_sweep_warp_matches_torch(rng):
    """Warp parity vs a float64 torch re-implementation of
    differentiable_warping's math (module.py:181-218). Our float32 result
    uses an analytically composed relative projection, so it should sit
    within float32 rounding of the f64 truth."""
    b, hs, ws, c, d, h, w = 2, 24, 32, 6, 5, 12, 16
    src_fea = rng.randn(b, hs, ws, c).astype(np.float32)
    ref_pair, src_pair = _random_cam_pairs(b)
    depths = (4.0 + 4.0 * rng.rand(b, d, h, w)).astype(np.float32)

    ours = np.asarray(jax.jit(plane_sweep_warp)(
        jnp.asarray(src_fea), jnp.asarray(src_pair), jnp.asarray(ref_pair),
        jnp.asarray(depths)))

    # float64 torch oracle on the composed projections
    def compose(p):
        out = p[:, 0].copy().astype(np.float64)
        out[:, :3, :4] = p[:, 1, :3, :3].astype(np.float64) @ \
            p[:, 0, :3, :4].astype(np.float64)
        return torch.from_numpy(out)

    src_t = torch.from_numpy(src_fea).double().permute(0, 3, 1, 2)
    proj = compose(src_pair) @ torch.inverse(compose(ref_pair))
    rot, trans = proj[:, :3, :3], proj[:, :3, 3:4]
    ys, xs = torch.meshgrid(torch.arange(h, dtype=torch.float64),
                            torch.arange(w, dtype=torch.float64),
                            indexing="ij")
    xyz = torch.stack([xs.reshape(-1), ys.reshape(-1),
                       torch.ones(h * w, dtype=torch.float64)])
    xyz = xyz.unsqueeze(0).repeat(b, 1, 1)
    rot_xyz = rot @ xyz
    rd = rot_xyz.unsqueeze(2) * torch.from_numpy(depths).double().view(
        b, 1, d, -1)
    pxyz = rd + trans.view(b, 3, 1, 1)
    z = pxyz[:, 2:3]
    z = torch.where(z == 0, torch.full_like(z, 1e-8), z)
    pxy = pxyz[:, :2] / z
    gx = pxy[:, 0] / ((ws - 1) / 2) - 1
    gy = pxy[:, 1] / ((hs - 1) / 2) - 1
    grid = torch.stack([gx, gy], dim=3)
    warped = F.grid_sample(src_t, grid.view(b, d * h, w, 2), mode="bilinear",
                           padding_mode="zeros", align_corners=True)
    ref_out = warped.view(b, c, d, h, w).permute(0, 2, 3, 4, 1).numpy()

    np.testing.assert_allclose(ours, ref_out, rtol=1e-3, atol=2e-3)


def test_packed_sampler_matches_naive(rng):
    """Corner-packed single-gather path == naive 4-gather path, including
    border-straddling and fully out-of-bounds samples."""
    from diffmvs_tpu.geometry.sampling import (
        bilinear_sample_packed, pack_corners)

    b, hs, ws, c = 2, 9, 11, 5
    n = 600
    src = rng.randn(b, hs, ws, c).astype(np.float32)
    x = (rng.rand(b, n).astype(np.float32) * (ws + 6) - 3)
    y = (rng.rand(b, n).astype(np.float32) * (hs + 6) - 3)
    # exact-integer and exact-border coords too
    x[:, :20] = np.round(x[:, :20])
    y[:, :20] = np.round(y[:, :20])

    naive = np.asarray(jax.jit(bilinear_sample)(
        jnp.asarray(src), jnp.asarray(x), jnp.asarray(y)))
    packed = jax.jit(
        lambda s, xx, yy: bilinear_sample_packed(
            pack_corners(s), hs, ws, c, xx, yy)
    )(jnp.asarray(src), jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(packed), naive, rtol=1e-5,
                               atol=1e-6)


def test_compose_projection(rng):
    ext = np.eye(4, dtype=np.float32)[None].repeat(3, 0)
    ext[:, :3, 3] = rng.randn(3, 3)
    intr = np.zeros((3, 4, 4), dtype=np.float32)
    intr[:, :3, :3] = np.array([[50, 0, 16], [0, 50, 12], [0, 0, 1]],
                               dtype=np.float32)
    pair = np.stack([ext, intr], axis=1)            # [B,2,4,4]
    full = np.asarray(jax.jit(compose_projection)(jnp.asarray(pair)))
    expected_top = intr[:, :3, :3] @ ext[:, :3, :4]
    np.testing.assert_allclose(full[:, :3, :4], expected_top, rtol=1e-6)
    np.testing.assert_allclose(full[:, 3], ext[:, 3], rtol=1e-6)


def test_depth_range_samples_fixed_and_adaptive(rng):
    cur = rng.rand(2, 6, 7).astype(np.float32)
    drs = jax.jit(depth_range_samples, static_argnums=(1,))
    out = np.asarray(drs(jnp.asarray(cur), 4, 0.01))
    assert out.shape == (2, 4, 6, 7)
    assert out.min() >= 0 and out.max() <= 1
    # spacing: (hi - lo) / (n-1) with radius ndepth//2*interval = 0.02
    interior = (cur > 0.1) & (cur < 0.9)
    spacing = (out[:, 1] - out[:, 0])[interior]
    np.testing.assert_allclose(spacing, 0.04 / 3, rtol=1e-4)

    conf = rng.rand(2, 6, 7).astype(np.float32)
    out2 = np.asarray(drs(
        jnp.asarray(cur), 4, 0.01, jnp.asarray(conf), 0.25, 4.0))
    r = 0.02 * (0.25 + (1 - conf) * 3.75)
    lo = np.clip(cur - r, 0, 1)
    np.testing.assert_allclose(out2[:, 0], lo, atol=1e-5)


def test_convex_upsample_matches_torch(rng):
    """Parity vs torch unfold-based upsample_depth (module.py:237-248)."""
    b, h, w, ratio = 2, 6, 8, 4
    depth = rng.randn(b, h, w).astype(np.float32)
    mask = rng.randn(b, h, w, 9 * ratio * ratio).astype(np.float32)

    ours = np.asarray(jax.jit(upsample_with_mask, static_argnums=2)(
        jnp.asarray(depth), jnp.asarray(mask), ratio))

    # torch oracle (channel-first mask layout)
    d_t = torch.from_numpy(depth).unsqueeze(1)
    m_t = torch.from_numpy(mask).permute(0, 3, 1, 2)
    m_t = m_t.view(b, 1, 9, ratio, ratio, h, w)
    m_t = torch.softmax(m_t, dim=2)
    up = F.unfold(d_t, [3, 3], padding=1).view(b, 1, 9, 1, 1, h, w)
    up = torch.sum(m_t * up, dim=2)
    up = up.permute(0, 1, 4, 2, 5, 3).reshape(b, ratio * h, ratio * w)
    np.testing.assert_allclose(ours, up.numpy(), rtol=1e-4, atol=1e-5)


def test_upsample_partition_of_unity(rng):
    """Constant maps stay constant under convex upsampling."""
    depth = np.full((1, 5, 5), 3.25, np.float32)
    mask = rng.randn(1, 5, 5, 9 * 4).astype(np.float32)
    # interior only — borders mix in zero padding
    out = np.asarray(jax.jit(upsample_with_mask, static_argnums=2)(
        jnp.asarray(depth), jnp.asarray(mask), 2))
    np.testing.assert_allclose(out[:, 2:-2, 2:-2], 3.25, rtol=1e-5)
