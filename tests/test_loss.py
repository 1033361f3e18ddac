"""Loss layout + value tests vs a torch oracle of loss.py."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from diffmvs_tpu.models.loss import compute_inverse_loss, loss_layout


def test_layout_diffmvs():
    stage_id, conf_flag = loss_layout((1, 4, 0))
    assert stage_id == [1, 2, 2, 2, 2, 2, 4]
    assert conf_flag == [False, False, True, True, True, True, False]


def test_layout_casdiffmvs():
    stage_id, conf_flag = loss_layout((1, 3, 3))
    assert stage_id == [1, 2, 2, 2, 2, 3, 3, 3, 3, 4]
    assert conf_flag == [False, False, True, True, True, False,
                         True, True, True, False]


def _torch_inverse_loss(depths, confs, depth_gt, mask, depth_values,
                        stage_iters, loss_rate, conf_weight):
    """Independent torch re-implementation of loss.py:6-74."""
    def depth_to_disp(depth, dmin, dmax):
        return (1.0 / depth - 1.0 / dmax) / (1.0 / dmin - 1.0 / dmax)

    from diffmvs_tpu.models.loss import loss_layout as layout
    stage_id, conf_flag = layout(stage_iters)

    disp_min = depth_values[:, 0][:, None, None]
    disp_max = depth_values[:, -1][:, None, None]
    dmax = 1.0 / disp_min
    dmin = 1.0 / disp_max

    total = 0.0
    n = len(depths)
    ci = 0
    for i, d in enumerate(depths):
        est = depth_to_disp(torch.from_numpy(d), dmin, dmax)
        gt = torch.from_numpy(depth_gt[f"stage{stage_id[i]}"])
        gt = torch.where(gt > 1e-4, gt, dmax.expand_as(gt))
        gt = depth_to_disp(gt, dmin, dmax)
        m = torch.from_numpy(mask[f"stage{stage_id[i]}"]) > 0.5
        if conf_flag[i]:
            c = torch.from_numpy(confs[ci]); ci += 1
            u = torch.clamp(1 - c, min=1e-6)
            term = (est - gt).abs() / u + conf_weight * torch.log(u)
            li = term[m].mean()
        else:
            li = F.l1_loss(est[m], gt[m])
        total = total + loss_rate ** (n - i - 1) * li
    return float(total)


def test_loss_value_matches_torch(rng):
    b, h, w = 2, 16, 24
    stage_iters = (1, 3, 3)
    from diffmvs_tpu.models.loss import loss_layout as layout
    stage_id, conf_flag = layout(stage_iters)

    res = {1: 8, 2: 4, 3: 2, 4: 1}
    depth_gt, mask = {}, {}
    for s in (1, 2, 3, 4):
        r = res[s]
        gt = (5.0 + rng.rand(b, h // r, w // r)).astype(np.float32)
        gt[:, 0, 0] = 0.0                       # invalid GT pixel
        depth_gt[f"stage{s}"] = gt
        m = (rng.rand(b, h // r, w // r) > 0.3).astype(np.float32)
        mask[f"stage{s}"] = m

    depths = [(5.0 + rng.rand(b, h // res[sid], w // res[sid])
               ).astype(np.float32) for sid in stage_id]
    confs = [rng.rand(b, h // res[sid], w // res[sid]).astype(np.float32)
             for sid, cf in zip(stage_id, conf_flag) if cf]
    depth_values = np.broadcast_to(
        np.linspace(1 / 10.0, 1 / 4.0, 32, dtype=np.float32), (b, 32)).copy()

    total, loss_dict = jax.jit(
        lambda d, c, g, m, dv: compute_inverse_loss(
            d, c, g, m, dv, stage_iters, 0.9, 0.05)
    )([jnp.asarray(d) for d in depths], [jnp.asarray(c) for c in confs],
      {k: jnp.asarray(v) for k, v in depth_gt.items()},
      {k: jnp.asarray(v) for k, v in mask.items()},
      jnp.asarray(depth_values))

    ref = _torch_inverse_loss(depths, confs, depth_gt, mask,
                              torch.from_numpy(depth_values),
                              stage_iters, 0.9, 0.05)
    np.testing.assert_allclose(float(total), ref, rtol=1e-4)
    assert len(loss_dict) == len(depths)
