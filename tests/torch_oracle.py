"""Compact torch oracle of the DiffMVS/CasDiffMVS architecture.

Independent re-implementation (NOT copied from the reference) used only by
tests: its module tree reproduces the reference's state_dict key names so
diffmvs_tpu.tools.torch_import can consume it, and its eval forward defines
the numerical ground truth for full-model parity. Noise is forced to zero
(the deterministic seam: rng=None on our side).

Architecture spec follows SURVEY.md §2 and the file/line citations in the
framework's docstrings.
"""

import math
from functools import partial

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------

class CBR2d(nn.Module):
    """conv+bn(+relu), names: .conv/.bn (2D)."""

    def __init__(self, cin, cout, k=3, s=1, p=0, relu=True):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, stride=s, padding=p, bias=False)
        self.bn = nn.BatchNorm2d(cout)
        self.relu = relu

    def forward(self, x):
        x = self.bn(self.conv(x))
        return F.relu(x) if self.relu else x


class CBR3d(nn.Module):
    def __init__(self, cin, cout, k=3, s=1, p=1, relu=True):
        super().__init__()
        self.conv = nn.Conv3d(cin, cout, k, stride=s, padding=p, bias=False)
        self.bn = nn.BatchNorm3d(cout)
        self.relu = relu

    def forward(self, x):
        x = self.bn(self.conv(x))
        return F.relu(x) if self.relu else x


class DeCBR3d(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = nn.ConvTranspose3d(cin, cout, 3, stride=2, padding=1,
                                       output_padding=1, bias=False)
        self.bn = nn.BatchNorm3d(cout)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class ResBlock(nn.Module):
    """names: conv1(.conv/.bn), conv2, downsample (when strided)."""

    def __init__(self, cin, cout, s=1):
        super().__init__()
        self.conv1 = CBR2d(cin, cout, 3, s, 1, relu=True)
        self.conv2 = CBR2d(cout, cout, 3, 1, 1, relu=False)
        self.downsample = CBR2d(cin, cout, 3, s, 1, relu=False) if s != 1 \
            else None

    def forward(self, x):
        y = self.conv2(self.conv1(x))
        if self.downsample is not None:
            x = self.downsample(x)
        return F.relu(x + y)


class GRUSep(nn.Module):
    def __init__(self, hdim, idim):
        super().__init__()
        for tag, k, p in (("1", (1, 5), (0, 2)), ("2", (5, 1), (2, 0))):
            for g in "zrq":
                setattr(self, f"conv{g}{tag}",
                        nn.Conv2d(hdim + idim, hdim, k, padding=p))

    def forward(self, h, x):
        for tag in ("1", "2"):
            hx = torch.cat([h, x], 1)
            z = torch.sigmoid(getattr(self, f"convz{tag}")(hx))
            r = torch.sigmoid(getattr(self, f"convr{tag}")(hx))
            q = torch.tanh(getattr(self, f"convq{tag}")(
                torch.cat([r * h, x], 1)))
            h = (1 - z) * h + z * q
        return h


class WSConv2d(nn.Conv2d):
    def forward(self, x):
        w = self.weight
        mu = w.mean(dim=(1, 2, 3), keepdim=True)
        var = w.var(dim=(1, 2, 3), unbiased=False, keepdim=True)
        return F.conv2d(x, (w - mu) * (var + 1e-5).rsqrt(), self.bias,
                        self.stride, self.padding)


class UBlock(nn.Module):
    """names: proj/norm (one WSConv+GN block with optional FiLM)."""

    def __init__(self, cin, cout, groups):
        super().__init__()
        self.proj = WSConv2d(cin, cout, 3, padding=1)
        self.norm = nn.GroupNorm(groups, cout)

    def forward(self, x, scale_shift=None):
        x = self.norm(self.proj(x))
        if scale_shift is not None:
            x = x * (scale_shift[0] + 1) + scale_shift[1]
        return F.silu(x)


class URes(nn.Module):
    """names: mlp(.1), block1, block2, res_conv."""

    def __init__(self, cin, cout, time_dim=None, groups=4):
        super().__init__()
        self.mlp = nn.Sequential(nn.SiLU(), nn.Linear(time_dim, cout * 2)) \
            if time_dim else None
        self.block1 = UBlock(cin, cout, groups)
        self.block2 = UBlock(cout, cout, groups)
        self.res_conv = nn.Conv2d(cin, cout, 1) if cin != cout \
            else nn.Identity()

    def forward(self, x, t=None):
        ss = None
        if self.mlp is not None and t is not None:
            e = self.mlp(t)[:, :, None, None]
            ss = e.chunk(2, dim=1)
        h = self.block2(self.block1(x, ss))
        return h + self.res_conv(x)


class UNetOracle(nn.Module):
    """names mirror update.py's Unet: init_conv, time_mlp.{1,3},
    downs.{i}.{0,1}, gru, mid, ups.{i}.{0,1}, final_res_block,
    final_conv, conf."""

    def __init__(self, dim, hidden_dim, input_dim, mults, groups=4):
        super().__init__()
        dims = [dim] + [dim * m for m in mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        self.dim = dim
        self.init_conv = nn.Conv2d(input_dim, dim, 7, padding=3)
        time_dim = dim * 4
        self.time_mlp = nn.Sequential(
            nn.Identity(), nn.Linear(dim, time_dim), nn.GELU(),
            nn.Linear(time_dim, time_dim))

        self.downs = nn.ModuleList()
        for i, (ci, co) in enumerate(in_out):
            last = i >= len(in_out) - 1
            down = (nn.Conv2d(ci, co, 3, padding=1) if last else
                    nn.Sequential(nn.Identity(), nn.Conv2d(ci * 4, co, 1)))
            self.downs.append(nn.ModuleList([
                URes(ci, ci, time_dim, groups), down]))

        self.gru = GRUSep(hidden_dim, dims[-1])
        self.mid = URes(hidden_dim, dims[-1], None, groups)

        self.ups = nn.ModuleList()
        for i, (ci, co) in enumerate(reversed(in_out)):
            last = i == len(in_out) - 1
            up = (nn.Conv2d(co, ci, 3, padding=1) if last else
                  nn.Sequential(nn.Identity(), nn.Conv2d(co, ci, 3,
                                                         padding=1)))
            self.ups.append(nn.ModuleList([
                URes(co + ci, co, time_dim, groups), up]))

        self.final_res_block = URes(dim * 2, dim, time_dim, groups)
        self.final_conv = nn.Conv2d(dim, 1, 1)
        self.conf = nn.Conv2d(dim, 1, 1)

    @staticmethod
    def _sinu(t, dim):
        half = dim // 2
        emb = math.log(10000) / (half - 1)
        freqs = torch.exp(torch.arange(half, dtype=torch.float32) * -emb)
        args = t.float()[:, None] * freqs[None]
        return torch.cat([args.sin(), args.cos()], dim=-1)

    @staticmethod
    def _space_to_depth(x):
        b, c, h, w = x.shape
        x = x.view(b, c, h // 2, 2, w // 2, 2)
        return x.permute(0, 1, 3, 5, 2, 4).reshape(b, c * 4, h // 2, w // 2)

    def forward(self, x, hidden, time):
        x = self.init_conv(x)
        r = x
        t = self.time_mlp[3](F.gelu(self.time_mlp[1](
            self._sinu(time, self.dim))))

        skips = []
        for i, (block, down) in enumerate(self.downs):
            x = block(x, t)
            skips.append(x)
            if isinstance(down, nn.Sequential):
                x = down[1](self._space_to_depth(x))
            else:
                x = down(x)

        hidden = self.gru(hidden, x)
        x = self.mid(hidden)

        for i, (block, up) in enumerate(self.ups):
            x = block(torch.cat([x, skips.pop()], 1), t)
            if isinstance(up, nn.Sequential):
                x = up[1](F.interpolate(x, scale_factor=2, mode="nearest"))
            else:
                x = up(x)

        x = self.final_res_block(torch.cat([x, r], 1), t)
        return hidden, self.final_conv(x), torch.sigmoid(self.conf(x))


# ---------------------------------------------------------------------------
# geometry helpers (independent, matching module.py semantics)
# ---------------------------------------------------------------------------

def warp(src_fea, src_proj, ref_proj, depths):
    b, c = src_fea.shape[:2]
    hs, ws = src_fea.shape[2:]
    d, h, w = depths.shape[1:]
    proj = src_proj @ torch.inverse(ref_proj)
    rot, tr = proj[:, :3, :3], proj[:, :3, 3:4]
    yy, xx = torch.meshgrid(torch.arange(h, dtype=torch.float32),
                            torch.arange(w, dtype=torch.float32),
                            indexing="ij")
    grid = torch.stack([xx.reshape(-1), yy.reshape(-1),
                        torch.ones(h * w)]).unsqueeze(0).expand(b, -1, -1)
    rx = rot @ grid
    pz = rx.unsqueeze(2) * depths.view(b, 1, d, -1) + tr.view(b, 3, 1, 1)
    z = torch.where(pz[:, 2:3] == 0, torch.full_like(pz[:, 2:3], 1e-8),
                    pz[:, 2:3])
    xy = pz[:, :2] / z
    gx = xy[:, 0] / ((ws - 1) / 2) - 1
    gy = xy[:, 1] / ((hs - 1) / 2) - 1
    sampled = F.grid_sample(src_fea,
                            torch.stack([gx, gy], -1).view(b, d * h, w, 2),
                            mode="bilinear", padding_mode="zeros",
                            align_corners=True)
    return sampled.view(b, c, d, h, w)


def compose(proj_pair):
    out = proj_pair[:, 0].clone()
    out[:, :3, :4] = proj_pair[:, 1, :3, :3] @ proj_pair[:, 0, :3, :4]
    return out


def d2d(disp, dmin, dmax):
    lo, hi = 1.0 / dmax, 1.0 / dmin
    sd = torch.clamp(lo + (hi - lo) * disp, min=1e-6)
    return 1.0 / sd


def to_disp(depth, dmin, dmax):
    lo, hi = 1.0 / dmax, 1.0 / dmin
    return (1.0 / depth - lo) / (hi - lo)


def unfold_upsample(disp, mask_logits, ratio):
    b, _, h, w = disp.shape
    m = mask_logits.view(b, 1, 9, ratio, ratio, h, w).softmax(dim=2)
    patches = F.unfold(disp, [3, 3], padding=1).view(b, 1, 9, 1, 1, h, w)
    up = (m * patches).sum(2).permute(0, 1, 4, 2, 5, 3)
    return up.reshape(b, ratio * h, ratio * w)


def hyp_samples(cur, n, interval, conf, rmin, rmax):
    if conf is None:
        lo = cur - (n // 2) * interval
        hi = cur + (n // 2) * interval
    else:
        r0 = (n // 2) * interval
        r = rmin * r0 + (1 - conf) * (rmax * r0 - rmin * r0)
        lo, hi = cur - r, cur + r
    step = (hi - lo) / (n - 1)
    idx = torch.arange(n, dtype=cur.dtype).view(1, n, 1, 1)
    return torch.clamp(lo.unsqueeze(1) + idx * step.unsqueeze(1), 0, 1)


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------

class CasDiffMVSOracle(nn.Module):
    """Eval-mode (export) oracle; zero noise; state_dict-name compatible."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        cascade = cfg.stage_iters[2] > 0
        feat_dims = (48, 32, 16) if cascade else (48, 32, 0)
        ctx_dims = tuple(h + c for h, c in zip(cfg.hidden_dim,
                                               cfg.context_dim))
        bc = 8

        # FeatureNet (names: feature.convL.J.{conv,bn}, out*, inner*)
        f = nn.Module()
        specs = {0: [(3, bc, 3, 1, 1), (bc, bc, 3, 1, 1)],
                 1: [(bc, 2 * bc, 5, 2, 2), (2 * bc, 2 * bc, 3, 1, 1),
                     (2 * bc, 2 * bc, 3, 1, 1)],
                 2: [(2 * bc, 4 * bc, 5, 2, 2), (4 * bc, 4 * bc, 3, 1, 1),
                     (4 * bc, 4 * bc, 3, 1, 1)],
                 3: [(4 * bc, 8 * bc, 5, 2, 2), (8 * bc, 8 * bc, 3, 1, 1),
                     (8 * bc, 8 * bc, 3, 1, 1)]}
        for lvl, layers in specs.items():
            setattr(f, f"conv{lvl}", nn.Sequential(
                *[CBR2d(ci, co, k, s, p) for ci, co, k, s, p in layers]))
        f.out1 = nn.Conv2d(8 * bc, feat_dims[0], 1, bias=False)
        f.inner1 = nn.Conv2d(4 * bc, 8 * bc, 1, bias=True)
        f.out2 = nn.Conv2d(8 * bc, feat_dims[1], 3, padding=1, bias=False)
        if cascade:
            f.inner2 = nn.Conv2d(2 * bc, 8 * bc, 1, bias=True)
            f.out3 = nn.Conv2d(8 * bc, feat_dims[2], 3, padding=1,
                               bias=False)
        self.feature = f

        # ContextNet
        c = nn.Module()
        c.conv1 = CBR2d(3, 8, 3, 1, 1)
        dims = [8, 16, 32, 48]
        for lvl in (1, 2, 3):
            setattr(c, f"layer{lvl}", nn.Sequential(
                ResBlock(dims[lvl - 1], dims[lvl], 2),
                ResBlock(dims[lvl], dims[lvl], 1)))
        c.output1 = nn.Conv2d(48, ctx_dims[0], 3, padding=1)
        c.output2 = nn.Conv2d(32, ctx_dims[1], 3, padding=1)
        if cascade:
            c.output3 = nn.Conv2d(16, ctx_dims[2], 3, padding=1)
        self.context = c

        # InitialCost "depthnet"
        dn = nn.Module()
        g0 = cfg.cost_dim_stage[0]
        pvw = nn.Module()
        pvw.conv = nn.Sequential(CBR3d(g0, 8), nn.Conv3d(8, 1, 3, padding=1))
        dn.pixel_view_weight = pvw
        cr = nn.Module()
        chans = [(g0, 8, 1), (8, 8, 1), (8, 16, 2), (16, 16, 1),
                 (16, 32, 2), (32, 32, 1)]
        for i, (ci, co, s) in enumerate(chans):
            setattr(cr, f"conv{i}", CBR3d(ci, co, s=s))
        cr.conv6 = DeCBR3d(32, 16)
        cr.conv7 = DeCBR3d(16, 8)
        cr.prob = nn.Conv3d(8, 1, 3, padding=1, bias=False)
        dn.cost_regularization = cr
        dn.mask = nn.Sequential(nn.Conv2d(ctx_dims[0], 64, 3, padding=1),
                                nn.ReLU(), nn.Conv2d(64, 4 * 9, 1))
        self.depthnet = dn

        # hidden inits
        hi = [nn.Sequential(CBR2d(cfg.hidden_dim[1], 32, 3, 2, 1),
                            nn.Conv2d(32, cfg.hidden_dim[1], 3, padding=1,
                                      bias=False))]
        if cascade:
            hi.append(nn.Sequential(
                CBR2d(cfg.hidden_dim[2], 32, 3, 2, 1),
                CBR2d(32, 32, 3, 2, 1),
                nn.Conv2d(32, cfg.hidden_dim[2], 3, padding=1, bias=False)))
        self.hidden_init = nn.ModuleList(hi)

        # refinement blocks
        self.up_ratio = 2 if cascade else 4
        mults = {1: (1, 2), 2: (1, 2, 4)}
        for s in (1, 2):
            if cfg.stage_iters[s] == 0:
                continue
            blk = nn.Module()
            enc = nn.Module()
            cd = cfg.cost_dim_stage[s] * cfg.cost_num[s]
            hd = cfg.context_dim[s]
            enc.convc1 = nn.Conv2d(cd, hd, 3, padding=1)
            enc.convc2 = nn.Conv2d(hd, hd, 3, padding=1)
            enc.convd1 = nn.Conv2d(cfg.cost_num[s], hd, 3, padding=1)
            enc.convd2 = nn.Conv2d(hd, hd, 3, padding=1)
            enc.output = nn.Conv2d(2 * hd, hd - 1, 3, padding=1)
            blk.encoder = enc
            blk.mask = nn.Sequential(
                nn.Conv2d(hd, 64, 3, padding=1), nn.ReLU(),
                nn.Conv2d(64, self.up_ratio ** 2 * 9, 1))
            blk.unet = UNetOracle(cfg.unet_dim[s], cfg.hidden_dim[s],
                                  2 * hd, mults[s])
            setattr(self, f"update_block_depth{s + 1}", blk)

    # ---------------- forward (eval/export, zero noise) -------------------

    def _initial(self, feats, ctx, projs, depth_hyp, dmin, dmax):
        dn = self.depthnet
        g = self.cfg.cost_dim_stage[0]
        b, c = feats[0].shape[:2]
        d = depth_hyp.shape[1]
        ref = feats[0].unsqueeze(2)
        num = 0
        den = 1e-8
        weights = []
        for i, src in enumerate(feats[1:]):
            warped = warp(src, compose(projs[:, i + 1]), compose(projs[:, 0]),
                          depth_hyp)
            cor = (warped.view(b, g, c // g, d, *warped.shape[3:]) *
                   ref.view(b, g, c // g, 1, *ref.shape[3:])).mean(2)
            vw = torch.sigmoid(dn.pixel_view_weight.conv(cor)).squeeze(1)
            vw = vw.max(dim=1)[0].unsqueeze(1)
            weights.append(vw)
            num = num + vw.unsqueeze(1) * cor
            den = den + vw.unsqueeze(1)
        agg = num / den
        cr = dn.cost_regularization
        x = cr.conv1(cr.conv0(agg))
        y = cr.conv3(cr.conv2(x))
        z = cr.conv5(cr.conv4(y))
        z = y + cr.conv6(z)
        z = x + cr.conv7(z)
        logits = cr.prob(z).squeeze(1)
        prob = logits.softmax(dim=1)
        idx = torch.arange(d, dtype=torch.float32).view(1, d, 1, 1)
        index = (idx * prob).sum(1, keepdim=True)
        normalized = index / (d - 1.0)
        depth = d2d(normalized, dmin, dmax).squeeze(1)
        p4 = 4 * F.avg_pool3d(F.pad(prob.unsqueeze(1), (0, 0, 0, 0, 1, 2)),
                              (4, 1, 1), stride=1).squeeze(1)
        conf = torch.gather(p4, 1, index.long().clamp(0, d - 1)).squeeze(1)
        return normalized.squeeze(1), depth, torch.cat(weights, 1), conf

    def _local_cost(self, inv_depth, feats, projs, interval, dmin, dmax,
                    n, g, vw, conf, rmin, rmax):
        if n > 1:
            samples = hyp_samples(inv_depth.squeeze(1), n, interval, conf,
                                  rmin, rmax)
        else:
            samples = inv_depth
        depth_hyp = d2d(samples, dmin, dmax)
        b, c = feats[0].shape[:2]
        d = depth_hyp.shape[1]
        ref = feats[0].unsqueeze(2)
        num, den = 0, 1e-8
        for i, src in enumerate(feats[1:]):
            warped = warp(src, compose(projs[:, i + 1]), compose(projs[:, 0]),
                          depth_hyp)
            cor = (warped.view(b, g, c // g, d, *warped.shape[3:]) *
                   ref.view(b, g, c // g, 1, *ref.shape[3:])).mean(2)
            w = vw[:, i].unsqueeze(1).unsqueeze(1)
            num = num + w * cor
            den = den + w
        agg = num / den
        return agg.reshape(b, -1, *agg.shape[3:]), samples

    def _backbone(self, imgs):
        """Features for all views + context for ref. Views are folded into
        the batch (identical in eval mode since every op is per-sample;
        in train mode this matches the framework's joint-BN-stats design,
        casdiffmvs.py:133-136)."""
        b, v = imgs.shape[:2]
        f = self.feature
        x = imgs.reshape(b * v, *imgs.shape[2:])
        c0 = f.conv0(x)
        c1 = f.conv1(c0)
        c2 = f.conv2(c1)
        c3 = f.conv3(c2)

        def unfold(t):
            return list(t.view(b, v, *t.shape[1:]).unbind(1))

        feats_ms = {1: unfold(f.out1(c3)), 2: [], 3: []}
        intra = F.interpolate(c3, scale_factor=2,
                              mode="nearest") + f.inner1(c2)
        feats_ms[2] = unfold(f.out2(intra))
        if hasattr(f, "out3"):
            intra = F.interpolate(intra, scale_factor=2,
                                  mode="nearest") + f.inner2(c1)
            feats_ms[3] = unfold(f.out3(intra))

        c = self.context
        x = c.conv1(imgs[:, 0])
        x = c.layer1(x)
        ctxs = {}
        if hasattr(c, "output3"):
            ctxs[3] = c.output3(x)
        x = c.layer2(x)
        ctxs[2] = c.output2(x)
        x = c.layer3(x)
        ctxs[1] = c.output1(x)
        return feats_ms, ctxs

    def _stage0(self, imgs, projs_ms, feats_ms, ctxs, dmin, dmax):
        """Initial depth at 1/8 + x2 convex upsample; returns
        (depth0, up_depth, conf0, vw_detached, init_depth)."""
        cfg = self.cfg
        b = imgs.shape[0]
        d0 = cfg.numdepth_initial
        h1, w1 = feats_ms[1][0].shape[2:]
        samples = torch.arange(d0, dtype=torch.float32).view(1, d0, 1, 1) \
            / (d0 - 1.0)
        depth_hyp = d2d(samples.expand(b, d0, h1, w1), dmin, dmax)
        ctx0 = F.relu(ctxs[1])
        inv0, depth0, vw, conf0 = self._initial(
            feats_ms[1], ctx0, projs_ms["stage1"], depth_hyp, dmin, dmax)
        mask0 = 0.25 * self.depthnet.mask(ctx0)
        inv_up = unfold_upsample(inv0.unsqueeze(1),
                                 mask0.view(b, -1, h1, w1), 2)
        up_depth = d2d(inv_up.unsqueeze(1), dmin, dmax).squeeze(1)
        return depth0, up_depth, conf0, vw.detach()

    def forward(self, imgs, projs_ms, depth_values):
        cfg = self.cfg
        b, v = imgs.shape[:2]
        disp_min = depth_values[:, 0].view(-1, 1, 1, 1)
        disp_max = depth_values[:, -1].view(-1, 1, 1, 1)
        dmax = 1.0 / disp_min
        dmin = 1.0 / disp_max
        interval = 1.0 / depth_values.shape[1]

        feats_ms, ctxs = self._backbone(imgs)

        depths, confidences = [], []
        depth0, up_depth, conf0, vw = self._stage0(
            imgs, projs_ms, feats_ms, ctxs, dmin, dmax)
        depths.append(depth0)
        confidences.append(F.interpolate(conf0.unsqueeze(1), scale_factor=8,
                                         mode="nearest").squeeze(1))
        depths.append(up_depth)

        for s in (1, 2):
            if cfg.stage_iters[s] == 0:
                continue
            blk = getattr(self, f"update_block_depth{s + 1}")
            feats = feats_ms[s + 1]
            projs = projs_ms[f"stage{s + 1}"]
            ctx_full = ctxs[s + 1]
            cur = depths[-1].unsqueeze(1).detach()
            inv_cur = to_disp(cur, dmin, dmax)
            vw_s = F.interpolate(vw, scale_factor=2 ** s, mode="nearest")

            hidden = ctx_full[:, :cfg.hidden_dim[s]]
            ctx = F.relu(ctx_full[:, cfg.hidden_dim[s]:])
            hidden = torch.tanh(self.hidden_init[s - 1](hidden))

            # DDIM eval with sampling_timesteps steps, zero noise
            T = cfg.timesteps[s]
            times = list(reversed(np.linspace(
                -1, T - 1, cfg.sampling_timesteps[s] + 1).astype(int)
                .tolist()))
            pairs = list(zip(times[:-1], times[1:]))
            img = torch.zeros_like(inv_cur)

            for time, time_next in pairs:
                t = torch.full((b,), time, dtype=torch.long)
                delta = img
                inv_new = torch.clamp(inv_cur + delta, 0, 1)
                delta = inv_new - inv_cur
                img = delta
                cur_hidden = hidden
                conf = None
                for _ in range(cfg.stage_iters[s]):
                    cost, samp = self._local_cost(
                        inv_new, feats, projs,
                        interval * (4, 2, 1)[s], dmin, dmax,
                        cfg.cost_num[s], cfg.cost_dim_stage[s], vw_s, conf,
                        cfg.min_radius, cfg.max_radius)
                    cf = F.relu(blk.encoder.convc1(cost))
                    cf = F.relu(blk.encoder.convc2(cf))
                    df = F.relu(blk.encoder.convd1(samp))
                    df = F.relu(blk.encoder.convd2(df))
                    enc = F.relu(blk.encoder.output(torch.cat([cf, df], 1)))
                    enc = torch.cat([enc, inv_new], 1)
                    cur_hidden, upd, conf2 = blk.unet(
                        torch.cat([ctx, enc], 1), cur_hidden, t)
                    conf = conf2.squeeze(1)
                    delta = delta + upd
                    inv_new = torch.clamp(inv_cur + delta, 0, 1)
                    delta = inv_new - inv_cur
                # sampling_timesteps == 1 -> no DDIM update needed

            depths.append(d2d(inv_new, dmin, dmax).squeeze(1))
            confidences.append(F.interpolate(
                conf.unsqueeze(1), scale_factor=2 ** (3 - s),
                mode="nearest").squeeze(1))
            mask = 0.25 * blk.mask(ctx)
            inv_up = unfold_upsample(inv_new, mask, self.up_ratio)
            depths.append(d2d(inv_up.unsqueeze(1), dmin, dmax).squeeze(1))

        return depths, confidences

    # ---------------- forward (training branch, injected t/noise) ----------

    def _schedule_tables(self, timesteps):
        steps = timesteps + 1
        x = np.linspace(0, timesteps, steps, dtype=np.float64)
        ac = np.cos(((x / timesteps) + 0.008) / 1.008 * math.pi * 0.5) ** 2
        ac = ac / ac[0]
        betas = np.clip(1 - ac[1:] / ac[:-1], 0, 0.999)
        ac = np.cumprod(1.0 - betas)
        return (torch.from_numpy(np.sqrt(ac)).float(),
                torch.from_numpy(np.sqrt(1.0 - ac)).float())

    def forward_train(self, imgs, projs_ms, depth_values, depth_gt_ms,
                      t_noise):
        """Training branch: q_sample of the GT residual at injected
        timesteps/noise, per-iteration detaches, full intermediate lists
        (update.py:423-464 + diffusion.py train path). t_noise maps
        stage_idx (1, 2) -> (t [B] long, noise [B,1,Hs,Ws])."""
        cfg = self.cfg
        b, v = imgs.shape[:2]
        disp_min = depth_values[:, 0].view(-1, 1, 1, 1)
        disp_max = depth_values[:, -1].view(-1, 1, 1, 1)
        dmax = 1.0 / disp_min
        dmin = 1.0 / disp_max
        interval = 1.0 / depth_values.shape[1]

        feats_ms, ctxs = self._backbone(imgs)
        depths, confs = [], []
        depth0, up_depth, _, vw = self._stage0(
            imgs, projs_ms, feats_ms, ctxs, dmin, dmax)
        depths.append(depth0)
        depths.append(up_depth)

        for s in (1, 2):
            if cfg.stage_iters[s] == 0:
                continue
            blk = getattr(self, f"update_block_depth{s + 1}")
            feats = feats_ms[s + 1]
            projs = projs_ms[f"stage{s + 1}"]
            ctx_full = ctxs[s + 1]
            cur = depths[-1].unsqueeze(1).detach()
            inv_cur = to_disp(cur, dmin, dmax)
            vw_s = F.interpolate(vw, scale_factor=2 ** s, mode="nearest")

            hidden = ctx_full[:, :cfg.hidden_dim[s]]
            ctx = F.relu(ctx_full[:, cfg.hidden_dim[s]:])
            hidden = torch.tanh(self.hidden_init[s - 1](hidden))

            # pseudo-GT for invalid pixels (diffusion.py:236-241)
            init_up = F.interpolate(depth0.unsqueeze(1), scale_factor=2 ** s,
                                    mode="nearest")
            inv_init = to_disp(init_up, dmin, dmax).detach()
            gt = depth_gt_ms[f"stage{s + 1}"].unsqueeze(1)
            inv_gt = to_disp(gt, dmin, dmax)
            inv_gt = torch.where(torch.isinf(inv_gt), inv_init, inv_gt)
            gt_delta = (inv_gt - inv_cur).detach()

            t, noise = t_noise[s]
            sa, so = self._schedule_tables(cfg.timesteps[s])
            sa_t = sa[t].view(-1, 1, 1, 1)
            so_t = so[t].view(-1, 1, 1, 1)
            delta = sa_t * gt_delta + so_t * noise
            inv_new = torch.clamp(inv_cur + delta, 0, 1)
            delta = inv_new - inv_cur

            conf = None
            cur_hidden = hidden
            for _ in range(cfg.stage_iters[s]):
                delta = delta.detach()
                if conf is not None:
                    conf = conf.detach()
                inv_new = inv_new.detach()
                cost, samp = self._local_cost(
                    inv_new, feats, projs,
                    interval * (4, 2, 1)[s], dmin, dmax,
                    cfg.cost_num[s], cfg.cost_dim_stage[s], vw_s, conf,
                    cfg.min_radius, cfg.max_radius)
                cf = F.relu(blk.encoder.convc1(cost))
                cf = F.relu(blk.encoder.convc2(cf))
                df = F.relu(blk.encoder.convd1(samp))
                df = F.relu(blk.encoder.convd2(df))
                enc = F.relu(blk.encoder.output(torch.cat([cf, df], 1)))
                enc = torch.cat([enc, inv_new], 1)
                cur_hidden, upd, conf2 = blk.unet(
                    torch.cat([ctx, enc], 1), cur_hidden, t)
                conf = conf2.squeeze(1)
                confs.append(conf)
                delta = delta + upd
                inv_new = inv_cur + delta
                inv_new = torch.clamp(inv_new, 0, 1)
                delta = inv_new - inv_cur
                depths.append(d2d(inv_new, dmin, dmax).squeeze(1))

            mask = 0.25 * blk.mask(ctx)
            inv_up = unfold_upsample(inv_new, mask, self.up_ratio)
            depths.append(d2d(inv_up.unsqueeze(1), dmin, dmax).squeeze(1))

        return depths, confs
