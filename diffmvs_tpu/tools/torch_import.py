"""Import released PyTorch checkpoints into diffmvs_tpu parameter pytrees.

The reference ships `.ckpt` files (torch.save dicts with a 'model'
state_dict, cf. /root/reference/train.py:136-141). This module provides
  * low-level layout transforms (torch OIHW conv weights -> HWIO, transposed
    convs -> the lhs-dilated-conv kernels our Deconv3dBnAct uses, linear
    transposes, BN stats), and
  * `import_torch_state_dict` — the full name map from the reference's
    module tree (models/diffusion.py / module.py / update.py) onto our flax
    parameter tree.

Weight-name provenance is documented inline so the mapping can be audited
against the reference file/line cited on each block.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# layout transforms
# ---------------------------------------------------------------------------

def conv2d_kernel(w: np.ndarray) -> np.ndarray:
    """torch [O, I, kh, kw] -> flax HWIO [kh, kw, I, O]."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def conv3d_kernel(w: np.ndarray) -> np.ndarray:
    """torch [O, I, kd, kh, kw] -> flax DHWIO [kd, kh, kw, I, O]."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 4, 1, 0)))


def deconv3d_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose3d [I, O, kd, kh, kw] -> our lhs-dilated conv
    kernel [kd, kh, kw, I, O] with spatially flipped taps.

    ConvTranspose(x, W)[o] = sum_i (x_i upsampled) * flip(W[i, o]) — so the
    equivalent forward conv over the dilated input uses the flipped kernel.
    """
    w = w[:, :, ::-1, ::-1, ::-1]
    return np.ascontiguousarray(np.transpose(w, (2, 3, 4, 0, 1)))


def linear_kernel(w: np.ndarray) -> np.ndarray:
    """torch [O, I] -> flax [I, O]."""
    return np.ascontiguousarray(w.T)


def _to_numpy(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


# ---------------------------------------------------------------------------
# assignment helpers
# ---------------------------------------------------------------------------

class _Assigner:
    def __init__(self, state_dict: Dict[str, np.ndarray]):
        self.sd = {k: _to_numpy(v) for k, v in state_dict.items()}
        self.used = set()
        self.params: Dict = {}
        self.batch_stats: Dict = {}

    def _set(self, tree: Dict, path: Tuple[str, ...], value: np.ndarray):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = value

    def take(self, torch_key: str) -> np.ndarray:
        self.used.add(torch_key)
        return self.sd[torch_key]

    def conv2d(self, tkey: str, *path: str, bias: bool = None):
        self._set(self.params, path + ("kernel",),
                  conv2d_kernel(self.take(tkey + ".weight")))
        has_bias = (tkey + ".bias") in self.sd if bias is None else bias
        if has_bias:
            self._set(self.params, path + ("bias",),
                      self.take(tkey + ".bias"))

    def conv3d(self, tkey: str, *path: str):
        self._set(self.params, path + ("kernel",),
                  conv3d_kernel(self.take(tkey + ".weight")))
        if (tkey + ".bias") in self.sd:
            self._set(self.params, path + ("bias",),
                      self.take(tkey + ".bias"))

    def deconv3d(self, tkey: str, *path: str):
        self._set(self.params, path + ("kernel",),
                  deconv3d_kernel(self.take(tkey + ".weight")))

    def linear(self, tkey: str, *path: str):
        self._set(self.params, path + ("kernel",),
                  linear_kernel(self.take(tkey + ".weight")))
        self._set(self.params, path + ("bias",), self.take(tkey + ".bias"))

    def bn(self, tkey: str, *path: str):
        self._set(self.params, path + ("scale",),
                  self.take(tkey + ".weight"))
        self._set(self.params, path + ("bias",), self.take(tkey + ".bias"))
        self._set(self.batch_stats, path + ("mean",),
                  self.take(tkey + ".running_mean"))
        self._set(self.batch_stats, path + ("var",),
                  self.take(tkey + ".running_var"))
        self.used.add(tkey + ".num_batches_tracked")

    def groupnorm(self, tkey: str, *path: str):
        self._set(self.params, path + ("scale",),
                  self.take(tkey + ".weight"))
        self._set(self.params, path + ("bias",), self.take(tkey + ".bias"))

    def conv_bn(self, tkey: str, *path: str):
        """reference Conv2d/Conv3d wrapper: .conv + .bn submodules."""
        w = self.sd[tkey + ".conv.weight"]
        if w.ndim == 4:
            self.conv2d(tkey + ".conv", *path, "conv")
        else:
            self.conv3d(tkey + ".conv", *path, "conv")
        self.bn(tkey + ".bn", *path, "bn")


# ---------------------------------------------------------------------------
# block importers (module-tree name maps)
# ---------------------------------------------------------------------------

def _import_featurenet(a: _Assigner, cascade: bool):
    """FeatureNet (module.py:357-420): conv{0..3} Sequential wrappers +
    out/inner heads."""
    seq_len = {0: 2, 1: 3, 2: 3, 3: 3}
    for lvl, n in seq_len.items():
        for j in range(n):
            a.conv_bn(f"feature.conv{lvl}.{j}", "feature", f"conv{lvl}_{j}")
    a.conv2d("feature.out1", "feature", "out1")
    a.conv2d("feature.inner1", "feature", "inner1")
    a.conv2d("feature.out2", "feature", "out2")
    if cascade:
        a.conv2d("feature.inner2", "feature", "inner2")
        a.conv2d("feature.out3", "feature", "out3")


def _import_resblock(a: _Assigner, tkey: str, *path: str,
                     downsample: bool):
    """ResidualBlock (module.py:303-319)."""
    a.conv2d(tkey + ".conv1.conv", *path, "conv1", "conv")
    a.bn(tkey + ".conv1.bn", *path, "conv1", "bn")
    a.conv2d(tkey + ".conv2.conv", *path, "conv2", "conv")
    a.bn(tkey + ".conv2.bn", *path, "conv2", "bn")
    if downsample:
        a.conv2d(tkey + ".downsample.conv", *path, "downsample", "conv")
        a.bn(tkey + ".downsample.bn", *path, "downsample", "bn")


def _import_contextnet(a: _Assigner, cascade: bool):
    """ContextNet (module.py:321-355)."""
    a.conv2d("context.conv1.conv", "context", "conv1", "conv")
    a.bn("context.conv1.bn", "context", "conv1", "bn")
    for lvl in (1, 2, 3):
        _import_resblock(a, f"context.layer{lvl}.0", "context",
                         f"layer{lvl}_0", downsample=True)
        _import_resblock(a, f"context.layer{lvl}.1", "context",
                         f"layer{lvl}_1", downsample=False)
    a.conv2d("context.output1", "context", "output1")
    a.conv2d("context.output2", "context", "output2")
    if cascade:
        a.conv2d("context.output3", "context", "output3")


def _import_costreg(a: _Assigner, tkey: str, *path: str):
    """CostRegNet_small (module.py:422-448)."""
    for i in range(6):
        a.conv_bn(f"{tkey}.conv{i}", *path, f"conv{i}")
    for i in (6, 7):
        a.deconv3d(f"{tkey}.conv{i}.conv", *path, f"conv{i}")
        a.bn(f"{tkey}.conv{i}.bn", *path, f"conv{i}", "bn")
    a.conv3d(f"{tkey}.prob", *path, "prob")


def _import_mask_head(a: _Assigner, tkey: str, *path: str):
    """mask Sequential: Conv2d, ReLU, Conv2d (module.py:481-484)."""
    a.conv2d(f"{tkey}.0", *path, "conv1")
    a.conv2d(f"{tkey}.2", *path, "conv2")


def _import_initialcost(a: _Assigner):
    """InitialCost 'depthnet' (module.py:465-573)."""
    a.conv_bn("depthnet.pixel_view_weight.conv.0",
              "depthnet", "pixel_view_weight", "conv0")
    a.conv3d("depthnet.pixel_view_weight.conv.1",
             "depthnet", "pixel_view_weight", "conv1")
    _import_costreg(a, "depthnet.cost_regularization",
                    "depthnet", "cost_regularization")
    _import_mask_head(a, "depthnet.mask", "depthnet", "mask")


def _import_gru(a: _Assigner, tkey: str, *path: str):
    for name in ("convz1", "convr1", "convq1", "convz2", "convr2", "convq2"):
        a.conv2d(f"{tkey}.{name}", *path, name)


def _import_resnet_block(a: _Assigner, tkey: str, *path: str,
                         time_mlp: bool, res_conv: bool):
    """diffusion ResnetBlock (update.py:135-159)."""
    if time_mlp:
        a.linear(f"{tkey}.mlp.1", *path, "mlp", "linear")
    for b in ("block1", "block2"):
        a.conv2d(f"{tkey}.{b}.proj", *path, b, "proj")
        a.groupnorm(f"{tkey}.{b}.norm", *path, b, "norm")
    if res_conv:
        a.conv2d(f"{tkey}.res_conv", *path, "res_conv")


def _import_unet(a: _Assigner, tkey: str, path: Tuple[str, ...],
                 dim: int, hidden_dim: int, dim_mults):
    """Unet (update.py:161-274)."""
    dims = [dim] + [dim * m for m in dim_mults]
    in_out = list(zip(dims[:-1], dims[1:]))

    a.conv2d(f"{tkey}.init_conv", *path, "init_conv")
    a.linear(f"{tkey}.time_mlp.1", *path, "time_mlp_1", "linear")
    a.linear(f"{tkey}.time_mlp.3", *path, "time_mlp_2", "linear")

    for ind, (dim_in, dim_out) in enumerate(in_out):
        is_last = ind >= len(in_out) - 1
        _import_resnet_block(a, f"{tkey}.downs.{ind}.0",
                             *path, f"down_{ind}_block",
                             time_mlp=True, res_conv=False)
        if not is_last:
            a.conv2d(f"{tkey}.downs.{ind}.1.1", *path, f"down_{ind}_ds",
                     "conv")
        else:
            a.conv2d(f"{tkey}.downs.{ind}.1", *path, f"down_{ind}_conv")

    _import_gru(a, f"{tkey}.gru", *path, "gru")
    _import_resnet_block(a, f"{tkey}.mid", *path, "mid",
                         time_mlp=False, res_conv=hidden_dim != dims[-1])

    for ind, (dim_in, dim_out) in enumerate(reversed(in_out)):
        is_last = ind == len(in_out) - 1
        _import_resnet_block(a, f"{tkey}.ups.{ind}.0",
                             *path, f"up_{ind}_block",
                             time_mlp=True, res_conv=True)
        if not is_last:
            a.conv2d(f"{tkey}.ups.{ind}.1.1", *path, f"up_{ind}_us", "conv")
        else:
            a.conv2d(f"{tkey}.ups.{ind}.1", *path, f"up_{ind}_conv")

    _import_resnet_block(a, f"{tkey}.final_res_block",
                         *path, "final_res_block",
                         time_mlp=True, res_conv=True)
    a.conv2d(f"{tkey}.final_conv", *path, "final_conv")
    a.conv2d(f"{tkey}.conf", *path, "conf")


def _import_update_block(a: _Assigner, tkey: str, stage: int, cfg):
    """DiffusionUpdateBlockDepth (update.py:299-390). The schedule buffers
    (betas, alphas_cumprod, ...) are recomputed constants here — skipped."""
    path = (f"update_block{stage}",)
    # encoder/unet live inside the nn.scan iteration cell ("cell" scope)
    for name in ("convc1", "convc2", "convd1", "convd2", "output"):
        a.conv2d(f"{tkey}.encoder.{name}", *path, "cell", "encoder", name)
    _import_mask_head(a, f"{tkey}.mask", *path, "mask")
    _import_unet(a, f"{tkey}.unet", path + ("cell", "unet"),
                 cfg.unet_dim[stage], cfg.hidden_dim[stage],
                 cfg.unet_dim_mults[stage])
    for buf in ("betas", "alphas_cumprod", "alphas_cumprod_prev",
                "sqrt_alphas_cumprod", "sqrt_one_minus_alphas_cumprod",
                "log_one_minus_alphas_cumprod", "sqrt_recip_alphas",
                "sqrt_recip_alphas_cumprod", "sqrt_recipm1_alphas_cumprod",
                "posterior_variance"):
        a.used.add(f"{tkey}.{buf}")


def _import_hidden_init(a: _Assigner, cascade: bool):
    """hidden_init ModuleLists (diffusion.py:53-58, 91-101)."""
    # stage 1: Sequential(Conv2d-wrapper, nn.Conv2d)
    a.conv_bn("hidden_init.0.0", "hidden_init1", "down0")
    a.conv2d("hidden_init.0.1", "hidden_init1", "out")
    if cascade:
        a.conv_bn("hidden_init.1.0", "hidden_init2", "down0")
        a.conv_bn("hidden_init.1.1", "hidden_init2", "down1")
        a.conv2d("hidden_init.1.2", "hidden_init2", "out")


def import_torch_state_dict(state_dict: Dict, cfg) -> Dict:
    """Map a reference CasDiffMVS state_dict onto our variable collections.

    cfg: diffmvs_tpu.config.ModelConfig matching the checkpoint variant.
    Returns {"params": ..., "batch_stats": ...} ready for
    CasDiffMVS(cfg).apply. Raises if any checkpoint tensor is unused.
    """
    a = _Assigner(state_dict)
    cascade = cfg.is_cascade

    _import_featurenet(a, cascade)
    _import_contextnet(a, cascade)
    _import_initialcost(a)
    _import_hidden_init(a, cascade)

    # update_block ModuleList order: [update_block_depth2(, _depth3)]
    # but the reference registers them twice (attributes + ModuleList);
    # state_dict carries both names — use the attribute names.
    _import_update_block(a, "update_block_depth2", 1, cfg)
    if cascade:
        _import_update_block(a, "update_block_depth3", 2, cfg)
    # the ModuleList aliases reference the same tensors; mark them used
    for k in list(a.sd):
        if k.startswith("update_block."):
            a.used.add(k)

    unused = set(a.sd) - a.used
    if unused:
        raise ValueError(f"unmapped checkpoint tensors: {sorted(unused)[:10]}"
                         f" (+{max(0, len(unused) - 10)} more)")
    return {"params": a.params, "batch_stats": a.batch_stats}


def load_torch_checkpoint(path: str, cfg):
    """Load a reference .ckpt file (requires torch, CPU map_location)."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    sd = state["model"] if "model" in state else state
    return import_torch_state_dict(sd, cfg)
