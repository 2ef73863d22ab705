"""ResNet backbones (ResNet-50/101) for all reference model families.

Covers the reference's three ResNet flavors with one parametric
implementation:
  - detectron.jittor ``detectron/modeling/backbone/resnet.py``:
    Caffe2-style — FrozenBatchNorm2d, stride on the 1x1 conv
    (``STRIDE_IN_1X1=True``), stem ``StemWithFixedBatchNorm``.
  - Yolact.jittor ``backbone.py::ResNetBackbone``: torchvision-style —
    BatchNorm (eval mode at inference), stride on the 3x3 conv, optional
    dilation for the last stage.
  - Pose2Seg.jittor ``modeling/resnet.py``: torchvision-style with a dilated
    C5 (stride 16 output).

Params are nested dicts; block lists are Python lists (small, unrolled at
trace time). Returns the C2..C5 feature maps for FPN consumers.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from tpuseg.nn import layers as L

STAGE_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


@dataclass(frozen=True)
class ResNetConfig:
    depth: int = 50
    stride_in_1x1: bool = False  # True = Caffe2/detectron, False = torchvision
    frozen_bn: bool = True  # inference: both behave as affine transforms
    dilation_c5: int = 1  # 2 => C5 at stride 16 (Pose2Seg dilated variant)
    width: int = 64
    bn_eps: float = 1e-5  # torchvision BN eps; detectron frozen-BN uses 0
    # YOLACT++ DCNv2: stages (0-based) whose blocks use deformable conv2,
    # every `dcn_interval`-th block (dbolya resnet101_dcn_inter3_backbone)
    dcn_stages: tuple = ()
    dcn_interval: int = 1
    # detectron FREEZE_CONV_BODY_AT: 2 freezes stem + layer1. Implemented
    # as stop_gradient at the frozen/trainable boundary — the optimizer's
    # lr_scale=0 already pins the values, but cutting the gradient here
    # also stops the backward pass from materialising the huge
    # high-resolution conv residuals (1 GB stem temps at bs=8 800x1344)
    freeze_at: int = 0
    # per-block jax.checkpoint is applied to stages in this set (0-based);
    # remat trades an extra forward in the backward pass for activation
    # memory — only the high-resolution early stages need it (layer1/2 at
    # 200x336 dominate HBM; layer3/4 activations are cheap to save)
    remat_stages: tuple = (0, 1, 2, 3)

    @property
    def stage_blocks(self):
        return STAGE_BLOCKS[self.depth]

    def block_uses_dcn(self, stage: int, block: int) -> bool:
        return stage in self.dcn_stages and block % self.dcn_interval == 0


def _norm(x, p, cfg: ResNetConfig):
    # at inference FrozenBN and eval-mode BN are the same affine op; eps
    # differs (detectron folds eps into the stored running_var -> eps=0).
    # Non-frozen BN (yolact/pose2seg backbones) routes through the
    # train-aware dispatcher so reference trainers normalize by batch
    # stats; FrozenBN stays frozen even in training (detectron semantics).
    if cfg.frozen_bn:
        return L.batch_norm_inference(x, p, eps=0.0)
    return L.batch_norm(x, p, eps=cfg.bn_eps)


def bottleneck(x: jax.Array, p: dict, stride: int, dilation: int, cfg: ResNetConfig):
    s1, s2 = (stride, 1) if cfg.stride_in_1x1 else (1, stride)
    out = L.conv2d(x, p["conv1"], stride=s1)
    out = L.relu(_norm(out, p["bn1"], cfg))
    if p.get("conv2_offset") is not None:
        from tpuseg.ops.deform_conv import dcn_block

        out = dcn_block(
            out,
            {"offset": p["conv2_offset"], "weight": p["conv2"]["weight"],
             "bias": p["conv2"].get("bias")},
            stride=s2, dilation=dilation)
    else:
        out = L.conv2d(out, p["conv2"], stride=s2, padding=dilation,
                       dilation=dilation)
    out = L.relu(_norm(out, p["bn2"], cfg))
    out = L.conv2d(out, p["conv3"])
    out = _norm(out, p["bn3"], cfg)
    if p.get("downsample") is not None:
        identity = L.conv2d(x, p["downsample"]["conv"], stride=stride)
        identity = _norm(identity, p["downsample"]["bn"], cfg)
    else:
        identity = x
    return L.relu(out + identity)


def forward(params: dict, x: jax.Array, cfg: ResNetConfig) -> dict:
    """x [B,H,W,3] -> {"c2": /4, "c3": /8, "c4": /16, "c5": /32 or /16}."""
    x = L.conv2d(x, params["stem"]["conv"], stride=2, padding=3)
    x = L.relu(_norm(x, params["stem"]["bn"], cfg))
    x = L.max_pool2d(x, 3, 2, padding=1)
    if cfg.freeze_at >= 1:
        x = jax.lax.stop_gradient(x)
    feats = {}
    for si, name in enumerate(["layer1", "layer2", "layer3", "layer4"]):
        stride = 1 if si == 0 else 2
        dilation = cfg.dilation_c5 if si == 3 else 1
        if dilation > 1:
            stride = 1
        for bi, bp in enumerate(params[name]):
            # per-block rematerialization: identity for inference (the
            # primal is unchanged under jit), but backward passes store
            # only block-boundary activations instead of every conv/BN
            # intermediate — the bs=8 800x1344 Mask R-CNN train step needs
            # 18.2 GB of HLO temps without this (> 15.75 GB v5e HBM).
            # cfg.remat_stages limits it to the stages whose activations
            # actually dominate HBM
            blk = bottleneck
            if si in cfg.remat_stages:
                # checkpoint_with_bn: under train-mode BN the block's batch
                # stats escape the remat region as explicit outputs and are
                # re-taped outside (plain jax.checkpoint otherwise) — remat
                # and BN training compose (VERDICT r3 #7)
                blk = L.checkpoint_with_bn(
                    bottleneck, params_argnum=1, static_argnums=(2, 3, 4))
            x = blk(x, bp, stride if bi == 0 else 1, dilation, cfg)
        if cfg.freeze_at >= si + 2:
            x = jax.lax.stop_gradient(x)
        feats[f"c{si + 2}"] = x
    return feats


def init_params(key: jax.Array, cfg: ResNetConfig, dtype=jnp.float32) -> dict:
    w = cfg.width
    keys = iter(jax.random.split(key, 256))

    def block_params(cin, mid, cout, downsample, use_dcn=False):
        p = {
            "conv1": L.conv_params(next(keys), 1, 1, cin, mid, bias=False, dtype=dtype),
            "bn1": L.bn_params(mid, dtype),
            "conv2": L.conv_params(next(keys), 3, 3, mid, mid, bias=False, dtype=dtype),
            "bn2": L.bn_params(mid, dtype),
            "conv3": L.conv_params(next(keys), 1, 1, mid, cout, bias=False, dtype=dtype),
            "bn3": L.bn_params(cout, dtype),
            "downsample": None,
            "conv2_offset": None,
        }
        if use_dcn:
            # offset conv is zero-initialized in the reference (identity DCN)
            p["conv2_offset"] = {
                "weight": jnp.zeros((3, 3, mid, 27), dtype),
                "bias": jnp.zeros((27,), dtype),
            }
            # upstream DCNv2 modules carry a conv bias (zero-init, trained)
            # unlike the bias-free plain bottleneck conv2 — without it a
            # from-scratch ++ checkpoint saved to .pth is missing
            # conv2.bias keys and fails upstream's strict load_state_dict
            p["conv2"]["bias"] = jnp.zeros((mid,), dtype)
        if downsample:
            p["downsample"] = {
                "conv": L.conv_params(next(keys), 1, 1, cin, cout, bias=False, dtype=dtype),
                "bn": L.bn_params(cout, dtype),
            }
        return p

    params = {
        "stem": {
            "conv": L.conv_params(next(keys), 7, 7, 3, w, bias=False, dtype=dtype),
            "bn": L.bn_params(w, dtype),
        }
    }
    cin = w
    for si, nblocks in enumerate(cfg.stage_blocks):
        mid = w * (2**si)
        cout = mid * 4
        blocks = []
        for bi in range(nblocks):
            blocks.append(block_params(
                cin if bi == 0 else cout, mid, cout, bi == 0,
                use_dcn=cfg.block_uses_dcn(si, bi)))
        params[f"layer{si + 1}"] = blocks
        cin = cout
    return params


def out_channels(cfg: ResNetConfig) -> dict:
    w = cfg.width
    return {f"c{i + 2}": w * (2**i) * 4 for i in range(4)}


# ---------------------------------------------------------------------------
# torch state-dict conversion (torchvision/detectron/yolact namings)
# ---------------------------------------------------------------------------


def from_torch_state(flat: dict, cfg: ResNetConfig, prefix: str = "") -> dict:
    """torchvision-style names (layerN.M.convK/bnK/downsample) -> param tree.

    Used directly for yolact's ResNetBackbone (dbolya keeps torchvision
    names) and Pose2Seg; detectron's maskrcnn names are remapped to this
    scheme first (see weights/detectron_map).
    """
    import numpy as np

    def conv(name):
        w = np.asarray(flat[f"{prefix}{name}.weight"], np.float32)
        p = {"weight": np.ascontiguousarray(w.transpose(2, 3, 1, 0))}
        p["bias"] = (
            np.asarray(flat[f"{prefix}{name}.bias"], np.float32)
            if f"{prefix}{name}.bias" in flat
            else None
        )
        return p

    def bn(name):
        return {
            k: np.asarray(flat[f"{prefix}{name}.{src}"], np.float32)
            for k, src in [
                ("weight", "weight"),
                ("bias", "bias"),
                ("running_mean", "running_mean"),
                ("running_var", "running_var"),
            ]
        }

    params = {"stem": {"conv": conv("conv1"), "bn": bn("bn1")}}
    for si, nblocks in enumerate(cfg.stage_blocks):
        blocks = []
        for bi in range(nblocks):
            base = f"layer{si + 1}.{bi}"
            p = {
                "conv1": conv(f"{base}.conv1"),
                "bn1": bn(f"{base}.bn1"),
                "conv2": conv(f"{base}.conv2"),
                "bn2": bn(f"{base}.bn2"),
                "conv3": conv(f"{base}.conv3"),
                "bn3": bn(f"{base}.bn3"),
                "downsample": None,
                "conv2_offset": None,
            }
            # DCNv2 blocks (yolact++): offset conv saved as conv2.conv_offset_mask
            for off_name in (f"{base}.conv2.conv_offset_mask",
                             f"{base}.conv2_offset"):
                if f"{prefix}{off_name}.weight" in flat:
                    p["conv2_offset"] = conv(off_name)
                    if f"{prefix}{base}.conv2.weight" not in flat:
                        p["conv2"] = conv(f"{base}.conv2.conv")
                    break
            if f"{prefix}{base}.downsample.0.weight" in flat:
                p["downsample"] = {
                    "conv": conv(f"{base}.downsample.0"),
                    "bn": bn(f"{base}.downsample.1"),
                }
            blocks.append(p)
        params[f"layer{si + 1}"] = blocks
    return params
