"""Pose2Seg — pose-conditioned human instance segmentation.

Capability parity with Pose2Seg.jittor (SURVEY.md §2.3; paper
arXiv:1803.10683, cited at reference README.md:354): image + per-person COCO
keypoints -> per-person masks, via
  base resize -> dilated ResNet50-FPN features -> per person: match keypoints
  against canonical pose templates -> best similarity (affine) transform ->
  AffineAlign feature crop (64x64) -> small residual SegModule -> binary mask
  logits -> inverse-affine paste back to image coordinates.

TPU-native: people are a padded ``max_people`` axis; ONE jit program handles
the whole image batch (the reference loops people in Python —
SURVEY.md §3.5 boundary note). Template matching + affine solve are tiny
per-person host/numpy math (closed-form umeyama); everything dense runs on
device (affine_align / seg head / inverse grid_sample paste).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.nn import fpn as fpn_nn
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
    seg_blocks: int = 10
    feature_channels: int = 256
    mask_thresh: float = 0.5
    # paste-back grid resolution: the aligned mask only carries 64x64 of
    # content, so pasting at 256 (then host-resizing to the original image)
    # is visually lossless and 4x cheaper than a full 512 grid
    paste_size: int = 256


# ---------------------------------------------------------------------------
# Pose templates (modeling/templates; regenerable canonical poses)
# ---------------------------------------------------------------------------
# COCO keypoint order: nose, eyes(l/r), ears(l/r), shoulders, elbows,
# wrists, hips, knees, ankles. Templates in a unit frame [0,1]^2:
# full standing body, upper-half body, and the left/right mirror.

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


def templates() -> np.ndarray:
    """[T, 17, 2] canonical poses in the unit alignment frame."""
    flip = _STAND.copy()
    flip[:, 0] = 1.0 - flip[:, 0]
    return np.stack([_STAND, _UPPER, flip])


# ---------------------------------------------------------------------------
# Affine solve (modeling/core.py pose_affinematrix / get_aligned_matrix)
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


def best_template_affine(kpts: np.ndarray, cfg: Pose2SegConfig):
    """kpts [17, 3] (x, y, visibility) in input-canvas pixels ->
    (A [2,3] mapping image px -> unit align frame, score).

    Tries every template, keeps the lowest-residual similarity solve
    (the reference scores cosine similarity of aligned skeletons; residual
    ranking is the equivalent selection rule).
    """
    valid = kpts[:, 2] > 0
    best = (None, np.inf)
    for tpl in templates():
        A, res = solve_similarity(kpts[:, :2].astype(np.float64), tpl, valid)
        if A is not None and res < best[1]:
            best = (A, res)
    return best


def affine_to_theta(A: np.ndarray, h: int, w: int) -> np.ndarray:
    """Pixel-space 2x3 'image->unit frame' affine -> normalized grid theta.

    ``affine_align`` consumes torch-convention theta: output-grid normalized
    coords -> input normalized coords. Our A maps input px -> align frame
    [0,1]; invert and convert both sides to [-1, 1] conventions.
    """
    A3 = np.concatenate([A, [[0, 0, 1.0]]], 0)
    inv = np.linalg.inv(A3)  # align frame -> image px
    # align frame u in [0,1]: grid coord g in [-1,1] -> u = (g+1)/2
    # image px p -> normalized n = 2p/(size-ish) - 1 ; use exact mapping:
    # n_x = 2*x/w - 1 (align_corners=False-ish scale); we use the plain
    # linear map consistent with grid_sample(align_corners=False):
    # x = ((n_x + 1) * w - 1) / 2  =>  n_x = (2x + 1) / w - 1
    out = np.zeros((2, 3), np.float64)
    # compose: g -> u -> p -> n
    # u = (g + 1) / 2 ; p = inv @ [u, 1] ; n = (2p + 1)/wh - 1
    M_u = np.array([[0.5, 0, 0.5], [0, 0.5, 0.5], [0, 0, 1]])
    M_n = np.array([[2.0 / w, 0, 1.0 / w - 1], [0, 2.0 / h, 1.0 / h - 1],
                    [0, 0, 1]])
    full = M_n @ inv @ M_u
    out = full[:2]
    return out.astype(np.float32)


def inverse_theta(A: np.ndarray, h: int, w: int) -> np.ndarray:
    """Theta for pasting an aligned 64x64 mask back onto the (h, w) canvas:
    output grid over the image, sampling from the aligned frame."""
    A3 = np.concatenate([A, [[0, 0, 1.0]]], 0)
    M_u_inv = np.array([[2.0, 0, -1.0], [0, 2.0, -1.0], [0, 0, 1]])
    # image grid g_img -> pixel p -> align frame u -> align grid g_al
    M_p = np.array([[w / 2.0, 0, (w - 1) / 2.0], [0, h / 2.0, (h - 1) / 2.0],
                    [0, 0, 1]])
    full = M_u_inv @ A3 @ M_p
    return full[:2].astype(np.float32)


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------


def backbone_forward(params: dict, images: jax.Array, cfg: Pose2SegConfig):
    """Dilated ResNet50 + FPN -> P2 feature map at stride 4."""
    rcfg = resnet_nn.ResNetConfig(depth=50, stride_in_1x1=False,
                                  frozen_bn=False, dilation_c5=2)
    feats = resnet_nn.forward(params["backbone"], images, rcfg)
    pyr = fpn_nn.fpn_forward(params["fpn"], feats, with_p6=False)
    return pyr["p2"]


def seg_module(params: dict, x: jax.Array, cfg: Pose2SegConfig) -> jax.Array:
    """resnet10units seg head: [N,64,64,C] -> [N,64,64,2] logits."""
    x = L.relu(L.conv2d(x, params["conv_in"], padding=1))
    for i in range(cfg.seg_blocks):
        bp = params[f"block{i}"]
        h = L.relu(L.conv2d(x, bp["conv1"], padding=1))
        h = L.conv2d(h, bp["conv2"], padding=1)
        x = L.relu(x + h)
    return L.conv2d(x, params["conv_out"])


def forward(params: dict, images: jax.Array, theta: jax.Array,
            inv_theta: jax.Array, person_valid: jax.Array,
            cfg: Pose2SegConfig):
    """images [B,S,S,3] normalized; theta [B,P,2,3] (align crop);
    inv_theta [B,P,2,3] (paste back); person_valid [B,P].
    -> dict(aligned_logits [B,P,64,64,2], masks [B,P,S,S] probs)."""
    b, s, _, _ = images.shape
    p = theta.shape[1]
    feats = backbone_forward(params, images, cfg)  # [B, S/4, S/4, C]
    aligned = affine_align(feats, theta, cfg.align_size)  # [B,P,64,64,C]
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


def init_params(key: jax.Array, cfg: Pose2SegConfig, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 64))
    rcfg = resnet_nn.ResNetConfig(depth=50, stride_in_1x1=False,
                                  frozen_bn=False, dilation_c5=2)
    c = cfg.feature_channels
    seg = {
        "conv_in": L.conv_params(next(keys), 3, 3, c, c, dtype=dtype),
        "conv_out": L.conv_params(next(keys), 1, 1, c, 2, dtype=dtype),
    }
    for i in range(cfg.seg_blocks):
        seg[f"block{i}"] = {
            "conv1": L.conv_params(next(keys), 3, 3, c, c, dtype=dtype),
            "conv2": L.conv_params(next(keys), 3, 3, c, c, dtype=dtype),
        }
    return {
        "backbone": resnet_nn.init_params(next(keys), rcfg, dtype),
        "fpn": fpn_nn.fpn_init(next(keys), (256, 512, 1024, 2048), c, dtype),
        "seg": seg,
    }
