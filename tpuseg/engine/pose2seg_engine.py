"""Pose2Seg predictor + eval engine (Pose2Seg.jittor test.py parity).

Surface (README.md:189-199): ``test.py --weights last.pkl --coco --OCHuman``
runs COCOeval(segm) on cocoVal / OCHumanVal / OCHumanTest using ground-truth
keypoints as the pose input (the model is pose-conditioned).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from tpuseg.models import pose2seg as P2S


class Pose2SegPredictor:
    def __init__(self, cfg: P2S.Pose2SegConfig | None = None, params=None,
                 weights: str | None = None, dtype=jnp.float32):
        self.cfg = cfg or P2S.Pose2SegConfig()
        if params is None:
            if weights:
                params = load_pose2seg_weights(weights, self.cfg)
            else:
                params = P2S.init_params(jax.random.PRNGKey(0), self.cfg)
        self.params = jax.tree.map(jnp.asarray, params)
        c = self.cfg

        @jax.jit
        def run(params, images, theta, inv_theta, valid):
            return P2S.forward(params, images, theta, inv_theta, valid, c)

        self._run = run

    def run_on_image(self, img_rgb: np.ndarray, keypoints: np.ndarray) -> dict:
        """img uint8 RGB [H,W,3]; keypoints [N,17,3] image px.
        -> {masks [N,H,W] uint8, valid [N]}."""
        import cv2

        cfg = self.cfg
        h, w = img_rgb.shape[:2]
        s = cfg.input_size
        scale = s / max(h, w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        canvas = np.zeros((s, s, 3), np.float32)
        resized = cv2.resize(img_rgb, (nw, nh), interpolation=cv2.INTER_LINEAR)
        canvas[:nh, :nw] = resized
        canvas = (canvas / 255.0 - np.asarray([0.485, 0.456, 0.406])) / np.asarray(
            [0.229, 0.224, 0.225])

        p = cfg.max_people
        n = min(len(keypoints), p)
        theta = np.zeros((1, p, 2, 3), np.float32)
        inv_theta = np.zeros((1, p, 2, 3), np.float32)
        valid = np.zeros((1, p), bool)
        for i in range(n):
            kp = keypoints[i].astype(np.float64).copy()
            kp[:, :2] *= scale
            A, res = P2S.best_template_affine(kp, cfg)
            if A is None:
                continue
            theta[0, i] = P2S.affine_to_theta(A, s, s)
            inv_theta[0, i] = P2S.inverse_theta(A, s, s)
            valid[0, i] = True
        out = self._run(self.params, jnp.asarray(canvas, jnp.float32)[None],
                        jnp.asarray(theta), jnp.asarray(inv_theta),
                        jnp.asarray(valid))
        masks_s = np.asarray(out["masks"])[0, :n]  # [n, PS, PS] paste grid
        ps = cfg.paste_size
        masks = np.zeros((n, h, w), np.uint8)
        # the paste grid covers the same square canvas, coarser: crop the
        # real-image region at paste scale, then resize to the original
        ph = max(int(round(nh * ps / s)), 1)
        pw = max(int(round(nw * ps / s)), 1)
        for i in range(n):
            m = masks_s[i][:ph, :pw]
            m = cv2.resize(m, (w, h), interpolation=cv2.INTER_LINEAR)
            masks[i] = (m > cfg.mask_thresh).astype(np.uint8)
        return {"masks": masks, "valid": valid[0, :n]}


def load_pose2seg_weights(path: str, cfg) -> dict:
    """Load a torch-saved Pose2Seg checkpoint (last.pkl) — best-effort name
    mapping; falls back to our npz format."""
    if path.endswith(".npz"):
        from tpuseg.engine.trainer import load_params_npz

        like = P2S.init_params(jax.random.PRNGKey(0), cfg)
        return load_params_npz(path, like)
    from tpuseg.weights.torch_io import flatten_state_dict, load_torch_file

    flat = flatten_state_dict(load_torch_file(path))
    return pose2seg_from_torch(flat, cfg)


def pose2seg_from_torch(flat: dict, cfg) -> dict:
    """Map a Pose2Seg torch state dict onto our tree.

    The released last.pkl keeps upstream module names (backbone.resnet50FPN /
    segnet); exact submodule names are [C]-tier (SURVEY §0) — this mapper
    keys on the torchvision-style resnet names it can find and raises with
    the unmatched names listed, so real checkpoints diagnose cleanly.
    """
    from tpuseg.nn import resnet as resnet_nn

    prefixes = sorted({k.split(".")[0] for k in flat})
    for pre in ("backbone.", "module.backbone.", ""):
        if f"{pre}conv1.weight" in flat or f"{pre}layer1.0.conv1.weight" in flat:
            rcfg = resnet_nn.ResNetConfig(depth=50, stride_in_1x1=False,
                                          frozen_bn=False, dilation_c5=2)
            backbone = resnet_nn.from_torch_state(flat, rcfg, prefix=pre)
            raise NotImplementedError(
                "Pose2Seg checkpoint found resnet weights under prefix "
                f"'{pre}'; FPN/seg-head name mapping requires the real "
                f"checkpoint's names. Top-level keys: {prefixes[:20]}")
    raise ValueError(
        f"unrecognized Pose2Seg checkpoint structure; keys: {prefixes[:20]}")


def evaluate_pose2seg(predictor, dataset, max_images=None, progress=True):
    """COCOeval segm over a keypoint dataset (test.py parity)."""
    from tpuseg.eval import rle as rle_mod
    from tpuseg.eval.cocoeval import COCOeval

    ids = dataset.image_ids
    if max_images:
        ids = ids[:max_images]
    results = []
    for n, iid in enumerate(ids, 1):
        img = dataset.load_image(iid)
        anns = dataset.coco.imgToAnns[iid]
        kpts = np.asarray(
            [np.asarray(a["keypoints"], np.float64).reshape(-1, 3)
             for a in anns if a.get("keypoints") is not None and
             np.sum(np.asarray(a["keypoints"]).reshape(-1, 3)[:, 2] > 0) >= 2]
        )
        if len(kpts) == 0:
            continue
        out = predictor.run_on_image(img, kpts)
        for i in range(len(out["masks"])):
            if not out["valid"][i]:
                continue
            results.append({
                "image_id": int(iid),
                "category_id": 1,
                "score": 1.0,
                "segmentation": rle_mod.encode(out["masks"][i]),
            })
        if progress and n % 10 == 0:
            print(f"\r{n}/{len(ids)}", end="", flush=True)
    if progress:
        print()
    E = COCOeval(dataset.coco, dataset.coco.loadRes(results), "segm")
    E.evaluate()
    E.accumulate()
    E.summarize()
    return E.stats
