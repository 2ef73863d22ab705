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
                params, self.cfg = load_pose2seg_weights(weights, self.cfg)
            else:
                params = P2S.init_params(jax.random.PRNGKey(0), self.cfg)
        # dtype: bf16 casts params + image compute like the sibling
        # predictors (yolact/maskrcnn/yolo engines); f32 is parity default
        self.params = jax.tree.map(
            lambda x: jnp.asarray(x, dtype) if jnp.issubdtype(
                jnp.asarray(x).dtype, jnp.floating) else jnp.asarray(x),
            params)
        c = self.cfg

        @jax.jit
        def run(params, images, theta, inv_theta, valid, skel):
            return P2S.forward(params, images.astype(dtype), theta,
                               inv_theta, valid, c,
                               skel_feats=skel if c.cat_skeleton else None)

        self._run = run

        # split program for crowded images: backbone once per image, heads
        # per max_people chunk (forward_from_features docstring)
        @jax.jit
        def run_backbone(params, images):
            return P2S.backbone_forward(params, images.astype(dtype), c)

        @jax.jit
        def run_heads(params, feats, theta, inv_theta, valid, skel):
            return P2S.forward_from_features(
                params, feats, theta, inv_theta, valid, c,
                skel_feats=skel if c.cat_skeleton else None)

        self._run_backbone = run_backbone
        self._run_heads = run_heads

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
        n = len(keypoints)  # crowded images run in chunks of max_people
        masks_chunks = []
        valid_all = np.zeros((n,), bool)
        feats = None
        if n > p:  # crowded: share one backbone pass across chunks
            feats = self._run_backbone(
                self.params, jnp.asarray(canvas, jnp.float32)[None])
        for c0 in range(0, n, p):
            chunk = keypoints[c0:c0 + p]
            theta = np.zeros((1, p, 2, 3), np.float32)
            inv_theta = np.zeros((1, p, 2, 3), np.float32)
            valid = np.zeros((1, p), bool)
            skel = np.zeros(
                (1, p, cfg.align_size, cfg.align_size,
                 cfg.skeleton_channels), np.float32)
            for i, kp_raw in enumerate(chunk):
                kp = kp_raw.astype(np.float64).copy()
                kp[:, :2] *= scale
                A, score, _ = P2S.choose_template(kp, cfg)
                if A is None:
                    continue
                theta[0, i] = P2S.affine_to_theta(A, s, s)
                inv_theta[0, i] = P2S.inverse_theta(A, s, s)
                valid[0, i] = True
                if cfg.cat_skeleton:
                    skel[0, i] = P2S.skeleton_feats_for_person(kp, A, cfg)
            if feats is not None:
                out = self._run_heads(self.params, feats,
                                      jnp.asarray(theta),
                                      jnp.asarray(inv_theta),
                                      jnp.asarray(valid), jnp.asarray(skel))
            else:
                out = self._run(self.params,
                                jnp.asarray(canvas, jnp.float32)[None],
                                jnp.asarray(theta), jnp.asarray(inv_theta),
                                jnp.asarray(valid), jnp.asarray(skel))
            masks_chunks.append(np.asarray(out["masks"])[0, :len(chunk)])
            valid_all[c0:c0 + len(chunk)] = valid[0, :len(chunk)]
        masks_s = (np.concatenate(masks_chunks, axis=0) if masks_chunks
                   else np.zeros((0, cfg.paste_size, cfg.paste_size),
                                 np.float32))  # [n, PS, PS] paste grid
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
        return {"masks": masks, "valid": valid_all}


def load_pose2seg_weights(path: str, cfg):
    """Load a torch-saved Pose2Seg checkpoint (last.pkl).

    Returns (params, cfg) — cfg may be adjusted (cat_skeleton inferred from
    the checkpoint's segnet input channels). Also accepts our npz format
    (returns (params, cfg) unchanged-config).
    """
    if path.endswith(".npz"):
        from tpuseg.engine.trainer import load_params_npz

        like = P2S.init_params(jax.random.PRNGKey(0), cfg)
        return load_params_npz(path, like), cfg
    from tpuseg.weights.torch_io import flatten_state_dict, load_torch_file

    flat = flatten_state_dict(load_torch_file(path))
    return pose2seg_from_torch(flat, cfg)


def pose2seg_from_torch(flat: dict, cfg):
    """Map an upstream Pose2Seg torch state dict onto our tree — strictly.

    The released last.pkl keeps upstream module names: ``backbone.*`` is the
    resnet50FPN (torchvision resnet names + toplayer/latlayer1-3/smooth1-3
    FPN convs, possibly with the resnet nested under ``backbone.resnet.``)
    and ``segnet.*`` is resnet10units (conv1/bn1, 10 Bottleneck units in a
    sequential container, 1x1 2-channel classifier). Every checkpoint tensor
    must be consumed (num_batches_tracked and non-model entries excepted) or
    this raises listing the leftovers. Returns (params, cfg') with
    cat_skeleton inferred from segnet.conv1's input channels.
    """
    import re

    from dataclasses import replace as _replace

    import numpy as np

    from tpuseg.nn import resnet as resnet_nn

    consumed = set()

    def _conv_np(key_w):
        consumed.add(key_w)
        w = np.ascontiguousarray(
            np.asarray(flat[key_w], np.float32).transpose(2, 3, 1, 0))
        key_b = key_w[:-len("weight")] + "bias"
        b = None
        if key_b in flat:
            consumed.add(key_b)
            b = np.asarray(flat[key_b], np.float32)
        return {"weight": w, "bias": b}

    def _bn_np(base):
        out = {}
        for k in ("weight", "bias", "running_mean", "running_var"):
            consumed.add(f"{base}.{k}")
            out[k] = np.asarray(flat[f"{base}.{k}"], np.float32)
        return out

    # tolerate DataParallel prefixes
    if any(k.startswith("module.") for k in flat):
        flat = {k[len("module."):] if k.startswith("module.") else k: v
                for k, v in flat.items()}

    # ---- backbone resnet (inlined kuangliu-style or nested .resnet.)
    res_pre = None
    for pre in ("backbone.", "backbone.resnet.", "backbone.resnet50.",
                "backbone.backbone."):
        if f"{pre}conv1.weight" in flat and f"{pre}layer1.0.conv1.weight" in flat:
            res_pre = pre
            break
    if res_pre is None:
        tops = sorted({k.split(".")[0] for k in flat})
        raise ValueError(
            f"unrecognized Pose2Seg checkpoint structure; keys: {tops[:20]}")
    rcfg = resnet_nn.ResNetConfig(depth=50, stride_in_1x1=False,
                                  frozen_bn=False,
                                  dilation_c5=cfg.dilation_c5)
    backbone = resnet_nn.from_torch_state(flat, rcfg, prefix=res_pre)
    consumed.update(
        k for k in flat
        if k.startswith(res_pre) and re.match(
            rf"{re.escape(res_pre)}(conv1\.|bn1\.|layer[1-4]\.)", k))

    # ---- FPN convs (live beside the resnet under backbone.)
    fpn_names = ("toplayer", "latlayer1", "latlayer2", "latlayer3",
                 "smooth1", "smooth2", "smooth3")
    fpn_pre = None
    for pre in ("backbone.", "backbone.fpn."):
        if f"{pre}toplayer.weight" in flat:
            fpn_pre = pre
            break
    if fpn_pre is None:
        raise ValueError(
            "Pose2Seg checkpoint has no FPN convs (toplayer/latlayer/...) "
            f"under 'backbone.'; keys: {sorted(flat)[:20]}")
    fpn = {n: _conv_np(f"{fpn_pre}{n}.weight") for n in fpn_names
           if f"{fpn_pre}{n}.weight" in flat}
    missing_fpn = [n for n in ("toplayer", "latlayer1", "latlayer2",
                               "latlayer3", "smooth3") if n not in fpn]
    if missing_fpn:
        raise ValueError(f"Pose2Seg FPN convs missing: {missing_fpn}")
    for n in ("smooth1", "smooth2"):  # unused by the P2 path but may exist
        fpn.setdefault(n, {
            "weight": np.zeros((3, 3, 256, 256), np.float32),
            "bias": np.zeros((256,), np.float32)})

    # ---- segnet (resnet10units)
    seg_keys = [k for k in flat if k.startswith("segnet.")]
    if not seg_keys:
        raise ValueError("Pose2Seg checkpoint has no segnet.* keys")
    # stem: first conv+bn
    stem_conv = None
    for cand in ("segnet.conv1.weight", "segnet.stem.0.weight",
                 "segnet.conv_in.weight"):
        if cand in flat:
            stem_conv = cand
            break
    if stem_conv is None:
        raise ValueError(f"segnet stem conv not found; keys: {seg_keys[:10]}")
    seg = {"conv1": _conv_np(stem_conv)}
    bn1_base = stem_conv.replace("conv1.weight", "bn1").replace(
        "stem.0.weight", "stem.1").replace("conv_in.weight", "bn_in")
    seg["bn1"] = _bn_np(bn1_base)

    # residual units: find the sequential container by pattern
    unit_pat = re.compile(r"^(segnet\..*?)\.(\d+)\.conv1\.weight$")
    containers = {}
    for k in seg_keys:
        m = unit_pat.match(k)
        if m:
            containers.setdefault(m.group(1), set()).add(int(m.group(2)))
    if not containers:
        raise ValueError(
            f"segnet residual units not found; keys: {seg_keys[:10]}")
    cont = max(containers, key=lambda c: len(containers[c]))
    idxs = sorted(containers[cont])
    units = []
    for i in idxs:
        base = f"{cont}.{i}"
        units.append({
            "conv1": _conv_np(f"{base}.conv1.weight"),
            "bn1": _bn_np(f"{base}.bn1"),
            "conv2": _conv_np(f"{base}.conv2.weight"),
            "bn2": _bn_np(f"{base}.bn2"),
            "conv3": _conv_np(f"{base}.conv3.weight"),
            "bn3": _bn_np(f"{base}.bn3"),
        })
    seg["units"] = units

    # classifier: remaining segnet conv with 2 output channels
    cls_key = None
    for k in seg_keys:
        if k.endswith(".weight") and k not in consumed:
            w = np.asarray(flat[k])
            if w.ndim == 4 and w.shape[0] == 2:
                cls_key = k
                break
    if cls_key is None:
        raise ValueError("segnet classifier (2-channel conv) not found")
    seg["classifier"] = _conv_np(cls_key)

    # ---- strict accounting
    ignorable = tuple(["num_batches_tracked"])
    leftovers = [
        k for k in flat
        if k not in consumed and not k.endswith(ignorable)
        and k.split(".")[0] in ("backbone", "segnet")]
    if leftovers:
        raise ValueError(
            f"Pose2Seg checkpoint keys not mapped ({len(leftovers)}): "
            f"{leftovers[:12]}")

    # infer skeleton concat from segnet input channels
    seg_in = seg["conv1"]["weight"].shape[2]
    cat_skeleton = seg_in > cfg.feature_channels
    cfg2 = _replace(cfg, cat_skeleton=cat_skeleton)
    if cat_skeleton and seg_in != cfg.feature_channels + cfg.skeleton_channels:
        raise ValueError(
            f"segnet expects {seg_in} input channels; model computes "
            f"{cfg.feature_channels} + {cfg.skeleton_channels} skeleton")
    return {"backbone": backbone, "fpn": fpn, "seg": seg}, cfg2


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
