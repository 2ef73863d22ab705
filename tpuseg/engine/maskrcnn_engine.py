"""Mask R-CNN predictor + eval engine (detectron.jittor COCODemo /
tools/test_net.py parity).

Host side: PIL bilinear resize to shortest-edge-800 (the reference's
torchvision transform), BGR mean subtraction, placement on one of two static
canvases (landscape 800x1344 / portrait 1344x800 — conv zero-padding makes
canvas features identical to the unpadded reference inside the real region).
Device side: one jit program per canvas (backbone->FPN->RPN->RoI heads).
Post: Masker-exact 28x28 -> image-coords mask pasting.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.models import maskrcnn as M
from tpuseg.ops.preprocess import DETECTRON_PIXEL_MEAN_BGR, detectron_target_size

CANVAS_LANDSCAPE = (800, 1344)
CANVAS_PORTRAIT = (1344, 800)


def preprocess_image_bgr(img_bgr: np.ndarray, min_size=800, max_size=1333):
    """-> (canvas float32 [Hc,Wc,3], (th, tw) real size, (sy, sx) scales).

    Scales are per-axis: PIL resize rounds each target edge independently,
    and upstream BoxList.resize divides x/y by their own ratios.

    The static canvas scales with (min_size, max_size): the resized short
    edge is at most min_size and the long edge at most ceil64(max_size),
    so e.g. COCODemo(min_image_size=480) compiles a 480x1344 program
    instead of padding onto the full 800-canvas (2.8x less compute). At
    the 800/1333 defaults this reproduces the canonical 800x1344 canvas.
    """
    from PIL import Image

    h, w = img_bgr.shape[:2]
    th, tw = detectron_target_size(h, w, min_size, max_size)
    long_edge = -(-max_size // 64) * 64
    # extreme aspect ratios can round the long edge past max_size (e.g.
    # 90x2690 -> tw=1345 at the 800/1333 defaults); clamp to the canvas
    th, tw = min(th, long_edge), min(tw, long_edge)
    canvas_hw = ((min_size, long_edge) if tw >= th
                 else (long_edge, min_size))
    pil = Image.fromarray(img_bgr[:, :, ::-1])  # PIL wants RGB
    resized = np.asarray(pil.resize((tw, th), Image.BILINEAR))[:, :, ::-1]
    canvas = np.zeros((*canvas_hw, 3), np.float32)
    canvas[:th, :tw] = resized.astype(np.float32) - np.asarray(
        DETECTRON_PIXEL_MEAN_BGR, np.float32)
    return canvas, (th, tw), (th / h, tw / w)


class MaskRCNNPredictor:
    """COCODemo-equivalent programmatic API (README.md:288-335).

    ``variant="fpn"`` (GeneralizedRCNN R-50/101-FPN) or ``"c4"``
    (e2e_mask_rcnn_R_50_C4 — the config the reference README demos,
    README.md:266/314): same surface, dispatched model + weight map.
    """

    def __init__(self, cfg=None, params=None,
                 weights: str | None = None, batch_size: int = 1,
                 confidence_threshold: float = 0.5, min_image_size: int = 800,
                 max_image_size: int = 1333, dtype=jnp.float32,
                 variant: str = "fpn", devices=None):
        if variant == "c4":
            from tpuseg.models import maskrcnn_c4 as C4

            self._mod = C4
            self.cfg = cfg or C4.MaskRCNNC4Config()
        elif variant == "retinanet":
            from tpuseg.models import retinanet as RN

            self._mod = RN
            self.cfg = cfg or RN.RetinaNetConfig()
        else:
            self._mod = M
            self.cfg = cfg or M.MaskRCNNConfig()
        self.variant = variant
        self.batch_size = batch_size
        self.confidence_threshold = confidence_threshold
        self.min_image_size = min_image_size
        self.max_image_size = max_image_size
        self.dtype = dtype
        if params is None:
            if weights:
                params = load_detectron_weights(weights, self.cfg,
                                                variant=variant)
            else:
                params = self._mod.init_params(jax.random.PRNGKey(0), self.cfg)
        self.params = jax.tree.map(
            lambda x: jnp.asarray(x, dtype) if jnp.issubdtype(
                jnp.asarray(x).dtype, jnp.floating) else jnp.asarray(x), params)
        self._runs = {}
        mcfg = self.cfg
        mod = self._mod

        from tpuseg.engine.yolact_engine import _resolve_devices

        self.n_devices = _resolve_devices(devices)
        if self.n_devices > 1:
            assert batch_size % self.n_devices == 0, (
                f"batch_size {batch_size} must divide across "
                f"{self.n_devices} devices")

        def make_run(canvas_hw):
            def run(params, images, image_hw):
                out = mod.forward_inference(
                    params, images.astype(dtype), image_hw, mcfg)
                return {k: v.astype(jnp.float32) if v.dtype != jnp.bool_
                        and jnp.issubdtype(v.dtype, jnp.floating) else v
                        for k, v in out.items()}

            if self.n_devices > 1:
                from tpuseg.parallel.inference import ShardedInference
                from tpuseg.parallel.mesh import make_mesh

                # shard_map is REQUIRED here, not GSPMD jit-shardings: on
                # TPU forward_inference contains pallas_call (RoIAlign /
                # NMS kernels), which carries no SPMD partitioning rule —
                # see tpuseg/parallel/inference.py. Each chip runs the
                # kernels on its own batch shard.
                si = ShardedInference(run, self.params,
                                      mesh=make_mesh(self.n_devices),
                                      use_shard_map=True, n_batch_args=2)
                self.params = si.params
                return si._fn
            return jax.jit(run)

        self._make_run = make_run

    def _run_for(self, canvas_hw):
        if canvas_hw not in self._runs:
            self._runs[canvas_hw] = self._make_run(canvas_hw)
        return self._runs[canvas_hw]

    def run_on_bgr_image(self, img_bgr: np.ndarray) -> dict:
        """Single image -> final detections in original-image coords."""
        return self.run_on_bgr_images([img_bgr])[0]

    def run_on_bgr_images(self, imgs_bgr: list) -> list:
        """Batched inference: images must share orientation (the engine's
        eval loop buckets by orientation); one jit dispatch per call."""
        canvases, hws, scales = [], [], []
        for img in imgs_bgr:
            canvas, (th, tw), scale = preprocess_image_bgr(
                img, self.min_image_size, self.max_image_size)
            canvases.append(canvas)
            hws.append((th, tw))
            scales.append(scale)
        shapes = {c.shape for c in canvases}
        assert len(shapes) == 1, "batch must share one canvas orientation"
        run = self._run_for(canvases[0].shape[:2])
        batch = np.stack(canvases)
        hws_np = np.asarray(hws, np.int32)
        pad = (-len(batch)) % self.n_devices
        if pad:  # sharded batch dim must divide across devices
            batch = np.concatenate(
                [batch, np.zeros((pad,) + batch.shape[1:], batch.dtype)])
            hws_np = np.concatenate(
                [hws_np, np.ones((pad, 2), np.int32)])
        out = run(self.params, jnp.asarray(batch), jnp.asarray(hws_np))
        out = {k: np.asarray(v) for k, v in out.items()}
        results = []
        for i, img in enumerate(imgs_bgr):
            h, w = img.shape[:2]
            valid = out["valid"][i]
            sy, sx = scales[i]
            boxes = out["boxes"][i][valid].copy()
            boxes[:, 0::2] /= sx
            boxes[:, 1::2] /= sy
            boxes[:, 0::2] = np.clip(boxes[:, 0::2], 0, w - 1)
            boxes[:, 1::2] = np.clip(boxes[:, 1::2], 0, h - 1)
            res = {
                "boxes": boxes,
                "scores": out["scores"][i][valid],
                "classes": out["classes"][i][valid],
            }
            if "masks" in out:  # absent for Faster R-CNN (MASK_ON False)
                res["masks"] = paste_masks(out["masks"][i][valid], boxes, h, w)
            results.append(res)
        return results

    def select_top_predictions(self, preds: dict) -> dict:
        keep = preds["scores"] >= self.confidence_threshold
        order = np.argsort(-preds["scores"][keep])
        return {k: v[keep][order] for k, v in preds.items()}


def load_detectron_weights(path: str, cfg, variant: str = "fpn") -> dict:
    from tpuseg.weights.torch_io import flatten_state_dict, load_torch_file

    flat = flatten_state_dict(load_torch_file(path))
    if variant == "c4":
        from tpuseg.models.maskrcnn_c4 import from_torch_state as c4_map

        return c4_map(flat, cfg)
    if variant == "retinanet":
        from tpuseg.models.retinanet import from_torch_state as rn_map

        return rn_map(flat, cfg)
    from tpuseg.weights.detectron_map import from_torch_state

    return from_torch_state(flat, cfg)


# ---------------------------------------------------------------------------
# Config-file dispatch (yacs tree -> model variant + dataclass config)
# ---------------------------------------------------------------------------


def _cfg_get(node, path, default):
    """Dotted-path lookup into a ConfigNode/dict tree with a default."""
    cur = node
    for part in path.split("."):
        try:
            cur = cur[part]
        except (KeyError, TypeError):
            return default
    return cur


def model_config_from_node(node):
    """ConfigNode (merge_from_file'd yaml) -> (variant, model dataclass).

    Dispatches on MODEL.META_ARCHITECTURE + MODEL.BACKBONE.CONV_BODY
    ("R-50-FPN" / "R-101-FPN" / "R-50-C4", README.md:263-284) and applies
    MASK_ON plus the RPN top-N and head constants from the yaml.
    """
    def get(path, default):
        return _cfg_get(node, path, default)

    conv_body = get("MODEL.BACKBONE.CONV_BODY", "R-50-FPN")
    num_classes = int(get("MODEL.ROI_BOX_HEAD.NUM_CLASSES", 81))
    mask_on = bool(get("MODEL.MASK_ON", True))  # False -> Faster R-CNN
    depth = 101 if "101" in conv_body else 50
    if get("MODEL.META_ARCHITECTURE", "GeneralizedRCNN") == "RetinaNet":
        from tpuseg.models.retinanet import RetinaNetConfig

        return "retinanet", RetinaNetConfig(
            depth=depth,
            num_classes=int(get("MODEL.RETINANET.NUM_CLASSES", num_classes)),
            pre_nms_top_n=int(get("MODEL.RETINANET.PRE_NMS_TOP_N", 1000)),
            score_thresh=float(get("MODEL.RETINANET.INFERENCE_TH", 0.05)),
            nms_thresh=float(get("MODEL.RETINANET.NMS_TH", 0.4)),
        )
    if conv_body.endswith("-C4"):
        from tpuseg.models.maskrcnn_c4 import MaskRCNNC4Config

        return "c4", MaskRCNNC4Config(
            depth=depth,
            rpn_pre_nms_top_n=int(get("MODEL.RPN.PRE_NMS_TOP_N_TEST", 6000)),
            rpn_post_nms_top_n=int(get("MODEL.RPN.POST_NMS_TOP_N_TEST", 1000)),
            rpn_pre_nms_top_n_train=int(
                get("MODEL.RPN.PRE_NMS_TOP_N_TRAIN", 12000)),
            rpn_post_nms_top_n_train=int(
                get("MODEL.RPN.POST_NMS_TOP_N_TRAIN", 2000)),
            pooler_sampling_ratio=int(
                get("MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO", 0)),
            num_classes=num_classes,
            mask_on=mask_on,
        )
    return "fpn", M.MaskRCNNConfig(
        depth=depth,
        rpn_pre_nms_top_n=int(get("MODEL.RPN.PRE_NMS_TOP_N_TEST", 1000)),
        rpn_post_nms_top_n=int(get("MODEL.RPN.POST_NMS_TOP_N_TEST", 1000)),
        fpn_post_nms_top_n=int(get("MODEL.RPN.FPN_POST_NMS_TOP_N_TEST", 1000)),
        fpn_post_nms_top_n_train=int(
            get("MODEL.RPN.FPN_POST_NMS_TOP_N_TRAIN", 2000)),
        num_classes=num_classes,
        mask_on=mask_on,
    )


def build_predictor_from_cfg(node, **kw) -> "MaskRCNNPredictor":
    """ConfigNode -> predictor for its model variant (see
    :func:`model_config_from_node`)."""
    variant, cfg = model_config_from_node(node)
    weights = _cfg_get(node, "MODEL.WEIGHT", "") or None
    min_size = int(_cfg_get(node, "INPUT.MIN_SIZE_TEST", 800))
    max_size = int(_cfg_get(node, "INPUT.MAX_SIZE_TEST", 1333))
    return MaskRCNNPredictor(cfg=cfg, weights=weights, variant=variant,
                             min_image_size=min_size,
                             max_image_size=max_size, **kw)


# ---------------------------------------------------------------------------
# Mask pasting (mask_head/inference.py Masker — exact semantics)
# ---------------------------------------------------------------------------


def paste_mask_in_image(mask28: np.ndarray, box: np.ndarray, im_h: int,
                        im_w: int, thresh: float = 0.5, padding: int = 1):
    import cv2

    m = mask28.shape[0]
    padded = np.zeros((m + 2 * padding, m + 2 * padding), np.float32)
    # padding=0 must be an identity copy ([0:-0] is an EMPTY slice)
    padded[padding:padding + m, padding:padding + m] = mask28
    scale = (m + 2 * padding) / m
    # expand box by the same scale
    w_half = (box[2] - box[0]) * 0.5 * scale
    h_half = (box[3] - box[1]) * 0.5 * scale
    x_c = (box[2] + box[0]) * 0.5
    y_c = (box[3] + box[1]) * 0.5
    ebox = np.array([x_c - w_half, y_c - h_half, x_c + w_half, y_c + h_half])
    ebox = ebox.astype(np.int64)
    w = max(int(ebox[2] - ebox[0] + 1), 1)
    h = max(int(ebox[3] - ebox[1] + 1), 1)
    resized = cv2.resize(padded, (w, h), interpolation=cv2.INTER_LINEAR)
    if thresh >= 0:
        resized = (resized > thresh).astype(np.uint8)
    out = np.zeros((im_h, im_w), np.uint8)
    x0 = max(int(ebox[0]), 0)
    x1 = min(int(ebox[2]) + 1, im_w)
    y0 = max(int(ebox[1]), 0)
    y1 = min(int(ebox[3]) + 1, im_h)
    if x1 > x0 and y1 > y0:
        out[y0:y1, x0:x1] = resized[
            (y0 - ebox[1]):(y1 - ebox[1]), (x0 - ebox[0]):(x1 - ebox[0])]
    return out


def paste_masks(masks28: np.ndarray, boxes: np.ndarray, im_h: int, im_w: int):
    n = len(boxes)
    out = np.zeros((n, im_h, im_w), np.uint8)
    for i in range(n):
        out[i] = paste_mask_in_image(masks28[i], boxes[i], im_h, im_w)
    return out


# ---------------------------------------------------------------------------
# COCO evaluation loop (tools/test_net.py parity)
# ---------------------------------------------------------------------------

# contiguous class id (0-based, no bg) -> COCO category id
COCO_CATEGORY_IDS = [
    1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 14, 15, 16, 17, 18, 19, 20, 21,
    22, 23, 24, 25, 27, 28, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42,
    43, 44, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58, 59, 60, 61,
    62, 63, 64, 65, 67, 70, 72, 73, 74, 75, 76, 77, 78, 79, 80, 81, 82, 84,
    85, 86, 87, 88, 89, 90,
]


def evaluate_coco(predictor: MaskRCNNPredictor, dataset, max_images=None,
                  progress=True, batch_size: int = 1):
    """Run COCO bbox+segm eval via our COCOeval clone. Returns stats dict.

    ``batch_size`` > 1 buckets images by orientation (each bucket shares a
    canvas) and runs one jit dispatch per bucket batch.
    """
    import time

    from tpuseg.eval import rle as rle_mod
    from tpuseg.eval.cocoeval import COCOeval

    ids = dataset.image_ids
    if max_images:
        ids = ids[:max_images]
    results = []
    t0 = time.perf_counter()
    n = 0

    def load_bgr(iid):
        img = dataset.load_image(iid)[:, :, ::-1]
        info = dataset.coco.imgs[iid]
        if img.shape[:2] != (info["height"], info["width"]):
            # load_image decodes in the annotation frame (EXIF ignored), so
            # a mismatch means the json metadata itself is wrong; conform
            # the pixels so the image lands in the right orientation bucket
            # (canvas-shape assert) and scores in the annotation frame
            import cv2

            img = cv2.resize(img, (info["width"], info["height"]),
                             interpolation=cv2.INTER_LINEAR)
        return img

    def consume(batch_ids):
        nonlocal n
        imgs = [load_bgr(i) for i in batch_ids]
        if len(imgs) == 1:  # single-image path (also duck-typed oracles)
            preds_list = [predictor.run_on_bgr_image(imgs[0])]
        else:
            preds_list = predictor.run_on_bgr_images(imgs)
        for iid, preds in zip(batch_ids, preds_list):
            for i in range(len(preds["scores"])):
                x1, y1, x2, y2 = preds["boxes"][i]
                det = {
                    "image_id": int(iid),
                    "category_id": COCO_CATEGORY_IDS[int(preds["classes"][i])],
                    "bbox": [float(x1), float(y1), float(x2 - x1 + 1),
                             float(y2 - y1 + 1)],
                    "score": float(preds["scores"][i]),
                }
                if "masks" in preds:
                    det["segmentation"] = rle_mod.encode(preds["masks"][i])
                results.append(det)
            n += 1
            if progress and n % 20 == 0:
                print(
                    f"\r{n}/{len(ids)} "
                    f"({n / (time.perf_counter() - t0):.2f} img/s)",
                    end="", flush=True)

    buckets: dict[bool, list] = {True: [], False: []}
    for iid in ids:
        info = dataset.coco.imgs[iid]
        landscape = info["width"] >= info["height"]
        buckets[landscape].append(iid)
        if len(buckets[landscape]) == batch_size:
            consume(buckets[landscape])
            buckets[landscape] = []
    for rest in buckets.values():
        for iid in rest:  # leftovers run singly (different pad would skew)
            consume([iid])
    if progress:
        print()
    stats = {}
    has_masks = any("segmentation" in r for r in results)
    for iou_type in ("bbox", "segm") if has_masks else ("bbox",):
        print(f"== {iou_type} ==")
        E = COCOeval(dataset.coco, dataset.coco.loadRes(results), iou_type)
        E.evaluate()
        E.accumulate()
        E.summarize()
        stats[iou_type] = E.stats
    return stats
