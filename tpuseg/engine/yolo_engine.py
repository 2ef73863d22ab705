"""YOLOv3 predictor + COCO eval engine (yolo.jittor test.py capability)."""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from tpuseg.models import yolov3 as Y


def unletterbox_boxes(boxes: np.ndarray, h: int, w: int,
                      input_size: int) -> np.ndarray:
    """Map boxes from input_size letterbox coords to original-image px,
    clipped to the image bounds (detect.py's undo-letterbox step)."""
    scale = input_size / max(h, w)
    pad_x = (input_size - w * scale) / 2
    pad_y = (input_size - h * scale) / 2
    out = boxes.copy()
    out[:, 0::2] = np.clip((out[:, 0::2] - pad_x) / scale, 0, w)
    out[:, 1::2] = np.clip((out[:, 1::2] - pad_y) / scale, 0, h)
    return out


class YoloPredictor:
    def __init__(self, cfg: Y.YoloV3Config | None = None, params=None,
                 weights: str | None = None, batch_size: int = 1,
                 dtype=jnp.float32):
        self.cfg = cfg or Y.YoloV3Config()
        self.batch_size = batch_size
        if params is None:
            if weights and weights.endswith(".weights"):
                from tpuseg.weights.darknet_io import load_yolov3_weights

                params = load_yolov3_weights(
                    weights, Y.init_params(jax.random.PRNGKey(0), self.cfg))
            elif weights:
                from tpuseg.engine.trainer import load_params_npz

                like = Y.init_params(jax.random.PRNGKey(0), self.cfg)
                params = load_params_npz(weights, like)
            else:
                params = Y.init_params(jax.random.PRNGKey(0), self.cfg)
        self.params = jax.tree.map(
            lambda x: jnp.asarray(x, dtype) if jnp.issubdtype(
                jnp.asarray(x).dtype, jnp.floating) else jnp.asarray(x), params)
        cfg_ = self.cfg

        @jax.jit
        def run(params, images_u8, hw):
            from tpuseg.ops.preprocess import letterbox_preprocess

            x = letterbox_preprocess(images_u8, hw, size=cfg_.input_size)
            return Y.detect(params, x.astype(dtype), cfg_)

        self._run = run

    def run_batch(self, images_u8_padded: np.ndarray, hw: np.ndarray) -> dict:
        out = self._run(self.params, jnp.asarray(images_u8_padded),
                        jnp.asarray(hw, jnp.int32))
        return {k: np.asarray(v) for k, v in out.items()}

    def unletterbox(self, boxes: np.ndarray, h: int, w: int) -> np.ndarray:
        """Map boxes from input_size letterbox coords to image px."""
        return unletterbox_boxes(boxes, h, w, self.cfg.input_size)


def evaluate_coco_boxes(predictor: YoloPredictor, dataset, max_images=None,
                        progress=True):
    """COCO bbox eval via our COCOeval clone (test.py mAP parity)."""
    from tpuseg.engine.maskrcnn_engine import COCO_CATEGORY_IDS
    from tpuseg.eval.cocoeval import COCOeval

    ids = dataset.image_ids
    if max_images:
        ids = ids[:max_images]
    bs = predictor.batch_size
    # ONE static canvas for the whole eval (dataset max, rounded to 32):
    # per-chunk max shapes would recompile the jitted detector for nearly
    # every batch
    maxh = maxw = 1
    for iid in ids:
        info = dataset.coco.imgs[iid]
        maxh = max(maxh, info["height"])
        maxw = max(maxw, info["width"])
    maxh = -(-maxh // 32) * 32
    maxw = -(-maxw // 32) * 32
    results = []
    for start in range(0, len(ids), bs):
        chunk = ids[start:start + bs]
        imgs, hws = [], []
        for iid in chunk:
            img = dataset.load_image(iid)
            info = dataset.coco.imgs[iid]
            if img.shape[:2] != (info["height"], info["width"]):
                # decode disagrees with the json metadata (e.g. EXIF
                # rotation): annotations live in the metadata frame, so
                # conform the pixels to it rather than overflow the canvas
                import cv2

                img = cv2.resize(img, (info["width"], info["height"]),
                                 interpolation=cv2.INTER_LINEAR)
            imgs.append(img)
            hws.append(img.shape[:2])
        batch = np.zeros((bs, maxh, maxw, 3), np.uint8)
        # padded slots keep hw=(1,1): hw=(0,0) makes the letterbox scale
        # inf and poisons the grid with NaNs
        hw = np.ones((bs, 2), np.int32)
        for i, img in enumerate(imgs):
            batch[i, :img.shape[0], :img.shape[1]] = img
            hw[i] = img.shape[:2]
        dets = predictor.run_batch(batch, hw)
        for i, iid in enumerate(chunk):
            valid = dets["valid"][i]
            boxes = predictor.unletterbox(
                dets["boxes"][i][valid], *hws[i])
            scores = dets["scores"][i][valid]
            classes = dets["classes"][i][valid]
            for j in range(len(scores)):
                x1, y1, x2, y2 = boxes[j]
                results.append({
                    "image_id": int(iid),
                    "category_id": COCO_CATEGORY_IDS[int(classes[j])],
                    "bbox": [float(x1), float(y1), float(x2 - x1),
                             float(y2 - y1)],
                    "score": float(scores[j]),
                })
        if progress:
            print(f"\r{min(start + bs, len(ids))}/{len(ids)}", end="",
                  flush=True)
    if progress:
        print()
    E = COCOeval(dataset.coco, dataset.coco.loadRes(results), "bbox")
    E.evaluate()
    E.accumulate()
    E.summarize()
    return E.stats
