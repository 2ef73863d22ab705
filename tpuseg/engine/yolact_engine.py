"""YOLACT predictor + evaluation engine (Yolact.jittor eval.py parity).

Surfaces reproduced (README.md:239-250):
  - ``--trained_model`` weight load, config inferred from preset name
  - full-val mAP table via YOLACT's own AP protocol (tpuseg.eval.yolact_map)
  - optional COCO-json dump evaluated by our COCOeval clone
  - single-image / folder visualization modes (tools/yolact_eval.py)

Device work is one jit program at fixed batch size; host work is decode,
resize-to-550 (cv2 bilinear == reference's device bilinear) and per-image
mask upsample 138 -> (h, w) + 0.5 binarize (output_utils.postprocess).
"""
from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.models import yolact as yolact_model


class YolactPredictor:
    """``devices``: None/1 = single device; "all" or an int = shard the
    batch across that many devices (data-parallel eval over ICI; the
    jt.mpi-style DP row of SURVEY §2.7). Batch size must divide evenly."""

    def __init__(self, cfg: yolact_model.YolactConfig, params=None,
                 weights: str | None = None, batch_size: int = 1,
                 dtype=jnp.float32, devices=None):
        self.cfg = cfg
        self.batch_size = batch_size
        self.dtype = dtype
        if params is None:
            if weights:
                params = load_yolact_weights(weights, cfg)
            else:
                params = yolact_model.init_params(jax.random.PRNGKey(0), cfg)
        self.params = jax.tree.map(
            lambda x: jnp.asarray(x, dtype) if jnp.issubdtype(
                jnp.asarray(x).dtype, jnp.floating) else jnp.asarray(x),
            params,
        )
        cfg_ = cfg

        def _run(params, images_u8):
            from tpuseg.ops.preprocess import yolact_preprocess

            x = yolact_preprocess(images_u8, size=cfg_.img_size).astype(dtype)
            preds = yolact_model.forward(params, x, cfg_)
            preds = {k: v.astype(jnp.float32) for k, v in preds.items()}
            return yolact_model.detect(
                preds, jnp.asarray(yolact_model.make_priors_np(cfg_)), cfg_,
                params_miou=params.get("maskiou"))

        self.n_devices = _resolve_devices(devices)
        if self.n_devices > 1:
            from tpuseg.parallel.inference import ShardedInference
            from tpuseg.parallel.mesh import make_mesh

            assert batch_size % self.n_devices == 0, (
                f"batch_size {batch_size} must divide across "
                f"{self.n_devices} devices")
            # shard_map, not GSPMD jit-shardings: the traditional-NMS
            # option routes through pallas_call on TPU, which carries no
            # SPMD partitioning rule (see tpuseg/parallel/inference.py)
            si = ShardedInference(_run, self.params,
                                  mesh=make_mesh(self.n_devices),
                                  use_shard_map=True)
            self.params = si.params
            self._run = si._fn
        else:
            self._run = jax.jit(_run)

    def run_batch(self, images_550_u8: np.ndarray) -> dict:
        """[B,550,550,3] uint8 RGB -> detection dict (numpy)."""
        out = self._run(self.params, jnp.asarray(images_550_u8))
        return {k: np.asarray(v) for k, v in out.items()}

    def postprocess_image(self, det_i: dict, h: int, w: int,
                          score_threshold: float = 0.0) -> dict:
        """Slot i of a batch -> final dets in image coords with full-res masks.

        Reference: layers/output_utils.py postprocess — masks were already
        assembled+cropped at proto resolution on device; here: bilinear
        upsample to (h, w), binarize at 0.5, scale boxes to pixels.
        """
        import cv2

        valid = det_i["valid"] & (det_i["scores"] > score_threshold)
        boxes = det_i["boxes"][valid]
        scores = det_i["scores"][valid]
        classes = det_i["classes"][valid]
        masks_small = det_i["masks"][valid]
        n = len(boxes)
        masks = np.zeros((n, h, w), np.uint8)
        for i in range(n):
            m = cv2.resize(masks_small[i], (w, h), interpolation=cv2.INTER_LINEAR)
            masks[i] = (m > 0.5).astype(np.uint8)
        px_boxes = boxes * np.asarray([w, h, w, h], np.float32)
        px_boxes[:, 0::2] = np.clip(px_boxes[:, 0::2], 0, w)
        px_boxes[:, 1::2] = np.clip(px_boxes[:, 1::2], 0, h)
        # sanitize_coordinates(cast=True): the reference emits integer
        # (truncated) pixel boxes and its AP protocol computes IoU on them
        px_boxes = px_boxes.astype(np.int64).astype(np.float32)
        out = {
            "boxes": px_boxes,
            "scores": scores,
            "classes": classes,
            "masks": masks,
        }
        if "mask_scores" in det_i:  # YOLACT++ maskiou rescoring
            out["mask_scores"] = det_i["mask_scores"][valid]
        return out


def _resolve_devices(devices) -> int:
    """None/1 -> 1; "all" -> every visible device; int/str -> that many."""
    if devices in (None, 1, "1"):
        return 1
    if devices == "all":
        return len(jax.devices())
    return int(devices)


def load_yolact_weights(path: str, cfg: yolact_model.YolactConfig) -> dict:
    from tpuseg.weights.torch_io import flatten_state_dict, load_torch_file
    from tpuseg.weights.yolact_map import from_torch_state

    flat = flatten_state_dict(load_torch_file(path))
    return from_torch_state(flat, cfg)


def resize_to_square(img_rgb: np.ndarray, size: int) -> np.ndarray:
    import cv2

    return cv2.resize(img_rgb, (size, size), interpolation=cv2.INTER_LINEAR)


def evaluate_dataset(predictor: YolactPredictor, dataset, max_images=None,
                     score_threshold: float = 0.0, progress=True,
                     use_native_loader: bool = True,
                     output_coco_json: str | None = None):
    """Full-val mAP table (eval.py no-image-args mode). Returns all_maps.

    With ``output_coco_json``, also dumps COCO-format results to
    ``<path>_{bbox,mask}.json`` and runs the COCOeval clone on them
    (eval.py --output_coco_json parity).
    """
    from tpuseg.eval.yolact_map import calc_map, make_ap_data, prep_metrics, print_maps

    cfg = predictor.cfg
    ids = dataset.image_ids
    if max_images:
        ids = ids[:max_images]
    bs = predictor.batch_size
    ap_data = make_ap_data(cfg.num_classes - 1)
    t_infer = 0.0
    n_done = 0
    coco_results = [] if output_coco_json is not None else None
    label_map_inv = (
        {v: k for k, v in dataset.label_map.items()}
        if getattr(dataset, "label_map", None) else {})
    loader = None
    prefetcher = None
    pending = None
    if use_native_loader:
        from concurrent.futures import ThreadPoolExecutor

        from tpuseg.data.native_loader import NativeImageLoader

        loader = NativeImageLoader()
        prefetcher = ThreadPoolExecutor(1)

        def load_chunk(chunk):
            paths = [dataset.image_path(iid) for iid in chunk]
            batch, hw = loader.load_batch(paths, cfg.img_size, cfg.img_size)
            metas = [(iid, int(hw[i, 0]), int(hw[i, 1]))
                     for i, iid in enumerate(chunk)]
            return batch, metas

        chunks = [ids[s:s + bs] for s in range(0, len(ids), bs)]
        # pipeline: next chunk decodes on the loader pool while the device
        # runs the current one (the input-side half of the north star's
        # fused preprocessing stage)
        pending = prefetcher.submit(load_chunk, chunks[0]) if chunks else None
    try:
        for start in range(0, len(ids), bs):
            chunk = ids[start:start + bs]
            if loader is not None:
                batch, metas = pending.result()
                nxt = start // bs + 1
                pending = (prefetcher.submit(load_chunk, chunks[nxt])
                           if nxt < len(chunks) else None)
            else:
                imgs = []
                metas = []
                for iid in chunk:
                    img = dataset.load_image(iid)
                    info = dataset.coco.imgs[iid]
                    if img.shape[:2] != (info["height"], info["width"]):
                        # load_image decodes in the annotation frame (EXIF
                        # ignored), so a mismatch here means the json
                        # metadata itself is wrong; conform the pixels so
                        # prep_metrics' pred/gt shapes still agree
                        import cv2

                        img = cv2.resize(img, (info["width"], info["height"]),
                                         interpolation=cv2.INTER_LINEAR)
                    metas.append((iid, img.shape[0], img.shape[1]))
                    imgs.append(resize_to_square(img, cfg.img_size))
                batch = np.stack(imgs)
            if len(chunk) < bs:
                batch = np.pad(batch, ((0, bs - len(chunk)), (0, 0), (0, 0), (0, 0)))
            t0 = time.perf_counter()
            dets = predictor.run_batch(batch)
            t_infer += time.perf_counter() - t0
            for bi, (iid, h, w) in enumerate(metas):
                det_i = {k: v[bi] for k, v in dets.items()}
                final = predictor.postprocess_image(det_i, h, w, score_threshold)
                gt = dataset.load_target(iid)
                prep_metrics(ap_data, final, gt)
                if coco_results is not None:
                    coco_results.extend(
                        detections_to_coco_json(final, iid, label_map_inv))
                n_done += 1
            if progress:
                print(f"\r{n_done}/{len(ids)} images "
                      f"({n_done / max(t_infer, 1e-9):.1f} img/s device)",
                      end="", flush=True)
    finally:
        # the prefetch pool must not leak a worker thread per
        # evaluate_dataset call (long sessions eval many ckpts)
        if prefetcher is not None:
            if pending is not None:
                pending.cancel()
            prefetcher.shutdown(wait=False)
    if progress:
        print()
    all_maps = calc_map(ap_data, cfg.num_classes - 1)
    print_maps(all_maps)
    if coco_results is not None:
        import json

        from tpuseg.eval.cocoeval import COCOeval

        # two jsons like the reference: the mask file must NOT carry bbox
        # keys (loadRes' bbox branch would take precedence and bin segm
        # detections by box area instead of mask area) and uses the
        # maskiou-rescored score when present
        bbox_res = [
            {k: v for k, v in r.items()
             if k not in ("segmentation", "mask_score")}
            for r in coco_results
        ]
        mask_res = [
            {**{k: v for k, v in r.items()
                if k not in ("bbox", "mask_score")},
             "score": r.get("mask_score", r["score"])}
            for r in coco_results
        ]
        d = os.path.dirname(output_coco_json)
        if d:
            os.makedirs(d, exist_ok=True)
        with open(f"{output_coco_json}_bbox.json", "w") as f:
            json.dump(bbox_res, f)
        with open(f"{output_coco_json}_mask.json", "w") as f:
            json.dump(mask_res, f)
        for iou_type, res in (("bbox", bbox_res), ("segm", mask_res)):
            print(f"== COCOeval {iou_type} ==")
            E = COCOeval(dataset.coco, dataset.coco.loadRes(res), iou_type)
            E.evaluate()
            E.accumulate()
            E.summarize()
    return all_maps


def detections_to_coco_json(final: dict, image_id: int, label_map_inv: dict):
    """One image's final dets -> COCO result dicts (bbox + segm).

    The combined dicts carry a 'mask_score' side-key (YOLACT++ maskiou
    rescoring) that the dump step splits into the reference's separate
    bbox/mask jsons."""
    from tpuseg.eval import rle as rle_mod

    out = []
    for i in range(len(final["scores"])):
        x1, y1, x2, y2 = final["boxes"][i]
        cat = label_map_inv.get(int(final["classes"][i]) + 1,
                                int(final["classes"][i]) + 1)
        det = {
            "image_id": int(image_id),
            "category_id": int(cat),
            "bbox": [float(x1), float(y1), float(x2 - x1), float(y2 - y1)],
            "score": float(final["scores"][i]),
            "segmentation": rle_mod.encode(final["masks"][i]),
        }
        if "mask_scores" in final:
            det["mask_score"] = float(final["mask_scores"][i])
        out.append(det)
    return out
