"""COCODemo — the reference's programmatic predictor facade.

API parity with detectron.jittor ``demo/predictor.py`` as used in the zoo
README (README.md:288-335):

    from tpuseg.engine.predictor import COCODemo
    coco_demo = COCODemo(cfg, min_image_size=800, confidence_threshold=0.5)
    predictions = coco_demo.run_on_opencv_image(image)  # BGR in, BGR out
"""
from __future__ import annotations

import numpy as np

from tpuseg.engine.maskrcnn_engine import MaskRCNNPredictor

CATEGORIES = [
    "__background", "person", "bicycle", "car", "motorcycle", "airplane",
    "bus", "train", "truck", "boat", "traffic light", "fire hydrant",
    "stop sign", "parking meter", "bench", "bird", "cat", "dog", "horse",
    "sheep", "cow", "elephant", "bear", "zebra", "giraffe", "backpack",
    "umbrella", "handbag", "tie", "suitcase", "frisbee", "skis", "snowboard",
    "sports ball", "kite", "baseball bat", "baseball glove", "skateboard",
    "surfboard", "tennis racket", "bottle", "wine glass", "cup", "fork",
    "knife", "spoon", "bowl", "banana", "apple", "sandwich", "orange",
    "broccoli", "carrot", "hot dog", "pizza", "donut", "cake", "chair",
    "couch", "potted plant", "bed", "dining table", "toilet", "tv", "laptop",
    "mouse", "remote", "keyboard", "cell phone", "microwave", "oven",
    "toaster", "sink", "refrigerator", "book", "clock", "vase", "scissors",
    "teddy bear", "hair drier", "toothbrush",
]


class COCODemo:
    def __init__(self, cfg=None, min_image_size: int | None = None,
                 confidence_threshold: float = 0.7,
                 show_mask_heatmaps: bool = False, weights: str | None = None):
        # cfg may be a ConfigNode (merge_from_file path): dispatch on its
        # META_ARCHITECTURE / CONV_BODY (FPN vs C4) and honor MODEL.WEIGHT.
        # min_image_size=None (default) keeps the yaml's INPUT.MIN_SIZE_TEST
        # — overriding only when the caller passes a value (demo
        # predictor.py's --min-image-size flag semantics); unconditionally
        # clobbering it would run e.g. a 480-tuned config at 800
        from tpuseg.engine.config import ConfigNode
        from tpuseg.engine.maskrcnn_engine import build_predictor_from_cfg

        if isinstance(cfg, ConfigNode):
            node = cfg.clone()
            if weights:
                node.defrost()
                node.MODEL.WEIGHT = weights
            self.predictor = build_predictor_from_cfg(
                node, confidence_threshold=confidence_threshold)
            if min_image_size is not None:
                self.predictor.min_image_size = min_image_size
        else:
            min_image_size = min_image_size or 800
            if weights is None and cfg is not None:
                try:
                    weights = cfg.MODEL.WEIGHT or None
                except (AttributeError, KeyError):
                    weights = None
            self.predictor = MaskRCNNPredictor(
                weights=weights, confidence_threshold=confidence_threshold,
                min_image_size=min_image_size)
        self.confidence_threshold = confidence_threshold

    def compute_prediction(self, image_bgr: np.ndarray) -> dict:
        return self.predictor.run_on_bgr_image(image_bgr)

    def select_top_predictions(self, predictions: dict) -> dict:
        return self.predictor.select_top_predictions(predictions)

    def run_on_opencv_image(self, image_bgr: np.ndarray) -> np.ndarray:
        """BGR image -> BGR image with boxes/masks/labels drawn."""
        import cv2

        preds = self.select_top_predictions(self.compute_prediction(image_bgr))
        vis = image_bgr.copy()
        rng = np.random.default_rng(0)
        for i in range(len(preds["scores"])):
            color = tuple(int(c) for c in rng.integers(60, 255, 3))
            if "masks" in preds:  # absent for boxes-only (faster rcnn /
                # retinanet) configs
                m = preds["masks"][i].astype(bool)
                vis[m] = (0.5 * vis[m] + 0.5 * np.asarray(color)).astype(
                    np.uint8)
            x1, y1, x2, y2 = preds["boxes"][i].astype(int)
            cv2.rectangle(vis, (x1, y1), (x2, y2), color, 2)
            name = CATEGORIES[int(preds["classes"][i]) + 1]
            cv2.putText(vis, f"{name}: {preds['scores'][i]:.2f}",
                        (x1, max(y1 - 4, 10)), cv2.FONT_HERSHEY_SIMPLEX, 0.5,
                        color, 1)
        return vis
