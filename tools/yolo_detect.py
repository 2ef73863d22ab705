#!/usr/bin/env python
"""YOLOv3 single-image detection (yolo.jittor detect.py parity).

Usage:
    python tools/yolo_detect.py --image=in.jpg [--weights=yolov3.weights]
        [--img_size=416] [--conf_thres=0.5] [--nms_thres=0.45] [--out=out.jpg]
"""
import argparse


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--image", required=True)
    ap.add_argument("--weights", default=None)
    ap.add_argument("--img_size", type=int, default=416)
    ap.add_argument("--conf_thres", type=float, default=0.5)
    ap.add_argument("--nms_thres", type=float, default=0.45)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpuseg.data.image_io import load_image_rgb
    from tpuseg.models import yolov3 as Y
    from tpuseg.ops.preprocess import letterbox_preprocess

    cfg = Y.YoloV3Config(
        input_size=args.img_size,
        conf_thresh=args.conf_thres,
        nms_thresh=args.nms_thres,
    )
    params = Y.init_params(jax.random.PRNGKey(0), cfg)
    if args.weights:
        from tpuseg.weights.darknet_io import load_yolov3_weights

        params = load_yolov3_weights(args.weights, params)
        params = jax.tree.map(jnp.asarray, params)

    img = load_image_rgb(args.image)
    h, w = img.shape[:2]

    @jax.jit
    def run(params, img_u8, hw):
        x = letterbox_preprocess(img_u8[None], hw[None], size=args.img_size)
        return Y.detect(params, x, cfg)

    dets = run(params, jnp.asarray(img), jnp.asarray([h, w], jnp.int32))
    boxes = np.array(dets["boxes"])[0]  # copy: jax buffers are read-only
    scores = np.asarray(dets["scores"])[0]
    classes = np.asarray(dets["classes"])[0]
    valid = np.asarray(dets["valid"])[0]

    # undo letterbox: map from input_size coords back to original image
    from tpuseg.engine.yolo_engine import unletterbox_boxes

    boxes = unletterbox_boxes(boxes, h, w, args.img_size)

    n = int(valid.sum())
    print(f"{n} detections (conf > {args.conf_thres})")
    for i in range(n):
        x1, y1, x2, y2 = boxes[i]
        print(
            f"  class {int(classes[i]):3d}  conf {scores[i]:.3f}  "
            f"box [{x1:.1f}, {y1:.1f}, {x2:.1f}, {y2:.1f}]"
        )
    if args.out and n:
        import cv2

        vis = img[:, :, ::-1].copy()
        for i in range(n):
            x1, y1, x2, y2 = boxes[i].astype(int)
            cv2.rectangle(vis, (x1, y1), (x2, y2), (0, 255, 0), 2)
            cv2.putText(vis, f"{int(classes[i])}:{scores[i]:.2f}",
                        (x1, max(y1 - 4, 10)), cv2.FONT_HERSHEY_SIMPLEX,
                        0.5, (0, 255, 0), 1)
        cv2.imwrite(args.out, vis)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
