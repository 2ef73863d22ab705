#!/usr/bin/env python
"""YOLOv3 training (yolo.jittor train.py capability)."""
import argparse


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--images", default="./data/coco/train2017")
    ap.add_argument("--annotations",
                    default="./data/coco/annotations/instances_train2017.json")
    ap.add_argument("--img_size", type=int, default=416)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--steps", type=int, default=500000)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--pretrained_backbone", default=None,
                    help="darknet53.conv.74")
    ap.add_argument("--save", default="weights/yolov3.npz")
    ap.add_argument("--save_every", type=int, default=5000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpuseg.data.coco_dataset import CocoDetectionDataset
    from tpuseg.data.native_loader import NativeImageLoader
    from tpuseg.engine.trainer import save_params_npz, sgd_init, sgd_update
    from tpuseg.models import yolov3 as Y
    from tpuseg.models.yolov3_loss import total_loss
    from tpuseg.ops.preprocess import letterbox_preprocess
    from tpuseg.utils.logging import MovingAverage

    cfg = Y.YoloV3Config(input_size=args.img_size)
    # iscrowd regions must not become positive training targets (the
    # reference YOLO label conversion drops crowd annotations entirely)
    dataset = CocoDetectionDataset(args.images, args.annotations,
                                   include_crowd=False)
    params = Y.init_params(jax.random.PRNGKey(0), cfg)
    if args.pretrained_backbone:
        from tpuseg.weights.darknet_io import load_darknet53_backbone

        params = load_darknet53_backbone(args.pretrained_backbone, params)
        params = jax.tree.map(jnp.asarray, params)
    buf = sgd_init(params)

    from tpuseg.nn import layers as L

    def step(params, buf, images, hw, gt_boxes, gt_classes, it):
        def loss_fn(p):
            x = letterbox_preprocess(images, hw, size=args.img_size)
            # darknet trains BN (batch stats + running-stat updates)
            with L.bn_train_mode() as bt:
                outs = Y.forward(p, x, cfg)
            losses = total_loss(outs, gt_boxes, gt_classes, cfg)
            return losses["total"], (losses, L.bn_tape_by_path(p, bt.tape))

        (_, (losses, bn_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        # burn-in warmup; it is a traced array under jit -> jnp.minimum
        lr = args.lr * jnp.minimum(1.0, (it + 1) / 1000)
        params, buf = sgd_update(params, grads, buf, lr, 0.9, 5e-4,
                                 lr_scale=L.bn_param_groups(params))
        params = L.bn_apply_stats(params, bn_stats)
        return params, buf, losses

    step_jit = jax.jit(step)
    loader = NativeImageLoader()
    rng = np.random.default_rng(0)
    ids = list(dataset.image_ids)
    avg = MovingAverage(100)
    max_gt = 64
    it = 0
    while it < args.steps:
        rng.shuffle(ids)
        for start in range(0, len(ids) - args.batch_size + 1, args.batch_size):
            chunk = ids[start:start + args.batch_size]
            # load at a common canvas; letterbox happens on device
            maxdim = args.img_size * 2
            batch = np.zeros((args.batch_size, maxdim, maxdim, 3), np.uint8)
            hw = np.zeros((args.batch_size, 2), np.int32)
            boxes = np.zeros((args.batch_size, max_gt, 4), np.float32)
            classes = np.full((args.batch_size, max_gt), -1, np.int32)
            for i, iid in enumerate(chunk):
                img = dataset.load_image(iid)
                gt = dataset.load_target(iid, with_masks=False)
                h, w = img.shape[:2]
                s = min(maxdim / w, maxdim / h, 1.0)
                if s < 1.0:
                    import cv2

                    img = cv2.resize(img, (int(w * s), int(h * s)))
                h, w = img.shape[:2]
                batch[i, :h, :w] = img
                hw[i] = (h, w)
                g = min(len(gt["boxes"]), max_gt)
                # gt into letterbox coords of the ORIGINAL image scale
                scale = args.img_size / max(h, w)
                pad_x = (args.img_size - w * scale) / 2
                pad_y = (args.img_size - h * scale) / 2
                bb = gt["boxes"][:g] * s * scale
                bb[:, 0::2] += pad_x
                bb[:, 1::2] += pad_y
                boxes[i, :g] = bb
                classes[i, :g] = gt["classes"][:g]
            params, buf, losses = step_jit(
                params, buf, jnp.asarray(batch), jnp.asarray(hw),
                jnp.asarray(boxes), jnp.asarray(classes), it)
            avg.add(float(losses["total"]))
            it += 1
            if it % 20 == 0:
                print(f"iter {it}: loss {avg.get_avg():.4f}")
            if it % args.save_every == 0:
                save_params_npz(args.save, jax.device_get(params))
                print(f"saved {args.save}")
            if it >= args.steps:
                break
    save_params_npz(args.save, jax.device_get(params))
    print(f"saved {args.save}")


if __name__ == "__main__":
    main()
