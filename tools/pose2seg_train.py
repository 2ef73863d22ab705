#!/usr/bin/env python
"""Pose2Seg training (Pose2Seg.jittor train.py parity — no-flag CLI with
dataset paths resolved from the catalog; README.md:189-193)."""
import argparse


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--images", default="./data/coco2017/train2017")
    ap.add_argument("--annotations",
                    default="./data/coco2017/annotations/"
                            "person_keypoints_train2017_pose2seg.json")
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--steps", type=int, default=15000)
    ap.add_argument("--save", default="weights/pose2seg_last.npz")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpuseg.data.coco_dataset import CocoDetectionDataset
    from tpuseg.engine.trainer import save_params_npz
    from tpuseg.models import pose2seg as P2S
    from tpuseg.models.pose2seg_loss import Pose2SegTrainer, warp_gt_to_aligned

    cfg = P2S.Pose2SegConfig()
    dataset = CocoDetectionDataset(args.images, args.annotations,
                                   label_map=None)
    params = P2S.init_params(jax.random.PRNGKey(0), cfg)
    trainer = Pose2SegTrainer(cfg)
    buf = trainer.init_state(params)
    rng = np.random.default_rng(0)
    ids = list(dataset.image_ids)
    import cv2

    s = cfg.input_size
    it = 0
    while it < args.steps:
        rng.shuffle(ids)
        for iid in ids:
            anns = dataset.coco.imgToAnns[iid]
            # keypoints and masks MUST come from the same annotation:
            # filtering a parallel kpts list while indexing the unfiltered
            # mask list pairs person i's pose with another person's mask
            pairs = []
            for a in anns:
                if a.get("iscrowd", 0) or a.get("keypoints") is None:
                    continue
                kp = np.asarray(a["keypoints"], np.float64).reshape(-1, 3)
                if (kp[:, 2] > 0).sum() >= 2:
                    pairs.append((kp, a))
            if not pairs:
                continue
            img = dataset.load_image(iid)
            h, w = img.shape[:2]
            scale = s / max(h, w)
            nh, nw = int(h * scale), int(w * scale)
            canvas = np.zeros((s, s, 3), np.float32)
            canvas[:nh, :nw] = cv2.resize(img, (nw, nh))
            canvas = (canvas / 255.0 - [0.485, 0.456, 0.406]) / [0.229, 0.224, 0.225]
            p = cfg.max_people
            theta = np.zeros((1, p, 2, 3), np.float32)
            valid = np.zeros((1, p), bool)
            gt_masks = np.zeros((1, p, s, s), np.float32)
            skel = np.zeros((1, p, cfg.align_size, cfg.align_size,
                             cfg.skeleton_channels), np.float32)
            from tpuseg.eval import rle as rle_mod

            for i, (kp, ann) in enumerate(pairs[:p]):
                kp = kp.copy()
                kp[:, :2] *= scale
                A, score, _ = P2S.choose_template(kp, cfg)
                if A is None:
                    continue
                theta[0, i] = P2S.affine_to_theta(A, s, s)
                valid[0, i] = True
                if cfg.cat_skeleton:
                    skel[0, i] = P2S.skeleton_feats_for_person(kp, A, cfg)
                m_full = rle_mod.decode(
                    rle_mod.segm_to_rle(ann["segmentation"], h, w))
                m = cv2.resize(m_full.astype(np.float32), (nw, nh))
                gt_masks[0, i, :nh, :nw] = m > 0.5
            if not valid.any():
                continue
            gt_aligned = warp_gt_to_aligned(
                jnp.asarray(gt_masks), jnp.asarray(theta), cfg.align_size)
            gt_aligned = (np.asarray(gt_aligned) > 0.5).astype(np.float32)
            params, buf, loss = trainer.train_step(
                params, buf, jnp.asarray(canvas, jnp.float32)[None],
                jnp.asarray(theta), jnp.asarray(valid),
                jnp.asarray(gt_aligned), it, skel=jnp.asarray(skel))
            it += 1
            if it % 20 == 0:
                print(f"iter {it}: loss {float(loss):.4f}")
            if it >= args.steps:
                break
    save_params_npz(args.save, jax.device_get(params))
    print(f"saved {args.save}")


if __name__ == "__main__":
    main()
