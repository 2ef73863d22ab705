#!/usr/bin/env python
"""Mask R-CNN training (detectron.jittor tools/train_net.py parity).

Usage (README.md:337-341):
    python tools/train_net.py --config-file configs/e2e_mask_rcnn_R_50_FPN_1x.yaml \
        [SOLVER.IMS_PER_BATCH 8] [DATASETS.IMAGES dir DATASETS.ANNOTATIONS json]
"""
import argparse


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config-file", default=None)
    ap.add_argument("--max_steps", type=int, default=None)
    ap.add_argument("--compute_dtype", default=None,
                    choices=[None, "bfloat16"],
                    help="bfloat16 = TPU mixed precision (f32 master weights)")
    ap.add_argument("opts", nargs=argparse.REMAINDER)
    args = ap.parse_args()

    import jax.numpy as jnp

    from tpuseg.data.coco_dataset import CocoDetectionDataset
    from tpuseg.engine.config import ConfigNode
    from tpuseg.engine.detectron_train_loop import do_train

    cfg = ConfigNode({
        "MODEL": {"WEIGHT": "", "MASK_ON": True},
        "SOLVER": {"BASE_LR": 0.0025, "WEIGHT_DECAY": 0.0001,
                   "STEPS": [120000, 160000], "MAX_ITER": 180000,
                   "IMS_PER_BATCH": 2, "CHECKPOINT_PERIOD": 2500},
        "DATASETS": {"TRAIN": "coco_2017_train", "IMAGES": "",
                     "ANNOTATIONS": ""},
        "OUTPUT_DIR": "weights/detectron",
    })
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()

    if cfg.DATASETS.IMAGES:
        images, ann = cfg.DATASETS.IMAGES, cfg.DATASETS.ANNOTATIONS
    else:
        from tpuseg.data.catalog import DatasetCatalog

        d = DatasetCatalog.get(cfg.DATASETS.TRAIN)["args"]
        images, ann = d["root"], d["ann_file"]
    # contiguous 0..79 labels (COCO_LABEL_MAP then -1): the 81-way heads
    # and eval's COCO_CATEGORY_IDS assume this; raw category_id-1 would
    # scramble classes above id 12 and leave ids 82-90 unsupervised
    from tpuseg.data.coco_dataset import COCO_LABEL_MAP

    dataset = CocoDetectionDataset(images, ann, label_map=COCO_LABEL_MAP)
    print(f"training on {len(dataset)} images; "
          f"max_iter {cfg.SOLVER.MAX_ITER}")
    # honor the yaml's model settings (CONV_BODY depth, MASK_ON, NUM_CLASSES)
    from tpuseg.engine.maskrcnn_engine import model_config_from_node

    variant, mcfg = model_config_from_node(cfg)
    train_kw = {}
    if variant == "retinanet":
        from tpuseg.models import retinanet as RN

        train_kw = {
            "forward_losses": lambda p, im, hw, t, key:
                RN.forward_train_losses(p, im, hw, t, mcfg),
            "init_params_fn": RN.init_params,
        }
    elif variant == "c4":
        from tpuseg.models import maskrcnn_c4 as C4

        train_kw = {
            "forward_losses": lambda p, im, hw, t, key:
                C4.forward_train_losses(p, im, hw, t, key, mcfg),
            "init_params_fn": lambda key, _cfg=None: C4.init_params(key, mcfg),
        }
    params = None
    if cfg.MODEL.WEIGHT:
        from tpuseg.engine.maskrcnn_engine import load_detectron_weights

        params = load_detectron_weights(cfg.MODEL.WEIGHT, mcfg,
                                        variant=variant)
        import jax.numpy as jnp
        import jax

        params = jax.tree.map(jnp.asarray, params)
    do_train(dataset, mcfg, params=params, **train_kw,
             base_lr=cfg.SOLVER.BASE_LR, steps=tuple(cfg.SOLVER.STEPS),
             max_iter=cfg.SOLVER.MAX_ITER,
             ims_per_batch=cfg.SOLVER.IMS_PER_BATCH,
             checkpoint_period=cfg.SOLVER.CHECKPOINT_PERIOD,
             output_dir=cfg.OUTPUT_DIR, max_steps=args.max_steps,
             compute_dtype=(jnp.bfloat16
                            if args.compute_dtype == "bfloat16" else None))


if __name__ == "__main__":
    main()
