"""Named model presets.

Mirrors the reference's selectable config names: YOLACT's
``--config=yolact_base_config`` chains (Yolact.jittor data/config.py,
README.md:125-136) and detectron's YAML files (configs/maskrcnn_benchmark/
*.yaml, README.md:263-284). Presets are ConfigNodes registered by name;
``.copy({...})`` inheritance matches the reference's Config.copy chains.
"""
from __future__ import annotations

from tpuseg.engine.config import ConfigNode, register_config

# ---------------------------------------------------------------------------
# ViT (ViT.jittor)
# ---------------------------------------------------------------------------

vit_b16_config = register_config(
    "vit_b16_config",
    ConfigNode(
        {
            "name": "vit_b16",
            "model": "vit",
            "image_size": 224,
            "patch_size": 16,
            "hidden_size": 768,
            "num_layers": 12,
            "num_heads": 12,
            "mlp_dim": 3072,
            "num_classes": 1000,
        }
    ),
)

vit_l16_config = register_config(
    "vit_l16_config",
    vit_b16_config.copy(
        {
            "name": "vit_l16",
            "hidden_size": 1024,
            "num_layers": 24,
            "num_heads": 16,
            "mlp_dim": 4096,
        }
    ),
)

# ---------------------------------------------------------------------------
# YOLACT (Yolact.jittor data/config.py chains; README.md:205-221 weight table)
# ---------------------------------------------------------------------------

yolact_base_config = register_config(
    "yolact_base_config",
    ConfigNode(
        {
            "name": "yolact_base",
            "model": "yolact",
            "backbone": "resnet101",
            "max_size": 550,
            "num_classes": 81,
            "mask_dim": 32,
            "fpn_channels": 256,
            "conf_thresh": 0.05,
            "nms_thresh": 0.5,
            "nms_top_k": 200,
            "max_num_detections": 100,
            "dataset": "coco2017_dataset",
        }
    ),
)

yolact_resnet50_config = register_config(
    "yolact_resnet50_config",
    yolact_base_config.copy({"name": "yolact_resnet50", "backbone": "resnet50"}),
)

yolact_darknet53_config = register_config(
    "yolact_darknet53_config",
    yolact_base_config.copy({"name": "yolact_darknet53", "backbone": "darknet53"}),
)

yolact_im700_config = register_config(
    "yolact_im700_config",
    # pred_scales rescale with the input (int(s / 550 * 700), upstream
    # yolact_im700_config) exactly as im400 below does — keeping the 550
    # scales would make every prior ~27% too small for the released im700
    # checkpoint
    # upstream yolact_im700_config also raises masks_to_train to 300 (the
    # 700px canvas fits more/larger instances per image)
    yolact_base_config.copy({"name": "yolact_im700", "max_size": 700,
                             "masks_to_train": 300,
                             "scales": [int(s / 550 * 700)
                                        for s in (24, 48, 96, 192, 384)]}),
)

yolact_im400_config = register_config(
    "yolact_im400_config",
    # pred_scales rescale with the input (int(s / 550 * 400), upstream
    # yolact_im400_config) — keeping the 550 scales would make every
    # prior ~1.4x too large for the released im400 checkpoint
    yolact_base_config.copy({"name": "yolact_im400", "max_size": 400,
                             "scales": [int(s / 550 * 400)
                                        for s in (24, 48, 96, 192, 384)]}),
)

# YOLACT++ (README.md:216-221 weight table): DCNv2 backbone (interval 3),
# 3 sub-scales per level, non-square anchors, mask rescoring
_PLUS_SCALES = [
    [s * 2 ** (j / 3.0) for j in range(3)] for s in (24, 48, 96, 192, 384)
]

yolact_plus_base_config = register_config(
    "yolact_plus_base_config",
    yolact_base_config.copy(
        {
            "name": "yolact_plus_base",
            "backbone": "resnet101",
            "use_square_anchors": False,
            "scales": _PLUS_SCALES,
            "dcn_backbone": True,
            "use_maskiou": True,
        }
    ),
)

yolact_plus_resnet50_config = register_config(
    "yolact_plus_resnet50_config",
    yolact_plus_base_config.copy(
        # resnet50_dcnv2_backbone: R50++ uses the deformable stages too
        {"name": "yolact_plus_resnet50", "backbone": "resnet50"}
    ),
)


def yolact_model_config(cfg):
    """ConfigNode preset -> models.yolact.YolactConfig."""
    from tpuseg.models.yolact import YolactConfig

    scales = cfg.get("scales", (24, 48, 96, 192, 384))
    if isinstance(scales, list):
        scales = tuple(tuple(s) if isinstance(s, list) else s for s in scales)
    return YolactConfig(
        backbone=cfg.backbone,
        img_size=cfg.max_size,
        num_classes=cfg.num_classes,
        mask_dim=cfg.mask_dim,
        fpn_channels=cfg.fpn_channels,
        conf_thresh=cfg.conf_thresh,
        nms_iou_thresh=cfg.nms_thresh,
        nms_top_k=cfg.nms_top_k,
        max_num_detections=cfg.max_num_detections,
        scales=scales,
        use_square_anchors=cfg.get("use_square_anchors", True),
        dcn_backbone=cfg.get("dcn_backbone", False),
        use_maskiou=cfg.get("use_maskiou", False),
    )


def yolact_loss_config(cfg):
    """ConfigNode preset -> models.yolact_loss.YolactLossConfig (training
    hyperparams that vary per preset, e.g. im700's masks_to_train=300)."""
    from tpuseg.models.yolact_loss import YolactLossConfig

    return YolactLossConfig(
        masks_to_train=cfg.get("masks_to_train", 100),
        use_maskiou=cfg.get("use_maskiou", False),
    )


# ---------------------------------------------------------------------------
# Dataset presets (yolact data/config.py dataset_base / coco2017_dataset)
# ---------------------------------------------------------------------------

dataset_base = register_config(
    "dataset_base",
    ConfigNode(
        {
            "name": "Base Dataset",
            "train_images": "./data/coco/images/",
            "train_info": "path_to_annotation_file",
            "valid_images": "./data/coco/images/",
            "valid_info": "path_to_annotation_file",
            "has_gt": True,
            "class_names": [],
        }
    ),
)

coco2017_dataset = register_config(
    "coco2017_dataset",
    dataset_base.copy(
        {
            "name": "COCO 2017",
            "train_images": "./data/coco/train2017/",
            "train_info": "./data/coco/annotations/instances_train2017.json",
            "valid_images": "./data/coco/val2017/",
            "valid_info": "./data/coco/annotations/instances_val2017.json",
        }
    ),
)
