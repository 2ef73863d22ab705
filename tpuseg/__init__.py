"""tpuseg — TPU-native instance segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
Jittor/InstanceSegmentation-jittor model zoo (see SURVEY.md): ViT-B/16
classification, YOLOv3 detection, YOLACT-550 instance segmentation,
Mask R-CNN R50-FPN, and Pose2Seg — as statically shaped, single-jit-program
pipelines with Pallas kernels for the formerly-CUDA ops.
"""

__version__ = "0.1.0"
