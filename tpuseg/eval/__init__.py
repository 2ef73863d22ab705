"""tpuseg.eval — COCO-compatible evaluation stack (pycocotools-free)."""
