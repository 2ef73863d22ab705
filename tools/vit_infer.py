#!/usr/bin/env python
"""Single-image ViT classification (ViT.jittor test/infer CLI parity).

Usage:
    python tools/vit_infer.py --image=path.jpg [--weights=vit.pth]
        [--config=vit_b16_config] [--top_k=5]
"""
import argparse


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--image", required=True)
    ap.add_argument("--weights", default=None)
    ap.add_argument("--config", default="vit_b16_config")
    ap.add_argument("--top_k", type=int, default=5)
    args = ap.parse_args()

    from tpuseg.data.image_io import load_image_rgb
    from tpuseg.engine.classify import ViTClassifier

    clf = ViTClassifier(args.config, args.weights)
    img = load_image_rgb(args.image)
    ids, probs = clf.run_on_image(img, args.top_k)
    for rank, (i, p) in enumerate(zip(ids, probs), 1):
        print(f"top{rank}: class {int(i)}  prob {float(p):.4f}")


if __name__ == "__main__":
    main()
