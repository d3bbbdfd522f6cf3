#!/usr/bin/env python
"""Single-image inference demo (reference demo/image_demo.py surface).

Usage: python demo/image_demo.py IMG CONFIG [--weights CKPT] [--out-dir DIR]
"""
from __future__ import annotations

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

from nsgp_repre_tpu.apis import DetInferencer


def main():
    p = argparse.ArgumentParser()
    p.add_argument("img")
    p.add_argument("config")
    p.add_argument("--weights", default=None)
    p.add_argument("--out-dir", default="outputs")
    p.add_argument("--pred-score-thr", type=float, default=0.3)
    args = p.parse_args()

    inferencer = DetInferencer(
        args.config, weights=args.weights, pred_score_thr=args.pred_score_thr
    )
    result = inferencer(args.img, out_dir=args.out_dir)
    pred = result["predictions"][0]
    for box, score, label in zip(pred["boxes"], pred["scores"], pred["labels"]):
        print(f"label={int(label)} score={float(score):.3f} box={[round(float(v), 1) for v in box]}")


if __name__ == "__main__":
    main()
