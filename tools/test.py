#!/usr/bin/env python
"""Evaluate a trained checkpoint (reference tools/test.py surface)."""
from __future__ import annotations

import argparse
import logging
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

from nsgp_repre_tpu.engine.runner import NullSpaceRunner
from nsgp_repre_tpu.utils.config import load_config


def parse_args():
    p = argparse.ArgumentParser(description="Test a detector")
    p.add_argument("config")
    p.add_argument("checkpoint")
    p.add_argument("--work-dir")
    p.add_argument(
        "--out",
        default=None,
        help="pickle per-image raw detections to this path "
        "(reference tools/test.py --out / DumpDetResults)",
    )
    p.add_argument("--cfg-options", nargs="+", default=None)
    return p.parse_args()


def main():
    logging.basicConfig(level=logging.INFO)
    from nsgp_repre_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    args = parse_args()
    cfg = load_config(args.config, overrides=args.cfg_options)
    if args.work_dir:
        cfg["work_dir"] = args.work_dir
    cfg["load_from"] = args.checkpoint
    cfg["is_trained"] = True
    runner = NullSpaceRunner(cfg)
    mAP = runner.val(dump_to=args.out)
    print(f"mAP: {mAP:.4f}")


if __name__ == "__main__":
    main()
