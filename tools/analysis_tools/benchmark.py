#!/usr/bin/env python
"""Inference / dataloader benchmark CLI (reference
tools/analysis_tools/benchmark.py surface)."""
from __future__ import annotations

import argparse
import json
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--checkpoint", default=None)
    p.add_argument(
        "--task",
        choices=["inference", "dataloader", "dataset"],
        default="inference",
    )
    p.add_argument(
        "--dataset-type", choices=["train", "val", "test"], default="train",
        help="which split the 'dataset' task benchmarks",
    )
    p.add_argument("--max-iter", type=int, default=200)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--height", type=int, default=608)
    p.add_argument("--width", type=int, default=1024)
    return p.parse_args()


def main():
    args = parse_args()
    from nsgp_repre_tpu.utils.benchmark import DataLoaderBenchmark, InferenceBenchmark
    from nsgp_repre_tpu.utils.config import load_config

    cfg = load_config(args.config)
    if args.task == "dataloader":
        from nsgp_repre_tpu.engine.runner import NullSpaceRunner

        runner = NullSpaceRunner(cfg)
        # measure the HOST pipeline: unwrap the runner's PrefetchLoader
        # (whose transfer_fn uploads to the device) down to the DetLoader
        loader = getattr(runner.train_loader, "loader", runner.train_loader)
        print(json.dumps(DataLoaderBenchmark(loader, args.max_iter).run()))
        return
    if args.task == "dataset":
        from nsgp_repre_tpu.engine.runner import NullSpaceRunner
        from nsgp_repre_tpu.utils.benchmark import DatasetBenchmark

        runner = NullSpaceRunner(cfg)
        ds = (
            runner.train_dataset
            if args.dataset_type == "train"
            else runner.val_dataset
        )
        print(json.dumps(DatasetBenchmark(ds, args.max_iter).run()))
        return

    from nsgp_repre_tpu.apis import init_detector
    from __graft_entry__ import _tiny_batch

    detector = init_detector(cfg, args.checkpoint)
    batch = _tiny_batch(args.batch_size, args.height, args.width)
    print(json.dumps(InferenceBenchmark(detector, args.max_iter).run(batch)))


if __name__ == "__main__":
    main()
