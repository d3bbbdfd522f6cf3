#!/usr/bin/env python
"""Train one task of the incremental pipeline.

CLI parity with the reference ``tools/train.py`` (SURVEY §2.6): a single
config positional arg, ``--work-dir``, ``--cfg-options`` dotted
overrides; the runner class is selected by the config's ``runner_type``
('BRNullSpaceRunner' | 'TeacherRunner').
"""
from __future__ import annotations

import argparse
import logging
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

from nsgp_repre_tpu.engine.runner import NullSpaceRunner, TeacherRunner
from nsgp_repre_tpu.utils.config import load_config


def parse_args():
    p = argparse.ArgumentParser(description="Train a detector (one task)")
    p.add_argument("config", help="config file path")
    p.add_argument("--work-dir", help="directory to save logs and models")
    p.add_argument("--resume", action="store_true")
    p.add_argument(
        "--cfg-options",
        nargs="+",
        default=None,
        help="override config entries, e.g. task_id=2 model.backbone.depth=50",
    )
    return p.parse_args()


RUNNERS = {
    "BRNullSpaceRunner": NullSpaceRunner,
    "TeacherRunner": TeacherRunner,
}


def main():
    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s"
    )
    from nsgp_repre_tpu.parallel.mesh import maybe_init_distributed
    from nsgp_repre_tpu.utils.compile_cache import enable_compile_cache

    maybe_init_distributed()
    enable_compile_cache()
    args = parse_args()
    cfg = load_config(args.config, overrides=args.cfg_options)
    if args.work_dir:
        cfg["work_dir"] = args.work_dir
    elif "work_dir" not in cfg:
        cfg["work_dir"] = osp.join(
            "./work_dirs", osp.splitext(osp.basename(args.config))[0]
        )
    cfg["resume"] = args.resume
    runner_cls = RUNNERS.get(cfg.get("runner_type", "BRNullSpaceRunner"))
    runner = runner_cls(cfg)
    runner.train()


if __name__ == "__main__":
    main()
