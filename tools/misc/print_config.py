#!/usr/bin/env python
"""Print a fully-resolved config (reference tools/misc/print_config.py)."""
from __future__ import annotations

import argparse
import json
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

from nsgp_repre_tpu.utils.config import load_config


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--cfg-options", nargs="+", default=None)
    args = p.parse_args()
    cfg = load_config(args.config, overrides=args.cfg_options)
    print(json.dumps(cfg, indent=2, default=str))


if __name__ == "__main__":
    main()
