#!/usr/bin/env python
"""Plot/compare training log curves (reference
tools/analysis_tools/analyze_logs.py surface). Reads the json-lines logs
written by the runner's LoggerHook-equivalent."""
from __future__ import annotations

import argparse
import json


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("task", choices=["plot_curve", "cal_train_time"])
    p.add_argument("json_logs", nargs="+")
    p.add_argument("--keys", nargs="+", default=["loss"])
    p.add_argument("--out", default=None)
    return p.parse_args()


def load_log(path):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                try:
                    rows.append(json.loads(line))
                except json.JSONDecodeError:
                    continue
    return rows


def main():
    args = parse_args()
    if args.task == "cal_train_time":
        for path in args.json_logs:
            rows = [r for r in load_log(path) if "time" in r]
            if rows:
                times = [r["time"] for r in rows]
                print(f"{path}: mean {sum(times)/len(times):.4f}s/iter over {len(times)} iters")
        return
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    for path in args.json_logs:
        rows = load_log(path)
        for key in args.keys:
            ys = [r[key] for r in rows if key in r]
            plt.plot(range(len(ys)), ys, label=f"{path}:{key}")
    plt.legend()
    plt.xlabel("iteration (logged)")
    out = args.out or "curves.png"
    plt.savefig(out)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
