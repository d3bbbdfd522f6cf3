#!/usr/bin/env python
"""Reference-replica training anchor (VERDICT r3 missing #3).

Trains the SAME task-1 protocol twice on mini-VOC and compares final
VOC mAP:

  1. the JAX/TPU stack (NullSpaceRunner, cl_faster_rcnn_cfgs/mini_voc/
     mini_voc_anchor_task1.py — a matched shortened schedule), and
  2. an independent torch replica of the mmdet training path
     (tests/torch_train_replica.py: own RPN proposals, own mmdet
     RandomSampler, mmdet losses/SGD/clip/schedule) on CPU.

Both start from the SAME weights (the torch init, converted) and consume
the SAME DetLoader batch plan (same seed → same image order, flips,
padding). Per-step sampler draws are the only uncontrolled difference,
so final-mAP agreement within a small tolerance anchors the JAX
training trajectory to the reference's math — the multi-epoch
complement of tests/test_grad_parity.py's single-step gradient parity.

Reference trajectory pieces being anchored:
  nsrunner_roi_replay.py:425-594 (train loop), SGD_NSCL.py:59-96 (step),
  anchor_head.py loss_by_feat, standard_roi_head.py bbox_loss.

Usage:
  python tools/misc/run_anchor_mini_voc.py [--skip-jax] [--skip-torch]
      [--epochs 10] [--seed 0]

The JAX half needs the TPU; the torch half is CPU-only (~1h on one
core). Results land in work_dirs/anchor/RESULTS.json.
"""
from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import sys
import time

import numpy as np

ROOT = osp.join(osp.dirname(osp.abspath(__file__)), "..", "..")
sys.path.insert(0, ROOT)
sys.path.insert(0, osp.join(ROOT, "tests"))
sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

WORK = osp.join(ROOT, "work_dirs", "anchor")
INIT_PTH = osp.join(WORK, "torch_init.pth")
CFG = osp.join(
    ROOT, "cl_faster_rcnn_cfgs", "mini_voc", "mini_voc_anchor_task1.py"
)


def _protocol():
    """(img_scale, backbone_blocks) from the shared config — the single
    source of truth so the two halves can never diverge on them."""
    from nsgp_repre_tpu.utils.config import load_config

    cfg = load_config(CFG)
    scale = tuple(cfg.get("img_scale", (500, 300)))
    blocks = tuple(
        cfg.get("model", {}).get("backbone", {}).get("stage_blocks", (3, 4, 6, 3))
    )
    return scale, blocks


def ensure_dataset():
    root = osp.join(ROOT, "data", "mini_voc", "VOCdevkit")
    if not osp.isdir(root):
        from make_mini_voc import generate

        generate(root, n_train=160, n_test=80, seed=0)
    return root


def build_torch_model(seed):
    import torch

    from torch_replica import TorchTaskFasterRCNN

    _, blocks = _protocol()
    torch.manual_seed(seed)
    return TorchTaskFasterRCNN(
        num_classes=20, task_split=(0, 15, 20), task_id=1,
        backbone_blocks=blocks,
    )


def save_init(tm):
    import torch

    os.makedirs(WORK, exist_ok=True)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in tm.mmdet_state_dict().items()}
    torch.save({"state_dict": sd}, INIT_PTH)
    print(f"wrote shared init to {INIT_PTH}")


def run_torch(voc_root, epochs, seed):
    from torch_train_replica import eval_voc, train_task1

    from nsgp_repre_tpu.datasets.loader import DetLoader
    from nsgp_repre_tpu.datasets.voc import VOCTaskDataset
    from nsgp_repre_tpu.evaluation.voc_map import eval_voc_map

    tm = build_torch_model(seed)
    if not osp.exists(INIT_PTH):
        save_init(tm)
    else:  # reload so both halves always share the persisted init
        import re

        import torch

        sd = torch.load(INIT_PTH, weights_only=False)["state_dict"]
        with torch.no_grad():
            for k, v in sd.items():
                t = None
                if k.startswith("backbone."):
                    t = tm.backbone.state_dict()[k[len("backbone."):]]
                elif (m := re.match(r"neck\.lateral_convs\.(\d)\.conv\.(\w+)", k)):
                    t = getattr(tm.lateral[int(m[1])], m[2])
                elif (m := re.match(r"neck\.fpn_convs\.(\d)\.conv\.(\w+)", k)):
                    t = getattr(tm.fpn[int(m[1])], m[2])
                elif (m := re.match(r"rpn_head\.(\w+)\.(\w+)", k)):
                    t = getattr(getattr(tm, m[1]), m[2])
                elif (m := re.match(r"roi_head\.bbox_head\.shared_fcs\.(\d)\.(\w+)", k)):
                    t = getattr((tm.shared_fc1, tm.shared_fc2)[int(m[1])], m[2])
                elif (m := re.match(r"roi_head\.bbox_head\.fc_cls\.(\d)\.(\w+)", k)):
                    t = getattr(tm.fc_cls[int(m[1])], m[2])
                elif (m := re.match(r"roi_head\.bbox_head\.fc_reg\.(\d)\.(\w+)", k)):
                    t = getattr(tm.fc_reg[int(m[1])], m[2])
                assert t is not None, f"unmapped init key {k}"
                t.copy_(v.reshape(t.shape))

    scale, blocks = _protocol()
    ds = VOCTaskDataset(
        voc_root, "VOC2007/ImageSets/Main/trainval.txt",
        task_split=[0, 15, 20], task_id=1,
    )
    loader = DetLoader(
        ds, batch_size=16, scale=scale, training=True,
        gt_capacity=64, seed=seed,
    )
    # milestones must mirror mini_voc_anchor_task1.py's MultiStepLR
    import torch

    # cache keyed by the protocol (an --epochs / scale / depth change
    # must retrain)
    tag = f"e{epochs}_s{seed}_b{''.join(map(str, blocks))}_{scale[0]}x{scale[1]}"
    trained_path = osp.join(WORK, f"torch_trained_{tag}.pt")
    t0 = time.time()
    if osp.exists(trained_path):
        tm.load_state_dict(torch.load(trained_path, weights_only=True))
        print("loaded previously trained torch replica (skip training)")
    else:
        train_task1(
            tm, loader, max_epochs=epochs, base_lr=0.01,
            milestones=_milestones(epochs), warmup_iters=100, seed=seed,
        )
        torch.save(tm.state_dict(), trained_path)
    train_s = time.time() - t0

    val_ds = VOCTaskDataset(
        voc_root, "VOC2007/ImageSets/Main/test.txt",
        task_split=[0, 15], task_id=1, test_mode=True,
    )
    val_loader = DetLoader(
        val_ds, batch_size=16, scale=scale, training=False, gt_capacity=64,
    )
    dets, anns = eval_voc(tm, val_loader, val_ds, num_classes=20)
    mAP, _ = eval_voc_map(dets, anns, num_classes=20, mode="11points")
    print(f"torch replica mAP {mAP:.4f} (train {train_s:.0f}s)")
    return float(mAP)


def _milestones(epochs):
    """LR-drop epochs, identical on both stacks: drops at 2/3 and 11/12
    of the schedule (24 -> (16, 22), 48 -> (32, 44) — the config file's
    v3 values; run_jax overrides the config scheduler for any other
    --epochs so the halves always match)."""
    if epochs < 12:
        return (max(epochs - 2, 1),)
    return (2 * epochs // 3, 11 * epochs // 12)


def run_jax(epochs, seed):
    from nsgp_repre_tpu.engine.runner import NullSpaceRunner
    from nsgp_repre_tpu.utils.compile_cache import enable_compile_cache
    from nsgp_repre_tpu.utils.config import load_config

    enable_compile_cache()
    if not osp.exists(INIT_PTH):
        save_init(build_torch_model(seed))
    cfg = load_config(CFG, overrides=[
        f"train_cfg.max_epochs={epochs}", f"seed={seed}",
    ])
    if epochs != 48:  # keep the LR schedule mirrored with run_torch
        cfg["param_scheduler"][1]["milestones"] = list(_milestones(epochs))
        cfg["param_scheduler"][1]["end"] = epochs
    runner = NullSpaceRunner(cfg)
    runner.train()
    mAP = runner.val()
    print(f"jax stack mAP {mAP:.4f}")
    return float(mAP)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-jax", action="store_true")
    ap.add_argument("--skip-torch", action="store_true")
    ap.add_argument("--epochs", type=int, default=48)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    voc_root = ensure_dataset()
    os.makedirs(WORK, exist_ok=True)
    results_path = osp.join(WORK, "RESULTS.json")

    def merge_write(**kv):
        # The two halves may run as separate concurrent processes (torch
        # on CPU, jax holding the TPU): always re-read before writing so
        # the slower half can't clobber the faster half's result.
        results = {}
        if osp.exists(results_path):
            results = json.load(open(results_path))
        results.update(kv)
        if "jax_mAP" in results and "torch_mAP" in results:
            results["abs_gap"] = abs(results["jax_mAP"] - results["torch_mAP"])
        json.dump(results, open(results_path, "w"), indent=1)
        return results

    if not osp.exists(INIT_PTH):
        save_init(build_torch_model(args.seed))
    if not args.skip_jax:
        merge_write(jax_mAP=run_jax(args.epochs, args.seed),
                    epochs=args.epochs, seed=args.seed)
    if not args.skip_torch:
        merge_write(torch_mAP=run_torch(voc_root, args.epochs, args.seed),
                    epochs=args.epochs, seed=args.seed)
    print(json.dumps(json.load(open(results_path)), indent=1))


if __name__ == "__main__":
    main()
