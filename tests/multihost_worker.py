"""Worker script for the 2-process multi-host regression test.

Usage:
  python multihost_worker.py <voc_root> <work_root> --nproc N --rank I \
      --coordinator localhost:PORT

Runs the task-1 NSGP pipeline (1 epoch train + val + artifacts) on a
tiny synthetic VOC under an N-process JAX runtime (1 CPU device per
process). With N=1 it runs exactly the single-host path; the test
compares the artifacts written by both worlds.
"""
import argparse
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=1"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("voc_root")
    ap.add_argument("work_root")
    ap.add_argument("--nproc", type=int, default=1)
    ap.add_argument("--rank", type=int, default=0)
    ap.add_argument("--coordinator", default=None)
    args = ap.parse_args()

    if args.nproc > 1:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.nproc,
            process_id=args.rank,
        )
    assert jax.process_count() == args.nproc

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import test_pipeline as tp
    from nsgp_repre_tpu.engine.runner import NullSpaceRunner

    cfg = tp.make_cfg(args.voc_root, args.work_root, task_id=1)
    # no flips: identical pixel content regardless of plan details
    cfg["train_dataloader"]["batch_size"] = 2
    r = NullSpaceRunner(cfg)
    r.train()
    mAP = r.val()
    print(f"RANK {args.rank}/{args.nproc} DONE mAP={mAP:.4f}", flush=True)


if __name__ == "__main__":
    main()
