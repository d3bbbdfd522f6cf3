"""nsgp_repre_tpu — TPU-native incremental object detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the NSGP-RePRE incremental
object-detection stack (ICML 2025, arXiv:2502.05540): a task-aware
Faster R-CNN (ResNet-50 + FPN) with

- **NSGP** — Null Space Gradient Projection: per-layer input covariances
  of the feature extractor are accumulated over old-task data; gradient
  updates are projected into the null space of those covariances.
- **RePRE** — Regional Prototype Replay: coarse (class-mean) and
  fine-grained (intra-class cluster) RoI-feature prototypes from old
  tasks are replayed through the classifier every step.

Everything on the compute path is jittable with static shapes: padded
instance arrays replace dynamic boxes, fixed-size NMS/top-k replace
dynamic filtering, and data parallelism runs over a `jax.sharding.Mesh`
with XLA collectives (no NCCL).

Reference behavior parity is documented per-module with file:line
citations into the upstream repo (yyl404/NSGP-RePRE).
"""

__version__ = "0.1.0"
