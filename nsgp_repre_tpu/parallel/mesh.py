"""Device-mesh data parallelism.

The reference's ONLY parallelism is DDP over NCCL (SURVEY §2.7:
MMDistributedDataParallel gradient allreduce, DefaultSampler sharding,
all_reduce_dict for covariances, all_gather_different_shape for ragged
RoI features). The TPU-native equivalent is a 1-D ``jax.sharding.Mesh``
('data' axis) with the batch sharded and params replicated — XLA inserts
the gradient all-reduce over ICI during pjit partitioning; no explicit
collective calls are needed in the step function.

Cross-device artifact reductions:
- covariance dicts: jnp sums of replicated/per-shard outputs (the jitted
  cov pass runs on the sharded batch; XLA reduces);
- ragged RoI gathers: fixed-capacity padded arrays + masks make
  ``all_gather_different_shape`` (nsrunner:73-105) unnecessary — a plain
  sharded-to-replicated reshard does it.

Multi-host (DCN) comes from ``jax.distributed.initialize`` at process
startup; the mesh construction below is topology-agnostic.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed() -> None:
    """Multi-host initialization from env (dist_train.sh contract).

    On TPU pods jax.distributed.initialize() discovers the topology from
    the runtime; for manual multi-process runs set JAX_COORDINATOR,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID. Replaces torch.distributed.launch
    + NCCL init (SURVEY §2.7).
    """
    import os

    coord = os.environ.get("JAX_COORDINATOR")
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )


def create_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place a DetBatch pytree with the leading dim sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.device_put(batch, sharding)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params/opt state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
