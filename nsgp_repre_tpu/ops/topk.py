"""Top-k selection tuned for TPU.

``jax.lax.top_k`` lowers to a full sort on TPU — measurably slow on the
155k-anchor score/priority vectors this detector selects from every
step. ``jax.lax.approx_max_k`` uses the TPU's partial-reduction ASIC
path (PartialReduce) and is ~10x faster at recall 0.95+.

Where it's used:
- random sampling priorities (models/samplers.py): priorities are iid
  uniform, so an approximate top-k IS still a uniform random subset —
  no semantic change at all;
- RPN proposal pre-NMS top-k (models/detector.py): ~5% of borderline
  low-score proposals may swap; set
  ``DetectorConfig(use_approx_topk=False)`` for exact-parity runs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def fast_top_k(x: jnp.ndarray, k: int, approx: bool = True, recall_target: float = 0.95):
    """(values, indices) of the k largest along the last axis."""
    if approx and 0 < k < x.shape[-1] and jnp.issubdtype(x.dtype, jnp.floating):
        return jax.lax.approx_max_k(x, k, recall_target=recall_target)
    return jax.lax.top_k(x, k)
