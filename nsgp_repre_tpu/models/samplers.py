"""Random pos/neg sampling with static shapes.

Parity target: mmdet/models/task_modules/samplers/random_sampler.py:14 —
sample ``num`` priors, at most ``num * pos_fraction`` positives, fill the
rest with negatives; take all candidates when a pool is short.

XLA re-design (SURVEY §7, "the single hardest impedance mismatch"):
dynamic candidate pools become *threshold selection on iid uniform
priorities* — a prior is sampled iff its priority clears the k-th largest
priority of its pool, where k adapts to the actual pos count. Two modes:

- :func:`random_sample_masks` returns boolean masks only (RPN: the loss
  is computed over all anchors with zero weights elsewhere — no gather);
- :func:`random_sample_gather` additionally materializes ``num`` indices
  (RCNN: the sampled rois feed RoIAlign and must be gathered).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.topk import fast_top_k
from .assigners import NEG

BIG = 1.0e6


def _kth_largest_threshold(priority: jnp.ndarray, mask: jnp.ndarray, k_max: int):
    """Value of the k-th largest masked priority, where k = min(k_dyn, k_max).

    Returns a function of a *dynamic* k (traced scalar): we take the
    static top-``k_max`` then index with the dynamic k.

    Priorities are iid uniform, so the TPU-fast approximate top-k keeps
    the selection exactly as random as the exact one.
    """
    masked = jnp.where(mask, priority, -jnp.inf)
    k_max = min(k_max, masked.shape[-1])  # tiny single-level test maps
    top = fast_top_k(masked, k_max)[0]  # (k_max,) descending

    def thresh(k_dyn):
        k = jnp.clip(k_dyn, 1, k_max)
        return top[k - 1]

    return thresh, masked


def random_sample_masks(
    rng: jax.Array,
    assigned: jnp.ndarray,
    num: int,
    pos_fraction: float,
):
    """Select pos/neg masks (no gather).

    Args:
        assigned: (N,) int32 from :func:`max_iou_assign`.

    Returns:
        pos_mask, neg_mask: (N,) bool, with ``sum(pos) <= num*pos_fraction``
        and ``sum(pos) + sum(neg) <= num``.
    """
    n = assigned.shape[0]
    u = jax.random.uniform(rng, (n,))
    is_pos = assigned >= 0
    is_neg = assigned == NEG

    max_pos = int(num * pos_fraction)
    pos_thresh_fn, pos_masked = _kth_largest_threshold(u, is_pos, max_pos)
    n_pos_avail = is_pos.sum()
    pos_mask = is_pos & (u >= pos_thresh_fn(jnp.minimum(n_pos_avail, max_pos)))
    # if fewer than max_pos positives exist, thresh is -inf → all selected
    pos_mask = jnp.where(n_pos_avail == 0, jnp.zeros_like(pos_mask), pos_mask)

    n_pos_sel = pos_mask.sum()
    neg_needed = jnp.maximum(num - n_pos_sel, 0)
    neg_thresh_fn, _ = _kth_largest_threshold(u, is_neg, num)
    n_neg_avail = is_neg.sum()
    k_neg = jnp.minimum(neg_needed, n_neg_avail)
    neg_mask = is_neg & (u >= neg_thresh_fn(k_neg))
    neg_mask = jnp.where(k_neg == 0, jnp.zeros_like(neg_mask), neg_mask)
    return pos_mask, neg_mask


def random_sample_gather(
    rng: jax.Array,
    assigned: jnp.ndarray,
    num: int,
    pos_fraction: float,
):
    """Like :func:`random_sample_masks` but also gathers ``num`` indices.

    Returns:
        idx: (num,) int32 indices of sampled priors (positives first-ish;
            unused slots point at 0).
        idx_valid: (num,) bool slot validity.
        idx_pos: (num,) bool — slot is a positive sample.
    """
    pos_mask, neg_mask = random_sample_masks(rng, assigned, num, pos_fraction)
    n = assigned.shape[0]
    u2 = jax.random.uniform(jax.random.fold_in(rng, 1), (n,))
    key = jnp.where(pos_mask, 2.0 * BIG + u2, jnp.where(neg_mask, BIG + u2, u2 - BIG))
    # exact top_k here: the selected set (≤ num entries with key > 0) must
    # ALL land in the output slots; approx recall could drop a sample.
    k = min(num, n)
    topv, topi = jax.lax.top_k(key, k)
    if k < num:  # fewer priors than slots (tiny single-level maps)
        topv = jnp.concatenate([topv, jnp.full((num - k,), -BIG, topv.dtype)])
        topi = jnp.concatenate([topi, jnp.zeros((num - k,), topi.dtype)])
    idx_valid = topv > 0.0
    idx_pos = topv > 2.0 * BIG - 1.0
    idx = jnp.where(idx_valid, topi, 0).astype(jnp.int32)
    return idx, idx_valid, idx_pos
