"""Detection losses with mmdet weight/avg_factor semantics.

Parity targets: mmdet/models/losses/cross_entropy_loss.py:202 and
smooth_l1_loss.py:118 (L1Loss) — elementwise loss * weight, summed and
divided by ``avg_factor``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def weighted_sigmoid_bce(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    weights: jnp.ndarray,
    avg_factor,
) -> jnp.ndarray:
    """Binary CE with logits (RPN objectness)."""
    t = targets.astype(logits.dtype)
    loss = jnp.maximum(logits, 0) - logits * t + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return (loss * weights).sum() / jnp.maximum(avg_factor, 1.0)


def weighted_softmax_ce(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    weights: jnp.ndarray,
    avg_factor,
) -> jnp.ndarray:
    """Softmax CE over the last dim; labels are int indices."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(
        logp, jnp.clip(labels, 0)[..., None].astype(jnp.int32), axis=-1
    )[..., 0]
    return (-ll * weights).sum() / jnp.maximum(avg_factor, 1.0)


def weighted_l1(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    weights: jnp.ndarray,
    avg_factor,
) -> jnp.ndarray:
    loss = jnp.abs(pred - target)
    return (loss * weights).sum() / jnp.maximum(avg_factor, 1.0)


def weighted_sigmoid_focal(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    weights: jnp.ndarray,
    avg_factor,
    num_classes: int,
    gamma: float = 2.0,
    alpha: float = 0.25,
) -> jnp.ndarray:
    """Sigmoid focal loss (mmdet FocalLoss, use_sigmoid=True).

    Parity: mmdet/models/losses/focal_loss.py ``py_sigmoid_focal_loss`` —
    one-vs-all sigmoid over ``num_classes`` columns; ``labels ==
    num_classes`` means background (all-zero target row).

    Args:
        logits: (N, num_classes); labels: (N,) int, background =
        num_classes; weights: (N,) anchor weights.
    """
    t = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    p = jax.nn.sigmoid(logits)
    # standard numerically-stable BCE with logits
    bce = jnp.maximum(logits, 0) - logits * t + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    pt = (1.0 - p) * t + p * (1.0 - t)
    alpha_t = alpha * t + (1.0 - alpha) * (1.0 - t)
    loss = alpha_t * jnp.power(pt, gamma) * bce
    return (loss * weights[..., None]).sum() / jnp.maximum(avg_factor, 1.0)


def weighted_smooth_l1(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    weights: jnp.ndarray,
    avg_factor,
    beta: float = 1.0,
) -> jnp.ndarray:
    """Smooth L1 (mmdet SmoothL1Loss, smooth_l1_loss.py:14)."""
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    return (loss * weights).sum() / jnp.maximum(avg_factor, 1.0)


def accuracy(logits: jnp.ndarray, labels: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """Weighted top-1 accuracy (mmdet logs ``acc`` for the RoI head)."""
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == labels).astype(jnp.float32) * weights
    return correct.sum() / jnp.maximum(weights.sum(), 1.0)
