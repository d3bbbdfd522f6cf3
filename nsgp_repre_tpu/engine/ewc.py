"""EWC regularization on BatchNorm affine parameters.

Parity targets (nsrunner_roi_replay.py):
- register_params (:1006-1031): regularize params whose name contains
  'bn' and not 'teacher_model';
- calculate_save_importance (:946-990): Fisher diagonal accumulated as
  grad² * batch_size / num_batches over one pass of the train loader;
- EWCHook (:1038-1073): adds 1000 * Σ_tasks importance·(θ − θ_old)² to
  the loss (terms stacked per task).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .optim import path_to_name

EWC_WEIGHT = 1000.0


def is_ewc_param(name: str) -> bool:
    return "bn" in name and "teacher" not in name


def select_ewc_params(params) -> Dict[str, jnp.ndarray]:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return {
        path_to_name(p): v for p, v in flat if is_ewc_param(path_to_name(p))
    }


def init_importance(params) -> Dict[str, jnp.ndarray]:
    return {k: jnp.zeros_like(v) for k, v in select_ewc_params(params).items()}


def accumulate_importance(
    importance: Dict[str, jnp.ndarray],
    grads,
    batch_size: int,
    num_batches: int,
) -> Dict[str, jnp.ndarray]:
    """importance += grad² * batch_size / num_batches (nsrunner:978-981)."""
    g = select_ewc_params(grads)
    scale = batch_size / num_batches
    return {k: importance[k] + g[k] ** 2 * scale for k in importance}


def append_task_terms(
    ewc_terms: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]],
    importance: Dict[str, jnp.ndarray],
    params,
) -> Dict[str, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Stack this task's (importance, θ) onto the per-task axis."""
    cur = select_ewc_params(params)
    out = {}
    for k, imp in importance.items():
        new_imp = imp[None]
        new_par = cur[k][None]
        if k in ewc_terms:
            old_imp, old_par = ewc_terms[k]
            new_imp = jnp.concatenate([old_imp, new_imp])
            new_par = jnp.concatenate([old_par, new_par])
        out[k] = (new_imp, new_par)
    return out


def ewc_loss(params, ewc_terms: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]]):
    """1000 * Σ importance·(θ − θ_old)² over all tasks and BN params."""
    if not ewc_terms:
        return jnp.zeros(())
    cur = select_ewc_params(params)
    total = jnp.zeros(())
    for k, (imp, old) in ewc_terms.items():
        p = cur[k][None]
        total = total + (imp * (p - old) ** 2).sum()
    return EWC_WEIGHT * total
