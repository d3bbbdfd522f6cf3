"""Null-space-projected optimizers (optax-style pure transforms).

Parity targets:
- SGDNSCL:  mmdet/engine/optimizers/SGD_NSCL.py:59-96 (step) — SGD with
  momentum/weight-decay whose final update is right-multiplied by a
  per-parameter projection matrix P (the null-space of old-task input
  covariance). 4D conv updates are flattened to (out, C) first (:82-91).
- AdamNSCL / AdamWNSCL: Adam_NSCL.py:15 / AdamW_NSCL.py:15 — the same
  projection applied to Adam(W) updates (decoupled WD at AdamW_NSCL.py:87).
- SGDNSCLNA: SGD_NSCL_NoAdaptive.py:16 — fixed-threshold ablation
  (selection differs at transform build time, engine/nsgp.py).

JAX re-design: the torch optimizers key transforms by parameter *name*
strings attached to optimizer groups (nsrunner:467-485); here transforms
live in the optimizer state as a pytree aligned with ``params`` — leaves
are either a (C, C) matrix or ``None``. Because flax conv kernels are
(kh, kw, in, out) while the covariance feature order is channel-major
(in, kh, kw) (see models/layers.py), conv updates are transposed to
(in*kh*kw, out) and projected as ``P @ g`` (== torch's ``(g2d) @ P`` for
the (out, C) layout, P symmetric).
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


def project_update(update: jnp.ndarray, transform: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Right-multiply a (reshaped-2D) update by its projection matrix."""
    if transform is None:
        return update
    if update.ndim == 4:  # conv kernel (kh, kw, in, out)
        kh, kw, cin, cout = update.shape
        g = jnp.transpose(update, (2, 0, 1, 3)).reshape(cin * kh * kw, cout)
        g = transform @ g
        return jnp.transpose(g.reshape(cin, kh, kw, cout), (1, 2, 0, 3))
    if update.ndim == 2:  # dense kernel (in, out)
        return transform @ update
    return update


class NSCLState(NamedTuple):
    momentum: Any
    transforms: Any  # pytree matching params: (C,C) arrays or None
    count: jnp.ndarray


def _ones_like_mults(params):
    return jax.tree.map(lambda _: 1.0, params)


def paramwise_mults(params, paramwise_cfg: dict):
    """Per-leaf (lr_mult, decay_mult) trees from an mmengine
    ``paramwise_cfg`` (DefaultOptimWrapperConstructor semantics:
    ``norm_decay_mult`` hits norm-layer params; ``custom_keys`` matches
    by substring with longest-key priority, schedule_1x_adamwnscl.py:24-28).
    """
    norm_wd = paramwise_cfg.get("norm_decay_mult")
    custom = paramwise_cfg.get("custom_keys", {}) or {}

    def one(path, _):
        name = path_to_name(path)
        lr_m, wd_m = 1.0, 1.0
        for k in sorted(custom, key=len, reverse=True):
            if k in name:
                lr_m = float(custom[k].get("lr_mult", 1.0))
                wd_m = float(custom[k].get("decay_mult", 1.0))
                break
        # norm params: FrozenBatchNorm scale/bias live under .../bn*/
        segs = name.split("/")
        if norm_wd is not None and any(s.startswith("bn") or s.endswith("_bn") for s in segs):
            wd_m = float(norm_wd)
        return lr_m, wd_m

    both = jax.tree_util.tree_map_with_path(one, params)
    is_t = lambda x: isinstance(x, tuple)
    lr_mults = jax.tree.map(lambda v: v[0], both, is_leaf=is_t)
    wd_mults = jax.tree.map(lambda v: v[1], both, is_leaf=is_t)
    return lr_mults, wd_mults


def sgd_nscl(
    learning_rate: optax.ScalarOrSchedule,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
    dampening: float = 0.0,
    nesterov: bool = False,
    lr_mults=None,
    wd_mults=None,
) -> optax.GradientTransformation:
    """SGD+momentum with null-space projection of the final update.

    Matches SGD_NSCL.get_update (:387-415): L2 weight decay folded into
    the gradient, torch-style momentum buffer (first step: buf = grad),
    ``update = -lr * buf`` then projected. ``lr_mults``/``wd_mults`` are
    optional per-leaf multiplier trees (mmengine paramwise_cfg: the torch
    side realizes them as per-group lr/weight_decay).
    """

    def init_fn(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return NSCLState(momentum=zeros, transforms={}, count=jnp.zeros((), jnp.int32))

    def update_fn(grads, state, params):
        lr = learning_rate(state.count) if callable(learning_rate) else learning_rate
        lm = lr_mults if lr_mults is not None else _ones_like_mults(params)
        wm = wd_mults if wd_mults is not None else _ones_like_mults(params)

        def one(g, p, buf, lmul, wmul):
            g = g + weight_decay * wmul * p
            buf_new = jnp.where(
                state.count > 0, momentum * buf + (1.0 - dampening) * g, g
            )
            d = g + momentum * buf_new if nesterov else buf_new
            return -lr * lmul * d, buf_new

        flat = jax.tree.map(one, grads, params, state.momentum, lm, wm)
        updates = jax.tree.map(lambda t: t[0], flat, is_leaf=lambda x: isinstance(x, tuple))
        bufs = jax.tree.map(lambda t: t[1], flat, is_leaf=lambda x: isinstance(x, tuple))
        updates = _apply_transforms(updates, state.transforms)
        return updates, NSCLState(momentum=bufs, transforms=state.transforms, count=state.count + 1)

    return optax.GradientTransformation(init_fn, update_fn)


class AdamNSCLState(NamedTuple):
    mu: Any
    nu: Any
    transforms: Any
    count: jnp.ndarray


def adam_nscl(
    learning_rate: optax.ScalarOrSchedule,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    decoupled_wd: bool = False,
    lr_mults=None,
    wd_mults=None,
) -> optax.GradientTransformation:
    """Adam(/W when ``decoupled_wd``) with null-space projection.

    AdamNSCL folds L2 into the grad; AdamWNSCL applies decoupled decay to
    the final update (AdamW_NSCL.py:87). Multiplier trees as in
    ``sgd_nscl``.
    """

    def init_fn(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return AdamNSCLState(
            mu=zeros,
            nu=jax.tree.map(jnp.zeros_like, params),
            transforms={},
            count=jnp.zeros((), jnp.int32),
        )

    def update_fn(grads, state, params):
        lr = learning_rate(state.count) if callable(learning_rate) else learning_rate
        t = state.count + 1
        lm = lr_mults if lr_mults is not None else _ones_like_mults(params)
        wm = wd_mults if wd_mults is not None else _ones_like_mults(params)

        def one(g, p, mu, nu, lmul, wmul):
            if weight_decay and not decoupled_wd:
                g = g + weight_decay * wmul * p
            mu_new = b1 * mu + (1 - b1) * g
            nu_new = b2 * nu + (1 - b2) * g * g
            mu_hat = mu_new / (1 - b1 ** t.astype(jnp.float32))
            nu_hat = nu_new / (1 - b2 ** t.astype(jnp.float32))
            upd = -lr * lmul * mu_hat / (jnp.sqrt(nu_hat) + eps)
            if weight_decay and decoupled_wd:
                upd = upd - lr * lmul * weight_decay * wmul * p
            return upd, mu_new, nu_new

        flat = jax.tree.map(one, grads, params, state.mu, state.nu, lm, wm)
        is_t = lambda x: isinstance(x, tuple)
        updates = jax.tree.map(lambda v: v[0], flat, is_leaf=is_t)
        mu = jax.tree.map(lambda v: v[1], flat, is_leaf=is_t)
        nu = jax.tree.map(lambda v: v[2], flat, is_leaf=is_t)
        updates = _apply_transforms(updates, state.transforms)
        return updates, AdamNSCLState(mu=mu, nu=nu, transforms=state.transforms, count=t)

    return optax.GradientTransformation(init_fn, update_fn)


def path_to_name(path) -> str:
    """('backbone','layer2_0','conv1','kernel') key path → joined name."""
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return "/".join(parts)


def _apply_transforms(updates, transforms):
    """Project updates whose path name has an installed transform.

    ``transforms`` is a flat dict {param-path-name: (C, C) array}; the
    dict keys are static at trace time so the lookup costs nothing.
    """
    if not transforms:
        return updates
    return jax.tree_util.tree_map_with_path(
        lambda path, u: project_update(u, transforms.get(path_to_name(path))),
        updates,
    )


def set_transforms(state, transforms):
    """Install projection matrices (built by engine/nsgp.py) into state."""
    return state._replace(transforms=transforms)


def masked(tx: optax.GradientTransformation, mask) -> optax.GradientTransformation:
    """Zero updates for non-trainable params (frozen stages, future heads).

    The reference freezes via ``requires_grad=False`` so frozen params
    never enter the optimizer (nsrunner:480-484); here the tree stays
    uniform and updates are masked instead — numerically identical.
    """

    def init_fn(params):
        return tx.init(params)

    def update_fn(grads, state, params):
        grads = jax.tree.map(lambda g, m: g * m, grads, mask)
        updates, state = tx.update(grads, state, params)
        updates = jax.tree.map(lambda u, m: u * m, updates, mask)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)
