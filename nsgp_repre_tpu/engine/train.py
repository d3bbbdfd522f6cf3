"""Jitted train/eval steps and schedules.

One train step = teacher pseudo-labeling + full detector loss + RePRE
replay + EWC + backward + NSCL (null-space-projected) update, all inside
a single jit. With a data mesh, the batch arrives sharded and XLA
inserts the gradient all-reduce over ICI (parallel/mesh.py).

Reference counterparts: the mmengine EpochBasedTrainLoop iteration
(nsrunner:580, model.train_step → parse_losses → optim step) and the
LinearLR(0.001→1, 500 iters) + MultiStepLR([8, 11]×0.1) schedule
(schedule_1x_sgdnscl.py).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.detector import DetectorConfig, FasterRCNN
from ..structures.sample import DetBatch
from .ewc import ewc_loss
from .optim import path_to_name
from .pseudo import merge_pseudo_labels

# ImageNet mean/std, RGB (DetDataPreprocessor cfg in
# cl_faster_rcnn_cfgs/_base_/models/faster-rcnn_r50_fpn.py)
PIXEL_MEAN = (123.675, 116.28, 103.53)
PIXEL_STD = (58.395, 57.12, 57.375)


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray
    # per-task constants (None-able pytree fields)
    teacher_params: Optional[Any] = None
    replay_feats: Optional[jnp.ndarray] = None
    replay_labels: Optional[jnp.ndarray] = None
    ewc_terms: Any = struct.field(default_factory=dict)


def normalize_images(images: jnp.ndarray) -> jnp.ndarray:
    """Fused on-device preprocessing: uint8 RGB → normalized float32.

    Replaces DetDataPreprocessor (data_preprocessor.py:110-150) — runs
    inside the jitted step, so resize/pad (host) + normalize (device)
    never materialize an extra float image in HBM.
    """
    mean = jnp.asarray(PIXEL_MEAN, jnp.float32)
    std = jnp.asarray(PIXEL_STD, jnp.float32)
    return (images.astype(jnp.float32) - mean) / std


def make_lr_schedule(
    base_lr: float,
    steps_per_epoch: int,
    max_epochs: int = 30,
    milestones=(8, 11),
    gamma: float = 0.1,
    warmup_iters: int = 500,
    warmup_start_factor: float = 0.001,
):
    """LinearLR warmup + MultiStepLR decay (schedule_1x_sgdnscl.py)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = warmup_start_factor + (1.0 - warmup_start_factor) * jnp.minimum(
            step / max(warmup_iters, 1), 1.0
        )
        epoch = step // max(steps_per_epoch, 1)
        decay = jnp.ones(())
        for m in milestones:
            decay = decay * jnp.where(epoch >= m, gamma, 1.0)
        return base_lr * warm * decay

    return schedule


def trainable_mask(params, config: DetectorConfig):
    """1.0/0.0 pytree: frozen backbone stages per ``config.frozen_stages``
    (mmdet resnet.py semantics: -1 = nothing frozen, 0 = stem only,
    k>=1 = stem + layers 1..k) and frozen future-task cls/reg heads
    (convfc_bbox_head_task.py:129-144)."""
    fs = config.frozen_stages

    def fn(path, leaf):
        name = path_to_name(path)
        if fs >= 0 and (
            name.startswith("backbone/conv1") or name.startswith("backbone/bn1")
        ):
            return jnp.zeros((), leaf.dtype)
        for s in range(1, fs + 1):
            if name.startswith(f"backbone/layer{s}_"):
                return jnp.zeros((), leaf.dtype)
        for i in range(len(config.task_split) - 1):
            if i + 1 > config.task_id:
                if f"fc_cls{i}/" in name or name.endswith(f"fc_cls{i}"):
                    return jnp.zeros((), leaf.dtype)
                if f"fc_reg{i}/" in name or name.endswith(f"fc_reg{i}"):
                    return jnp.zeros((), leaf.dtype)
        return jnp.ones((), leaf.dtype)

    return jax.tree_util.tree_map_with_path(fn, params)


def total_loss(losses: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """mmengine parse_losses: sum every entry whose key contains 'loss'."""
    return sum(v for k, v in losses.items() if "loss" in k)


def _raw_replay_inputs(teacher_model, state: "TrainState", rng: jax.Array,
                       sample_size: int = 64):
    """Raw-feature replay (StandardRoIReplayHead.loss,
    standard_roi_replay_head.py:56-66): randomly sample 64 stored RoI
    features per step and compute the frozen teacher's cls logits on
    them. Returns (feats, teacher_cls) for the student's MSE loss."""
    n = state.replay_feats.shape[0]
    k = min(sample_size, n)
    sel = jax.random.choice(rng, n, (k,), replace=False)
    feats = jnp.take(state.replay_feats, sel, axis=0)
    teacher_vars = {"params": state.teacher_params, "batch_stats": state.batch_stats}
    t_cls, _ = teacher_model.apply(teacher_vars, feats, method=teacher_model.bbox_forward)
    return feats, jax.lax.stop_gradient(t_cls)


def make_teacher_step(teacher_model: FasterRCNN):
    """Jitted frozen-teacher predict: (teacher_vars, batch) → padded
    detections in CANVAS coordinates (rescale=False), exactly the tensor
    the in-step pseudo-label path consumes. The teacher is deterministic
    per (image, flip), so the runner caches these per (img_id, flip) and
    feeds them back through ``make_train_step(external_teacher=True)``
    instead of recomputing identical labels every epoch
    (faster_rcnn_roi_replay.py:65-109 recomputes per step; nothing in the
    protocol depends on that)."""

    def fn(teacher_vars, batch: DetBatch):
        batch = batch.replace(images=normalize_images(batch.images))
        return jax.lax.stop_gradient(
            teacher_model.apply(
                teacher_vars, batch, False, method=teacher_model.predict
            )
        )

    return jax.jit(fn)


def make_train_step(
    model: FasterRCNN,
    optimizer: optax.GradientTransformation,
    teacher_model: Optional[FasterRCNN] = None,
    donate: bool = True,
    clip_grad_norm: Optional[float] = None,
):
    """Build the jitted train step.

    The returned function: (state, batch, rng[, teacher_dets]) →
    (state, metrics). When ``teacher_dets`` (precomputed canvas-space
    teacher detections, see :func:`make_teacher_step`) is passed, the
    in-graph teacher predict is skipped and the given detections feed
    the pseudo-label merge instead.
    ``batch.images`` may be uint8 (normalized in-graph).
    ``clip_grad_norm`` mirrors mmengine OptimWrapper's ``clip_grad``
    (global-norm clipping before the optimizer update).
    """

    def step_fn(state: TrainState, batch: DetBatch, rng: jax.Array,
                teacher_dets=None):
        batch = batch.replace(images=normalize_images(batch.images))

        rpn_gt = roi_gt = None
        if teacher_dets is not None or (
            teacher_model is not None and state.teacher_params is not None
        ):
            if teacher_dets is None:
                teacher_vars = {
                    "params": state.teacher_params,
                    "batch_stats": state.batch_stats,
                }
                dets = teacher_model.apply(
                    teacher_vars, batch, False, method=teacher_model.predict
                )
                dets = jax.lax.stop_gradient(dets)
            else:
                dets = jax.lax.stop_gradient(teacher_dets)
            rpn_gt, roi_gt = merge_pseudo_labels(
                batch.gt, dets,
                rpn_thresh=model.config.rpn_thresh,
                roi_thresh=model.config.roi_thresh,
                iou_skip=model.config.pseudo_iou_skip,
            )

        raw_mode = (
            model.config.replay_mode == "raw"
            and state.replay_feats is not None
            and state.teacher_params is not None
            and teacher_model is not None
        )
        raw_feats = raw_teacher_cls = None
        if raw_mode:
            rng, r_sel = jax.random.split(rng)
            raw_feats, raw_teacher_cls = _raw_replay_inputs(teacher_model, state, r_sel)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            losses = model.apply(
                variables, batch, rng,
                rpn_gt, roi_gt,
                None if raw_mode else state.replay_feats,
                None if raw_mode else state.replay_labels,
                method=model.loss,
            )
            if raw_mode:
                losses["replay_loss_cls"] = model.apply(
                    variables, raw_feats, raw_teacher_cls,
                    method=model.raw_replay_loss,
                )
            if state.ewc_terms:
                losses["ewc_loss"] = ewc_loss(params, state.ewc_terms)
            return total_loss(losses), losses

        (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        if clip_grad_norm is not None:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, clip_grad_norm / jnp.maximum(gnorm, 1e-12))
            grads = jax.tree.map(lambda g: g * scale, grads)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = state.replace(
            params=params, opt_state=opt_state, step=state.step + 1
        )
        metrics = {"loss": loss, **losses}
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_eval_step(model: FasterRCNN):
    """Jitted predict step: (variables, batch) → padded detections."""

    def eval_fn(variables, batch: DetBatch):
        batch = batch.replace(images=normalize_images(batch.images))
        return model.apply(variables, batch, method=model.predict)

    return jax.jit(eval_fn)


def make_cov_step(model: FasterRCNN):
    """Jitted covariance pass (cal_fea_in, nsrunner:704-763).

    Runs the full loss forward (mode='nullspace' semantics — no teacher)
    with the 'cov' collection mutable; returns the per-layer input
    covariance pytree for this batch.
    """

    def cov_fn(variables, batch: DetBatch, rng: jax.Array):
        batch = batch.replace(images=normalize_images(batch.images))
        _, state = model.apply(
            variables, batch, rng, method=model.loss, mutable=["cov"]
        )
        return state["cov"]

    return jax.jit(cov_fn)


def make_roi_extract_step(model: FasterRCNN, target_count: int = 5):
    """Jitted RePRE RoI-feature extraction (cal_rois, nsrunner:776-868)."""

    def roi_fn(variables, batch: DetBatch, rng: jax.Array):
        batch = batch.replace(images=normalize_images(batch.images))
        return model.apply(
            variables, batch, rng, target_count, method=model.get_bbox_stuff
        )

    return jax.jit(roi_fn)


def make_importance_step(model: FasterRCNN, teacher_model: Optional[FasterRCNN] = None):
    """Jitted EWC-importance step: per-batch squared grads of BN params
    (calculate_save_importance, nsrunner:946-990).

    The reference runs ``model._run_forward(mode='loss')`` (:972) AFTER
    training, when the teacher is attached and model.loss is EWC-wrapped
    — so at task≥2 the importance includes the pseudo-label, replay and
    EWC terms. Reproduced by reusing the full train-step loss.
    """

    def imp_fn(state: TrainState, batch: DetBatch, rng: jax.Array):
        batch = batch.replace(images=normalize_images(batch.images))
        rpn_gt = roi_gt = None
        if teacher_model is not None and state.teacher_params is not None:
            teacher_vars = {
                "params": state.teacher_params,
                "batch_stats": state.batch_stats,
            }
            dets = teacher_model.apply(
                teacher_vars, batch, False, method=teacher_model.predict
            )
            dets = jax.lax.stop_gradient(dets)
            rpn_gt, roi_gt = merge_pseudo_labels(
                batch.gt, dets,
                rpn_thresh=model.config.rpn_thresh,
                roi_thresh=model.config.roi_thresh,
                iou_skip=model.config.pseudo_iou_skip,
            )

        raw_mode = (
            model.config.replay_mode == "raw"
            and state.replay_feats is not None
            and state.teacher_params is not None
            and teacher_model is not None
        )
        raw_feats = raw_teacher_cls = None
        if raw_mode:
            rng, r_sel = jax.random.split(rng)
            raw_feats, raw_teacher_cls = _raw_replay_inputs(teacher_model, state, r_sel)

        def loss_fn(p):
            variables = {"params": p, "batch_stats": state.batch_stats}
            losses = model.apply(
                variables, batch, rng,
                rpn_gt, roi_gt,
                None if raw_mode else state.replay_feats,
                None if raw_mode else state.replay_labels,
                method=model.loss,
            )
            if raw_mode:
                losses["replay_loss_cls"] = model.apply(
                    variables, raw_feats, raw_teacher_cls,
                    method=model.raw_replay_loss,
                )
            if state.ewc_terms:
                losses["ewc_loss"] = ewc_loss(p, state.ewc_terms)
            return total_loss(losses)

        return jax.grad(loss_fn)(state.params)

    return jax.jit(imp_fn)
