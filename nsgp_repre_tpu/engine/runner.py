"""Training orchestrators.

- :class:`NullSpaceRunner` ≙ BRNullSpaceRunner
  (mmdet/engine/runner/nsrunner_roi_replay.py:112): per task —
  auto-load previous best checkpoint, build the frozen teacher
  (task_id−1), install NSGP transforms from ``covariance.npz``, load EWC
  terms, build RePRE prototypes from ``rois_etc.npz``, run the train
  loop (per-epoch val + best checkpoint), then compute and save the
  next task's artifacts (EWC importance, input covariances, RoI
  features).
- :class:`TeacherRunner` ≙ mmdet/engine/runner/teacherrunner.py:65 —
  teacher pseudo-labeling only, no NSGP/EWC/artifacts.
"""
from __future__ import annotations

import json
import logging
import os
import os.path as osp
import re
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..datasets import CocoTaskDataset, DIORTaskDataset, VOCTaskDataset
from ..datasets.loader import DetLoader
from ..datasets.prefetch import PrefetchLoader
from ..evaluation import eval_coco_map, eval_voc_map
from ..models.detector import DetectorConfig, FasterRCNN
from ..parallel.mesh import create_mesh, replicate, shard_batch
from ..structures.sample import DetBatch, InstanceArray
from ..utils import checkpoint as ckpt_io
from ..utils.config import Config
from . import ewc as ewc_lib
from . import nsgp, optim, replay
from .train import (
    TrainState,
    make_cov_step,
    make_eval_step,
    make_importance_step,
    make_lr_schedule,
    make_roi_extract_step,
    make_teacher_step,
    make_train_step,
    trainable_mask,
)

logger = logging.getLogger("nsgp_repre_tpu")

# reference ignore_keys name their torch modules; translate prefixes to
# this package's parameter paths (nsrunner:354 default + forced entries)
_IGNORE_NAME_MAP = {
    "rpn": "rpn_head",
    "roi_head.bbox_head.fc_cls": "bbox_head/fc_cls",
    "roi_head.bbox_head.fc_reg": "bbox_head/fc_reg",
    "roi_head": "bbox_head",
    "teacher": "teacher",
}
_FORCED_IGNORE = ["roi_head.bbox_head.fc_cls", "roi_head.bbox_head.fc_reg", "teacher"]


def translate_ignore_keys(keys: List[str]) -> List[str]:
    out = []
    for k in list(keys) + _FORCED_IGNORE:
        out.append(_IGNORE_NAME_MAP.get(k, k))
    return out


def build_optimizer(opt_cfg: dict, lr_schedule, params=None, paramwise_cfg=None):
    """Map a reference ``optim_wrapper.optimizer`` dict onto the projected
    optax transforms (SGD/Adam/AdamW ± NSCL share implementations — the
    plain types are the NSCL ones with no transform installed)."""
    lr_mults = wd_mults = None
    if paramwise_cfg and params is not None:
        lr_mults, wd_mults = optim.paramwise_mults(params, paramwise_cfg)
    opt_type = opt_cfg.get("type", "SGDNSCL")
    if opt_type in ("SGDNSCL", "SGDNSCLNA", "SGD"):
        return optim.sgd_nscl(
            lr_schedule,
            momentum=opt_cfg.get("momentum", 0.9),
            weight_decay=opt_cfg.get("weight_decay", 1e-4),
            lr_mults=lr_mults, wd_mults=wd_mults,
        )
    if opt_type in ("AdamNSCL", "Adam"):
        return optim.adam_nscl(
            lr_schedule, weight_decay=opt_cfg.get("weight_decay", 0.0),
            lr_mults=lr_mults, wd_mults=wd_mults,
        )
    if opt_type in ("AdamWNSCL", "AdamW"):
        return optim.adam_nscl(
            lr_schedule,
            weight_decay=opt_cfg.get("weight_decay", 0.1),
            decoupled_wd=True,
            lr_mults=lr_mults, wd_mults=wd_mults,
        )
    raise ValueError(opt_type)


def detector_config_from_cfg(cfg: Config) -> DetectorConfig:
    """Map a reference-shaped model config dict onto DetectorConfig."""
    model = cfg.get("model", {})
    bbox_head = model.get("roi_head", {}).get("bbox_head", {})
    num_classes = bbox_head.get("num_classes", 20)
    task_split = tuple(cfg.get("train_task_split", (0, num_classes)))
    task_id = cfg.get("task_id", 1)
    rr = cfg.get("rr_thresh", [0.5, 0.5])
    train_cfg = model.get("train_cfg", {})
    rpn_t = train_cfg.get("rpn", {})
    prop_t = train_cfg.get("rpn_proposal", {})
    rcnn_t = train_cfg.get("rcnn", {})
    test_cfg = model.get("test_cfg", {})
    rcnn_te = test_cfg.get("rcnn", {})
    return DetectorConfig(
        num_classes=num_classes,
        task_split=task_split,
        task_id=task_id,
        rpn_pos_iou_thr=rpn_t.get("assigner", {}).get("pos_iou_thr", 0.7),
        rpn_neg_iou_thr=rpn_t.get("assigner", {}).get("neg_iou_thr", 0.3),
        rpn_min_pos_iou=rpn_t.get("assigner", {}).get("min_pos_iou", 0.3),
        rpn_num=rpn_t.get("sampler", {}).get("num", 256),
        rpn_pos_fraction=rpn_t.get("sampler", {}).get("pos_fraction", 0.5),
        rpn_nms_pre=prop_t.get("nms_pre", 2000),
        rpn_max_per_img=prop_t.get("max_per_img", 1000),
        rpn_nms_iou=prop_t.get("nms", {}).get("iou_threshold", 0.7),
        rcnn_pos_iou_thr=rcnn_t.get("assigner", {}).get("pos_iou_thr", 0.5),
        rcnn_neg_iou_thr=rcnn_t.get("assigner", {}).get("neg_iou_thr", 0.5),
        rcnn_min_pos_iou=rcnn_t.get("assigner", {}).get("min_pos_iou", 0.5),
        rcnn_num=rcnn_t.get("sampler", {}).get("num", 512),
        rcnn_pos_fraction=rcnn_t.get("sampler", {}).get("pos_fraction", 0.25),
        score_thr=rcnn_te.get("score_thr", 0.05),
        nms_iou=rcnn_te.get("nms", {}).get("iou_threshold", 0.5),
        max_per_img=rcnn_te.get("max_per_img", 100),
        rpn_thresh=rr[0],
        roi_thresh=rr[1],
        compute_dtype=cfg.get("compute_dtype", "float32"),
        backbone_blocks=tuple(
            model.get("backbone", {}).get("stage_blocks", (3, 4, 6, 3))
        ),
        frozen_stages=model.get("backbone", {}).get("frozen_stages", 1),
        replay_mode=(
            "raw"
            if model.get("roi_head", {}).get("type") == "StandardRoIReplayHead"
            else "prototype"
        ),
        # parity mode: exact top-k for pre-NMS selection (slower; flip on
        # when validating mAP against the reference)
        use_approx_topk=cfg.get("use_approx_topk", True),
        teacher_fast=cfg.get("teacher_fast", cfg.get("use_approx_topk", True)),
        roi_align_mode=cfg.get(
            "roi_align_mode",
            "window" if cfg.get("use_approx_topk", True) else "gather",
        ),
        rpn_nms_impl=cfg.get("rpn_nms_impl", "auto"),
        rpn_sparse_loss=cfg.get(
            "rpn_sparse_loss", cfg.get("use_approx_topk", True)
        ),
        stem_s2d=cfg.get("stem_s2d", False),
    )


def build_dataset(ds_cfg: Config, data_root_override: Optional[str] = None):
    typ = ds_cfg.get("type", "VOCTask")
    data_root = data_root_override or ds_cfg.get("data_root", "data/VOCdevkit")
    common = dict(
        task_split=list(ds_cfg.get("task_split", (0, 20))),
        task_id=ds_cfg.get("task_id", 1),
        test_mode=ds_cfg.get("test_mode", False),
    )
    if typ in ("VOCTask", "VOCTaskDataset"):
        return VOCTaskDataset(
            data_root=data_root,
            ann_file=ds_cfg.get("ann_file", "VOC2007/ImageSets/Main/trainval.txt"),
            sub_data_root=ds_cfg.get("data_prefix", {}).get("sub_data_root", "VOC2007/"),
            **common,
        )
    if typ in ("DIORTask", "DIORTaskDataset"):
        return DIORTaskDataset(
            data_root=data_root,
            ann_file=ds_cfg.get("ann_file"),
            sub_data_root=ds_cfg.get("data_prefix", {}).get("sub_data_root", ""),
            **common,
        )
    if typ in ("CocoTaskDataset", "CocoTask"):
        return CocoTaskDataset(
            data_root=data_root,
            ann_file=ds_cfg.get("ann_file"),
            img_prefix=ds_cfg.get("data_prefix", {}).get("img", ""),
            **common,
        )
    raise ValueError(f"unknown dataset type {typ}")


class NullSpaceRunner:
    """Per-task orchestration of the NSGP-RePRE pipeline."""

    # val_task_split (dataset configs): evaluate all classes seen so far
    def __init__(self, cfg: Config, use_nsgp: bool = True):
        self.cfg = cfg
        self.use_nsgp = use_nsgp
        self.work_dir = cfg.get("work_dir", "./work_dirs/default")
        os.makedirs(self.work_dir, exist_ok=True)
        self.task_id = cfg.get("task_id", 1)
        self.task_split = list(cfg.get("train_task_split", (0, 20)))
        self.previous_dir = cfg.get("previous_dir") if self.task_id != 1 else None
        if self.previous_dir is not None and not osp.exists(self.previous_dir):
            assert self.task_id == 1, "previous task dir required for task>1"
        self.ckpt_keywords = cfg.get("ckpt_keywords", "best")
        self.offset = cfg.get("offset", 0.0) or 0.0
        self.ignore_keys = translate_ignore_keys(cfg.get("ignore_keys", ["rpn", "roi_head"]))
        self.max_prototype = cfg.get("max_prototype", 10)
        self.reserve_per_class = cfg.get("reserve_per_class", 0) or 0
        self.is_trained = bool(cfg.get("is_trained", False))
        self.seed = cfg.get("seed", 0)
        self.use_teacher = cfg.get("use_teacher", True) and self.task_id != 1 \
            and "joint" not in self.work_dir

        self.det_cfg = detector_config_from_cfg(cfg)
        self.model = FasterRCNN(config=self.det_cfg)
        self.teacher_model = (
            FasterRCNN(
                config=dataclass_replace(
                    self.det_cfg,
                    task_id=self.task_id - 1,
                    # teacher fast path: 1x1 RoIAlign sample grid (see
                    # DetectorConfig.teacher_fast) — the gather dominates
                    # teacher predict (124.7 of 189 ms at batch 16).
                    # Moot under the Pallas window kernel: its cost is
                    # DMA-bound, independent of the sample grid, so the
                    # teacher keeps the full 2x2 grid there.
                    roi_sampling_ratio=(
                        1
                        if self.det_cfg.teacher_fast
                        and self.det_cfg.roi_align_mode != "window"
                        else self.det_cfg.roi_sampling_ratio
                    ),
                )
            )
            if self.use_teacher
            else None
        )

        # ---- data ----
        tl_cfg = cfg.get("train_dataloader", {})
        vl_cfg = cfg.get("val_dataloader", {})
        self.train_dataset = build_dataset(_leaf_dataset(tl_cfg.get("dataset", {})))
        self.val_dataset = build_dataset(_leaf_dataset(vl_cfg.get("dataset", {})))
        scale = tuple(cfg.get("img_scale", (1000, 600)))

        gt_capacity = cfg.get("gt_capacity", 64)
        # multi-host: each process loads only its slice of every global
        # batch; the plan (order/buckets/flips) is seed-deterministic and
        # identical across processes (datasets/loader.py)
        n_proc, proc_id = jax.process_count(), jax.process_index()
        self.train_loader = PrefetchLoader(DetLoader(
            self.train_dataset,
            batch_size=tl_cfg.get("batch_size", 16),
            scale=scale,
            training=True,
            repeat=_dataset_repeat(tl_cfg.get("dataset", {})),
            seed=self.seed,
            gt_capacity=gt_capacity,
            num_shards=n_proc,
            shard_id=proc_id,
        ), buffer_size=tl_cfg.get("num_workers", 2),
           transfer_fn=self._device_batch)
        self.val_loader = PrefetchLoader(DetLoader(
            self.val_dataset,
            batch_size=vl_cfg.get("batch_size", tl_cfg.get("batch_size", 16)),
            scale=scale,
            training=False,
            gt_capacity=gt_capacity,
            num_shards=n_proc,
            shard_id=proc_id,
        ), buffer_size=2, transfer_fn=self._val_transfer)

        # ---- schedule / optimizer ----
        opt_cfg = cfg.get("optim_wrapper", {}).get("optimizer", {})
        self.max_epochs = cfg.get("train_cfg", {}).get("max_epochs", 30)
        sched_cfg = cfg.get("param_scheduler", None)
        milestones, gamma, warmup = (8, 11), 0.1, 500
        if sched_cfg:
            for s in sched_cfg:
                if s.get("type") == "MultiStepLR":
                    milestones = tuple(s.get("milestones", milestones))
                    gamma = s.get("gamma", gamma)
                if s.get("type") == "LinearLR":
                    warmup = s.get("end", warmup)
        steps_per_epoch = max(len(self.train_loader), 1)
        base_lr = opt_cfg.get("lr", 0.02)
        # auto_scale_lr (linear scaling rule; schedule_1x_sgdnscl.py:47-51,
        # disabled by default with base_batch_size=16)
        asl = cfg.get("auto_scale_lr", {})
        if asl.get("enable", False):
            base_lr = base_lr * tl_cfg.get("batch_size", 16) / asl.get("base_batch_size", 16)
        self.lr_schedule = make_lr_schedule(
            base_lr,
            steps_per_epoch,
            max_epochs=self.max_epochs,
            milestones=milestones,
            gamma=gamma,
            warmup_iters=warmup,
        )
        opt_type = opt_cfg.get("type", "SGDNSCL")
        self._opt_cfg, self._opt_type = dict(opt_cfg), opt_type
        self._paramwise_cfg = cfg.get("optim_wrapper", {}).get("paramwise_cfg") or {}
        self.adaptive = opt_type != "SGDNSCLNA"

        # ---- model init / checkpoint ----
        rng = jax.random.PRNGKey(self.seed)
        dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = self.model.init(rng, dummy)
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})

        load_from = cfg.get("load_from")
        if load_from is None and self.previous_dir is not None:
            load_from = ckpt_io.find_checkpoint(self.previous_dir, self.ckpt_keywords)
            assert load_from, f"no '{self.ckpt_keywords}' ckpt in {self.previous_dir}"
        pretrained = cfg.get_nested("model.backbone.init_cfg.checkpoint")
        if load_from:
            self._load_checkpoint(load_from)
            logger.info(f"loaded checkpoint {load_from}")
        elif pretrained and osp.exists(str(pretrained)):
            self._load_backbone(pretrained)

        # optimizer (built after params exist: paramwise_cfg multipliers
        # are per-leaf trees, mmengine DefaultOptimWrapperConstructor)
        base_opt = build_optimizer(
            self._opt_cfg, self.lr_schedule, self.params, self._paramwise_cfg
        )
        mask = trainable_mask(self.params, self.det_cfg)
        self.optimizer = optim.masked(base_opt, mask)
        self.opt_state = self.optimizer.init(self.params)

        # ---- teacher (nsrunner:529-549: deepcopy AFTER ckpt load) ----
        self.teacher_params = (
            jax.tree.map(jnp.copy, self.params) if self.use_teacher else None
        )

        # ---- NSGP transforms (update_optim_transforms, nsrunner:634) ----
        if self.use_nsgp and self.task_id != 1 and not self.is_trained:
            cov_path = cfg.get("fea_in_load_path") or self.previous_dir
            cov = ckpt_io.load_covariance(cov_path)
            transforms = nsgp.build_transforms(
                cov,
                offset=self.offset,
                ignore_patterns=self.ignore_keys,
                adaptive=self.adaptive,
                logger=logger,
            )
            self.opt_state = optim.set_transforms(self.opt_state, transforms)
            logger.info(f"installed {len(transforms)} NSGP transforms")

        # ---- EWC terms (load_importance, nsrunner:996-999) ----
        self.ewc_terms: Dict = {}
        if self.use_nsgp and self.task_id != 1 and not self.is_trained \
                and "joint" not in self.work_dir:
            ewc_path = osp.join(self.previous_dir, "ewc_reg_terms_ewc.npz")
            if osp.exists(ewc_path):
                raw = ckpt_io.load_ewc_terms(self.previous_dir)
                self.ewc_terms = {
                    k: (jnp.asarray(v[0]), jnp.asarray(v[1])) for k, v in raw.items()
                }

        # ---- RePRE prototypes ----
        self.replay_feats = None
        self.replay_labels = None
        roi_head_type = cfg.get_nested("model.roi_head.type", "StandardMultiPrototypeReplayHead")
        if self.task_id != 1 and self.previous_dir and osp.exists(
            osp.join(self.previous_dir, "rois_etc.npz")
        ):
            arrays = ckpt_io.load_rois_etc(self.previous_dir)
            feats, cls_targets = arrays[0], arrays[1]
            protos, labels = [], []
            if roi_head_type == "StandardRoIReplayHead":
                # raw-feature variant: keep the WHOLE stored buffer; the
                # train step samples 64/step and distills against the
                # teacher (standard_roi_replay_head.py:56-66)
                self.replay_feats = jnp.asarray(
                    feats.reshape(feats.shape[0], -1).astype(np.float32)
                )
                self.replay_labels = jnp.asarray(cls_targets.astype(np.int32))
                logger.info(
                    f"raw replay buffer: {self.replay_feats.shape[0]} stored RoI feats"
                )
            elif roi_head_type == "StandardPrototypeReplayHead":
                protos, labels = replay.build_coarse_prototypes(
                    feats, cls_targets, self.task_split, self.task_id
                )
            else:  # StandardMultiPrototypeReplayHead (main configs)
                saved = ckpt_io.load_masks(self.previous_dir)
                protos, labels, masks = replay.build_prototypes(
                    feats, cls_targets, self.task_split, self.task_id,
                    max_prototype=self.max_prototype, saved_masks=saved,
                )
                if self._is_main():
                    ckpt_io.save_masks(self.work_dir, masks)
                self._barrier("masks")
            if len(protos):
                # map absolute class label → index in the sliced
                # [:task_split[task_id]] ++ [bg] logit vector (labels are
                # old-task classes, which are already < task_split[task_id])
                self.replay_feats = jnp.asarray(protos)
                self.replay_labels = jnp.asarray(labels)
                logger.info(f"built {len(protos)} RePRE prototypes")

        # ---- steps ----
        # data-parallel mesh over as many devices as evenly divide the batch
        import math as _math

        bs = tl_cfg.get("batch_size", 16)
        if jax.process_count() > 1:
            # multi-host: the mesh must span every process's devices
            # (make_array_from_process_local_data assembles per-process
            # slices onto all addressable shards)
            assert bs % jax.device_count() == 0, (
                f"batch_size {bs} must divide over {jax.device_count()} "
                f"global devices in multi-host mode"
            )
            n_dev = jax.device_count()
        else:
            n_dev = _math.gcd(jax.device_count(), bs)
        self.mesh = create_mesh(n_dev) if n_dev > 1 else None
        clip_cfg = cfg.get("optim_wrapper", {}).get("clip_grad") or {}
        self.train_step = make_train_step(
            self.model, self.optimizer, self.teacher_model,
            clip_grad_norm=clip_cfg.get("max_norm"),
        )
        # teacher pseudo-label cache: the frozen teacher is deterministic
        # per (image, flip), so its labels are computed once per variant
        # (a 2-variant pre-pass + lazy fallback) instead of every step of
        # every epoch. teacher_label_cache=False restores the reference's
        # exact per-step recompute (faster_rcnn_roi_replay.py:65-109).
        self.teacher_cache = (
            bool(cfg.get("teacher_label_cache", True)) and self.use_teacher
        )
        self.teacher_step = (
            make_teacher_step(self.teacher_model) if self.use_teacher else None
        )
        self._pseudo_cache: Dict[tuple, tuple] = {}
        # entries hold only the valid detection rows (+ their original
        # row positions, so reconstruction is bit-exact) — ~26 bytes per
        # detection instead of ~2.5 KB per fixed (max_per_img,) row set.
        # The budget caps host RAM on large datasets (COCO train2017 at
        # a typical ~30 valid teacher dets/image ≈ 180 MB for both flip
        # variants); past it, new entries are recomputed per step instead
        # of cached (the _cached_pseudo fallback) and a warning is logged.
        self._pseudo_cache_bytes = 0
        self._pseudo_cache_budget = int(
            cfg.get("teacher_cache_budget_mb", 512)
        ) * (1 << 20)
        self._pseudo_cache_full = False
        self.eval_step = make_eval_step(self.model)
        self.cov_step = make_cov_step(self.model)
        self.roi_step = make_roi_extract_step(self.model)
        self.imp_step = make_importance_step(self.model, self.teacher_model)

        self.state = TrainState(
            params=self.params,
            batch_stats=self.batch_stats,
            opt_state=self.opt_state,
            step=jnp.zeros((), jnp.int32),
            teacher_params=self.teacher_params,
            replay_feats=self.replay_feats,
            replay_labels=self.replay_labels,
            ewc_terms=self.ewc_terms,
        )

    # ------------------------------------------------------------------
    def _load_checkpoint(self, path: str, params=None, stats=None):
        """Restore params/batch_stats from ``path`` into the given trees
        (defaults to the live ones — never into stale/donated arrays).

        ``.pth``/``.pt`` paths are treated as reference (mmdet torch)
        full-detector checkpoints and converted on the fly, so configs
        whose ``load_from`` points at a reference work-dir run unchanged.
        """
        if path.endswith((".pth", ".pt")):
            from ..utils.torch_convert import load_torch_detector

            params_flat, stats_flat = load_torch_detector(path)
            params = params if params is not None else self.params
            stats = stats if stats is not None else self.batch_stats
            self.params = ckpt_io.restore_into(params, params_flat, strict=False)
            self.batch_stats = ckpt_io.restore_into(stats, stats_flat, strict=False)
            return
        flat = ckpt_io.load_pytree_flat(path)
        params_flat = {k[7:]: v for k, v in flat.items() if k.startswith("params/")}
        stats_flat = {k[12:]: v for k, v in flat.items() if k.startswith("batch_stats/")}
        params = params if params is not None else self.params
        stats = stats if stats is not None else self.batch_stats
        self.params = ckpt_io.restore_into(params, params_flat, strict=False)
        if stats_flat:
            self.batch_stats = ckpt_io.restore_into(stats, stats_flat, strict=False)
        else:
            self.batch_stats = stats

    def _load_backbone(self, path: str):
        from ..utils.torch_convert import load_torch_resnet50

        params, stats = load_torch_resnet50(path)
        self.params = ckpt_io.restore_into(self.params, params, strict=False)
        self.batch_stats = ckpt_io.restore_into(self.batch_stats, stats, strict=False)
        logger.info(f"loaded torch backbone {path}")

    def _save_checkpoint(self, name: str, host_tree=None):
        """``host_tree`` lets the caller fetch the state once per epoch and
        share it across the epoch/best/resume writes — three separate
        device→host transfers of the full model otherwise dominate the
        inter-epoch wall time on a tunneled TPU."""
        tree = host_tree or {
            "params": self.state.params, "batch_stats": self.state.batch_stats
        }
        tree = {"params": tree["params"], "batch_stats": tree["batch_stats"]}
        path = osp.join(self.work_dir, name)
        if self._is_main():
            ckpt_io.save_pytree(path, tree)
        self._barrier("ckpt:" + name)
        return path

    def _fetch_host_state(self, with_slots: bool = False):
        """One batched device→host fetch of everything the per-epoch
        checkpoint writes need."""
        tree = {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
        }
        if with_slots:
            st = self.state.opt_state
            tree.update({
                f"opt_{f}": getattr(st, f)
                for f in st._fields
                if f not in ("transforms", "count")
            })
            tree["count"] = st.count
            tree["step"] = self.state.step
        return jax.device_get(tree)

    def _variables(self):
        return {"params": self.state.params, "batch_stats": self.state.batch_stats}

    # ------------------------------------------------------------------
    # ------------------------------------------------------------------
    # resume (any task). The reference forbids task>1 resume
    # (nsrunner_roi_replay.py:551) because ITS teacher is deep-copied
    # from the mutable `load_from` student; here every cross-task input
    # is rebuilt deterministically at __init__ from the PREVIOUS task's
    # on-disk artifacts — teacher_params from previous_dir's best ckpt,
    # NSGP transforms from covariance.npz, RePRE prototypes from
    # rois_etc.npz + mask.pkl, EWC rows from ewc_reg_terms_ewc.npz —
    # none of which a mid-task crash can corrupt. Resume therefore only
    # needs to restore the training-loop state proper (params,
    # batch_stats, optimizer slots, step, best-mAP watermark).
    # ------------------------------------------------------------------
    def _save_resume_state(self, epoch: int, host_tree=None, best_map=-1.0):
        # optimizer slot buffers, whatever the state type (NSCLState has
        # momentum; AdamNSCLState has mu/nu) — transforms are rebuilt from
        # the covariance artifact on restart, count is a scalar
        tree = host_tree or self._fetch_host_state(with_slots=True)
        tree = dict(tree)
        tree["epoch"] = np.asarray(epoch)
        # restoring the best-mAP watermark keeps a post-resume epoch from
        # overwriting a better pre-crash best_*.npz
        tree["best_map"] = np.asarray(float(best_map))
        ckpt_io.save_pytree(osp.join(self.work_dir, "resume_state.npz"), tree)

    def _try_resume(self) -> int:
        self._resumed_best = -1.0
        path = osp.join(self.work_dir, "resume_state.npz")
        if not (self.cfg.get("resume", False) and osp.exists(path)):
            return 0
        flat = ckpt_io.load_pytree_flat(path)
        pick = lambda pre, tmpl: ckpt_io.restore_into(
            tmpl, {k[len(pre):]: v for k, v in flat.items() if k.startswith(pre)}
        )
        params = pick("params/", self.state.params)
        stats = pick("batch_stats/", self.state.batch_stats)
        st = self.state.opt_state
        slots = {
            f: pick(f"opt_{f}/", getattr(st, f))
            for f in st._fields
            if f not in ("transforms", "count")
        }
        opt_state = st._replace(**slots, count=jnp.asarray(flat["count"]))
        self.state = self.state.replace(
            params=params, batch_stats=stats, opt_state=opt_state,
            step=jnp.asarray(flat["step"]),
        )
        self._resumed_best = float(flat.get("best_map", -1.0))
        epoch = int(flat["epoch"]) + 1
        logger.info(
            f"resumed from {path} at epoch {epoch} "
            f"(best mAP so far {self._resumed_best:.4f})"
        )
        return epoch

    # ------------------------------------------------------------------
    # teacher pseudo-label cache (task>1). The frozen teacher's labels
    # depend only on (image, flip); one pre-pass over both flip variants
    # replaces max_epochs-1 identical recomputes (~71 ms of a ~240 ms
    # task-2 step at batch 16 was teacher predict in round 2).
    # ------------------------------------------------------------------
    def _teacher_vars(self):
        return {
            "params": self.state.teacher_params,
            "batch_stats": self.state.batch_stats,
        }

    @staticmethod
    def _global_keys(meta):
        """(img_id, flip) key per row of the GLOBAL batch plan."""
        flips = getattr(meta, "flips", [False] * len(meta))
        return list(zip(list(meta), flips))

    def _fill_pseudo_cache(self, batch: DetBatch, keys):
        """Run the jitted teacher on the (device) batch and cache every
        global row; returns the device detections ready for the step.
        After ``_fetch`` the rows are global on every process, so all
        processes cache identically."""
        dets = self.teacher_step(self._teacher_vars(), batch)
        boxes = self._fetch(dets.boxes)
        scores = self._fetch(dets.scores)
        labels = self._fetch(dets.labels)
        valid = self._fetch(dets.valid)
        for i, key in enumerate(keys):
            if key in self._pseudo_cache:
                continue
            idx = np.where(valid[i])[0].astype(np.int32)
            entry = (
                np.ascontiguousarray(boxes[i][idx]),
                np.ascontiguousarray(scores[i][idx]),
                np.ascontiguousarray(labels[i][idx]),
                idx,
            )
            nbytes = sum(a.nbytes for a in entry)
            if self._pseudo_cache_bytes + nbytes > self._pseudo_cache_budget:
                if not self._pseudo_cache_full:
                    self._pseudo_cache_full = True
                    logger.warning(
                        "teacher pseudo-label cache budget reached "
                        f"({self._pseudo_cache_budget >> 20} MB at "
                        f"{len(self._pseudo_cache)} entries); further "
                        "images fall back to per-step teacher recompute "
                        "(raise teacher_cache_budget_mb to cache more)"
                    )
                continue
            self._pseudo_cache_bytes += nbytes
            self._pseudo_cache[key] = entry
        return dets

    def _cached_pseudo(self, batch: DetBatch, meta):
        """Assemble this batch's teacher detections from the cache,
        falling back to one live teacher run (which also fills the
        cache) when any row is missing."""
        keys = self._global_keys(meta)
        if any(k not in self._pseudo_cache for k in keys):
            return self._fill_pseudo_cache(batch, keys)
        # rebuild the GLOBAL rows, then shard like the batch itself
        P = self.det_cfg.max_per_img
        B = self.train_loader.loader.local_batch
        lo = self.train_loader.loader.shard_id * B
        local = keys[lo : lo + B]
        boxes = np.zeros((B, P, 4), np.float32)
        scores = np.zeros((B, P), np.float32)
        labels = np.full((B, P), -1, np.int32)
        valid = np.zeros((B, P), bool)
        for i, k in enumerate(local[:B]):
            b, s, l, idx = self._pseudo_cache[k]
            boxes[i][idx] = b
            scores[i][idx] = s
            labels[i][idx] = l
            valid[i][idx] = True
        return self._device_batch(InstanceArray(
            boxes=boxes, labels=labels, valid=valid, scores=scores,
        ))

    def _precompute_pseudo_labels(self):
        """Two deterministic passes (flip off / flip on) over the train
        set with the jitted teacher; fills the (img_id, flip) cache."""
        t0 = time.time()
        tl_cfg = self.cfg.get("train_dataloader", {})
        n_proc, proc_id = jax.process_count(), jax.process_index()
        for force_flip in (False, True):
            pre = DetLoader(
                self.train_dataset,
                batch_size=tl_cfg.get("batch_size", 16),
                scale=tuple(self.cfg.get("img_scale", (1000, 600))),
                training=False,
                gt_capacity=self.cfg.get("gt_capacity", 64),
                num_shards=n_proc,
                shard_id=proc_id,
                force_flip=force_flip,
            )
            for i, (batch, meta) in enumerate(PrefetchLoader(
                pre, buffer_size=2, transfer_fn=self._device_batch
            )):
                self._fill_pseudo_cache(batch, self._global_keys(meta))
                if i % 20 == 0:
                    # liveness heartbeat: this phase (teacher compile +
                    # two dataset passes) is otherwise silent for many
                    # minutes and external hang-watchdogs need signal
                    logger.info(
                        f"teacher prefill flip={force_flip} batch {i} "
                        f"({time.time() - t0:.0f}s)"
                    )
        logger.info(
            f"teacher pseudo-label cache: {len(self._pseudo_cache)} entries "
            f"in {time.time() - t0:.1f}s"
        )

    def _train_batch_step(self, batch: DetBatch, meta, key):
        """One optimizer step, routing the teacher through the cache
        when enabled."""
        if self.teacher_cache and self.state.teacher_params is not None:
            dets = self._cached_pseudo(batch, meta)
            return self.train_step(self.state, batch, key, dets)
        return self.train_step(self.state, batch, key)

    def train(self):
        rng = jax.random.PRNGKey(self.seed + 1)
        log_path = osp.join(self.work_dir, "scalars.json")
        start_epoch = self._try_resume()
        best_map = self._resumed_best
        profile_dir = self.cfg.get("profile_dir")
        if not self.is_trained:
            if self.teacher_cache and self.state.teacher_params is not None:
                self._precompute_pseudo_labels()
            log_f = open(log_path, "a")
            # Two differently-shaped train programs (the landscape /
            # portrait bucket canvases) must never be in flight at once:
            # async dispatch otherwise overlaps both programs' activation
            # workspaces and at batch-16 COCO canvases that exceeds HBM —
            # the worker dies with "TPU worker process crashed" after a
            # handful of alternations (reproduced 2026-08-19; bs8 or a
            # single bucket are fine). A scalar fetch on bucket switch
            # serializes the pipeline at ~one RTT per switch.
            prev_canvas, prev_sync = None, None
            for epoch in range(start_epoch, self.max_epochs):
                self.train_loader.set_epoch(epoch)
                for it, (batch, meta) in enumerate(self.train_loader):
                    if profile_dir and epoch == 0 and it == 10:
                        jax.profiler.start_trace(profile_dir)
                    if profile_dir and epoch == 0 and it == 15:
                        jax.profiler.stop_trace()
                        logger.info(f"profiler trace saved to {profile_dir}")
                    batch = self._device_batch(batch)
                    canvas = tuple(batch.images.shape[1:3])
                    if prev_canvas not in (None, canvas) and prev_sync is not None:
                        float(prev_sync)
                    prev_canvas = canvas
                    rng, key = jax.random.split(rng)
                    t0 = time.time()
                    self.state, metrics = self._train_batch_step(batch, meta, key)
                    prev_sync = metrics["loss"]
                    if it % 50 == 0:
                        metrics = {k: float(v) for k, v in metrics.items()}
                        lr = float(self.lr_schedule(int(self.state.step)))
                        dt = time.time() - t0
                        logger.info(
                            f"epoch {epoch} iter {it}/{len(self.train_loader)} "
                            f"lr {lr:.2e} "
                            + " ".join(f"{k}:{v:.4f}" for k, v in metrics.items())
                        )
                        log_f.write(json.dumps(
                            dict(epoch=epoch, iter=it, lr=lr, time=dt, **metrics)
                        ) + "\n")
                        log_f.flush()
                if prev_sync is not None:
                    float(prev_sync)  # train/eval programs: same hazard
                mAP = self.val()
                try:  # MemoryProfilerHook-style RSS logging (optional psutil)
                    import psutil

                    rss = psutil.Process().memory_info().rss / 2 ** 30
                    logger.info(f"epoch {epoch}: mAP {mAP:.4f} (host RSS {rss:.1f} GiB)")
                except ImportError:
                    logger.info(f"epoch {epoch}: mAP {mAP:.4f}")
                host_tree = self._fetch_host_state(with_slots=True)
                self._save_checkpoint(f"epoch_{epoch}.npz", host_tree=host_tree)
                self._save_resume_state(
                    epoch, host_tree=host_tree,
                    best_map=max(mAP, best_map),
                )
                last = osp.join(self.work_dir, f"epoch_{epoch - 1}.npz")
                if osp.exists(last):
                    os.remove(last)  # max_keep_ckpts=1
                if mAP > best_map:
                    for f in os.listdir(self.work_dir):
                        if f.startswith("best_"):
                            os.remove(osp.join(self.work_dir, f))
                    best_map = mAP
                    self._save_checkpoint(
                        f"best_mAP_epoch_{epoch}.npz", host_tree=host_tree
                    )

        if not self.is_trained:
            log_f.close()
        # post-training artifacts (nsrunner:589-593)
        self.calculate_save_importance()
        self.cal_fea_in()
        self.cal_rois()

    def _val_transfer(self, batch: DetBatch) -> DetBatch:
        """Device placement for val batches: shard over the mesh when the
        batch divides it (single-device eval on an 8-chip mesh wastes 7/8
        of the fleet), else replicate on the default device."""
        leaves = jax.tree.leaves(batch)
        if leaves and isinstance(leaves[0], jax.Array) and not isinstance(
            leaves[0], np.ndarray
        ):
            return batch
        if self.mesh is not None and (
            jax.process_count() > 1
            or batch.images.shape[0] % self.mesh.size == 0
        ):
            return self._device_batch(batch)
        return jax.tree.map(jnp.asarray, batch)

    def _device_batch(self, batch) -> DetBatch:
        leaves = jax.tree.leaves(batch)
        if leaves and isinstance(leaves[0], jax.Array) and not isinstance(
            leaves[0], np.ndarray
        ):
            return batch  # already transferred (PrefetchLoader transfer_fn)
        if jax.process_count() > 1 and self.mesh is not None:
            # each process holds its contiguous rows of the global batch;
            # assemble per-leaf global arrays over the full mesh (the
            # JAX-native analogue of DDP per-rank batches)
            from jax.sharding import NamedSharding, PartitionSpec as P

            sh = NamedSharding(self.mesh, P("data"))
            return jax.tree.map(
                lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
                batch,
            )
        batch = jax.tree.map(jnp.asarray, batch)
        if self.mesh is not None:
            batch = shard_batch(batch, self.mesh)
        return batch

    @staticmethod
    def _is_main() -> bool:
        return jax.process_index() == 0

    @staticmethod
    def _barrier(tag: str):
        """Cross-process sync so non-writer processes never read an
        artifact before process 0 finished writing it."""
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(tag)

    def _fetch(self, x) -> np.ndarray:
        """np.asarray that also works on multi-host global arrays (the
        reference's all_gather_different_shape analogue,
        nsrunner_roi_replay.py:73-105 — here shapes are static, so
        resharding to replicated is an all-gather)."""
        if jax.process_count() == 1 or getattr(x, "is_fully_addressable", True):
            return np.asarray(x)
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = jax.jit(lambda a: a, out_shardings=NamedSharding(self.mesh, P()))(x)
        return np.asarray(rep)

    # ------------------------------------------------------------------
    def val(self, dump_to: Optional[str] = None) -> float:
        """Run validation; with ``dump_to`` also pickle the per-image raw
        detections (img_id, boxes, scores, labels) for offline analysis —
        the reference's ``tools/test.py --out results.pkl`` DumpDetResults
        path (mmdet/evaluation/metrics/dump_det_results.py)."""
        detections, annotations = [], []
        dumped = [] if dump_to else None
        variables = self._variables()
        vis_budget = self.cfg.get("vis_images", 0)  # DetVisualizationHook
        for batch, img_ids in self.val_loader:
            n_real = len(img_ids)
            # upload normally happened in the PrefetchLoader worker
            # (transfer_fn=_val_transfer); this is the idempotent fallback
            # for plain DetLoader callers
            batch_dev = self._val_transfer(batch)
            dets = self.eval_step(variables, batch_dev)
            if vis_budget > 0 and jax.process_index() == 0:
                from ..visualization import DetLocalVisualizer

                vis = DetLocalVisualizer(
                    osp.join(self.work_dir, "vis_data"),
                    class_names=getattr(self.val_dataset, "classes", None),
                )
                # the batch is device-resident (PrefetchLoader uploads in
                # its worker; globally sharded under multi-process) —
                # route every read through _fetch, as for dets
                imgs_h = self._fetch(batch_dev.images)
                gtv_h = self._fetch(batch_dev.gt.valid)
                gtb_h = self._fetch(batch_dev.gt.boxes)
                gtl_h = self._fetch(batch_dev.gt.labels)
                for i in range(min(n_real, vis_budget)):
                    v = self._fetch(dets.valid)[i]
                    pred = dict(
                        boxes=self._fetch(dets.boxes)[i][v],
                        scores=self._fetch(dets.scores)[i][v],
                        labels=self._fetch(dets.labels)[i][v],
                    )
                    gv = gtv_h[i]
                    gt_panel = dict(
                        boxes=gtb_h[i][gv],
                        labels=gtl_h[i][gv],
                    )
                    vis.add_datasample(
                        str(img_ids[i]), imgs_h[i], pred, gt=gt_panel
                    )
                vis_budget -= n_real
            boxes = self._fetch(dets.boxes)
            scores = self._fetch(dets.scores)
            labels = self._fetch(dets.labels)
            valid = self._fetch(dets.valid)
            for i in range(n_real):
                per_cls = {}
                for c in range(self.det_cfg.num_classes):
                    m = valid[i] & (labels[i] == c)
                    per_cls[c] = (boxes[i][m], scores[i][m])
                detections.append(per_cls)
                if dumped is not None:
                    v = valid[i]
                    dumped.append(
                        dict(
                            img_id=img_ids[i],
                            boxes=np.asarray(boxes[i][v]),
                            scores=np.asarray(scores[i][v]),
                            labels=np.asarray(labels[i][v]),
                        )
                    )
            annotations.extend(self._val_annotations(img_ids))
        if dump_to and jax.process_index() == 0:
            import pickle

            with open(dump_to, "wb") as f:
                pickle.dump(dumped, f)
            logger.info(f"dumped {len(dumped)} per-image results to {dump_to}")
        metric = self.cfg.get("val_evaluator", {}).get("type", "VOCMetric")
        if metric == "CocoMetric":
            res = eval_coco_map(detections, annotations, self.det_cfg.num_classes)
            return res["mAP"]
        mode = self.cfg.get("val_evaluator", {}).get("eval_mode", "11points")
        mean_ap, _ = eval_voc_map(
            detections, annotations, self.det_cfg.num_classes, mode=mode
        )
        return mean_ap

    def _val_annotations(self, img_ids):
        by_id = getattr(self, "_val_ann_cache", None)
        if by_id is None:
            by_id = {r["img_id"]: r for r in self.val_dataset.records}
            self._val_ann_cache = by_id
        out = []
        for i in img_ids:
            r = by_id[i]
            out.append(
                dict(
                    boxes=r["boxes"],
                    labels=r["labels"],
                    difficult=r.get("difficult"),
                    ignore_boxes=r.get("ignore_boxes"),
                )
            )
        return out

    def test(self, dump_to: Optional[str] = None) -> float:
        mAP = self.val(dump_to=dump_to)
        logger.info(f"test mAP: {mAP:.4f}")
        # nsrunner test() also recomputes artifacts (:624-625)
        self.cal_fea_in()
        self.calculate_save_importance()
        return mAP

    # ------------------------------------------------------------------
    # artifact passes
    # ------------------------------------------------------------------
    def _reload_best(self):
        path = ckpt_io.find_checkpoint(self.work_dir, self.ckpt_keywords)
        if path:
            self._load_checkpoint(
                path, params=self.state.params, stats=self.state.batch_stats
            )
            self.state = self.state.replace(
                params=self.params, batch_stats=self.batch_stats
            )

    def cal_fea_in(self, max_batches: Optional[int] = None):
        """Input covariances over the train set (nsrunner:704-763)."""
        logger.info("cal_fea_in ...")
        self._reload_best()
        variables = self._variables()
        rng = jax.random.PRNGKey(self.seed + 2)
        total = None
        self.train_loader.set_epoch(0)
        for i, (batch, _) in enumerate(self.train_loader):
            if max_batches and i >= max_batches:
                break
            batch = self._device_batch(batch)
            rng, key = jax.random.split(rng)
            cov_tree = self.cov_step(variables, batch, key)
            cov = nsgp.cov_collection_to_param_names(cov_tree)
            # the reference only hooks modules outside ignore_keys
            # (nsrunner:731-732), so its covariance.pth holds backbone+neck
            # only — filter at save time for the same artifact contents
            cov = {
                k: v for k, v in cov.items()
                if not any(re.match(p, k) for p in self.ignore_keys)
            }
            total = nsgp.accumulate_cov(total, cov)
        total = {k: self._fetch(v) for k, v in (total or {}).items()}
        if self.task_id != 1:
            # accumulate onto the previous artifact (nsrunner:746-749);
            # keys present only in the previous covariance carry forward —
            # if ignore_keys change between tasks, old-task information
            # must not vanish from the artifact chain
            prev = ckpt_io.load_covariance(self.previous_dir)
            total = (
                dict(prev)
                | {k: v for k, v in total.items() if k not in prev}
                | {k: v + prev[k] for k, v in total.items() if k in prev}
            )
        if self._is_main():
            path = ckpt_io.save_covariance(self.work_dir, total)
            logger.info(f"covariance saved to {path}")
        self._barrier("covariance")

    def cal_rois(self, max_batches: Optional[int] = None):
        """RoI features for RePRE (nsrunner:776-868)."""
        logger.info("cal_rois ...")
        self._reload_best()
        variables = self._variables()
        rng = jax.random.PRNGKey(self.seed + 3)
        feats, cls_t, cls_w, bb_t, bb_w, rois = [], [], [], [], [], []
        self.train_loader.set_epoch(0)
        for i, (batch, _) in enumerate(self.train_loader):
            if max_batches and i >= max_batches:
                break
            batch = self._device_batch(batch)
            rng, key = jax.random.split(rng)
            out = self.roi_step(variables, batch, key)
            mid, labels, cw, tgt, bw, r, valid = [self._fetch(x) for x in out]
            feats.append(mid[valid])
            cls_t.append(labels[valid])
            cls_w.append(cw[valid])
            bb_t.append(tgt[valid])
            bb_w.append(bw[valid])
            rois.append(r[valid])
        arrays = [
            np.concatenate(feats), np.concatenate(cls_t), np.concatenate(cls_w),
            np.concatenate(bb_t), np.concatenate(bb_w), np.concatenate(rois),
        ]
        if self.reserve_per_class:
            arrays = replay.subsample_per_class(
                arrays, arrays[1], self.reserve_per_class,
                num_classes=self.det_cfg.num_classes,
            )
        if self.task_id != 1:
            prev = ckpt_io.load_rois_etc(self.previous_dir)
            arrays = [np.concatenate([p, a]) for p, a in zip(prev, arrays)]
        if self._is_main():
            path = ckpt_io.save_rois_etc(self.work_dir, arrays)
            logger.info(f"rois_etc saved to {path} ({len(arrays[0])} features)")
        self._barrier("rois_etc")

    def calculate_save_importance(self, max_batches: Optional[int] = None):
        """EWC Fisher diagonal over the train set (nsrunner:946-990)."""
        logger.info("cal importance ...")
        rng = jax.random.PRNGKey(self.seed + 4)
        importance = ewc_lib.init_importance(self.state.params)
        n_batches = len(self.train_loader)
        self.train_loader.set_epoch(0)
        for i, (batch, _) in enumerate(self.train_loader):
            if max_batches and i >= max_batches:
                break
            batch = self._device_batch(batch)
            rng, key = jax.random.split(rng)
            grads = self.imp_step(self.state, batch, key)
            importance = ewc_lib.accumulate_importance(
                importance, grads, batch.images.shape[0], n_batches
            )
        terms = ewc_lib.append_task_terms(
            dict(self.state.ewc_terms), importance, self.state.params
        )
        if self._is_main():
            path = ckpt_io.save_ewc_terms(self.work_dir, terms)
            logger.info(f"EWC terms saved to {path}")
        self._barrier("ewc_terms")


class TeacherRunner(NullSpaceRunner):
    """Teacher-only baseline — no NSGP projections, no EWC, no artifact
    computation (teacherrunner.py:65)."""

    def __init__(self, cfg: Config):
        super().__init__(cfg, use_nsgp=False)

    def train(self):
        best_map = -1.0
        rng = jax.random.PRNGKey(self.seed + 1)
        for epoch in range(self.max_epochs):
            self.train_loader.set_epoch(epoch)
            for it, (batch, _) in enumerate(self.train_loader):
                batch = self._device_batch(batch)
                rng, key = jax.random.split(rng)
                self.state, metrics = self.train_step(self.state, batch, key)
                if it % 50 == 0:
                    logger.info(
                        f"epoch {epoch} iter {it}: "
                        + " ".join(f"{k}:{float(v):.4f}" for k, v in metrics.items())
                    )
            mAP = self.val()
            self._save_checkpoint(f"epoch_{epoch}.npz")
            if mAP > best_map:
                best_map = mAP
                self._save_checkpoint(f"best_mAP_epoch_{epoch}.npz")


def dataclass_replace(dc, **kw):
    import dataclasses

    return dataclasses.replace(dc, **kw)


def _leaf_dataset(ds_cfg: Config) -> Config:
    """Unwrap RepeatDataset/ConcatDataset nesting in reference configs."""
    cur = ds_cfg
    while cur.get("type") in ("RepeatDataset", "ConcatDataset"):
        if cur.get("type") == "RepeatDataset":
            cur = cur.get("dataset", {})
        else:
            datasets = cur.get("datasets", [])
            cur = datasets[0] if datasets else {}
    return cur


def _dataset_repeat(ds_cfg: Config) -> int:
    if ds_cfg.get("type") == "RepeatDataset":
        return ds_cfg.get("times", 1)
    return 1
