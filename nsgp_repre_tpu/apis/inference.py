"""User-facing inference APIs.

Parity targets: mmdet/apis/inference.py:26 (``init_detector``), :122
(``inference_detector``) and mmdet/apis/det_inferencer.py:45
(``DetInferencer``) — config+checkpoint → model; single-image or batch
prediction through the test pipeline; visualization hooks.
"""
from __future__ import annotations

import os.path as osp
from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..datasets.loader import load_image, resize_keep_ratio, _round_up
from ..engine.runner import detector_config_from_cfg
from ..engine.train import make_eval_step
from ..models.detector import FasterRCNN
from ..structures.sample import DetBatch, InstanceArray
from ..utils import checkpoint as ckpt_io
from ..utils.config import Config, load_config


class Detector:
    """A loaded model + its jitted predict step."""

    def __init__(self, model: FasterRCNN, variables, img_scale=(1000, 600)):
        self.model = model
        self.variables = variables
        self.img_scale = img_scale
        self._eval_step = make_eval_step(model)
        self.classes: Optional[Sequence[str]] = None

    def predict_batch(self, batch: DetBatch) -> InstanceArray:
        return self._eval_step(self.variables, batch)


def init_detector(
    config: Union[str, Config],
    checkpoint: Optional[str] = None,
    img_scale: Optional[Tuple[int, int]] = None,
) -> Detector:
    """Build a detector from a config file (+ optional checkpoint)."""
    cfg = load_config(config) if isinstance(config, str) else config
    det_cfg = detector_config_from_cfg(cfg)
    model = FasterRCNN(config=det_cfg)
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), dummy)
    params, stats = variables["params"], variables.get("batch_stats", {})
    if checkpoint and checkpoint.endswith((".pth", ".pt")):
        # a reference (mmdet torch) checkpoint — convert in place
        from ..utils.torch_convert import load_torch_detector

        params_flat, stats_flat = load_torch_detector(checkpoint)
        params = ckpt_io.restore_into(params, params_flat, strict=False)
        stats = ckpt_io.restore_into(stats, stats_flat, strict=False)
    elif checkpoint:
        flat = ckpt_io.load_pytree_flat(checkpoint)
        params = ckpt_io.restore_into(
            params, {k[7:]: v for k, v in flat.items() if k.startswith("params/")},
            strict=False,
        )
        stats = ckpt_io.restore_into(
            stats, {k[12:]: v for k, v in flat.items() if k.startswith("batch_stats/")},
            strict=False,
        )
    scale = img_scale or tuple(cfg.get("img_scale", (1000, 600)))
    return Detector(model, {"params": params, "batch_stats": stats}, scale)


def _pack_images(detector: Detector, imgs: List[np.ndarray]) -> DetBatch:
    """Resize keep-ratio and pad each image onto one static canvas."""
    long_side, short_side = max(detector.img_scale), min(detector.img_scale)
    bh, bw = _round_up(long_side), _round_up(long_side)
    B = len(imgs)
    # use a square canvas covering both orientations for the demo API
    images = np.zeros((B, _round_up(short_side) if all(
        i.shape[1] >= i.shape[0] for i in imgs
    ) else bh, bw, 3), np.uint8)
    bh = images.shape[1]
    img_shape = np.zeros((B, 2), np.int32)
    ori_shape = np.zeros((B, 2), np.int32)
    scale_factor = np.ones((B, 2), np.float32)
    for i, img in enumerate(imgs):
        resized, _, (ws, hs) = resize_keep_ratio(
            img, np.zeros((0, 4), np.float32), detector.img_scale
        )
        h, w = resized.shape[:2]
        h, w = min(h, bh), min(w, bw)
        images[i, :h, :w] = resized[:h, :w]
        img_shape[i] = (h, w)
        ori_shape[i] = img.shape[:2]
        scale_factor[i] = (ws, hs)
    cap = 1
    return DetBatch(
        images=jnp.asarray(images),
        img_shape=jnp.asarray(img_shape),
        ori_shape=jnp.asarray(ori_shape),
        scale_factor=jnp.asarray(scale_factor),
        gt=InstanceArray(
            boxes=jnp.zeros((B, cap, 4), jnp.float32),
            labels=jnp.full((B, cap), -1, jnp.int32),
            valid=jnp.zeros((B, cap), bool),
        ),
    )


def inference_detector(
    detector: Detector,
    imgs: Union[str, np.ndarray, List[Union[str, np.ndarray]]],
    score_thr: float = 0.0,
) -> Union[dict, List[dict]]:
    """Run inference; returns dict(boxes, scores, labels) per image in
    ORIGINAL image coordinates (rescale=True like the reference)."""
    single = not isinstance(imgs, (list, tuple))
    if single:
        imgs = [imgs]
    arrays = [load_image(i) if isinstance(i, str) else i for i in imgs]
    batch = _pack_images(detector, arrays)
    dets = detector.predict_batch(batch)
    out = []
    for i in range(len(arrays)):
        valid = np.asarray(dets.valid[i]) & (np.asarray(dets.scores[i]) >= score_thr)
        out.append(
            dict(
                boxes=np.asarray(dets.boxes[i])[valid],
                scores=np.asarray(dets.scores[i])[valid],
                labels=np.asarray(dets.labels[i])[valid],
            )
        )
    return out[0] if single else out


class DetInferencer:
    """Config-driven inferencer (det_inferencer.py:45 surface)."""

    def __init__(
        self,
        model: Union[str, Config],
        weights: Optional[str] = None,
        pred_score_thr: float = 0.3,
    ):
        self.detector = init_detector(model, weights)
        self.pred_score_thr = pred_score_thr

    def __call__(
        self,
        inputs: Union[str, np.ndarray, List],
        out_dir: str = "",
        no_save_vis: bool = False,
        return_vis: bool = False,
    ) -> dict:
        single = not isinstance(inputs, (list, tuple))
        items = [inputs] if single else list(inputs)
        # items is always a list here, so this returns a list of dicts
        predictions = inference_detector(
            self.detector, items, score_thr=self.pred_score_thr
        )
        visualizations = []
        if out_dir and not no_save_vis:
            import os

            from ..visualization import draw_detections

            os.makedirs(out_dir, exist_ok=True)
            for i, (item, pred) in enumerate(zip(items, predictions)):
                img = load_image(item) if isinstance(item, str) else item
                vis = draw_detections(img, pred, class_names=self.detector.classes)
                name = (
                    osp.basename(item) if isinstance(item, str) else f"{i}.jpg"
                )
                _save_image(osp.join(out_dir, name), vis)
                if return_vis:
                    visualizations.append(vis)
        return dict(predictions=predictions, visualization=visualizations)


def _save_image(path: str, img: np.ndarray):
    try:
        import cv2

        cv2.imwrite(path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    except ImportError:  # pragma: no cover
        from PIL import Image

        Image.fromarray(img).save(path)
