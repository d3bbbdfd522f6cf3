import jax.numpy as jnp
import numpy as np
import pytest

from nsgp_repre_tpu.structures import (
    bbox2delta,
    bbox_clip,
    bbox_flip,
    bbox_overlaps,
    delta2bbox,
    pad_instances,
)


def test_bbox_overlaps_basic():
    a = jnp.array([[0.0, 0.0, 10.0, 10.0], [5.0, 5.0, 15.0, 15.0]])
    b = jnp.array([[0.0, 0.0, 10.0, 10.0], [100.0, 100.0, 110.0, 110.0]])
    iou = bbox_overlaps(a, b)
    assert iou.shape == (2, 2)
    np.testing.assert_allclose(iou[0, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(iou[0, 1], 0.0, atol=1e-6)
    # inter = 5*5=25, union = 100+100-25=175
    np.testing.assert_allclose(iou[1, 0], 25.0 / 175.0, rtol=1e-5)


def test_bbox_overlaps_iof():
    a = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.array([[0.0, 0.0, 5.0, 10.0]])
    iof = bbox_overlaps(a, b, mode="iof")
    np.testing.assert_allclose(iof[0, 0], 0.5, rtol=1e-5)


def test_bbox_overlaps_padded_zero_boxes():
    a = jnp.zeros((3, 4))
    b = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    iou = bbox_overlaps(a, b)
    np.testing.assert_allclose(iou, 0.0, atol=1e-6)


def test_delta_coder_roundtrip():
    rng = np.random.RandomState(0)
    proposals = rng.uniform(0, 100, size=(20, 2)).astype(np.float32)
    proposals = np.concatenate([proposals, proposals + rng.uniform(5, 60, (20, 2)).astype(np.float32)], axis=1)
    gts = rng.uniform(0, 100, size=(20, 2)).astype(np.float32)
    gts = np.concatenate([gts, gts + rng.uniform(5, 60, (20, 2)).astype(np.float32)], axis=1)
    means = (0.0, 0.0, 0.0, 0.0)
    stds = (0.1, 0.1, 0.2, 0.2)
    deltas = bbox2delta(jnp.asarray(proposals), jnp.asarray(gts), means, stds)
    rec = delta2bbox(jnp.asarray(proposals), deltas, means, stds)
    np.testing.assert_allclose(np.asarray(rec), gts, rtol=1e-3, atol=5e-3)


def test_delta2bbox_clip_and_ratio():
    rois = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    # huge dw should be clamped by wh_ratio_clip
    deltas = jnp.array([[0.0, 0.0, 50.0, 0.0]])
    out = delta2bbox(rois, deltas, max_shape=(20, 20))
    assert float(out[0, 0]) >= 0.0 and float(out[0, 2]) <= 20.0


def test_bbox_flip_involution():
    boxes = jnp.array([[10.0, 20.0, 30.0, 40.0]])
    flipped = bbox_flip(boxes, (100, 200))
    back = bbox_flip(flipped, (100, 200))
    np.testing.assert_allclose(np.asarray(back), np.asarray(boxes))
    # flipped box is still x1 < x2
    assert float(flipped[0, 0]) < float(flipped[0, 2])


def test_bbox_clip():
    boxes = jnp.array([[-5.0, -5.0, 300.0, 50.0]])
    out = bbox_clip(boxes, (100, 200))
    np.testing.assert_allclose(np.asarray(out), [[0.0, 0.0, 200.0, 50.0]])


def test_pad_instances():
    inst = pad_instances(
        np.array([[0, 0, 5, 5], [1, 1, 2, 2]], dtype=np.float32),
        np.array([3, 7]),
        capacity=4,
    )
    assert inst.boxes.shape == (4, 4)
    assert int(inst.num_valid()) == 2
    assert inst.labels[2] == -1
