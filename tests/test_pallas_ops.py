"""Pallas kernel correctness on CPU via interpret mode (the TPU-compiled
path is exercised by bench.py / the TPU smoke runs)."""
import jax
import jax.numpy as jnp
import numpy as np

from nsgp_repre_tpu.ops.nms import nms as nms_xla
from nsgp_repre_tpu.ops.nms_pallas import nms_pallas


def test_nms_pallas_matches_xla_interpret():
    rng = np.random.RandomState(0)
    B, N, K = 2, 128, 16
    xy = rng.uniform(0, 80, (B, N, 2)).astype(np.float32)
    wh = rng.uniform(5, 40, (B, N, 2)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    scores = jnp.asarray(rng.rand(B, N).astype(np.float32))
    valid = jnp.asarray(rng.rand(B, N) > 0.1)

    ix, kx = jax.vmap(lambda b, s, v: nms_xla(b, s, v, 0.6, K))(boxes, scores, valid)
    ip, kp = nms_pallas(boxes, scores, valid, 0.6, K, interpret=True)
    np.testing.assert_array_equal(np.asarray(kx), np.asarray(kp))
    # compare selected indices only on valid slots
    for b in range(B):
        np.testing.assert_array_equal(
            np.asarray(ix[b])[np.asarray(kx[b])], np.asarray(ip[b])[np.asarray(kp[b])]
        )


def test_visualizer_draws():
    from nsgp_repre_tpu.visualization import draw_detections

    img = np.zeros((50, 60, 3), np.uint8)
    pred = dict(
        boxes=np.array([[5, 5, 30, 30]], np.float32),
        scores=np.array([0.9]),
        labels=np.array([2]),
    )
    out = draw_detections(img, pred, class_names=["a", "b", "c"], score_thr=0.5)
    assert out.shape == img.shape
    assert out.sum() > 0  # something was drawn
    # below-threshold boxes aren't drawn
    out2 = draw_detections(img, pred, score_thr=0.95)
    assert out2.sum() == 0
