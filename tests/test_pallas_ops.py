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


def _roi_fixture(seed=0, B=2, C=32, R=16, canvas=(256, 384)):
    """FPN pyramid + a roi mix spanning all levels (none window-bumped)."""
    rng = np.random.RandomState(seed)
    H, W = canvas
    strides = (4, 8, 16, 32)
    feats = [
        jnp.asarray(rng.randn(B, H // s, W // s, C).astype(np.float32))
        for s in strides
    ]
    # sides 20..160 px → levels 0..2 plus clamped-small maps at 3
    x1 = rng.uniform(0, W - 170, R).astype(np.float32)
    y1 = rng.uniform(0, H - 170, R).astype(np.float32)
    side_w = rng.uniform(20, 160, R).astype(np.float32)
    side_h = rng.uniform(20, 160, R).astype(np.float32)
    rois = jnp.asarray(np.stack([x1, y1, x1 + side_w, y1 + side_h], -1))
    bidx = jnp.asarray(rng.randint(0, B, R).astype(np.int32))
    return feats, rois, bidx, strides


def test_roi_align_window_interpret_parity():
    """Pallas windowed RoIAlign == XLA gather path with the kernel's own
    level routing (bit-level bilinear semantics, all levels exercised)."""
    from nsgp_repre_tpu.ops.roi_align import multilevel_roi_align
    from nsgp_repre_tpu.ops.roi_align_pallas import (
        multilevel_roi_align_window,
        route_levels,
    )

    feats, rois, bidx, strides = _roi_fixture()
    out_p = multilevel_roi_align_window(
        feats, rois, bidx, strides=strides, interpret=True
    )
    lvl = route_levels(
        rois, tuple((f.shape[1], f.shape[2]) for f in feats), strides, 7, 2, 56.0
    )
    out_x = multilevel_roi_align(
        feats, rois, bidx, strides=strides, lvl_override=lvl
    )
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_x), rtol=1e-4, atol=1e-4
    )
    # routing only deviates from mmdet when a window would not fit —
    # none of these rois bump
    base = multilevel_roi_align(feats, rois, bidx, strides=strides)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(base), rtol=1e-4, atol=1e-4
    )


def test_roi_align_window_grad_and_padding():
    """custom-VJP backward is the exact transpose; roi-count padding to
    the kernel tile is transparent."""
    from nsgp_repre_tpu.ops.roi_align import multilevel_roi_align
    from nsgp_repre_tpu.ops.roi_align_pallas import (
        multilevel_roi_align_window,
        route_levels,
    )

    feats, rois, bidx, strides = _roi_fixture(seed=1, R=13)  # non-multiple of 8
    cot = jnp.asarray(
        np.random.RandomState(2).randn(13, 7, 7, 32).astype(np.float32)
    )

    def f_win(fs):
        out = multilevel_roi_align_window(
            fs, rois, bidx, strides=strides, interpret=True
        )
        return (out * cot).sum()

    lvl = route_levels(
        rois, tuple((f.shape[1], f.shape[2]) for f in feats), strides, 7, 2, 56.0
    )

    def f_ref(fs):
        out = multilevel_roi_align(
            fs, rois, bidx, strides=strides, lvl_override=lvl
        )
        return (out * cot).sum()

    v_win, g_win = jax.value_and_grad(f_win)(feats)
    v_ref, g_ref = jax.value_and_grad(f_ref)(feats)
    np.testing.assert_allclose(float(v_win), float(v_ref), rtol=1e-4)
    for gw, gr in zip(g_win, g_ref):
        np.testing.assert_allclose(
            np.asarray(gw), np.asarray(gr), rtol=1e-4, atol=1e-4
        )


def test_roi_align_bwd_pallas_interpret_parity():
    """Pallas read-modify-write backward == the XLA scatter transpose,
    all four levels receiving gradient."""
    from nsgp_repre_tpu.ops.roi_align import multilevel_roi_align
    from nsgp_repre_tpu.ops.roi_align_pallas import (
        multilevel_roi_align_bwd_pallas,
        route_levels,
    )

    feats, rois, bidx, strides = _roi_fixture(seed=3)
    # add big rois so levels 2-3 are exercised too (sqrt(area) >= 224)
    big = jnp.asarray(
        [[0.0, 0.0, 230.0, 240.0], [10.0, 5.0, 370.0, 250.0]] * 4,
        jnp.float32,
    )
    rois = jnp.concatenate([rois[:8], big])
    level_hw = tuple((f.shape[1], f.shape[2]) for f in feats)
    lvl = route_levels(rois, level_hw, strides, 7, 2, 56.0)
    assert int(lvl.max()) >= 2
    g = jnp.asarray(
        np.random.RandomState(4).randn(16, 7, 7, 32).astype(np.float32)
    )

    def ref(fs):
        return multilevel_roi_align(
            fs, rois, bidx, strides=strides, lvl_override=lvl
        )

    _, vjp = jax.vjp(ref, feats)
    g_ref = vjp(g)[0]
    g_pal = multilevel_roi_align_bwd_pallas(
        g, rois, bidx, level_hw, 2, strides=strides, interpret=True
    )
    for a, b in zip(g_pal, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )


def test_rpn_assign_pallas_matches_xla_interpret():
    """Fused assign+targets kernel == max_iou_assign + one-hot matmul +
    bbox2delta, including low-quality claims, ties, padded gts and
    invalid anchors."""
    from nsgp_repre_tpu.models.assigners import max_iou_assign
    from nsgp_repre_tpu.ops.assign_pallas import rpn_assign_targets_pallas
    from nsgp_repre_tpu.structures.boxes import bbox2delta

    rng = np.random.RandomState(0)
    B, G, N = 3, 5, 700
    xy = rng.uniform(0, 80, (N, 2)).astype(np.float32)
    wh = rng.uniform(4, 40, (N, 2)).astype(np.float32)
    anchors = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    gxy = rng.uniform(0, 80, (B, G, 2)).astype(np.float32)
    gwh = rng.uniform(4, 50, (B, G, 2)).astype(np.float32)
    gt_boxes = jnp.asarray(np.concatenate([gxy, gxy + gwh], -1))
    # duplicate a gt-box to force exact IoU ties in the claim logic
    gt_boxes = gt_boxes.at[:, 1].set(gt_boxes[:, 0])
    gt_valid = jnp.asarray(rng.rand(B, G) > 0.3)
    prior_valid = jnp.asarray(rng.rand(B, N) > 0.1)

    assigned_p, maxov_p, tgt_p = rpn_assign_targets_pallas(
        anchors, gt_boxes, gt_valid, prior_valid, 0.7, 0.3, 0.3,
        interpret=True,
    )

    def one(gb, gv, pv):
        assigned, maxov = max_iou_assign(
            anchors, gb, gv, 0.7, 0.3, 0.3,
            match_low_quality=True, prior_valid=pv,
        )
        g = jnp.clip(assigned, 0)
        onehot = jax.nn.one_hot(g, G, dtype=jnp.float32)
        tgt = bbox2delta(anchors, onehot @ gb)
        return assigned, maxov, tgt

    assigned_x, maxov_x, tgt_x = jax.vmap(one)(gt_boxes, gt_valid, prior_valid)
    np.testing.assert_array_equal(np.asarray(assigned_p), np.asarray(assigned_x))
    np.testing.assert_allclose(
        np.asarray(maxov_p), np.asarray(maxov_x), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(tgt_p), np.asarray(tgt_x), rtol=1e-4, atol=1e-5
    )


def test_rpn_assign_pallas_large_gt_capacity():
    """task>=2 appends teacher pseudo-label slots to the gt capacity
    (G~=132): the kernel must shrink its lane tile to stay under the
    scoped-VMEM limit and still match the XLA path (regression for the
    Gp=136 compile-time OOM)."""
    from nsgp_repre_tpu.models.assigners import max_iou_assign
    from nsgp_repre_tpu.ops.assign_pallas import rpn_assign_targets_pallas

    rng = np.random.RandomState(1)
    B, G, N = 2, 132, 3000
    xy = rng.uniform(0, 600, (N, 2)).astype(np.float32)
    wh = rng.uniform(4, 200, (N, 2)).astype(np.float32)
    anchors = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    gxy = rng.uniform(0, 600, (B, G, 2)).astype(np.float32)
    gwh = rng.uniform(4, 200, (B, G, 2)).astype(np.float32)
    gt_boxes = jnp.asarray(np.concatenate([gxy, gxy + gwh], -1))
    gt_valid = jnp.asarray(rng.rand(B, G) > 0.4)
    prior_valid = jnp.ones((B, N), bool)

    assigned_p, maxov_p, _ = rpn_assign_targets_pallas(
        anchors, gt_boxes, gt_valid, prior_valid, 0.7, 0.3, 0.3,
        interpret=True,
    )
    assigned_x, maxov_x = jax.vmap(
        lambda gb, gv, pv: max_iou_assign(
            anchors, gb, gv, 0.7, 0.3, 0.3,
            match_low_quality=True, prior_valid=pv,
        )
    )(gt_boxes, gt_valid, prior_valid)
    np.testing.assert_array_equal(np.asarray(assigned_p), np.asarray(assigned_x))
    np.testing.assert_allclose(
        np.asarray(maxov_p), np.asarray(maxov_x), rtol=1e-6, atol=1e-6
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


def test_roi_align_small_window_classification():
    """The (SWY, SWX) small-window fast path must trigger for naturally
    routed rois and stay off for giants — and both paths must agree with
    the XLA reference (covered above; here we pin the classifier)."""
    import jax.numpy as jnp

    from nsgp_repre_tpu.ops.roi_align_pallas import (
        SWX, SWY, _route_and_weights,
    )

    # level maps larger than the big window, so origins don't clamp to 0
    # (clamped tiny maps legitimately classify everything big)
    feats, rois, bidx, strides = _roi_fixture(seed=7, canvas=(512, 768))
    big = jnp.asarray([[0.0, 0.0, 500.0, 400.0]], jnp.float32)
    rois = jnp.concatenate([rois[:15], big])
    bidx = jnp.concatenate([bidx[:15], bidx[:1]])
    level_hw = tuple((f.shape[1], f.shape[2]) for f in feats)
    lvl, oy, ox, wy, wx, ey, ex = _route_and_weights(
        rois, bidx, level_hw, strides, 7, 2, 56.0
    )
    small = (ey <= SWY) & (ex <= SWX)
    assert bool(small[:15].any()), "no roi took the small-window path"
    assert not bool(small[-1]), "a 500px roi classified small"
    # extents never exceed the DMA'd window
    import numpy as np

    assert int(np.asarray(ey).max()) <= 48 and int(np.asarray(ex).max()) <= 48


def test_roi_align_dense_levels_parity():
    """blocked_images=True pools coarse (sub-DENSE_MAX_HW) levels with
    full-map matmuls; results and gradients must match the XLA gather
    reference exactly (same routing, no window bumps at these sizes)."""
    import jax
    import jax.numpy as jnp

    from nsgp_repre_tpu.ops.roi_align import multilevel_roi_align
    from nsgp_repre_tpu.ops.roi_align_pallas import (
        _dense_levels,
        multilevel_roi_align_bwd_pallas,
        multilevel_roi_align_window,
        route_levels,
    )

    rng = np.random.RandomState(11)
    B, C = 2, 32
    strides = (4, 8, 16, 32)
    H, W = 256, 384
    feats = [
        jnp.asarray(rng.randn(B, H // s, W // s, C).astype(np.float32))
        for s in strides
    ]
    level_hw = tuple((f.shape[1], f.shape[2]) for f in feats)
    # image-major blocked rois, 8 per image, spanning all levels
    G = 8
    rois_np = []
    for b in range(B):
        x1 = rng.uniform(0, W - 200, G)
        y1 = rng.uniform(0, H - 200, G)
        sw = rng.uniform(20, 190, G)
        sh = rng.uniform(20, 190, G)
        rois_np.append(np.stack([x1, y1, x1 + sw, y1 + sh], -1))
    rois = jnp.asarray(np.concatenate(rois_np).astype(np.float32))
    bidx = jnp.asarray(np.repeat(np.arange(B), G).astype(np.int32))
    assert _dense_levels(level_hw, B, B * G, True), "no dense level hit"

    out_d = multilevel_roi_align_window(
        feats, rois, bidx, strides=strides, blocked_images=True,
        interpret=True,
    )
    lvl = route_levels(rois, level_hw, strides, 7, 2, 56.0)
    out_ref = multilevel_roi_align(
        feats, rois, bidx, strides=strides, lvl_override=lvl
    )
    np.testing.assert_allclose(
        np.asarray(out_d), np.asarray(out_ref), rtol=1e-4, atol=1e-4
    )

    g = jnp.asarray(rng.randn(B * G, 7, 7, C).astype(np.float32))

    def ref(fs):
        return multilevel_roi_align(
            fs, rois, bidx, strides=strides, lvl_override=lvl
        )

    _, vjp = jax.vjp(ref, feats)
    g_ref = vjp(g)[0]
    g_d = multilevel_roi_align_bwd_pallas(
        g, rois, bidx, level_hw, B, strides=strides,
        blocked_images=True, interpret=True,
    )
    for a, b in zip(g_d, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )
