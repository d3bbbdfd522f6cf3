import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsgp_repre_tpu.ops import (
    AnchorGenerator,
    batched_nms,
    multilevel_roi_align,
    nms,
    roi_align,
)


class TestAnchors:
    def test_base_anchor_shapes(self):
        gen = AnchorGenerator()
        assert gen.num_base_priors == 3
        for base in gen.base_anchors:
            assert base.shape == (3, 4)

    def test_base_anchor_values_stride16(self):
        # stride 16, scale 8 → ratio=1 anchor is 128x128 centered at 0
        gen = AnchorGenerator()
        base = gen.base_anchors[2]  # stride 16
        sq = base[1]  # ratio=1.0
        np.testing.assert_allclose(sq, [-64, -64, 64, 64], atol=1e-4)
        # ratio 0.5 → w = 128/sqrt(0.5), h = 128*sqrt(0.5)
        w = base[0, 2] - base[0, 0]
        h = base[0, 3] - base[0, 1]
        np.testing.assert_allclose(w / h, 2.0, rtol=1e-5)
        np.testing.assert_allclose(w * h, 128 * 128, rtol=1e-4)

    def test_grid_anchors(self):
        gen = AnchorGenerator(strides=(4,), ratios=(1.0,), scales=(8.0,))
        anchors = gen.grid_anchors([(2, 3)])[0]
        assert anchors.shape == (6, 4)
        # second anchor shifted by one stride in x
        np.testing.assert_allclose(anchors[1] - anchors[0], [4, 0, 4, 0])
        np.testing.assert_allclose(anchors[3] - anchors[0], [0, 4, 0, 4])

    def test_valid_flags(self):
        gen = AnchorGenerator(strides=(4,), ratios=(1.0,), scales=(8.0,))
        flags = gen.valid_flags([(4, 4)], (8, 16))[0]
        # valid rows = ceil(8/4)=2, cols = 4
        assert flags.sum() == 2 * 4


class TestNMS:
    def test_simple_suppression(self):
        boxes = jnp.array(
            [
                [0, 0, 10, 10],
                [1, 1, 11, 11],  # overlaps box 0 heavily
                [50, 50, 60, 60],
            ],
            dtype=jnp.float32,
        )
        scores = jnp.array([0.9, 0.8, 0.7])
        valid = jnp.ones(3, dtype=bool)
        idx, keep = nms(boxes, scores, valid, iou_threshold=0.5, max_out=3)
        assert keep.tolist() == [True, True, False]
        assert idx[0] == 0 and idx[1] == 2

    def test_respects_valid_mask(self):
        boxes = jnp.array([[0, 0, 10, 10], [50, 50, 60, 60]], dtype=jnp.float32)
        scores = jnp.array([0.9, 0.8])
        valid = jnp.array([False, True])
        idx, keep = nms(boxes, scores, valid, 0.5, 2)
        assert keep.tolist() == [True, False]
        assert idx[0] == 1

    def test_batched_nms_classes_dont_suppress(self):
        boxes = jnp.array([[0, 0, 10, 10], [0, 0, 10, 10]], dtype=jnp.float32)
        scores = jnp.array([0.9, 0.8])
        idxs = jnp.array([0, 1])
        valid = jnp.ones(2, dtype=bool)
        _, keep = batched_nms(boxes, scores, idxs, valid, 0.5, 2)
        assert keep.sum() == 2

    def test_matches_reference_greedy(self):
        rng = np.random.RandomState(0)
        n = 64
        xy = rng.uniform(0, 50, (n, 2)).astype(np.float32)
        wh = rng.uniform(5, 30, (n, 2)).astype(np.float32)
        boxes = np.concatenate([xy, xy + wh], axis=1)
        scores = rng.uniform(0, 1, n).astype(np.float32)

        # reference numpy greedy NMS
        def np_nms(b, s, thr):
            order = np.argsort(-s)
            keep = []
            sup = np.zeros(n, bool)
            for i in order:
                if sup[i]:
                    continue
                keep.append(i)
                xx1 = np.maximum(b[i, 0], b[:, 0])
                yy1 = np.maximum(b[i, 1], b[:, 1])
                xx2 = np.minimum(b[i, 2], b[:, 2])
                yy2 = np.minimum(b[i, 3], b[:, 3])
                inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
                a_i = (b[i, 2] - b[i, 0]) * (b[i, 3] - b[i, 1])
                a_j = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
                iou = inter / (a_i + a_j - inter)
                sup |= iou > thr
            return keep

        expect = np_nms(boxes, scores, 0.5)
        idx, keep = nms(jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(n, bool), 0.5, n)
        got = [int(i) for i, k in zip(idx, keep) if k]
        assert got == expect


class TestRoIAlign:
    def test_constant_map(self):
        # constant feature → pooled output equals that constant
        f = jnp.full((1, 16, 16, 8), 3.5)
        rois = jnp.array([[4.0, 4.0, 12.0, 12.0]])
        out = roi_align(f, rois, jnp.array([0]), output_size=7, spatial_scale=1.0)
        assert out.shape == (1, 7, 7, 8)
        np.testing.assert_allclose(np.asarray(out), 3.5, rtol=1e-5)

    def test_linear_ramp_exact(self):
        # f(x, y) = x → bilinear interp of a linear fn is exact,
        # so each pooled bin equals the x-coordinate of its sample mean.
        H = W = 16
        xs = np.arange(W, dtype=np.float32)
        f = np.tile(xs[None, :, None], (H, 1, 1))[None]  # (1,H,W,1)
        rois = jnp.array([[2.0, 2.0, 10.0, 10.0]])
        out = roi_align(jnp.asarray(f), rois, jnp.array([0]), output_size=4, spatial_scale=1.0, sampling_ratio=2)
        # aligned=True: start = 2-0.5=1.5, bin=2, centers at 1.5+ (i+0.5)*2... mean of 2 samples per bin
        # bin 0 samples at 1.5+0.5 and 1.5+1.5 → mean 2.5
        np.testing.assert_allclose(np.asarray(out[0, 0, :, 0]), [2.5, 4.5, 6.5, 8.5], rtol=1e-5)

    def test_batch_routing(self):
        f = jnp.stack([jnp.zeros((8, 8, 4)), jnp.ones((8, 8, 4))])
        rois = jnp.array([[1.0, 1.0, 6.0, 6.0], [1.0, 1.0, 6.0, 6.0]])
        out = roi_align(f, rois, jnp.array([0, 1]), output_size=2, spatial_scale=1.0)
        np.testing.assert_allclose(np.asarray(out[0]), 0.0)
        np.testing.assert_allclose(np.asarray(out[1]), 1.0, rtol=1e-6)

    def test_multilevel_matches_single_level(self):
        rng = np.random.RandomState(1)
        B, C = 2, 16
        feats = [jnp.asarray(rng.randn(B, 64 // s, 64 // s, C).astype(np.float32)) for s in (1, 2, 4, 8)]
        # small roi → level 0 (scale 32 < 56 → lvl 0)
        rois = jnp.array([[8.0, 8.0, 40.0, 40.0]])
        bidx = jnp.array([1])
        out_ml = multilevel_roi_align(feats, rois, bidx, strides=(4, 8, 16, 32))
        out_sl = roi_align(feats[0], rois, bidx, output_size=7, spatial_scale=1.0 / 4)
        np.testing.assert_allclose(np.asarray(out_ml), np.asarray(out_sl), rtol=1e-4, atol=1e-5)

    def test_multilevel_level_routing(self):
        rng = np.random.RandomState(2)
        B, C = 1, 4
        feats = [jnp.asarray(rng.randn(B, 256 // s, 256 // s, C).astype(np.float32)) for s in (4, 8, 16, 32)]
        # large roi: scale = 448 → log2(448/56) = 3 → level 3
        rois = jnp.array([[0.0, 0.0, 448.0, 448.0]])
        bidx = jnp.array([0])
        out_ml = multilevel_roi_align(feats, rois, bidx)
        out_l3 = roi_align(feats[3], rois, bidx, output_size=7, spatial_scale=1.0 / 32)
        np.testing.assert_allclose(np.asarray(out_ml), np.asarray(out_l3), rtol=1e-4, atol=1e-5)

    def test_gradients_flow(self):
        f = jnp.ones((1, 8, 8, 2))
        rois = jnp.array([[1.0, 1.0, 6.0, 6.0]])

        def loss(feat):
            return roi_align(feat, rois, jnp.array([0]), output_size=2, spatial_scale=1.0).sum()

        g = jax.grad(loss)(f)
        assert np.asarray(g).sum() > 0


class TestRoIPool:
    def test_max_pool_constant(self):
        import jax.numpy as jnp

        from nsgp_repre_tpu.ops.roi_pool import roi_pool

        f = jnp.full((1, 16, 16, 4), 2.0)
        out = roi_pool(f, jnp.array([[0.0, 0, 8, 8]]), jnp.array([0]), output_size=2)
        assert out.shape == (1, 2, 2, 4)
        np.testing.assert_allclose(np.asarray(out), 2.0)

    def test_max_pool_picks_max(self):
        import jax.numpy as jnp

        from nsgp_repre_tpu.ops.roi_pool import roi_pool

        f = np.zeros((1, 8, 8, 1), np.float32)
        f[0, 1, 1, 0] = 5.0
        out = roi_pool(jnp.asarray(f), jnp.array([[0.0, 0, 4, 4]]), jnp.array([0]), output_size=2)
        assert float(np.asarray(out).max()) == 5.0


class TestMatrixNMS:
    """nms_matrix must be pick-for-pick identical to the sequential
    greedy loop (same keep indices, same order, same validity)."""

    def _random_case(self, seed, n, spread=80.0, tie_frac=0.0):
        rng = np.random.RandomState(seed)
        xy = rng.uniform(0, spread, (n, 2)).astype(np.float32)
        wh = rng.uniform(4, 40, (n, 2)).astype(np.float32)
        boxes = np.concatenate([xy, xy + wh], axis=1)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        if tie_frac:
            k = max(2, int(n * tie_frac))
            scores[:k] = 0.5  # score ties → index tie-break must match
        valid = rng.uniform(0, 1, n) > 0.1
        return jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid)

    @pytest.mark.parametrize("seed,n,tile", [
        (0, 7, 512), (1, 130, 64), (2, 600, 512), (3, 1300, 512),
        (4, 600, 128), (5, 513, 512),
    ])
    def test_matches_sequential_greedy(self, seed, n, tile):
        from nsgp_repre_tpu.ops.nms import nms_matrix

        boxes, scores, valid = self._random_case(seed, n)
        for thr, max_out in [(0.5, n), (0.7, max(1, n // 3))]:
            ref_idx, ref_valid = nms(boxes, scores, valid, thr, max_out)
            got_idx, got_valid = nms_matrix(
                boxes, scores, valid, thr, max_out, tile=tile
            )
            np.testing.assert_array_equal(ref_valid, got_valid)
            np.testing.assert_array_equal(
                np.where(ref_valid, ref_idx, 0), np.where(got_valid, got_idx, 0)
            )

    def test_score_ties_break_by_index(self):
        from nsgp_repre_tpu.ops.nms import nms_matrix

        boxes, scores, valid = self._random_case(7, 200, spread=30.0,
                                                 tie_frac=0.5)
        ref_idx, ref_valid = nms(boxes, scores, valid, 0.5, 200)
        got_idx, got_valid = nms_matrix(boxes, scores, valid, 0.5, 200)
        np.testing.assert_array_equal(ref_valid, got_valid)
        np.testing.assert_array_equal(
            np.where(ref_valid, ref_idx, 0), np.where(got_valid, got_idx, 0)
        )

    def test_all_invalid_and_degenerate(self):
        from nsgp_repre_tpu.ops.nms import nms_matrix

        boxes = jnp.zeros((16, 4), jnp.float32)  # zero-area boxes
        scores = jnp.linspace(1.0, 0.1, 16)
        idx, kv = nms_matrix(boxes, scores, jnp.zeros(16, bool), 0.5, 8)
        assert not bool(kv.any())
        # degenerate but valid: zero-area boxes have IoU 0 → all kept
        idx, kv = nms_matrix(boxes, scores, jnp.ones(16, bool), 0.5, 8)
        ref_idx, ref_kv = nms(boxes, scores, jnp.ones(16, bool), 0.5, 8)
        np.testing.assert_array_equal(ref_kv, kv)
        np.testing.assert_array_equal(ref_idx, idx)

    def test_max_out_exceeds_candidates(self):
        """More output slots than candidates: extra slots invalid, no
        duplicated index-0 phantom (the C4 tiny-anchor-set shape)."""
        from nsgp_repre_tpu.ops.nms import nms_matrix

        boxes, scores, valid = self._random_case(9, 24)
        ref_idx, ref_valid = nms(boxes, scores, valid, 0.5, 64)
        got_idx, got_valid = nms_matrix(boxes, scores, valid, 0.5, 64)
        np.testing.assert_array_equal(ref_valid, got_valid)
        np.testing.assert_array_equal(
            np.where(ref_valid, ref_idx, 0), np.where(got_valid, got_idx, 0)
        )

    def test_batched_matches_vmapped_reference(self):
        from nsgp_repre_tpu.ops.nms import batched_nms_matrix

        rng = np.random.RandomState(11)
        B, n = 3, 300
        xy = rng.uniform(0, 60, (B, n, 2)).astype(np.float32)
        wh = rng.uniform(4, 30, (B, n, 2)).astype(np.float32)
        boxes = jnp.asarray(np.concatenate([xy, xy + wh], axis=2))
        scores = jnp.asarray(rng.uniform(0, 1, (B, n)).astype(np.float32))
        idxs = jnp.asarray(rng.randint(0, 5, (B, n)).astype(np.int32))
        valid = jnp.asarray(rng.uniform(0, 1, (B, n)) > 0.2)
        ref_idx, ref_valid = jax.vmap(
            lambda b, s, l, v: batched_nms(b, s, l, v, 0.7, 100)
        )(boxes, scores, idxs, valid)
        got_idx, got_valid = batched_nms_matrix(
            boxes, scores, idxs, valid, 0.7, 100, tile=128
        )
        np.testing.assert_array_equal(ref_valid, got_valid)
        np.testing.assert_array_equal(
            np.where(ref_valid, ref_idx, 0), np.where(got_valid, got_idx, 0)
        )


class TestSoftNMS:
    """soft_nms (mmcv semantics: linear/gaussian score decay, min_score
    drop) — the test_cfg nms=dict(type='soft_nms') knob."""

    def _np_soft_nms(self, boxes, scores, iou_thr, max_out, sigma, min_score, method):
        """Straightforward numpy soft-NMS (independent oracle)."""
        def iou(a, b):
            x1 = max(a[0], b[0]); y1 = max(a[1], b[1])
            x2 = min(a[2], b[2]); y2 = min(a[3], b[3])
            inter = max(0.0, x2 - x1) * max(0.0, y2 - y1)
            ua = (a[2]-a[0])*(a[3]-a[1]) + (b[2]-b[0])*(b[3]-b[1]) - inter
            return inter / ua if ua > 0 else 0.0

        s = scores.copy().astype(np.float64)
        alive = s > min_score
        kept, kept_s = [], []
        for _ in range(max_out):
            if not alive.any():
                break
            j = int(np.where(alive, s, -np.inf).argmax())
            kept.append(j); kept_s.append(s[j]); alive[j] = False
            for k in np.where(alive)[0]:
                o = iou(boxes[j], boxes[k])
                if method == "gaussian":
                    w = np.exp(-o * o / sigma)
                else:
                    w = 1.0 - o if o > iou_thr else 1.0
                s[k] *= w
                if s[k] <= min_score:
                    alive[k] = False
        return kept, kept_s

    def test_matches_numpy_oracle(self):
        import jax.numpy as jnp

        from nsgp_repre_tpu.ops.nms import soft_nms

        rng = np.random.RandomState(0)
        n = 40
        ctr = rng.rand(n, 2) * 40
        wh = 10 + rng.rand(n, 2) * 20
        boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], 1).astype(np.float32)
        scores = rng.rand(n).astype(np.float32)
        for method in ("linear", "gaussian"):
            ki, kv, ks = soft_nms(
                jnp.asarray(boxes), jnp.asarray(scores),
                jnp.ones(n, bool), 0.3, 16, 0.5, 1e-3, method,
            )
            exp_i, exp_s = self._np_soft_nms(
                boxes, scores, 0.3, 16, 0.5, 1e-3, method
            )
            got_i = np.asarray(ki)[np.asarray(kv)]
            got_s = np.asarray(ks)[np.asarray(kv)]
            np.testing.assert_array_equal(got_i, exp_i, err_msg=method)
            np.testing.assert_allclose(got_s, exp_s, rtol=1e-4, err_msg=method)

    def test_decay_keeps_overlapping_boxes(self):
        """Unlike hard NMS, a strongly-overlapping second box survives
        with a decayed score."""
        import jax.numpy as jnp

        from nsgp_repre_tpu.ops.nms import nms, soft_nms

        boxes = jnp.asarray([[0.0, 0, 10, 10], [1.0, 0, 11, 10], [50.0, 50, 60, 60]])
        scores = jnp.asarray([0.9, 0.8, 0.7])
        v = jnp.ones(3, bool)
        _, hard_valid = nms(boxes, scores, v, 0.5, 3)
        assert int(hard_valid.sum()) == 2  # box 1 suppressed
        ki, kv, ks = soft_nms(boxes, scores, v, 0.5, 3, method="gaussian")
        assert int(kv.sum()) == 3  # survives, decayed
        s = np.asarray(ks)[np.asarray(ki).tolist().index(1)]
        assert 0.0 < s < 0.8

    def test_detector_soft_nms_knob(self):
        """nms_type='soft_nms' flows from config to predict."""
        from nsgp_repre_tpu.models.zoo import build_detector

        model_cfg = dict(
            type="FasterRCNN",
            test_cfg=dict(rcnn=dict(
                score_thr=0.05,
                nms=dict(type="soft_nms", iou_threshold=0.3, sigma=0.6,
                         min_score=1e-3, method="gaussian"),
                max_per_img=20,
            )),
        )
        model, cfg = build_detector(model_cfg, num_classes=4,
                                    backbone_blocks=(1, 1, 1, 1))
        assert cfg.nms_type == "soft_nms"
        assert cfg.soft_nms_sigma == 0.6
        assert cfg.soft_nms_method == "gaussian"
