import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsgp_repre_tpu.engine import ewc as ewc_lib
from nsgp_repre_tpu.engine import nsgp, optim, replay
from nsgp_repre_tpu.engine.pseudo import merge_pseudo_labels
from nsgp_repre_tpu.models.assigners import IGNORE, NEG, max_iou_assign
from nsgp_repre_tpu.models.samplers import random_sample_gather, random_sample_masks
from nsgp_repre_tpu.structures.sample import InstanceArray


class TestSGDNSCL:
    def test_plain_sgd_momentum(self):
        params = {"w": jnp.array([1.0, 2.0])}
        tx = optim.sgd_nscl(0.1, momentum=0.9, weight_decay=0.0)
        state = tx.init(params)
        g = {"w": jnp.array([1.0, 1.0])}
        # step 1: buf = g, update = -lr*g
        u1, state = tx.update(g, state, params)
        np.testing.assert_allclose(u1["w"], [-0.1, -0.1], rtol=1e-6)
        # step 2: buf = 0.9*g + g = 1.9g
        u2, state = tx.update(g, state, params)
        np.testing.assert_allclose(u2["w"], [-0.19, -0.19], rtol=1e-6)

    def test_weight_decay(self):
        params = {"w": jnp.array([10.0])}
        tx = optim.sgd_nscl(1.0, momentum=0.0, weight_decay=0.1)
        state = tx.init(params)
        u, _ = tx.update({"w": jnp.array([0.0])}, state, params)
        np.testing.assert_allclose(u["w"], [-1.0], rtol=1e-6)

    def test_projection_dense(self):
        params = {"layer": {"kernel": jnp.zeros((4, 2))}}
        tx = optim.sgd_nscl(1.0, momentum=0.0, weight_decay=0.0)
        state = tx.init(params)
        # projector onto first two dims
        P = jnp.diag(jnp.array([1.0, 1.0, 0.0, 0.0]))
        state = optim.set_transforms(state, {"layer/kernel": P})
        g = {"layer": {"kernel": jnp.ones((4, 2))}}
        u, _ = tx.update(g, state, params)
        np.testing.assert_allclose(u["layer"]["kernel"][:2], -1.0)
        np.testing.assert_allclose(u["layer"]["kernel"][2:], 0.0)

    def test_projection_conv_matches_torch_layout(self):
        # conv kernel (kh, kw, in, out); projection over C = in*kh*kw with
        # channel-major ordering must equal flattened torch (out, C) @ P
        rng = np.random.RandomState(0)
        kh = kw = 3
        cin, cout = 2, 4
        C = cin * kh * kw
        g = rng.randn(kh, kw, cin, cout).astype(np.float32)
        P = rng.randn(C, C).astype(np.float32)
        P = P @ P.T  # symmetric
        out = optim.project_update(jnp.asarray(g), jnp.asarray(P))
        # torch equivalent: weight (out, in, kh, kw) flattened (out, C) @ P
        g_t = np.transpose(g, (3, 2, 0, 1)).reshape(cout, C)
        expect = (g_t @ P).reshape(cout, cin, kh, kw).transpose(2, 3, 1, 0)
        np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4, atol=1e-4)

    def test_masked_freezes(self):
        params = {"a": jnp.ones(2), "b": jnp.ones(2)}
        mask = {"a": jnp.ones(()), "b": jnp.zeros(())}
        tx = optim.masked(optim.sgd_nscl(1.0, momentum=0.0, weight_decay=0.0), mask)
        state = tx.init(params)
        u, _ = tx.update({"a": jnp.ones(2), "b": jnp.ones(2)}, state, params)
        assert float(jnp.abs(u["a"]).sum()) > 0
        np.testing.assert_allclose(u["b"], 0.0)


class TestTrainableMask:
    """trainable_mask must follow mmdet frozen_stages semantics
    (resnet.py _freeze_stages: -1 none, 0 stem only, k>=1 stem+1..k) —
    the from-scratch mini configs set frozen_stages=-1 and train ALL
    backbone params."""

    def _mask(self, frozen_stages):
        from nsgp_repre_tpu.engine.train import trainable_mask
        from nsgp_repre_tpu.models.detector import DetectorConfig

        cfg = DetectorConfig(
            num_classes=4, task_split=(0, 2, 4), task_id=1,
            frozen_stages=frozen_stages,
        )
        params = {
            "backbone": {
                "conv1": {"kernel": jnp.ones(1)},
                "bn1": {"scale": jnp.ones(1)},
                "layer1_0": {"conv1": {"kernel": jnp.ones(1)}},
                "layer2_0": {"conv1": {"kernel": jnp.ones(1)}},
            },
            "bbox_head": {
                "fc_cls0": {"kernel": jnp.ones(1)},
                "fc_cls1": {"kernel": jnp.ones(1)},
            },
        }
        m = trainable_mask(params, cfg)
        return {
            "conv1": float(m["backbone"]["conv1"]["kernel"]),
            "bn1": float(m["backbone"]["bn1"]["scale"]),
            "layer1": float(m["backbone"]["layer1_0"]["conv1"]["kernel"]),
            "layer2": float(m["backbone"]["layer2_0"]["conv1"]["kernel"]),
            "cls0": float(m["bbox_head"]["fc_cls0"]["kernel"]),
            "cls1": float(m["bbox_head"]["fc_cls1"]["kernel"]),
        }

    def test_from_scratch_trains_everything(self):
        m = self._mask(-1)
        assert m == dict(conv1=1, bn1=1, layer1=1, layer2=1, cls0=1, cls1=0)

    def test_stem_only(self):
        m = self._mask(0)
        assert m == dict(conv1=0, bn1=0, layer1=1, layer2=1, cls0=1, cls1=0)

    def test_default_stage1(self):
        m = self._mask(1)
        assert m == dict(conv1=0, bn1=0, layer1=0, layer2=1, cls0=1, cls1=0)

    def test_two_stages(self):
        m = self._mask(2)
        assert m == dict(conv1=0, bn1=0, layer1=0, layer2=0, cls0=1, cls1=0)


class TestNSGP:
    def test_adaptive_threshold_elbow(self):
        # spectrum with a sharp elbow at index 20
        svals = np.concatenate([np.linspace(100, 50, 20), np.linspace(1, 0.1, 80)])
        i = nsgp.adaptive_threshold_index(svals)
        assert 15 <= i <= 30

    def test_offset_shifts(self):
        svals = np.concatenate([np.linspace(100, 50, 20), np.linspace(1, 0.1, 80)])
        i0 = nsgp.adaptive_threshold_index(svals, 0.0)
        ip = nsgp.adaptive_threshold_index(svals, 0.5)
        assert ip >= i0

    def test_large_dim_smoothing_path(self):
        rng = np.random.RandomState(0)
        svals = np.sort(np.abs(rng.randn(256)))[::-1] * np.linspace(100, 1, 256)
        i = nsgp.adaptive_threshold_index(svals)
        assert 0 <= i < 256

    def test_projection_idempotent(self):
        rng = np.random.RandomState(1)
        X = rng.randn(100, 32).astype(np.float32)
        cov = X.T @ X
        tf = nsgp.build_transforms({"neck/conv/kernel": jnp.asarray(cov)})
        P = np.asarray(tf["neck/conv/kernel"])
        np.testing.assert_allclose(P @ P, P, atol=1e-3)
        np.testing.assert_allclose(P, P.T, atol=1e-5)

    def test_backbone_frobenius_normalized(self):
        rng = np.random.RandomState(1)
        X = rng.randn(100, 16).astype(np.float32)
        cov = X.T @ X
        tf = nsgp.build_transforms({"backbone/conv/kernel": jnp.asarray(cov)})
        P = np.asarray(tf["backbone/conv/kernel"])
        np.testing.assert_allclose(np.linalg.norm(P), 1.0, rtol=1e-4)

    def test_ignore_patterns(self):
        cov = {"rpn_head/conv/kernel": jnp.eye(8), "neck/c/kernel": jnp.eye(8)}
        tf = nsgp.build_transforms(cov, ignore_patterns=["rpn_head"])
        assert "rpn_head/conv/kernel" not in tf
        assert "neck/c/kernel" in tf

    def test_null_space_annihilates_row_space(self):
        # gradient direction along data rows should be (mostly) killed
        rng = np.random.RandomState(2)
        basis = rng.randn(4, 32).astype(np.float32)
        X = rng.randn(500, 4).astype(np.float32) @ basis  # rank-4 data
        cov = X.T @ X + 1e-4 * np.eye(32, dtype=np.float32)
        tf = nsgp.build_transforms({"neck/conv/kernel": jnp.asarray(cov)})
        P = np.asarray(tf["neck/conv/kernel"])
        v = basis[0]  # vector in the row space
        projected = P @ v
        assert np.linalg.norm(projected) < 0.05 * np.linalg.norm(v)

    def test_eigh_descending(self):
        cov = jnp.diag(jnp.array([1.0, 5.0, 3.0]))
        evals, evecs = nsgp.eigh_descending(cov)
        np.testing.assert_allclose(np.asarray(evals), [5.0, 3.0, 1.0], atol=1e-6)


class TestEWC:
    def _params(self):
        return {
            "backbone": {
                "bn1": {"scale": jnp.ones(4), "bias": jnp.zeros(4)},
                "conv1": {"kernel": jnp.ones((3, 3, 3, 4))},
            }
        }

    def test_select_bn_only(self):
        sel = ewc_lib.select_ewc_params(self._params())
        assert set(sel) == {"backbone/bn1/scale", "backbone/bn1/bias"}

    def test_loss_zero_then_positive(self):
        params = self._params()
        imp = {k: jnp.ones_like(v) for k, v in ewc_lib.select_ewc_params(params).items()}
        terms = ewc_lib.append_task_terms({}, imp, params)
        assert float(ewc_lib.ewc_loss(params, terms)) == 0.0
        params2 = jax.tree.map(lambda x: x + 0.1, params)
        loss = float(ewc_lib.ewc_loss(params2, terms))
        # 1000 * (8 params * 0.01)
        np.testing.assert_allclose(loss, 1000 * 8 * 0.01, rtol=1e-4)

    def test_multi_task_stacking(self):
        params = self._params()
        imp = {k: jnp.ones_like(v) for k, v in ewc_lib.select_ewc_params(params).items()}
        terms = ewc_lib.append_task_terms({}, imp, params)
        terms = ewc_lib.append_task_terms(terms, imp, params)
        assert terms["backbone/bn1/scale"][0].shape[0] == 2


class TestReplay:
    def _clustered_feats(self):
        rng = np.random.RandomState(0)
        # class 0: two tight clusters + isolated outliers (the greedy
        # clustering excludes the bottom-third by neighbor count, so the
        # outliers absorb the exclusion and both clusters seed prototypes)
        c0a = rng.randn(30, 64) * 0.01 + 1.0
        c0b = rng.randn(30, 64) * 0.01 - 1.0
        c0out = rng.randn(30, 64) * 3.0
        c1 = rng.randn(40, 64) * 0.01 + 5.0
        feats = np.concatenate([c0a, c0b, c0out, c1]).astype(np.float32)
        targets = np.array([0] * 90 + [1] * 40)
        return feats, targets

    def test_coarse_plus_fine(self):
        feats, targets = self._clustered_feats()
        protos, labels, masks = replay.build_prototypes(
            feats, targets, task_split=[0, 2, 4], task_id=2, max_prototype=3
        )
        # per class: 1 coarse + up to 2 fine
        assert (labels == 0).sum() >= 2
        assert (labels == 1).sum() >= 1
        assert protos.shape[1] == 64
        assert len(masks) == 2

    def test_mask_cache_reproduces(self):
        feats, targets = self._clustered_feats()
        p1, l1, masks = replay.build_prototypes(
            feats, targets, [0, 2, 4], 2, max_prototype=3
        )
        p2, l2, _ = replay.build_prototypes(
            feats, targets, [0, 2, 4], 2, max_prototype=3, saved_masks=masks
        )
        np.testing.assert_allclose(p1, p2)

    def test_coarse_only(self):
        feats, targets = self._clustered_feats()
        protos, labels = replay.build_coarse_prototypes(feats, targets, [0, 2, 4], 2)
        assert len(protos) == 2
        np.testing.assert_allclose(protos[1], feats[targets == 1].mean(0), rtol=1e-5)

    def test_subsample_per_class(self):
        feats, targets = self._clustered_feats()
        arrays = replay.subsample_per_class([feats, targets], targets, 5, num_classes=2)
        assert len(arrays[0]) == 10
        assert (np.sort(np.unique(arrays[1])) == [0, 1]).all()


class TestPseudoLabels:
    def test_merge_thresholds(self):
        gt = InstanceArray(
            boxes=jnp.array([[[0.0, 0, 10, 10], [0, 0, 0, 0]]]),
            labels=jnp.array([[3, -1]]),
            valid=jnp.array([[True, False]]),
        )
        dets = InstanceArray(
            boxes=jnp.array(
                [[[0.0, 0, 10, 10.5],  # overlaps gt heavily → skipped
                  [50, 50, 60, 60],    # score .8 → both rpn+roi
                  [70, 70, 80, 80]]]   # score .6 → rpn only
            ),
            labels=jnp.array([[1, 1, 2]]),
            valid=jnp.array([[True, True, True]]),
            scores=jnp.array([[0.9, 0.8, 0.6]]),
        )
        rpn_gt, roi_gt = merge_pseudo_labels(gt, dets, 0.5, 0.7)
        assert rpn_gt.valid.sum() == 3  # 1 gt + 2 pseudo
        assert roi_gt.valid.sum() == 2  # 1 gt + 1 pseudo
        assert rpn_gt.boxes.shape == (1, 5, 4)


class TestAssignSample:
    def test_assign_basic(self):
        priors = jnp.array(
            [[0.0, 0, 10, 10], [100, 100, 110, 110], [0, 0, 9, 10], [200, 200, 300, 300]]
        )
        gts = jnp.array([[0.0, 0, 10, 10], [0, 0, 0, 0]])
        gt_valid = jnp.array([True, False])
        assigned, max_ov = max_iou_assign(
            priors, gts, gt_valid, 0.7, 0.3, 0.3, match_low_quality=True
        )
        assert int(assigned[0]) == 0  # exact match
        assert int(assigned[1]) == NEG
        assert int(assigned[2]) == 0  # iou 0.9 >= 0.7
        assert int(assigned[3]) == NEG

    def test_low_quality_match(self):
        # gt whose best prior has IoU in [min_pos, pos_thr)
        priors = jnp.array([[0.0, 0, 10, 10], [40, 40, 60, 60]])
        gts = jnp.array([[42.0, 42, 58, 70]])
        assigned, _ = max_iou_assign(
            priors, gts, jnp.array([True]), 0.9, 0.3, 0.3, match_low_quality=True
        )
        assert int(assigned[1]) == 0

    def test_sampler_pos_cap(self):
        assigned = jnp.array([0] * 100 + [NEG] * 200)
        pos, neg = random_sample_masks(jax.random.PRNGKey(0), assigned, 64, 0.25)
        assert int(pos.sum()) == 16
        assert int(neg.sum()) == 48

    def test_sampler_few_pos(self):
        assigned = jnp.array([0] * 3 + [NEG] * 200)
        pos, neg = random_sample_masks(jax.random.PRNGKey(0), assigned, 64, 0.25)
        assert int(pos.sum()) == 3
        assert int(neg.sum()) == 61

    def test_sampler_no_pos(self):
        assigned = jnp.array([NEG] * 50 + [IGNORE] * 10)
        pos, neg = random_sample_masks(jax.random.PRNGKey(1), assigned, 32, 0.5)
        assert int(pos.sum()) == 0
        assert int(neg.sum()) == 32

    def test_gather_valid_slots(self):
        assigned = jnp.array([0, 1, NEG, NEG, NEG, IGNORE] * 10)
        idx, valid, is_pos = random_sample_gather(
            jax.random.PRNGKey(2), assigned, 16, 0.25
        )
        assert int(valid.sum()) == 16
        assert int(is_pos.sum()) == 4
        # positive slots index actual positives
        for i, (p, v) in enumerate(zip(np.asarray(is_pos), np.asarray(valid))):
            if p:
                assert int(assigned[idx[i]]) >= 0
