import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsgp_repre_tpu.models import DetectorConfig, FasterRCNN, ResNet50, FPN
from nsgp_repre_tpu.models.bbox_head import NEG_INF_SCORE, Shared2FCBBoxHeadTask
from nsgp_repre_tpu.structures.sample import DetBatch, InstanceArray


def tiny_config(**kw):
    base = dict(num_classes=4, task_split=(0, 2, 4), task_id=1,
                rpn_nms_pre=64, rpn_max_per_img=32, rcnn_num=16,
                rpn_num=16, max_per_img=8)
    base.update(kw)
    return DetectorConfig(**base)


def tiny_batch(rng=0, B=1, H=64, W=64, capacity=6):
    r = np.random.RandomState(rng)
    images = jnp.asarray(r.randn(B, H, W, 3).astype(np.float32))
    boxes = np.zeros((B, capacity, 4), np.float32)
    labels = np.full((B, capacity), -1, np.int32)
    valid = np.zeros((B, capacity), bool)
    boxes[:, 0] = [8, 8, 40, 40]
    boxes[:, 1] = [20, 24, 56, 60]
    labels[:, 0] = 0
    labels[:, 1] = 1
    valid[:, :2] = True
    return DetBatch(
        images=images,
        img_shape=jnp.tile(jnp.array([H, W], jnp.int32), (B, 1)),
        ori_shape=jnp.tile(jnp.array([H, W], jnp.int32), (B, 1)),
        scale_factor=jnp.ones((B, 2), jnp.float32),
        gt=InstanceArray(
            boxes=jnp.asarray(boxes), labels=jnp.asarray(labels),
            valid=jnp.asarray(valid),
        ),
    )


class TestBackbone:
    def test_stem_s2d_exact(self):
        """Space-to-depth stem must be bit-for-math equal to the direct
        7x7/2 conv (same params, f32), including the asymmetric-padding
        borders."""
        from nsgp_repre_tpu.models.layers import CovConv

        r = np.random.RandomState(0)
        x = jnp.asarray(r.randn(2, 64, 96, 3).astype(np.float32))
        m_ref = CovConv(8, (7, 7), (2, 2), (3, 3), use_bias=False)
        m_s2d = CovConv(8, (7, 7), (2, 2), (3, 3), use_bias=False, s2d=True)
        v = m_ref.init(jax.random.PRNGKey(0), x)
        y_ref = m_ref.apply(v, x)
        y_s2d = m_s2d.apply(v, x)
        assert y_ref.shape == y_s2d.shape == (2, 32, 48, 8)
        np.testing.assert_allclose(
            np.asarray(y_ref), np.asarray(y_s2d), rtol=1e-6, atol=1e-5
        )

    def test_resnet_shapes(self):
        model = ResNet50()
        x = jnp.zeros((1, 64, 64, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        outs = model.apply(variables, x)
        assert [o.shape for o in outs] == [
            (1, 16, 16, 256), (1, 8, 8, 512), (1, 4, 4, 1024), (1, 2, 2, 2048)
        ]

    def test_fpn_shapes(self):
        model = FPN()
        ins = [jnp.zeros((1, 16, 16, 256)), jnp.zeros((1, 8, 8, 512)),
               jnp.zeros((1, 4, 4, 1024)), jnp.zeros((1, 2, 2, 2048))]
        variables = model.init(jax.random.PRNGKey(0), ins)
        outs = model.apply(variables, ins)
        assert [o.shape for o in outs] == [
            (1, 16, 16, 256), (1, 8, 8, 256), (1, 4, 4, 256),
            (1, 2, 2, 256), (1, 1, 1, 256),
        ]


class TestBBoxHead:
    def test_task_masking(self):
        head = Shared2FCBBoxHeadTask(task_split=(0, 2, 4), task_id=1, num_classes=4)
        x = jnp.ones((3, 7, 7, 256))
        variables = head.init(jax.random.PRNGKey(0), x)
        cls, reg = head.apply(variables, x)
        assert cls.shape == (3, 5)
        assert reg.shape == (3, 16)
        # future task (classes 2,3) logits masked to -inf-equivalent
        np.testing.assert_allclose(np.asarray(cls[:, 2:4]), NEG_INF_SCORE)
        np.testing.assert_allclose(np.asarray(reg[:, 8:]), 0.0)
        # active + background logits are finite
        assert np.isfinite(np.asarray(cls[:, :2])).all()
        assert np.isfinite(np.asarray(cls[:, 4])).all()

    def test_task2_all_active(self):
        head = Shared2FCBBoxHeadTask(task_split=(0, 2, 4), task_id=2, num_classes=4)
        x = jnp.ones((2, 7, 7, 256))
        variables = head.init(jax.random.PRNGKey(0), x)
        cls, _ = head.apply(variables, x)
        assert np.isfinite(np.asarray(cls)).all()


class TestDetector:
    @pytest.fixture(scope="class")
    def model_and_vars(self):
        cfg = tiny_config()
        model = FasterRCNN(config=cfg)
        batch = tiny_batch()
        variables = model.init(jax.random.PRNGKey(0), batch.images)
        return model, variables, batch

    def test_loss_keys_and_finiteness(self, model_and_vars):
        model, variables, batch = model_and_vars
        losses = model.apply(
            variables, batch, jax.random.PRNGKey(1), method=model.loss
        )
        for k in ("loss_rpn_cls", "loss_rpn_bbox", "loss_cls", "loss_bbox"):
            assert k in losses
            assert np.isfinite(float(losses[k])), k
        assert float(losses["loss_cls"]) > 0

    def test_predict_shapes(self, model_and_vars):
        model, variables, batch = model_and_vars
        dets = model.apply(variables, batch, method=model.predict)
        assert dets.boxes.shape == (1, 8, 4)
        assert dets.scores.shape == (1, 8)
        # all valid detections are active-task classes
        lab = np.asarray(dets.labels)[np.asarray(dets.valid)]
        assert (lab < 2).all()

    def test_sparse_rpn_loss_matches_dense(self, model_and_vars):
        """rpn_sparse_loss=True (the default) must reproduce the dense
        path's loss values AND parameter gradients — the sparse gather
        is the dense conv restricted to the sampled positions."""
        _, variables, batch = model_and_vars
        m_dense = FasterRCNN(config=tiny_config(rpn_sparse_loss=False))
        m_sparse = FasterRCNN(config=tiny_config(rpn_sparse_loss=True))
        key = jax.random.PRNGKey(3)

        def total(model, params):
            losses = model.apply(
                {**variables, "params": params}, batch, key, method=model.loss
            )
            return sum(
                v for k, v in losses.items() if k.startswith("loss_rpn")
            )

        ld, gd = jax.value_and_grad(lambda p: total(m_dense, p))(
            variables["params"]
        )
        ls, gs = jax.value_and_grad(lambda p: total(m_sparse, p))(
            variables["params"]
        )
        np.testing.assert_allclose(float(ld), float(ls), rtol=1e-5)
        flat_d = jax.tree_util.tree_leaves_with_path(gd)
        flat_s = {jax.tree_util.keystr(k): v
                  for k, v in jax.tree_util.tree_leaves_with_path(gs)}
        checked = 0
        for k, vd in flat_d:
            ks = jax.tree_util.keystr(k)
            vs = flat_s[ks]
            scale = max(float(jnp.abs(vd).max()), 1e-8)
            np.testing.assert_allclose(
                np.asarray(vd), np.asarray(vs), atol=2e-5 * scale, rtol=1e-4,
                err_msg=ks,
            )
            if float(jnp.abs(vd).max()) > 0:
                checked += 1
        assert checked > 10  # rpn head + backbone + fpn all get gradient

    def test_matrix_rpn_nms_matches_default(self, model_and_vars):
        """rpn_nms_impl='matrix' must produce the same predictions as
        the sequential XLA path (the CPU default via 'auto')."""
        model, variables, batch = model_and_vars
        dets_ref = model.apply(variables, batch, method=model.predict)
        m2 = FasterRCNN(config=tiny_config(rpn_nms_impl="matrix"))
        dets = m2.apply(variables, batch, method=m2.predict)
        np.testing.assert_array_equal(
            np.asarray(dets_ref.valid), np.asarray(dets.valid)
        )
        v = np.asarray(dets_ref.valid)
        np.testing.assert_allclose(
            np.asarray(dets_ref.boxes)[v], np.asarray(dets.boxes)[v],
            rtol=0, atol=0,
        )
        np.testing.assert_array_equal(
            np.asarray(dets_ref.labels)[v], np.asarray(dets.labels)[v]
        )

    def test_loss_is_differentiable(self, model_and_vars):
        model, variables, batch = model_and_vars
        params = variables["params"]
        consts = {k: v for k, v in variables.items() if k != "params"}

        def total(p):
            losses = model.apply(
                {"params": p, **consts}, batch, jax.random.PRNGKey(1),
                method=model.loss,
            )
            return sum(v for k, v in losses.items() if k.startswith("loss"))

        grads = jax.grad(total)(params)
        flat = jax.tree_util.tree_leaves(grads)
        gnorm = sum(float(jnp.abs(g).sum()) for g in flat)
        assert np.isfinite(gnorm) and gnorm > 0

    def test_cov_collection_captured(self, model_and_vars):
        model, variables, batch = model_and_vars
        _, state = model.apply(
            variables, batch.images, method=model.extract_feat, mutable=["cov"]
        )
        covs = jax.tree_util.tree_leaves(state["cov"])
        assert len(covs) > 50  # ResNet50 has 53 convs + FPN 9... + downsample
        for c in covs[:3]:
            assert c.shape[0] == c.shape[1]
            # symmetric PSD
            np.testing.assert_allclose(np.asarray(c), np.asarray(c).T, rtol=1e-4, atol=1e-4)

    def test_get_bbox_stuff(self, model_and_vars):
        model, variables, batch = model_and_vars
        out = model.apply(
            variables, batch, jax.random.PRNGKey(3), method=model.get_bbox_stuff
        )
        mid, labels, cls_w, tgt, bbox_w, rois, valid = out
        assert mid.shape == (5, 7 * 7 * 256)
        assert labels.shape == (5,)
        assert bool(valid.all())
