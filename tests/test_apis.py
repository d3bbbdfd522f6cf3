"""init_detector / inference_detector / DetInferencer round trip
(reference tests/test_apis analogue) on a shrunken model."""
import numpy as np
import pytest

from nsgp_repre_tpu.utils.config import Config


def tiny_cfg():
    return Config.wrap(
        dict(
            task_id=1,
            train_task_split=[0, 4],
            img_scale=(100, 60),
            model=dict(
                backbone=dict(stage_blocks=(1, 1, 1, 1)),
                roi_head=dict(bbox_head=dict(num_classes=4)),
                train_cfg=dict(
                    rpn_proposal=dict(nms_pre=64, max_per_img=32),
                ),
                test_cfg=dict(rcnn=dict(max_per_img=8, score_thr=0.0)),
            ),
        )
    )


class TestInference:
    def test_init_and_infer(self, tmp_path):
        from nsgp_repre_tpu.apis import inference_detector, init_detector

        det = init_detector(tiny_cfg())
        img = np.random.RandomState(0).randint(0, 255, (60, 80, 3), np.uint8)
        result = inference_detector(det, img)
        assert set(result) == {"boxes", "scores", "labels"}
        assert result["boxes"].shape[1] == 4 if len(result["boxes"]) else True

    def test_inferencer_saves_vis(self, tmp_path):
        import cv2

        from nsgp_repre_tpu.apis import DetInferencer

        img_path = str(tmp_path / "img.jpg")
        cv2.imwrite(img_path, np.random.RandomState(1).randint(0, 255, (60, 80, 3), np.uint8))
        inferencer = DetInferencer(tiny_cfg(), pred_score_thr=0.0)
        out = inferencer(img_path, out_dir=str(tmp_path / "vis"))
        assert "predictions" in out
        assert (tmp_path / "vis" / "img.jpg").exists()

    def test_checkpoint_roundtrip(self, tmp_path):
        import jax.numpy as jnp

        from nsgp_repre_tpu.apis import init_detector
        from nsgp_repre_tpu.utils import checkpoint as ckpt_io

        det = init_detector(tiny_cfg())
        path = str(tmp_path / "ckpt.npz")
        ckpt_io.save_pytree(path, det.variables)
        det2 = init_detector(tiny_cfg(), checkpoint=path)
        a = jnp.concatenate([x.ravel() for x in
                             __import__("jax").tree_util.tree_leaves(det.variables["params"])])
        b = jnp.concatenate([x.ravel() for x in
                             __import__("jax").tree_util.tree_leaves(det2.variables["params"])])
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
