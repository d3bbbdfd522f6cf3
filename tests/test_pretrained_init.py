"""Pretrained-backbone initialization dry-run (VERDICT r4 missing #4).

The reference always starts task 1 from an ImageNet ResNet-50 file
(reference cl_faster_rcnn_cfgs/incremental_task/
cl_faster_rcnn_nsgp_repre_15_5_1.py:41-43 sets
``model.backbone.init_cfg.checkpoint`` to a local torch .pth;
reference mmdet/models/backbones/resnet.py:306 consumes it).
``tools/misc/run_real_voc_15_5.sh`` promises the same path here:
torchvision state-dict FILE → ``init_cfg.checkpoint`` cfg key →
``NullSpaceRunner._load_backbone`` → ``load_torch_resnet50`` conversion
→ task-1 training. This covers that chain end-to-end on a synthesized
(random-weight) torchvision-format checkpoint: the converted values
must land in the live param tree, training must produce finite params,
and ``frozen_stages=1`` (stem + stage 1) must leave the pretrained
values bit-identical afterwards.
"""
import os.path as osp
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, osp.dirname(__file__))
from test_pipeline import make_cfg  # noqa: E402
from test_torch_parity import TorchResNet50  # noqa: E402


def _synthesize_torchvision_ckpt(path: str) -> dict:
    """Random-weight ResNet-50 state dict in torchvision layout (incl.
    the fc classifier keys a real IMAGENET1K_V1 file carries, which the
    converter must ignore)."""
    torch.manual_seed(3)
    model = TorchResNet50()
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)
    sd = model.state_dict()
    sd["fc.weight"] = torch.zeros(1000, 2048)
    sd["fc.bias"] = torch.zeros(1000)
    torch.save(sd, path)
    return {k: v.numpy() for k, v in sd.items()}


def test_torch_ckpt_file_to_task1_training(voc_root, tmp_path):
    from nsgp_repre_tpu.engine.runner import NullSpaceRunner

    ckpt_path = str(tmp_path / "imagenet_pretrained_backbone.pth")
    sd = _synthesize_torchvision_ckpt(ckpt_path)

    cfg = make_cfg(voc_root, str(tmp_path / "work"), task_id=1)
    cfg["model"]["backbone"]["init_cfg"] = {"checkpoint": ckpt_path}
    r = NullSpaceRunner(cfg)

    # conversion landed: conv kernels are the torch OIHW weights in HWIO
    conv1 = np.asarray(r.params["backbone"]["conv1"]["kernel"])
    np.testing.assert_array_equal(conv1, sd["conv1.weight"].transpose(2, 3, 1, 0))
    l1c2 = np.asarray(r.params["backbone"]["layer1_0"]["conv2"]["kernel"])
    np.testing.assert_array_equal(l1c2, sd["layer1.0.conv2.weight"].transpose(2, 3, 1, 0))
    # BN running stats landed in batch_stats (stay frozen: norm_eval)
    bn_mean = np.asarray(r.batch_stats["backbone"]["bn1"]["mean"])
    np.testing.assert_array_equal(bn_mean, sd["bn1.running_mean"])
    # stage-2 weights landed too (these SHOULD train below)
    l2c1_init = np.asarray(r.params["backbone"]["layer2_0"]["conv1"]["kernel"])
    np.testing.assert_array_equal(l2c1_init, sd["layer2.0.conv1.weight"].transpose(2, 3, 1, 0))

    r.train()

    import jax

    final = r.state.params
    assert all(
        np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(final)
    ), "non-finite params after task-1 training from pretrained init"

    # frozen_stages=1: stem + stage 1 bit-identical to the file
    np.testing.assert_array_equal(
        np.asarray(final["backbone"]["conv1"]["kernel"]), conv1
    )
    np.testing.assert_array_equal(
        np.asarray(final["backbone"]["layer1_0"]["conv2"]["kernel"]), l1c2
    )
    np.testing.assert_array_equal(
        np.asarray(r.state.batch_stats["backbone"]["bn1"]["mean"]), bn_mean
    )
    # stage 2 is trainable and must have moved
    l2c1_final = np.asarray(final["backbone"]["layer2_0"]["conv1"]["kernel"])
    assert not np.array_equal(l2c1_final, l2c1_init), "stage-2 never trained"

    mAP = r.val()
    assert np.isfinite(mAP)
