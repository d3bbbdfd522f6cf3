"""Testing utilities, prefetch loader, benchmark helpers."""
import numpy as np

from nsgp_repre_tpu.testing import demo_det_batch, tiny_detector_config


def test_demo_det_batch():
    b = demo_det_batch(batch_size=2, num_instances=(2, 3), gt_capacity=8)
    assert b.images.shape == (2, 64, 64, 3)
    assert int(b.gt.valid[0].sum()) == 2
    assert int(b.gt.valid[1].sum()) == 3
    v = np.asarray(b.gt.valid)
    boxes = np.asarray(b.gt.boxes)
    assert (boxes[v][:, 2] > boxes[v][:, 0]).all()


def test_tiny_detector_config():
    cfg = tiny_detector_config(task_id=2)
    assert cfg.task_id == 2
    assert cfg.backbone_blocks == (1, 1, 1, 1)


def test_prefetch_loader_matches_plain():
    from nsgp_repre_tpu.datasets.prefetch import PrefetchLoader

    class FakeLoader:
        def __init__(self):
            self.epoch = 0
        def set_epoch(self, e):
            self.epoch = e
        def __len__(self):
            return 5
        def __iter__(self):
            for i in range(5):
                yield (np.full((2, 2), i), [i])

    pf = PrefetchLoader(FakeLoader(), buffer_size=2)
    assert len(pf) == 5
    items = [ids[0] for _, ids in pf]
    assert items == [0, 1, 2, 3, 4]
    # reusable
    items = [ids[0] for _, ids in pf]
    assert items == [0, 1, 2, 3, 4]


def test_prefetch_transfer_fn_applied_in_worker():
    """transfer_fn runs inside the worker thread on the batch half of
    each item (the runner passes _device_batch to overlap uploads)."""
    import threading

    from nsgp_repre_tpu.datasets.prefetch import PrefetchLoader

    class FakeLoader:
        def set_epoch(self, e):
            pass
        def __len__(self):
            return 3
        def __iter__(self):
            for i in range(3):
                yield (np.full((2, 2), i), [i])

    main_thread = threading.get_ident()
    seen_threads = []

    def xfer(batch):
        seen_threads.append(threading.get_ident())
        return batch + 100

    pf = PrefetchLoader(FakeLoader(), buffer_size=2, transfer_fn=xfer)
    out = list(pf)
    assert [b[0, 0] for b, _ in out] == [100, 101, 102]
    assert [ids[0] for _, ids in out] == [0, 1, 2]
    assert all(t != main_thread for t in seen_threads)


def test_prefetch_early_break_releases_worker():
    """A consumer that stops early (max_batches caps, benchmark break)
    must unblock the worker thread instead of pinning buffered batches
    forever."""
    import threading
    import time

    from nsgp_repre_tpu.datasets.prefetch import PrefetchLoader

    class Slowless:
        def __len__(self):
            return 100
        def __iter__(self):
            for i in range(100):
                yield (np.full((1,), i), [i])

    before = threading.active_count()
    pf = PrefetchLoader(Slowless(), buffer_size=2)
    for j, (b, ids) in enumerate(pf):
        if j == 3:
            break
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before


def test_prefetch_propagates_errors():
    from nsgp_repre_tpu.datasets.prefetch import PrefetchLoader

    class Bad:
        def __iter__(self):
            yield 1
            raise ValueError("boom")
        def __len__(self):
            return 2

    import pytest
    with pytest.raises(ValueError):
        list(PrefetchLoader(Bad()))


def test_dataset_benchmark():
    """DatasetBenchmark times per-item pipeline fps (reference
    mmdet/utils/benchmark.py:406 third mode)."""
    from nsgp_repre_tpu.utils.benchmark import DatasetBenchmark

    class _DS:
        def __len__(self):
            return 32

        def __getitem__(self, i):
            return {"img": i}

    res = DatasetBenchmark(_DS(), max_iter=16, num_warmup=2).run()
    assert res["items_per_sec"] > 0
    assert res["ms_per_item"] > 0


def test_anchor_protocol_plumbing():
    """The anchor driver's two halves must read the SAME protocol from
    the shared config (tools/misc/run_anchor_mini_voc.py::_protocol) —
    v2 diverged on RepeatDataset and anchored nothing."""
    import os.path as osp
    import sys

    sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "tools", "misc"))
    from run_anchor_mini_voc import _milestones, _protocol

    scale, blocks = _protocol()
    assert scale == (400, 240)
    assert blocks == (1, 1, 1, 1)
    # milestone formula: both stacks derive drops from epochs the same way
    assert _milestones(48) == (32, 44)
    assert _milestones(24) == (16, 22)
    # torch replica accepts the depth knob and names keys the converter maps
    from torch_replica import TorchTaskFasterRCNN

    tm = TorchTaskFasterRCNN(
        num_classes=20, task_split=(0, 15, 20), task_id=1,
        backbone_blocks=blocks,
    )
    sd = tm.mmdet_state_dict()
    assert "backbone.layer4.0.conv1.weight" in sd
    assert not any(k.startswith("backbone.layer1.1.") for k in sd)
