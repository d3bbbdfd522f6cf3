"""2-process multi-host regression: the task-1 pipeline produces the
same artifacts (covariance, RoI-feature store) whether run as ONE
process or as TWO coordinated JAX processes each loading only its shard
of every global batch (VERDICT r1 item 5; reference per-rank semantics
nsrunner_roi_replay.py:73-105,746-749)."""
import os
import os.path as osp
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

HERE = osp.dirname(__file__)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_world(voc_root, work_root, nproc):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = []
    coord = f"localhost:{_free_port()}"
    for rank in range(nproc):
        cmd = [
            sys.executable, osp.join(HERE, "multihost_worker.py"),
            voc_root, work_root,
            "--nproc", str(nproc), "--rank", str(rank),
            "--coordinator", coord,
        ]
        procs.append(subprocess.Popen(
            cmd, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        ))
    outs = [p.communicate(timeout=3000)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-4000:]
    return outs


def test_two_process_artifacts_match_single(tmp_path):
    import test_pipeline as tp

    class F:
        def mktemp(self, name):
            p = tmp_path / name
            p.mkdir()
            return p

    voc_root = tp.voc_root.__wrapped__(F())

    w1 = str(tmp_path / "world1")
    w2 = str(tmp_path / "world2")
    _run_world(voc_root, w1, 1)
    outs = _run_world(voc_root, w2, 2)
    assert "DONE" in outs[0] and "DONE" in outs[1]

    from nsgp_repre_tpu.utils import checkpoint as ckpt_io

    d1, d2 = osp.join(w1, "task_1"), osp.join(w2, "task_1")
    cov1 = ckpt_io.load_covariance(d1)
    cov2 = ckpt_io.load_covariance(d2)
    assert set(cov1) == set(cov2)
    for k in cov1:
        np.testing.assert_allclose(cov1[k], cov2[k], rtol=1e-3, atol=1e-3,
                                   err_msg=k)

    r1 = ckpt_io.load_rois_etc(d1)
    r2 = ckpt_io.load_rois_etc(d2)
    assert r1[0].shape == r2[0].shape
    # same stored class labels (order-insensitive)
    assert sorted(r1[1].tolist()) == sorted(r2[1].tolist())
    np.testing.assert_allclose(
        np.sort(r1[0].sum(axis=1)), np.sort(r2[0].sum(axis=1)),
        rtol=1e-3, atol=1e-3,
    )
