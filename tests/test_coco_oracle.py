"""Golden validation of evaluation/coco_map.py against the reference's
ACTUAL COCOeval matching code.

pycocotools is not installed in this image, but the reference vendors the
verbatim upstream ``COCOeval.evaluateImg`` greedy matcher and
``summarize`` in ``mmdet/datasets/api_wrappers/cocoeval_mp.py:131,213``
(COCOevalMP only overrides _prepare/evaluate for multiprocessing; the
matching/summary bodies are the published pycocotools algorithm
line-for-line).  This test loads that class read-only at test time and
drives its real ``evaluateImg``/``summarize`` as the oracle; only the two
trivial numeric helpers the stubbed base class would have provided are
supplied here:

- ``computeIoU``: xyxy IoU with the documented crowd semantics
  (intersection over det area for iscrowd gts, maskUtils.iou bbox mode);
- ``accumulate``: the published precision/recall accumulation
  (cumsum TP/FP over globally mergesort-ranked scores, 101-point
  searchsorted interpolation) — a direct port of the pycocotools
  algorithm, operating ONLY on numbers produced by the reference's
  evaluateImg.

The fixture is randomized and adversarial: crowd gts, score ties,
area-range boundary boxes, images with dets-but-no-gts and gts-but-no-
dets, classes absent from whole images.
"""
from __future__ import annotations

import importlib.util
import sys
import types
from collections import defaultdict

import numpy as np
import pytest

from nsgp_repre_tpu.evaluation.coco_map import eval_coco_map

REF_FILE = "/root/reference/mmdet/datasets/api_wrappers/cocoeval_mp.py"

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RNG = [
    [0.0, 1e10],
    [0.0, 32.0 ** 2],
    [32.0 ** 2, 96.0 ** 2],
    [96.0 ** 2, 1e10],
]
AREA_LBL = ["all", "small", "medium", "large"]


def _load_reference_cocoeval():
    """Import COCOevalMP from the reference with its absent deps stubbed
    (pycocotools base class is empty — every method we call is the
    reference's own code)."""
    from ref_stubs import install_mmengine_stub, install_pycocotools_stub

    install_pycocotools_stub()
    install_mmengine_stub()
    spec = importlib.util.spec_from_file_location("_ref_cocoeval", REF_FILE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.COCOevalMP


class _Params:
    def __init__(self, img_ids, cat_ids):
        self.iouType = "bbox"
        self.iouThrs = IOU_THRS
        self.recThrs = REC_THRS
        self.maxDets = [1, 10, 100]
        self.areaRng = AREA_RNG
        self.areaRngLbl = AREA_LBL
        self.imgIds = list(img_ids)
        self.catIds = list(cat_ids)
        self.useCats = 1
        self.useSegm = None


class _Logger:
    def info(self, *a, **k):
        pass


def _iou_xyxy_crowd(dets, gts, iscrowd):
    """maskUtils.iou bbox semantics: crowd gt → inter / det area."""
    if len(dets) == 0 or len(gts) == 0:
        return np.zeros((len(dets), len(gts)))
    lt = np.maximum(dets[:, None, :2], gts[None, :, :2])
    rb = np.minimum(dets[:, None, 2:], gts[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    ad = (dets[:, 2] - dets[:, 0]) * (dets[:, 3] - dets[:, 1])
    ag = (gts[:, 2] - gts[:, 0]) * (gts[:, 3] - gts[:, 1])
    union = ad[:, None] + ag[None, :] - inter
    union = np.where(np.asarray(iscrowd, bool)[None, :], ad[:, None], union)
    return inter / np.maximum(union, 1e-12)


def _run_oracle(gts_per_img, dts_per_img, num_classes):
    """Drive the reference evaluateImg over every (cat, area, img) cell,
    accumulate with the published algorithm, summarize with the
    reference's summarize; return its stats vector."""
    COCOevalMP = _load_reference_cocoeval()
    img_ids = list(range(len(gts_per_img)))
    cat_ids = list(range(num_classes))
    ev = object.__new__(COCOevalMP)
    ev.params = _Params(img_ids, cat_ids)
    ev.logger = _Logger()
    ev.eval = {}

    _gts = defaultdict(list)
    _dts = defaultdict(list)
    uid = [1]

    def _nid():
        uid[0] += 1
        return uid[0]

    for i, ann in enumerate(gts_per_img):
        for b, l, c in zip(ann["boxes"], ann["labels"], ann["iscrowd"]):
            area = float((b[2] - b[0]) * (b[3] - b[1]))
            _gts[i, int(l)].append(
                dict(id=_nid(), bbox=np.asarray(b, float), area=area,
                     iscrowd=int(c), ignore=int(c))
            )
    for i, det in enumerate(dts_per_img):
        for c, (boxes, scores) in det.items():
            for b, s in zip(boxes, scores):
                area = float((b[2] - b[0]) * (b[3] - b[1]))
                _dts[i, int(c)].append(
                    dict(id=_nid(), bbox=np.asarray(b, float), area=area,
                         score=float(s))
                )
    ev._gts, ev._dts = _gts, _dts

    def computeIoU(imgId, catId):
        gt = _gts[imgId, catId]
        dt = _dts[imgId, catId]
        if len(gt) == 0 or len(dt) == 0:
            return np.zeros((len(dt), len(gt)))
        inds = np.argsort([-d["score"] for d in dt], kind="mergesort")
        dt = [dt[i] for i in inds][: ev.params.maxDets[-1]]
        d = np.stack([x["bbox"] for x in dt])
        g = np.stack([x["bbox"] for x in gt])
        crowd = [x["iscrowd"] for x in gt]
        return _iou_xyxy_crowd(d, g, crowd)

    ev.computeIoU = computeIoU

    # upstream evaluate() flat ordering: k-major, then area, then img
    max_det = max(ev.params.maxDets)
    eval_imgs = [
        ev.evaluateImg(imgId, catId, aRng, max_det)
        for catId in cat_ids
        for aRng in AREA_RNG
        for imgId in img_ids
    ]

    # ---- published pycocotools accumulate, on reference evaluateImg outputs
    T, R = len(IOU_THRS), len(REC_THRS)
    K, A, M = len(cat_ids), len(AREA_RNG), len(ev.params.maxDets)
    I = len(img_ids)
    precision = -np.ones((T, R, K, A, M))
    recall = -np.ones((T, K, A, M))
    scores_out = -np.ones((T, R, K, A, M))
    for k in range(K):
        for a in range(A):
            E = [eval_imgs[k * A * I + a * I + i] for i in range(I)]
            E = [e for e in E if e is not None]
            if len(E) == 0:
                continue
            for m, maxDet in enumerate(ev.params.maxDets):
                dt_scores = np.concatenate(
                    [np.asarray(e["dtScores"][0:maxDet]) for e in E]
                )
                inds = np.argsort(-dt_scores, kind="mergesort")
                dt_sorted = dt_scores[inds]
                dtm = np.concatenate(
                    [e["dtMatches"][:, 0:maxDet] for e in E], axis=1
                )[:, inds]
                dt_ig = np.concatenate(
                    [e["dtIgnore"][:, 0:maxDet] for e in E], axis=1
                )[:, inds]
                gt_ig = np.concatenate([e["gtIgnore"] for e in E])
                npig = np.count_nonzero(gt_ig == 0)
                if npig == 0:
                    continue
                tps = np.logical_and(dtm, np.logical_not(dt_ig))
                fps = np.logical_and(np.logical_not(dtm), np.logical_not(dt_ig))
                tp_sum = np.cumsum(tps, axis=1).astype(np.float64)
                fp_sum = np.cumsum(fps, axis=1).astype(np.float64)
                for t in range(T):
                    tp, fp = tp_sum[t], fp_sum[t]
                    nd = len(tp)
                    rc = tp / npig
                    pr = (tp / (fp + tp + np.spacing(1))).tolist()
                    q = np.zeros(R)
                    ss = np.zeros(R)
                    recall[t, k, a, m] = rc[-1] if nd else 0
                    for i in range(nd - 1, 0, -1):
                        if pr[i] > pr[i - 1]:
                            pr[i - 1] = pr[i]
                    ins = np.searchsorted(rc, REC_THRS, side="left")
                    try:
                        for ri, pi in enumerate(ins):
                            q[ri] = pr[pi]
                            ss[ri] = dt_sorted[pi]
                    except IndexError:
                        pass
                    precision[t, :, k, a, m] = q
                    scores_out[t, :, k, a, m] = ss
    ev.eval = dict(
        params=ev.params,
        counts=[T, R, K, A, M],
        precision=precision,
        recall=recall,
        scores=scores_out,
    )
    ev.summarize()  # the reference's real summarize
    return ev.stats


def _make_fixture(seed=0, n_img=12, num_classes=3):
    """Adversarial random detections/annotations in eval_coco_map's
    native format."""
    rng = np.random.RandomState(seed)
    gts, dts = [], []
    for i in range(n_img):
        boxes, labels, crowd = [], [], []
        if i != 3:  # image 3: dets but no gts
            for _ in range(rng.randint(1, 6)):
                # sizes spanning small/medium/large incl. boundary areas
                size = rng.choice([8.0, 31.9, 32.0, 60.0, 96.0, 200.0])
                x, y = rng.uniform(0, 400, 2)
                ar = rng.uniform(0.5, 2.0)
                boxes.append([x, y, x + size * ar, y + size / ar])
                labels.append(rng.randint(num_classes))
                crowd.append(rng.rand() < 0.15)
        gts.append(
            dict(
                boxes=np.asarray(boxes, np.float64).reshape(-1, 4),
                labels=np.asarray(labels, np.int64),
                iscrowd=np.asarray(crowd, bool),
            )
        )
        det = {}
        if i != 7:  # image 7: gts but no dets
            for c in range(num_classes):
                db, ds = [], []
                # jittered copies of this class's gts (incl. duplicates)
                for b, l in zip(gts[-1]["boxes"], gts[-1]["labels"]):
                    if l != c:
                        continue
                    for _ in range(rng.randint(0, 3)):
                        j = rng.uniform(-6, 6, 4)
                        db.append(np.asarray(b) + j)
                        ds.append(round(float(rng.rand()), 1))  # forced ties
                # false positives
                for _ in range(rng.randint(0, 3)):
                    x, y = rng.uniform(0, 400, 2)
                    w, h = rng.uniform(5, 120, 2)
                    db.append([x, y, x + w, y + h])
                    ds.append(round(float(rng.rand()), 1))
                if db:
                    det[c] = (
                        np.asarray(db, np.float64).reshape(-1, 4),
                        np.asarray(ds, np.float64),
                    )
        dts.append(det)
    return dts, gts


KEYS = ["mAP", "mAP_50", "mAP_75", "mAP_s", "mAP_m", "mAP_l"]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_coco_map_matches_reference_protocol(seed):
    """eval_coco_map == the reference's verbatim evaluateImg + summarize
    on an adversarial fixture (stats[0:6] = AP/AP50/AP75/APs/APm/APl)."""
    dts, gts = _make_fixture(seed)
    stats = _run_oracle(gts, dts, num_classes=3)
    ours = eval_coco_map(dts, gts, num_classes=3)
    golden = {k: (float(v) if v > -1 else 0.0) for k, v in zip(KEYS, stats[:6])}
    for k in KEYS:
        assert ours[k] == pytest.approx(golden[k], abs=1e-8), (
            k, ours[k], golden[k])
    assert ours["mAP"] > 0.05  # fixture actually scores


def test_coco_map_numpy_fallback_matches_native(monkeypatch):
    """The pure-numpy matcher path agrees with whichever path is active
    by default (C++ native or numpy) — both must equal the oracle."""
    import nsgp_repre_tpu.evaluation.coco_map as cm
    import nsgp_repre_tpu.native as native_mod

    dts, gts = _make_fixture(5)
    default = eval_coco_map(dts, gts, num_classes=3)
    # _evaluate_img re-imports coco_match_native from the module at call
    # time, so patching the attribute forces the numpy fallback
    monkeypatch.setattr(native_mod, "coco_match_native",
                        lambda *a, **k: None)
    fallback = cm.eval_coco_map(dts, gts, num_classes=3)
    for k in KEYS:
        assert default[k] == pytest.approx(fallback[k], abs=1e-9)
