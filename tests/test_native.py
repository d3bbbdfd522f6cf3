"""Native C++ eval kernels agree with the numpy reference paths."""
import numpy as np
import pytest

from nsgp_repre_tpu.native import coco_match_native, get_lib, voc_tpfp_native


needs_native = pytest.mark.skipif(get_lib() is None, reason="native lib unavailable")


@needs_native
class TestNativeVOC:
    def test_matches_numpy(self):
        rng = np.random.RandomState(0)
        for trial in range(5):
            D, G = rng.randint(1, 30), rng.randint(0, 10)
            det = np.concatenate(
                [rng.uniform(0, 50, (D, 2)), rng.uniform(55, 100, (D, 2))], axis=1
            ).astype(np.float32)
            gt = np.concatenate(
                [rng.uniform(0, 50, (G, 2)), rng.uniform(55, 100, (G, 2))], axis=1
            ).astype(np.float32)
            ignore = (rng.rand(G) < 0.3).astype(np.uint8)
            tp_n, fp_n = voc_tpfp_native(det, gt, ignore, 0.5)

            # numpy reference (evaluation/voc_map.py fallback path)
            from nsgp_repre_tpu.evaluation.voc_map import _iou_matrix

            tp = np.zeros(D, np.float32)
            fp = np.zeros(D, np.float32)
            if G == 0:
                fp[:] = 1
            else:
                ious = _iou_matrix(det, gt)
                claimed = np.zeros(G, bool)
                for d in range(D):
                    best = ious[d].argmax()
                    if ious[d, best] >= 0.5:
                        if ignore[best]:
                            continue
                        if not claimed[best]:
                            claimed[best] = True
                            tp[d] = 1
                        else:
                            fp[d] = 1
                    else:
                        fp[d] = 1
            np.testing.assert_array_equal(tp_n, tp)
            np.testing.assert_array_equal(fp_n, fp)


@needs_native
class TestNativeCOCO:
    def test_perfect_match(self):
        det = np.array([[0, 0, 50, 50]], np.float32)
        gt = np.array([[0, 0, 50, 50]], np.float32)
        thrs = np.linspace(0.5, 0.95, 10)
        dtm, dti, gti = coco_match_native(det, gt, np.zeros(1, np.uint8), thrs, 0, 1e10)
        assert dtm.all()
        assert not dti.any()
        assert not gti.any()

    def test_loose_match_partial(self):
        det = np.array([[0, 0, 80, 80]], np.float32)
        gt = np.array([[0, 0, 100, 100]], np.float32)
        thrs = np.linspace(0.5, 0.95, 10)
        dtm, _, _ = coco_match_native(det, gt, np.zeros(1, np.uint8), thrs, 0, 1e10)
        # IoU = 0.64 → matched at 0.5/0.55/0.6 only
        assert dtm[:3].all() and not dtm[3:].any()

    def test_crowd_ignored(self):
        det = np.array([[0, 0, 10, 10]], np.float32)
        gt = np.array([[0, 0, 100, 100]], np.float32)
        thrs = np.array([0.5])
        # IoU-with-crowd = inter/det_area = 1.0 → matched but ignored
        dtm, dti, gti = coco_match_native(det, gt, np.ones(1, np.uint8), thrs, 0, 1e10)
        assert dtm[0, 0] and dti[0, 0] and gti[0]

    def test_area_range(self):
        det = np.array([[0, 0, 10, 10]], np.float32)  # area 100
        gt = np.array([[0, 0, 10, 10]], np.float32)
        thrs = np.array([0.5])
        _, _, gti = coco_match_native(
            det, gt, np.zeros(1, np.uint8), thrs, 32 ** 2, 1e10
        )
        assert gti[0]  # too small for the 'medium' range


def test_coco_map_uses_native_consistently():
    """End-to-end coco eval gives same result whether native or not —
    covered implicitly: if native is present it's used; spot-check value."""
    from nsgp_repre_tpu.evaluation import eval_coco_map

    ann = [dict(boxes=np.array([[0, 0, 50, 50]], np.float32), labels=np.array([0]))]
    det = [{0: (np.array([[0, 0, 50, 50]], np.float32), np.array([0.95]))}]
    res = eval_coco_map(det, ann, num_classes=1)
    assert res["mAP"] > 0.99
