// Native detection-evaluation kernels.
//
// The reference relies on pycocotools' C extension for COCO evaluation
// (SURVEY §2.9: COCOeval) and a multiprocessing Pool for VOC mAP
// (mean_ap.py:605). This library provides the hot per-image/class
// matching loops in C++; the Python layer (evaluation/*.py) keeps the
// protocol logic and falls back to numpy when the .so is absent.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)
// ABI: plain C, consumed via ctypes (no pybind11 in this image).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

namespace {

inline double box_area(const double* b) {
  return (double)(b[2] - b[0]) * (double)(b[3] - b[1]);
}

// IoU; for crowd gts, intersection over det area (COCO semantics).
inline double iou_one(const double* d, const double* g, bool crowd) {
  double x1 = std::max(d[0], g[0]);
  double y1 = std::max(d[1], g[1]);
  double x2 = std::min(d[2], g[2]);
  double y2 = std::min(d[3], g[3]);
  double iw = std::max(0.0, x2 - x1);
  double ih = std::max(0.0, y2 - y1);
  double inter = iw * ih;
  double ua = crowd ? box_area(d) : box_area(d) + box_area(g) - inter;
  if (ua <= 1e-9) return 0.0;
  return inter / ua;
}

}  // namespace

extern "C" {

// COCO-protocol greedy matching for one image/class.
// dets must be pre-sorted by score descending (caller side).
// Boxes are float64: pycocotools computes areas/IoU on Python floats,
// and float32 rounding flips area-range classification of boundary
// boxes (e.g. area exactly 32^2) — observed vs the reference oracle.
// Outputs: dt_matched/dt_ignore are (T, D) row-major uint8;
//          gt_ignore is (G,) uint8 (area-range + crowd).
void coco_match(const double* det_boxes, int D,
                const double* gt_boxes, const uint8_t* gt_crowd, int G,
                const double* iou_thrs, int T,
                double area_lo, double area_hi,
                uint8_t* dt_matched, uint8_t* dt_ignore,
                uint8_t* gt_ignore_out) {
  std::vector<uint8_t> gt_ig(G);
  for (int g = 0; g < G; ++g) {
    double a = box_area(gt_boxes + 4 * g);
    gt_ig[g] = gt_crowd[g] || a < area_lo || a > area_hi;
  }
  // sort gts: non-ignored first, stable (COCOeval convention)
  std::vector<int> order(G);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(),
                   [&](int a, int b) { return gt_ig[a] < gt_ig[b]; });

  std::vector<double> ious((size_t)D * G);
  for (int d = 0; d < D; ++d)
    for (int gi = 0; gi < G; ++gi) {
      int g = order[gi];
      ious[(size_t)d * G + gi] =
          iou_one(det_boxes + 4 * d, gt_boxes + 4 * g, gt_crowd[g] != 0);
    }

  std::vector<int> gtm((size_t)T * G, -1);
  std::memset(dt_matched, 0, (size_t)T * D);
  std::memset(dt_ignore, 0, (size_t)T * D);

  for (int t = 0; t < T; ++t) {
    for (int d = 0; d < D; ++d) {
      double best_iou = std::min(iou_thrs[t], 1.0 - 1e-10);
      int best_g = -1;
      for (int gi = 0; gi < G; ++gi) {
        int g = order[gi];
        if (gtm[(size_t)t * G + gi] >= 0 && !gt_crowd[g]) continue;
        if (best_g >= 0 && !gt_ig[order[best_g]] && gt_ig[g]) break;
        double v = ious[(size_t)d * G + gi];
        if (v < best_iou) continue;
        best_iou = v;
        best_g = gi;
      }
      if (best_g >= 0) {
        gtm[(size_t)t * G + best_g] = d;
        dt_matched[(size_t)t * D + d] = 1;
        dt_ignore[(size_t)t * D + d] = gt_ig[order[best_g]];
      } else {
        double a = box_area(det_boxes + 4 * d);
        dt_ignore[(size_t)t * D + d] = (a < area_lo || a > area_hi);
      }
    }
  }
  // report gt_ignore in ORIGINAL gt order
  for (int g = 0; g < G; ++g) gt_ignore_out[g] = gt_ig[g];
}

// VOC-protocol TP/FP for one image/class (dets pre-sorted by score).
// gt_ignore marks 'difficult' boxes: a match to one is neither TP nor FP.
void voc_tpfp(const double* det_boxes, int D,
              const double* gt_boxes, const uint8_t* gt_ignore, int G,
              double iou_thr, float* tp, float* fp) {
  std::vector<uint8_t> claimed(G, 0);
  for (int d = 0; d < D; ++d) {
    tp[d] = 0.f;
    fp[d] = 0.f;
    if (G == 0) {
      fp[d] = 1.f;
      continue;
    }
    double best = -1.0;
    int best_g = -1;
    for (int g = 0; g < G; ++g) {
      double v = iou_one(det_boxes + 4 * d, gt_boxes + 4 * g, false);
      if (v > best) {
        best = v;
        best_g = g;
      }
    }
    if (best >= iou_thr) {
      if (gt_ignore[best_g]) continue;  // neither tp nor fp
      if (!claimed[best_g]) {
        claimed[best_g] = 1;
        tp[d] = 1.f;
      } else {
        fp[d] = 1.f;
      }
    } else {
      fp[d] = 1.f;
    }
  }
}

}  // extern "C"
