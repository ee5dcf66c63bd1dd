// Native evaluation core.
//
// Host-side greedy detection<->GT matching, the sequential inner loop of
// VOC AP / CorLoc and COCO-style AP evaluation. The reference carries a C++
// fast path for exactly this reason (detectron2/layers/csrc/cocoeval/
// cocoeval.cpp); this is its standalone equivalent for the TPU framework —
// plain C ABI, loaded via ctypes (no pybind11 in this image).
//
// Build: make -C native   (produces native/build/libeval_core.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

// VOC devkit IoU (+1 pixel areas).
inline double voc_iou(const double* g, const double* b) {
  double ixmin = std::max(g[0], b[0]);
  double iymin = std::max(g[1], b[1]);
  double ixmax = std::min(g[2], b[2]);
  double iymax = std::min(g[3], b[3]);
  double iw = std::max(ixmax - ixmin + 1.0, 0.0);
  double ih = std::max(iymax - iymin + 1.0, 0.0);
  double inter = iw * ih;
  double uni = (b[2] - b[0] + 1.0) * (b[3] - b[1] + 1.0) +
               (g[2] - g[0] + 1.0) * (g[3] - g[1] + 1.0) - inter;
  return uni > 0 ? inter / uni : 0.0;
}

// Plain IoU (COCO convention, no +1).
inline double coco_iou(const double* g, const double* b) {
  double ixmin = std::max(g[0], b[0]);
  double iymin = std::max(g[1], b[1]);
  double ixmax = std::min(g[2], b[2]);
  double iymax = std::min(g[3], b[3]);
  double iw = std::max(ixmax - ixmin, 0.0);
  double ih = std::max(iymax - iymin, 0.0);
  double inter = iw * ih;
  double uni = (b[2] - b[0]) * (b[3] - b[1]) +
               (g[2] - g[0]) * (g[3] - g[1]) - inter;
  return uni > 0 ? inter / uni : 0.0;
}

}  // namespace

extern "C" {

// VOC greedy matching for one class over the whole dataset.
//
// Detections MUST be pre-sorted by descending confidence.
//   det_boxes: (D, 4) float64, det_img: (D,) int32 image index
//   gt_boxes:  (G, 4) float64 grouped by image, gt_offsets: (n_images+1,)
//   gt_difficult: (G,) uint8
// Outputs: tp/fp: (D,) uint8  (reference voc_eval,
// detectron2/evaluation/pascal_voc_evaluation.py:288-340).
void voc_match(const double* det_boxes, const int32_t* det_img, int64_t D,
               const double* gt_boxes, const uint8_t* gt_difficult,
               const int64_t* gt_offsets, int64_t n_images, double ovthresh,
               uint8_t* tp, uint8_t* fp) {
  std::vector<uint8_t> taken(gt_offsets[n_images], 0);
  for (int64_t d = 0; d < D; ++d) {
    tp[d] = 0;
    fp[d] = 0;
    int32_t im = det_img[d];
    if (im < 0 || im >= n_images) {
      fp[d] = 1;
      continue;
    }
    int64_t g0 = gt_offsets[im], g1 = gt_offsets[im + 1];
    double ovmax = -1.0;
    int64_t jmax = -1;
    for (int64_t g = g0; g < g1; ++g) {
      double ov = voc_iou(gt_boxes + 4 * g, det_boxes + 4 * d);
      if (ov > ovmax) {
        ovmax = ov;
        jmax = g;
      }
    }
    if (jmax >= 0 && ovmax > ovthresh) {
      if (!gt_difficult[jmax]) {
        if (!taken[jmax]) {
          tp[d] = 1;
          taken[jmax] = 1;
        } else {
          fp[d] = 1;
        }
      }
      // difficult match: neither tp nor fp (ignored)
    } else {
      fp[d] = 1;
    }
  }
}

// VOC CorLoc for one class: only the first (highest-scoring) detection per
// image counts (reference voc_eval_corloc, pascal_voc_evaluation.py:353-455).
// Outputs per-image verdicts: 1 = localized, 0 = missed, -1 = not judged.
void voc_corloc(const double* det_boxes, const int32_t* det_img, int64_t D,
                const double* gt_boxes, const uint8_t* gt_difficult,
                const int64_t* gt_offsets, int64_t n_images, double ovthresh,
                int8_t* verdict) {
  for (int64_t i = 0; i < n_images; ++i) verdict[i] = -1;
  for (int64_t d = 0; d < D; ++d) {
    int32_t im = det_img[d];
    if (im < 0 || im >= n_images || verdict[im] != -1) continue;
    int64_t g0 = gt_offsets[im], g1 = gt_offsets[im + 1];
    bool any_easy = false;
    for (int64_t g = g0; g < g1; ++g)
      if (!gt_difficult[g]) any_easy = true;
    if (!any_easy) continue;
    double ovmax = -1.0;
    for (int64_t g = g0; g < g1; ++g)
      ovmax = std::max(ovmax, voc_iou(gt_boxes + 4 * g, det_boxes + 4 * d));
    verdict[im] = ovmax > ovthresh ? 1 : 0;
  }
}

// COCO-style greedy matching for one class in one image over T IoU
// thresholds (the O(T*D*G) loop of cocoeval; reference csrc/cocoeval/
// cocoeval.cpp EvaluateImages). Detections pre-sorted by descending score.
//   ious: (D, G) float64 precomputable or null -> computed here
// Outputs tp/ignored: (T, D) uint8.
void coco_match(const double* det_boxes, int64_t D, const double* gt_boxes,
                const uint8_t* gt_ignore, int64_t G, const double* iou_thrs,
                int64_t T, uint8_t* tp, uint8_t* ign) {
  std::vector<double> ious(static_cast<size_t>(D) * G);
  for (int64_t d = 0; d < D; ++d)
    for (int64_t g = 0; g < G; ++g)
      ious[d * G + g] = coco_iou(gt_boxes + 4 * g, det_boxes + 4 * d);

  std::vector<uint8_t> taken(G);
  for (int64_t t = 0; t < T; ++t) {
    std::fill(taken.begin(), taken.end(), 0);
    for (int64_t d = 0; d < D; ++d) {
      double best_iou = iou_thrs[t];
      int64_t best = -1;
      for (int64_t g = 0; g < G; ++g) {
        if (taken[g] && !gt_ignore[g]) continue;
        if (ious[d * G + g] >= best_iou) {
          // prefer non-ignored matches
          if (best > -1 && !gt_ignore[best] && gt_ignore[g]) continue;
          best = g;
          best_iou = ious[d * G + g];
        }
      }
      uint8_t is_tp = 0, is_ign = 0;
      if (best > -1) {
        if (gt_ignore[best]) {
          is_ign = 1;
        } else {
          is_tp = 1;
          taken[best] = 1;
        }
      }
      tp[t * D + d] = is_tp;
      ign[t * D + d] = is_ign;
    }
  }
}

}  // extern "C"
