"""COCO-style keypoint evaluation (OKS AP), dependency-free.

The reference quotes COCO AP from the paper and relies on pycocotools
for any actual evaluation (SURVEY.md section 4). pycocotools is absent
here, so this module implements the COCO keypoint metric directly:
object-keypoint-similarity matching, greedy per-image assignment
(highest-scored detections first, as COCOeval does), and AP averaged
over OKS thresholds .50:.05:.95.

Inputs use the framework's people-JSON contract plus COCO-style GT
(per-image list of persons with (17|18, 3) keypoint arrays and areas).
"""

from __future__ import annotations

import numpy as np

from tpupose import topology

# COCO per-keypoint sigmas (17 kps) mapped onto our 18 parts; the
# synthesised neck reuses the shoulder sigma.
_COCO_SIGMAS = {
    "nose": 0.026, "Leye": 0.025, "Reye": 0.025, "Lear": 0.035, "Rear": 0.035,
    "Lsho": 0.079, "Rsho": 0.079, "Lelb": 0.072, "Relb": 0.072,
    "Lwri": 0.062, "Rwri": 0.062, "Lhip": 0.107, "Rhip": 0.107,
    "Lkne": 0.087, "Rkne": 0.087, "Lank": 0.089, "Rank": 0.089,
    "neck": 0.079,
}
SIGMAS = np.asarray([_COCO_SIGMAS[p] for p in topology.PARTS])

OKS_THRESHOLDS = np.arange(0.5, 1.0, 0.05)


def oks(
    pred: np.ndarray, gt: np.ndarray, area: float
) -> float:
    """Object keypoint similarity between one (18, 3) prediction
    [x, y, score] and one (18, 3) GT [x, y, v] (v < 2 = labelled)."""
    labelled = gt[:, 2] < 2
    if not labelled.any():
        return 0.0
    d2 = (pred[:, 0] - gt[:, 0]) ** 2 + (pred[:, 1] - gt[:, 1]) ** 2
    var = (2 * SIGMAS) ** 2
    e = d2 / var / (max(area, 1.0) * 2.0)
    return float(np.exp(-e)[labelled].mean())


def people_to_array(people: list[dict]) -> tuple[np.ndarray, np.ndarray]:
    """people JSON -> ((N, 18, 3) keypoints [x, y, present], (N,) scores)."""
    n = len(people)
    kps = np.zeros((n, topology.NUM_PARTS, 3))
    kps[:, :, 2] = 2.0
    scores = np.zeros(n)
    for i, person in enumerate(people):
        for name, v in person["keypoints"].items():
            pi = topology.PART_INDEX[name]
            kps[i, pi] = (v["x"], v["y"], 0.0)
        scores[i] = person["score"]
    return kps, scores


def evaluate(
    predictions: list[list[dict]],
    gts: list[list[dict]],
) -> dict[str, float]:
    """AP over OKS thresholds.

    predictions[i]: people JSON for image i.
    gts[i]: list of {"keypoints": (18, 3) internal-order or (17, 3)
    COCO-order array-like, "area": float} for image i. 17-keypoint GT is
    converted (neck synthesised from the shoulders).
    Returns {"AP": mean AP, "AP50": ..., "AP75": ...}.
    """
    n_thr = len(OKS_THRESHOLDS)
    det_scores_all: list[float] = []
    det_tp_all: list[np.ndarray] = []  # (n_thr,) bool per detection
    total_gt = 0

    def _to_internal(kp) -> np.ndarray:
        kp = np.asarray(kp, np.float64)
        if kp.shape[0] == topology.NUM_PARTS:
            return kp
        if kp.shape[0] == 17:  # COCO order with COCO visibility codes
            from tpupose.data.coco_prep import coco_joints_to_parts

            return coco_joints_to_parts(kp.reshape(-1).tolist())
        raise ValueError(f"GT keypoints must be (17|18, 3), got {kp.shape}")

    for preds, gt_list in zip(predictions, gts):
        gt_kps = [_to_internal(g["keypoints"]) for g in gt_list]
        gt_area = [float(g.get("area", 1.0)) for g in gt_list]
        total_gt += len(gt_list)

        det_kps, det_scores = people_to_array(preds)
        # stable, like COCOeval's mergesort: ties keep detection order
        order = np.argsort(-det_scores, kind="stable")

        ious = np.zeros((len(order), len(gt_list)))
        for r, di in enumerate(order):
            for gj in range(len(gt_list)):
                ious[r, gj] = oks(det_kps[di], gt_kps[gj], gt_area[gj])

        tp = np.zeros((len(order), n_thr), bool)
        for thr_i, thr in enumerate(OKS_THRESHOLDS):
            taken = np.zeros(len(gt_list), bool)
            for r in range(len(order)):
                best, best_j = thr, -1
                for gj in range(len(gt_list)):
                    if taken[gj] or ious[r, gj] < best:
                        continue
                    best, best_j = ious[r, gj], gj
                if best_j >= 0:
                    taken[best_j] = True
                    tp[r, thr_i] = True
        for r, di in enumerate(order):
            det_scores_all.append(float(det_scores[di]))
            det_tp_all.append(tp[r])

    if total_gt == 0:
        return {"AP": 0.0, "AP50": 0.0, "AP75": 0.0}

    aps = []
    rank = sorted(range(len(det_scores_all)), key=lambda i: -det_scores_all[i])
    # (python sorted is stable: global ties keep per-image insertion order,
    # matching COCOeval's kind='mergesort')
    rec_points = np.linspace(0, 1, 101)
    for thr_i in range(n_thr):
        tp = np.asarray([det_tp_all[i][thr_i] for i in rank], bool)
        if len(tp) == 0:
            aps.append(0.0)
            continue
        cum_tp = np.cumsum(tp)
        recall = cum_tp / total_gt
        precision = cum_tp / (np.arange(len(tp)) + 1)
        # COCO 101-point interpolation
        pr = np.maximum.accumulate(precision[::-1])[::-1]
        idxs = np.searchsorted(recall, rec_points, side="left")
        prec_interp = np.asarray(
            [pr[ix] if ix < len(pr) else 0.0 for ix in idxs]
        )
        aps.append(float(prec_interp.mean()))

    return {
        "AP": float(np.mean(aps)),
        "AP50": aps[0],
        "AP75": aps[5],
    }
