"""Golden-fixture validation of the OKS AP evaluator (round-1 VERDICT
weak #6: coco_eval was only self-consistent). Every expected value here
is hand-computed from pycocotools COCOeval semantics:

  * OKS: exp(-d^2 / (2*sigma)^2 / (2*area)), averaged over labelled kps
  * per-image greedy matching: detections in score order, each takes the
    best remaining GT with OKS >= threshold
  * AP: 101-point interpolated precision over recall, averaged over OKS
    thresholds .50:.05:.95
"""

import numpy as np

from tpupose import topology
from tpupose.data import coco_eval


def person_kps(offset=0.0, n_parts=18):
    """(18, 3) GT: all parts labelled on a grid."""
    kp = np.zeros((n_parts, 3))
    for i in range(n_parts):
        kp[i] = (50.0 + 10 * i + offset, 80.0 + 5 * i, 0.0)
    return kp


def as_pred(kp, score, dx=0.0):
    """GT array -> people-JSON prediction shifted by dx."""
    return {
        "keypoints": {
            topology.PARTS[i]: {"x": float(kp[i, 0] + dx), "y": float(kp[i, 1]),
                                "score": 0.5}
            for i in range(kp.shape[0])
        },
        "score": score,
        "num_parts": int(kp.shape[0]),
    }


def test_oks_formula_matches_cocoeval():
    """Pin the OKS kernel against a hand-computed pycocotools value."""
    gt = np.zeros((18, 3))
    gt[:, 2] = 2.0
    gt[0] = (100.0, 100.0, 0.0)           # nose only, sigma 0.026
    pred = np.zeros((18, 3))
    pred[0] = (103.0, 104.0, 0.0)         # d^2 = 25
    area = 1000.0
    # e = 25 / (2*0.026)^2 / (2*1000) = 25 / 0.002704 / 2000
    expected = np.exp(-25.0 / (2 * 0.026) ** 2 / (2 * area))
    got = coco_eval.oks(pred, gt, area)
    np.testing.assert_allclose(got, expected, rtol=1e-12)


def test_perfect_detections_ap_1():
    gt1, gt2 = person_kps(0.0), person_kps(150.0)
    gts = [[{"keypoints": gt1, "area": 5000.0},
            {"keypoints": gt2, "area": 5000.0}]]
    preds = [[as_pred(gt1, 0.9), as_pred(gt2, 0.8)]]
    res = coco_eval.evaluate(preds, gts)
    assert res["AP"] == res["AP50"] == res["AP75"] == 1.0
    assert res["AR"] == res["AR50"] == res["AR75"] == 1.0
    # both GT areas (5000) fall in the medium range [32^2, 96^2];
    # the large range holds no GT -> COCOeval's -1 sentinel
    assert res["AP_M"] == res["AR_M"] == 1.0
    assert res["AP_L"] == res["AR_L"] == -1.0


def test_partial_match_hand_computed_ap():
    """One perfect detection + one mid-OKS detection of a second GT.

    With OKS(det2) = s passing exactly the thresholds {.50...} <= s:
    at passing thresholds tp = [1, 1] -> 101-pt AP = 1.0; at failing
    thresholds tp = [1, 0] -> recall caps at 0.5 -> AP = 51/101.
    """
    gt1, gt2 = person_kps(0.0), person_kps(150.0)
    area = 4000.0
    gts = [[{"keypoints": gt1, "area": area},
            {"keypoints": gt2, "area": area}]]
    dx = 6.0   # -> OKS ~0.678: passes thresholds .50/.55/.60/.65, fails .70+
    preds = [[as_pred(gt1, 0.9), as_pred(gt2, 0.8, dx=dx)]]

    # hand-compute det2's OKS: every kp shifted by dx
    s = float(np.mean(np.exp(-dx * dx / (2 * coco_eval.SIGMAS) ** 2 / (2 * area))))
    assert 0.5 < s < 0.95  # scenario sanity: s must split the thresholds
    n_pass = int(np.sum(coco_eval.OKS_THRESHOLDS <= s))
    expected_ap = (n_pass * 1.0 + (10 - n_pass) * (51 / 101)) / 10.0

    res = coco_eval.evaluate(preds, gts)
    np.testing.assert_allclose(res["AP"], expected_ap, rtol=1e-9)
    assert res["AP50"] == 1.0


def test_false_positive_ranks_into_precision():
    """2 images: a perfect detection and a pure false positive with a
    HIGHER score. Global ranking: [FP, TP] -> precision [0, 0.5],
    recall [0, 1]. Interpolated: all 101 recall points read the
    right-cummax precision 0.5 -> AP = 0.5 at every threshold."""
    gt1 = person_kps(0.0)
    gts = [[{"keypoints": gt1, "area": 5000.0}], []]
    fp = as_pred(person_kps(800.0), 0.95)   # nothing to match in image 2
    preds = [[as_pred(gt1, 0.6)], [fp]]
    res = coco_eval.evaluate(preds, gts)
    np.testing.assert_allclose(res["AP"], 0.5, rtol=1e-9)
    np.testing.assert_allclose(res["AP50"], 0.5, rtol=1e-9)


def test_max_dets_cap_drops_lowest_scored():
    """COCO keypoints caps detections at 20/image (score-descending).
    21 detections where the only TRUE one has the LOWEST score: with
    the cap it is dropped entirely (AP 0); uncapped it survives at
    rank 21 -> every recall point reads right-cummax precision 1/21."""
    gt1 = person_kps(0.0)
    gts = [[{"keypoints": gt1, "area": 5000.0}]]
    junk = [as_pred(person_kps(800.0 + 40 * i), 0.9 - 0.01 * i)
            for i in range(20)]
    preds = [junk + [as_pred(gt1, 0.05)]]

    capped = coco_eval.evaluate(preds, gts)
    assert capped["AP"] == 0.0
    assert capped["AR"] == 0.0

    uncapped = coco_eval.evaluate(preds, gts, max_dets=100)
    np.testing.assert_allclose(uncapped["AP"], 1 / 21, rtol=1e-9)
    assert uncapped["AR"] == 1.0


def test_area_range_ignore_semantics():
    """Medium GT (area 5000) + large GT (area 10^5): in the medium
    range the large GT is IGNORED — its (perfect) detection matches
    the ignored GT and counts neither TP nor FP, so AP_M stays 1.0
    (COCOeval gt-ignore semantics), and symmetrically for AP_L."""
    gt_m, gt_l = person_kps(0.0), person_kps(400.0)
    gts = [[{"keypoints": gt_m, "area": 5000.0},
            {"keypoints": gt_l, "area": 1e5}]]
    preds = [[as_pred(gt_m, 0.9), as_pred(gt_l, 0.8)]]
    res = coco_eval.evaluate(preds, gts)
    assert res["AP"] == res["AR"] == 1.0
    assert res["AP_M"] == res["AR_M"] == 1.0
    assert res["AP_L"] == res["AR_L"] == 1.0


def test_recall_is_final_recall_at_max_dets():
    """2 GT, 1 perfect detection: AR = 0.5 at every threshold while
    AP = 51/101 (precision 1 up to recall 0.5, then 0)."""
    gt1, gt2 = person_kps(0.0), person_kps(300.0)
    gts = [[{"keypoints": gt1, "area": 4000.0},
            {"keypoints": gt2, "area": 4000.0}]]
    preds = [[as_pred(gt1, 0.9)]]
    res = coco_eval.evaluate(preds, gts)
    np.testing.assert_allclose(res["AR"], 0.5, rtol=1e-9)
    np.testing.assert_allclose(res["AP"], 51 / 101, rtol=1e-9)


def test_greedy_matching_prefers_best_oks_not_first_gt():
    """One detection between two GTs must take the HIGHER-OKS one, and
    the leftover GT counts as a miss (recall 0.5)."""
    gt_near = person_kps(0.0)
    gt_far = person_kps(30.0)
    area = 4000.0
    gts = [[{"keypoints": gt_far, "area": area},   # listed first, worse OKS
            {"keypoints": gt_near, "area": area}]]
    preds = [[as_pred(gt_near, 0.9, dx=2.0)]]      # clearly nearest gt_near
    res = coco_eval.evaluate(preds, gts)
    # tp=[1] against total_gt=2 -> recall 0.5, precision 1 -> AP = 51/101
    np.testing.assert_allclose(res["AP50"], 51 / 101, rtol=1e-9)


def unlabelled_kps():
    """(18, 3) GT with NO labelled keypoints (v=2 everywhere) — the
    shape of a COCO crowd / unannotated-person ignore annotation."""
    kp = np.zeros((18, 3))
    kp[:, 2] = 2.0
    return kp


def test_oks_bbox_fallback_hand_computed():
    """computeOks parity for keypointless GT: distances clamp to the
    2x-expanded bbox and average over ALL detection slots."""
    gt = unlabelled_kps()
    bbox = (100.0, 100.0, 50.0, 40.0)   # expanded: x [50, 200], y [60, 180]
    area = 2000.0
    pred = np.zeros((18, 3))
    pred[:, 0] = 205.0                  # 5 px beyond x1=200
    pred[:, 1] = 100.0                  # inside y range -> dy = 0
    expected = float(np.mean(
        np.exp(-25.0 / (2 * coco_eval.SIGMAS) ** 2 / (2 * area))
    ))
    got = coco_eval.oks(pred, gt, area, bbox=bbox)
    np.testing.assert_allclose(got, expected, rtol=1e-12)
    # inside the expanded box: dx = dy = 0 -> OKS exactly 1
    pred[:, 0] = 120.0
    assert coco_eval.oks(pred, gt, area, bbox=bbox) == 1.0
    # no bbox -> nothing to match against
    assert coco_eval.oks(pred, gt, area) == 0.0


def _crowd_scene(iscrowd):
    """1 real GT + 1 keypointless ignore GT (bbox far away) + 3 dets:
    two high-scored dets inside the ignore region, one perfect det."""
    gt1 = person_kps(0.0)
    bbox = [400.0, 400.0, 120.0, 120.0]
    gts = [[
        {"keypoints": gt1, "area": 5000.0},
        {"keypoints": unlabelled_kps(), "area": 40000.0,
         "iscrowd": iscrowd, "bbox": bbox},
    ]]
    in_region = np.zeros((18, 3))
    in_region[:, 0] = 450.0
    in_region[:, 1] = 450.0
    preds = [[as_pred(in_region, 0.95), as_pred(in_region, 0.93),
              as_pred(gt1, 0.9)]]
    return preds, gts


def test_crowd_region_absorbs_any_number_of_detections():
    """COCOeval lets iscrowd GT match repeatedly: BOTH detections inside
    the crowd region are match-to-ignore (neither TP nor FP), the crowd
    never enters recall's denominator -> AP = AR = 1.0. Before the
    ignore semantics landed, those two outranked the true detection as
    false positives and AP collapsed to 0.5."""
    preds, gts = _crowd_scene(iscrowd=1)
    res = coco_eval.evaluate(preds, gts)
    assert res["AP"] == res["AP50"] == 1.0
    assert res["AR"] == 1.0


def test_keypointless_noncrowd_gt_matches_ignore_once():
    """num_keypoints==0 GT is ignored like a crowd, but a NON-crowd GT
    absorbs only ONE detection: the second in-region detection stays a
    false positive outranking the TP. Hand-computed: global ranking
    [ignored, FP, TP] -> kept [FP, TP], precision [0, 1/2], recall
    [0, 1] -> right-cummax reads 0.5 at every recall point -> AP 0.5."""
    preds, gts = _crowd_scene(iscrowd=0)
    res = coco_eval.evaluate(preds, gts)
    np.testing.assert_allclose(res["AP"], 0.5, rtol=1e-9)
    np.testing.assert_allclose(res["AP50"], 0.5, rtol=1e-9)
    assert res["AR"] == 1.0


def test_explicit_num_keypoints_overrides_labelled_count():
    """A GT with labelled keypoints but num_keypoints=0 (as a COCO
    annotation field) is still an ignore region — _prepare reads the
    field, not the array."""
    gt1, gt2 = person_kps(0.0), person_kps(300.0)
    gts = [[{"keypoints": gt1, "area": 5000.0},
            {"keypoints": gt2, "area": 5000.0, "num_keypoints": 0}]]
    # only gt1 detected; gt2 ignored -> recall denominator is 1 -> AR 1.0
    preds = [[as_pred(gt1, 0.9)]]
    res = coco_eval.evaluate(preds, gts)
    assert res["AP"] == res["AR"] == 1.0


def test_bootstrap_paired_image_resampling():
    """bootstrap(): point values equal evaluate(), CIs bracket them, and
    the PAIRED delta between a better and a worse prediction set over
    the same images is positive in every resample (shared image variance
    cancels)."""
    rng_gt = [person_kps(30.0 * i) for i in range(6)]
    gts = [[{"keypoints": g, "area": 4000.0}] for g in rng_gt]
    perfect = [[as_pred(g, 0.9)] for g in rng_gt]
    # worse: misses half the images entirely
    worse = [[as_pred(g, 0.9)] if i % 2 == 0 else []
             for i, g in enumerate(rng_gt)]
    res = coco_eval.bootstrap(
        {"perfect": perfect, "worse": worse}, gts, n_boot=200, seed=0
    )
    np.testing.assert_allclose(
        res["value"]["perfect"], coco_eval.evaluate(perfect, gts)["AP"]
    )
    np.testing.assert_allclose(
        res["value"]["worse"], coco_eval.evaluate(worse, gts)["AP"]
    )
    assert res["value"]["perfect"] == 1.0
    lo, hi = res["ci"]["perfect"]
    assert lo == hi == 1.0          # perfect on every resample
    lo, hi = res["ci"]["worse"]
    assert lo <= res["value"]["worse"] <= hi
    assert hi < 1.0
    delta = res["samples"]["perfect"] - res["samples"]["worse"]
    assert (delta >= 0).all() and delta.mean() > 0


def test_people_to_coco_results_roundtrip():
    """Detections export as pycocotools keypoint results (17-kp COCO
    order), and re-importing through coco_joints_to_parts recovers every
    non-neck keypoint position."""
    from tpupose.data.coco_prep import (
        COCO_KEYPOINTS,
        coco_joints_to_parts,
        people_to_coco_results,
    )

    gt = person_kps(0.0)
    person = as_pred(gt, 0.87)
    recs = people_to_coco_results([person], image_id=42)
    assert len(recs) == 1
    r = recs[0]
    assert r["image_id"] == 42 and r["category_id"] == 1
    assert r["score"] == 0.87
    assert len(r["keypoints"]) == 51          # 17 triplets
    # loadRes-style visibility: mark triplets present so the importer
    # keeps them (the exporter writes per-kp confidence in slot 3)
    trip = np.asarray(r["keypoints"]).reshape(17, 3)
    trip[:, 2] = 2.0
    back = coco_joints_to_parts(trip.reshape(-1).tolist())
    # positions match for every COCO-mapped part (neck is synthesised)
    from tpupose import topology
    from tpupose.data.coco_prep import _COCO_TO_PART

    for name in COCO_KEYPOINTS:
        pi = topology.PART_INDEX[_COCO_TO_PART[name]]
        want = person["keypoints"][_COCO_TO_PART[name]]
        np.testing.assert_allclose(back[pi, :2], (want["x"], want["y"]))
    # absent keypoints emit (0, 0, 0)
    partial = {"keypoints": {"nose": {"x": 5.0, "y": 6.0, "score": 0.9}},
               "score": 0.5, "num_parts": 1}
    r2 = people_to_coco_results([partial], image_id=0)[0]
    t2 = np.asarray(r2["keypoints"]).reshape(17, 3)
    assert t2[0].tolist() == [5.0, 6.0, 0.9]   # nose is COCO slot 0
    assert (t2[1:] == 0).all()


def test_detection_area_includes_placeholder_slots():
    """loadRes parity: a detection's extent box spans ALL keypoint
    slots, so absent keypoints at their (0, 0) placeholder stretch it
    toward the origin — the pycocotools quirk the area-partitioned
    metrics (AP_M/AP_L) depend on."""
    partial = {
        "keypoints": {
            "nose": {"x": 100.0, "y": 100.0, "score": 0.9},
            "neck": {"x": 110.0, "y": 105.0, "score": 0.9},
        },
        "score": 1.0, "num_parts": 2,
    }
    kps, _ = coco_eval.people_to_array([partial])
    # present-only extent would be 10 x 5 = 50; loadRes spans (0,0)
    assert coco_eval.detection_area(kps[0]) == 110.0 * 105.0
