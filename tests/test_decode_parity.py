"""Parity: jitted jnp decode vs the NumPy golden twin (SURVEY.md 4a/4b).

Both decoders consume identical averaged heatmap/PAF tensors; the final
people JSON must agree keypoint-for-keypoint. Internal peak ids may
differ (the jnp path orders peaks by score, the twin by scan order), so
comparison is on resolved coordinates/scores.
"""

import numpy as np
import pytest

from tpupose import topology
from tpupose.config import InferenceConfig
from tpupose.decode import decode_maps, to_people
from tpupose.decode.peaks import find_peaks, gaussian_blur
from tpupose.reference_impl import decode_np, gt_np


def synthetic_person(cx, cy, size=120.0):
    rel = {
        "nose": (0.0, -0.95), "neck": (0.0, -0.65),
        "Rsho": (-0.30, -0.65), "Relb": (-0.42, -0.30), "Rwri": (-0.45, 0.05),
        "Lsho": (0.30, -0.65), "Lelb": (0.42, -0.30), "Lwri": (0.45, 0.05),
        "Rhip": (-0.18, 0.10), "Rkne": (-0.20, 0.55), "Rank": (-0.20, 0.95),
        "Lhip": (0.18, 0.10), "Lkne": (0.20, 0.55), "Lank": (0.20, 0.95),
        "Reye": (-0.08, -1.02), "Leye": (0.08, -1.02),
        "Rear": (-0.17, -0.98), "Lear": (0.17, -0.98),
    }
    out = np.zeros((18, 3))
    for name, (dx, dy) in rel.items():
        out[topology.PART_INDEX[name]] = (cx + dx * size, cy + dy * size * 0.5, 0.0)
    return out


def scene_maps(joint_list, size=368):
    import cv2

    joints = np.stack(joint_list)
    labels = gt_np.create_heatmaps_np(joints)
    heat = cv2.resize(labels[:, :, 38:], (size, size), interpolation=cv2.INTER_CUBIC)
    paf = cv2.resize(labels[:, :, :38], (size, size), interpolation=cv2.INTER_CUBIC)
    # Cubic upsampling creates exact plateau ties; 1-ulp differences between
    # scipy and XLA gaussian blurs then flip the >= NMS comparisons. Real
    # network outputs never tie exactly, so break ties with tiny noise —
    # both decoders consume the identical array, keeping parity meaningful.
    noise = np.random.default_rng(7).normal(size=heat.shape) * 1e-3
    heat = heat + noise
    return heat.astype(np.float32), paf.astype(np.float32)


def canon(people):
    """Canonical, order-insensitive people representation."""
    out = []
    for p in people:
        kps = tuple(
            sorted(
                (name, round(v["x"], 3), round(v["y"], 3), round(v["score"], 4))
                for name, v in p["keypoints"].items()
            )
        )
        out.append((kps, p["num_parts"], round(p["score"], 3)))
    return sorted(out)


@pytest.mark.parametrize(
    "people_spec",
    [
        [(180.0, 190.0, 140.0)],
        [(120.0, 200.0, 120.0), (260.0, 180.0, 120.0)],
        [(90.0, 160.0, 90.0), (190.0, 200.0, 110.0), (300.0, 170.0, 95.0)],
    ],
)
def test_decode_parity_synthetic(people_spec):
    heat, paf = scene_maps([synthetic_person(*s) for s in people_spec])
    cfg = InferenceConfig()

    subset, cand = decode_np.decode_np(heat, paf, cfg)
    ref = decode_np.people_json(subset, cand)

    got = to_people(decode_maps(heat, paf, cfg))

    # parity with the twin is the contract; person count can exceed the
    # synthetic spec when upsampling plateaus duplicate a peak (a genuine
    # artifact of the reference's greedy algorithm, reproduced faithfully)
    assert len(got) == len(ref) >= len(people_spec)
    assert canon(got) == canon(ref)


def test_decode_parity_empty():
    cfg = InferenceConfig()
    heat = np.zeros((368, 368, 19), np.float32)
    paf = np.zeros((368, 368, 38), np.float32)
    got = to_people(decode_maps(heat, paf, cfg))
    assert got == []


def test_gaussian_blur_matches_scipy(rng):
    from scipy.ndimage import gaussian_filter

    x = rng.normal(size=(64, 48, 3)).astype(np.float32)
    ours = np.asarray(gaussian_blur(x, 3.0))
    ref = np.stack(
        [gaussian_filter(x[:, :, c], sigma=3.0) for c in range(3)], axis=-1
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_peaks_match_twin(rng):
    """Smoothed random field: identical peak sets, capacity respected."""
    base = rng.normal(size=(92, 92, 19)).astype(np.float32)
    heat = np.stack(
        [
            np.asarray(gaussian_blur(base[:, :, c : c + 1], 4.0))[:, :, 0]
            for c in range(19)
        ],
        axis=-1,
    ) * 3.0
    cfg = InferenceConfig()

    twin = decode_np.find_peaks_np(heat, cfg)
    ours = find_peaks(heat, max_peaks=cfg.max_peaks, sigma=cfg.peak_sigma,
                      thre1=cfg.thre1)
    xs, ys = np.asarray(ours["xs"]), np.asarray(ours["ys"])
    sc, va = np.asarray(ours["scores"]), np.asarray(ours["valid"])
    for part in range(18):
        ref_set = {(x, y) for x, y, _, _ in twin[part]}
        got_set = {
            (int(xs[part, i]), int(ys[part, i]))
            for i in range(xs.shape[1])
            if va[part, i]
        }
        assert got_set == ref_set, part
        for i in range(xs.shape[1]):
            if va[part, i]:
                np.testing.assert_allclose(
                    sc[part, i], heat[ys[part, i], xs[part, i], part], rtol=1e-6
                )
