"""Sanity tests for the NumPy golden twin itself.

The twin is the oracle for all jnp/Pallas parity tests, so it must first be
self-consistent: GT maps rasterised from synthetic skeletons must decode
back to those skeletons (SURVEY.md section 4a).
"""

import numpy as np
import pytest

from tpupose import topology
from tpupose.config import AugmentConfig, InferenceConfig, ModelConfig
from tpupose.reference_impl import decode_np, gt_np


def synthetic_person(cx: float, cy: float, size: float = 120.0) -> np.ndarray:
    """A plausible upright skeleton centred at (cx, cy), (18, 3) array."""
    s = size
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
        i = topology.PART_INDEX[name]
        out[i] = (cx + dx * s, cy + dy * s * 0.5, 0.0)
    return out


@pytest.fixture(scope="module")
def scene():
    joints = np.stack(
        [synthetic_person(120.0, 200.0), synthetic_person(260.0, 180.0)]
    )
    model = ModelConfig()
    aug = AugmentConfig()
    heat_small = gt_np.put_gaussian_maps_np(joints, model, aug)
    paf_small = gt_np.put_vector_maps_np(joints, model, aug)
    # upsample the 46x46 label maps to 368x368 the way inference sees them
    import cv2

    heat = cv2.resize(heat_small, (368, 368), interpolation=cv2.INTER_CUBIC)
    paf = cv2.resize(paf_small, (368, 368), interpolation=cv2.INTER_CUBIC)
    return joints, heat, paf


def test_gaussian_maps_properties(scene):
    joints, heat, _ = scene
    model = ModelConfig()
    small = gt_np.put_gaussian_maps_np(joints, model, AugmentConfig())
    assert small.shape == (46, 46, 19)
    assert small.max() <= 1.0 + 1e-9 and small.min() >= -1e-9
    # peak of nose channel is near person 1's nose in label-grid coords
    nose = joints[0, topology.PART_INDEX["nose"], :2]
    iy, ix = np.unravel_index(np.argmax(small[:, :, 0]), (46, 46))
    gx = ix * model.stride + model.stride / 2 - 0.5
    gy = iy * model.stride + model.stride / 2 - 0.5
    # two people: the argmax should land on one of the two noses
    nose2 = joints[1, topology.PART_INDEX["nose"], :2]
    d1 = np.hypot(gx - nose[0], gy - nose[1])
    d2 = np.hypot(gx - nose2[0], gy - nose2[1])
    assert min(d1, d2) < model.stride
    # background complements the foreground max
    fg = small[:, :, :18].max(axis=2)
    np.testing.assert_allclose(small[:, :, 18], 1.0 - fg, atol=1e-12)


def test_vector_maps_unit_norm(scene):
    joints, _, _ = scene
    paf = gt_np.put_vector_maps_np(joints, ModelConfig(), AugmentConfig())
    assert paf.shape == (46, 46, 38)
    mag = np.sqrt(paf[:, :, 0::2] ** 2 + paf[:, :, 1::2] ** 2)
    # every painted pixel has magnitude <= 1 (averaging can shrink it)
    assert mag.max() <= 1.0 + 1e-9
    # the neck->nose limb (14) of an upright person points up (negative y)
    k = 14
    band = np.abs(paf[:, :, 2 * k + 1]) > 0.5
    assert band.any()
    assert paf[:, :, 2 * k + 1][band].mean() < 0


def test_decode_recovers_two_people(scene):
    joints, heat, paf = scene
    cfg = InferenceConfig()
    subset, candidate = decode_np.decode_np(heat, paf, cfg)
    assert len(subset) == 2
    people = decode_np.people_json(subset, candidate)
    # each recovered person matches one synthetic person within a stride
    centres_true = sorted(joints[:, topology.PART_INDEX["neck"], 0])
    centres_got = sorted(
        p["keypoints"]["neck"]["x"] for p in people if "neck" in p["keypoints"]
    )
    np.testing.assert_allclose(centres_got, centres_true, atol=8.0)
    for p in people:
        assert p["num_parts"] >= 10


def test_peak_finder_golden():
    """Hand-built map: two bumps above threshold, one below."""
    cfg = InferenceConfig()
    h = np.zeros((64, 64, 19))
    for (x, y, a) in [(10, 20, 1.0), (40, 50, 0.8), (55, 10, 0.05)]:
        ys, xs = np.mgrid[0:64, 0:64]
        h[:, :, 0] += a * np.exp(-((xs - x) ** 2 + (ys - y) ** 2) / 18.0)
    peaks = decode_np.find_peaks_np(h, cfg)
    got = sorted((p[0], p[1]) for p in peaks[0])
    assert got == [(10, 20), (40, 50)]
    assert all(len(peaks[i]) == 0 for i in range(1, 18))
    # global ids are consecutive
    assert [p[3] for p in peaks[0]] == [0, 1]


def test_assembly_culls_weak_rows():
    """A person with only 2 parts must be culled (cnt < 4)."""
    cfg = InferenceConfig()
    all_peaks = [[] for _ in range(18)]
    # lone neck->Rsho pair => subset row with cnt=2 -> culled
    all_peaks[topology.PART_INDEX["neck"]] = [(50, 50, 0.9, 0)]
    all_peaks[topology.PART_INDEX["Rsho"]] = [(70, 50, 0.9, 1)]
    conn = [np.zeros((0, 5)) for _ in range(19)]
    conn[0] = np.array([[0, 1, 0.9, 0, 0]])
    special = [k for k in range(19) if k != 0]
    subset, _ = decode_np.assemble_np(all_peaks, conn, special, cfg)
    assert len(subset) == 0
