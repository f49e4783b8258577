"""End-to-end inference plumbing test.

Uses a fake CNN that emits ground-truth-derived maps regardless of its
input, so the full pyramid -> upsample -> average -> decode -> JSON path
is exercised deterministically without pretrained weights (SURVEY.md
section 7: parity harnesses stay weight-agnostic). The real model's
numerics are covered by test_model.py; decode by test_decode_parity.py.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tpupose import topology
from tpupose.config import DEFAULT, with_scales
from tpupose.infer import PoseEstimator
from tpupose.ops import image as image_ops
from tpupose.reference_impl import gt_np


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


class FakeMapModel:
    """Emits stored full-res maps resized to the stride-8 output grid."""

    def __init__(self, heat, paf, stride=8):
        self.heat = jnp.asarray(heat)
        self.paf = jnp.asarray(paf)
        self.stride = stride

    def apply(self, variables, x):
        oh, ow = x.shape[1] // self.stride, x.shape[2] // self.stride
        heat = image_ops.resize_bilinear(self.heat, oh, ow)[None]
        paf = image_ops.resize_bilinear(self.paf, oh, ow)[None]
        return [(paf, heat)]


@pytest.fixture(scope="module")
def estimator_and_truth():
    import cv2

    joints = np.stack([synthetic_person(120.0, 200.0), synthetic_person(260.0, 180.0)])
    labels = gt_np.create_heatmaps_np(joints)
    heat = cv2.resize(labels[:, :, 38:], (368, 368), interpolation=cv2.INTER_CUBIC)
    paf = cv2.resize(labels[:, :, :38], (368, 368), interpolation=cv2.INTER_CUBIC)
    noise = np.random.default_rng(3).normal(size=heat.shape) * 1e-3
    heat = (heat + noise).astype(np.float32)

    est = PoseEstimator.__new__(PoseEstimator)
    est.cfg = with_scales((0.5, 1.0))
    est.model = FakeMapModel(heat, paf)
    est.params = {}
    est.pretrained = False
    est._fns = {}
    return est, joints


def test_process_end_to_end(estimator_and_truth):
    est, joints = estimator_and_truth
    image = np.full((368, 368, 3), 128, np.uint8)
    out = est.process(image)
    people = out["people"]
    assert len(people) == 2
    necks_true = sorted(joints[:, topology.PART_INDEX["neck"], 0])
    necks_got = sorted(p["keypoints"]["neck"]["x"] for p in people)
    np.testing.assert_allclose(necks_got, necks_true, atol=10.0)
    for p in people:
        assert p["num_parts"] >= 12


def test_process_draw(estimator_and_truth):
    est, _ = estimator_and_truth
    image = np.full((368, 368, 3), 128, np.uint8)
    out = est.process(image, draw=True)
    canvas = out["canvas"]
    assert canvas.shape == (368, 368, 3) and canvas.dtype == np.uint8
    assert (canvas != 128).any()  # something was drawn


def test_pyramid_sizes_match_reference_geometry():
    sizes = image_ops.pyramid_sizes(DEFAULT.inference, DEFAULT.model, 368, 368)
    # scale_search x boxsize/h: heights 184, 368, 552, 736; stride-8 padded
    assert [s[0] for s in sizes] == [184, 368, 552, 736]
    for rh, rw, ph, pw in sizes:
        assert ph % 8 == 0 and pw % 8 == 0 and ph >= rh and pw >= rw
