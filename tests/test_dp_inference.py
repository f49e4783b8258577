"""Data-parallel inference (parallel/inference.py) on the virtual mesh.

Sharding the image batch must not change any decode output: the program
is per-image except the batch-global tier cond (a scalar all-reduce).
"""

import numpy as np

from tpupose.config import with_scales
from tpupose.infer import PoseEstimator
from tpupose.parallel.inference import dp_process_batch
from tpupose.parallel.sharding import make_mesh


def _people_equal(a, b):
    assert len(a) == len(b)
    for pa, pb in zip(a, b):
        assert len(pa) == len(pb)
        for qa, qb in zip(pa, pb):
            assert qa["num_parts"] == qb["num_parts"]
            assert abs(qa["score"] - qb["score"]) < 1e-4
            for part, kp in qa["keypoints"].items():
                assert part in qb["keypoints"]
                assert kp["x"] == qb["keypoints"][part]["x"]
                assert kp["y"] == qb["keypoints"][part]["y"]


def test_dp_batch_matches_unsharded():
    est = PoseEstimator(cfg=with_scales((0.5, 1.0)))
    rng = np.random.default_rng(0)
    images = (rng.random((8, 96, 96, 3)) * 255).astype(np.uint8)
    want = est.process_batch(images)
    got = dp_process_batch(est, images, make_mesh(8))
    _people_equal(want, got)


def test_dp_batch_pads_to_mesh():
    """Batch 5 on 4 devices: padded row is decoded then dropped."""
    est = PoseEstimator(cfg=with_scales((1.0,)))
    rng = np.random.default_rng(1)
    images = (rng.random((5, 64, 64, 3)) * 255).astype(np.uint8)
    want = est.process_batch(images)
    got = dp_process_batch(est, images, make_mesh(4))
    _people_equal(want, got)
