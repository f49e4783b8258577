"""Data-parallel inference (parallel/inference.py) on the virtual mesh.

Sharding the image batch must not change any decode output: the program
is per-image except the batch-global tier cond (a scalar all-reduce).
"""

import json

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


def test_dp_estimator_is_a_drop_in_for_serving():
    """DataParallelEstimator duck-types the process_batch contract the
    micro-batcher uses (scales + valid_hw kwargs, attribute delegation),
    so `serve --dp N` shards device batches without code changes."""
    from tpupose.parallel.inference import DataParallelEstimator

    est = PoseEstimator(cfg=with_scales((1.0,)))
    dp = DataParallelEstimator(est, make_mesh(4))
    assert dp.pretrained == est.pretrained  # delegation
    rng = np.random.default_rng(2)
    images = (rng.random((6, 64, 64, 3)) * 255).astype(np.uint8)
    # bucketed path: bottom/right canvas padding masked via valid_hw
    valid = np.asarray([[64, 64]] * 6, np.int32)
    valid[3] = (40, 48)
    want = est.process_batch(images, valid_hw=valid)
    got = dp.process_batch(images, valid_hw=valid)
    _people_equal(want, got)


def test_dp_bucketed_runner_matches_plain():
    """BucketedRunner drives process_batch_async/_finish — the DP
    wrapper must shard that path too (cli eval --dp --buckets)."""
    from tpupose.buckets import BucketedRunner
    from tpupose.parallel.inference import DataParallelEstimator

    est = PoseEstimator(cfg=with_scales((1.0,)))
    rng = np.random.default_rng(4)
    imgs = [(rng.random((48 + 8 * i, 64, 3)) * 255).astype(np.uint8)
            for i in range(5)]
    buckets = ((64, 64),)
    want = BucketedRunner(est, buckets, batch_size=4).process_many(imgs)
    dp = DataParallelEstimator(est, make_mesh(4))
    got = BucketedRunner(dp, buckets, batch_size=4).process_many(imgs)
    _people_equal(want, got)


def test_dp_serving_end_to_end():
    """HTTP serving over the mesh: serve() with a DP-wrapped estimator
    returns the same decode as the single-device server."""
    import urllib.request

    from tpupose.parallel.inference import DataParallelEstimator
    from tpupose.serve import serve

    est = PoseEstimator(cfg=with_scales((1.0,)))
    rng = np.random.default_rng(3)
    img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)

    def post(srv):
        import cv2

        ok, buf = cv2.imencode(".png", img)
        assert ok
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.server_port}/pose",
            data=buf.tobytes(),
            headers={"Content-Type": "application/octet-stream"},
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            return json.loads(r.read())

    srv = serve(est, port=0, max_batch=4, batch_window_ms=2.0,
                request_timeout_s=600.0)
    try:
        want = post(srv)
    finally:
        srv.shutdown()
        if srv.batcher is not None:
            srv.batcher.close()
    dp = DataParallelEstimator(est, make_mesh(4))
    srv = serve(dp, port=0, max_batch=4, batch_window_ms=2.0,
                request_timeout_s=600.0)
    try:
        got = post(srv)
    finally:
        srv.shutdown()
        if srv.batcher is not None:
            srv.batcher.close()
    assert want == got


def test_resolve_dp_validation():
    """--dp spec parsing: shared by serve --dp and cli eval --dp."""
    import pytest

    from tpupose.parallel.inference import resolve_dp

    devs = list(range(4))  # only len() is used
    assert resolve_dp("auto", devs) == 4
    assert resolve_dp("2", devs) == 2
    with pytest.raises(ValueError, match="exceeds"):
        resolve_dp("5", devs)
    with pytest.raises(ValueError, match=">= 1"):
        resolve_dp("0", devs)
    with pytest.raises(ValueError, match="device count or 'auto'"):
        resolve_dp("many", devs)
