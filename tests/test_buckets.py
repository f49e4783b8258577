"""Shape-bucketed serving: bucket selection, canvas placement, the
decode-side valid-rectangle mask, and the MicroBatcher bucket path.

The bucket ladder bounds the jit-cache over arbitrary request shapes
(every distinct (H, W) otherwise compiles its own fused program); the
decoder's ``valid_hw`` mask guarantees the gray bottom/right margin
never emits peaks (tpupose/buckets.py, decode/api.py).
"""

import concurrent.futures

import numpy as np

import jax

from tpupose.buckets import (
    DEFAULT_BUCKETS,
    choose_bucket,
    parse_buckets,
    to_bucket,
    unscale_people,
)
from tpupose.config import InferenceConfig
from tpupose.decode.api import decode_maps_batch
from tpupose.decode.peaks import gaussian_blur


def smooth_field(seed, h, w, c, sigma, gain):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(h, w, c)).astype(np.float32)
    out = np.concatenate(
        [np.asarray(gaussian_blur(base[:, :, i:i + 1], sigma)) for i in range(c)],
        axis=-1,
    )
    return (out * gain).astype(np.float32)


# --- bucket selection / canvas ------------------------------------------------


def test_choose_bucket_native_fit():
    bh, bw, s = choose_bucket(300, 400, DEFAULT_BUCKETS)
    assert (bh, bw) == (368, 496) and s == 1.0
    bh, bw, s = choose_bucket(368, 368, DEFAULT_BUCKETS)
    assert (bh, bw) == (368, 368) and s == 1.0
    # portrait fits the portrait bucket, not the transposed one
    bh, bw, s = choose_bucket(600, 350, DEFAULT_BUCKETS)
    assert (bh, bw) == (656, 368) and s == 1.0


def test_choose_bucket_downscale_keeps_most_resolution():
    bh, bw, s = choose_bucket(1000, 1000, DEFAULT_BUCKETS)
    # the largest near-square canvas wins: s = 496/1000
    assert (bh, bw) in ((496, 656), (656, 496))
    assert abs(s - 0.496) < 1e-9


def test_parse_buckets_roundtrip():
    assert parse_buckets("368x368,496X656") == ((368, 368), (496, 656))


def test_to_bucket_places_content_top_left():
    img = np.full((40, 56, 3), 200, np.uint8)
    canvas, vh, vw = to_bucket(img, 64, 64, 1.0)
    assert canvas.shape == (64, 64, 3) and (vh, vw) == (40, 56)
    assert (canvas[:40, :56] == 200).all()
    assert (canvas[40:, :] == 128).all() and (canvas[:, 56:] == 128).all()


def test_to_bucket_downscales():
    img = np.zeros((100, 100, 3), np.uint8)
    img[:50] = 250
    canvas, vh, vw = to_bucket(img, 50, 50, 0.5)
    assert (vh, vw) == (50, 50)
    # top half of the content stays bright after the 0.5 resample
    assert canvas[:20].mean() > 200 and canvas[30:].mean() < 50


def test_unscale_people_maps_coords_back():
    people = [{
        "keypoints": {"nose": {"x": 10.0, "y": 20.0, "score": 0.9}},
        "score": 1.0, "num_parts": 1,
    }]
    out = unscale_people(people, 0.5)
    kp = out[0]["keypoints"]["nose"]
    assert (kp["x"], kp["y"]) == (20.0, 40.0) and kp["score"] == 0.9
    assert unscale_people(people, 1.0) is people


# --- decode valid_hw mask -----------------------------------------------------


def _fields(n=2, h=48, w=48):
    heats = np.stack(
        [smooth_field(5 + i, h, w, 19, 6.0, 5.0) for i in range(n)]
    )
    pafs = np.stack(
        [smooth_field(105 + i, h, w, 38, 6.0, 3.0) for i in range(n)]
    )
    return heats, pafs


def test_valid_hw_full_extent_is_identity():
    heats, pafs = _fields()
    run = decode_maps_batch  # module-level jit: one compile per program per process
    cfg = InferenceConfig()
    base = jax.device_get(run(heats, pafs, cfg))
    full = np.asarray([[48, 48], [48, 48]], np.int32)
    got = jax.device_get(run(heats, pafs, cfg, full))
    for k in base:
        np.testing.assert_array_equal(
            np.asarray(got[k]), np.asarray(base[k]), err_msg=k
        )


def test_valid_hw_masks_margin_peaks():
    heats, pafs = _fields()
    run = decode_maps_batch  # module-level jit: one compile per program per process
    cfg = InferenceConfig()
    base = jax.device_get(run(heats, pafs, cfg))
    # the unmasked smooth field must have peaks beyond the 24x24 window
    # for the mask to be doing anything
    xs1 = np.asarray(base["peak_xs"])[1].reshape(-1)
    ys1 = np.asarray(base["peak_ys"])[1].reshape(-1)
    ss1 = np.asarray(base["peak_scores"])[1].reshape(-1)
    live = ss1 > 0
    assert ((xs1[live] >= 24) | (ys1[live] >= 24)).any()

    vh = np.asarray([[48, 48], [24, 24]], np.int32)
    got = jax.device_get(run(heats, pafs, cfg, vh))
    # image 0 (full extent) is bitwise-unaffected by image 1's mask:
    # peak tables are per-image and tier changes are value-preserving
    for k in base:
        np.testing.assert_array_equal(
            np.asarray(got[k])[0], np.asarray(base[k])[0], err_msg=k
        )
    # image 1: every surviving peak sits inside the valid rectangle
    xs = np.asarray(got["peak_xs"])[1].reshape(-1)
    ys = np.asarray(got["peak_ys"])[1].reshape(-1)
    ss = np.asarray(got["peak_scores"])[1].reshape(-1)
    live = ss > 0
    assert live.any()
    assert (xs[live] < 24).all() and (ys[live] < 24).all()


def test_estimator_bucketed_batch():
    """End-to-end: gray-padded canvases + valid_hw through the full
    fused program; detections stay inside each image's valid rect."""
    from tpupose.config import PoseConfig, ModelConfig
    from tpupose.infer import PoseEstimator

    cfg = PoseConfig(
        model=ModelConfig(num_stages=1, compute_dtype="float32"),
        inference=InferenceConfig(
            scale_search=(0.5,), max_peaks=16, max_people=16
        ),
    )
    est = PoseEstimator(cfg)
    rng = np.random.default_rng(11)
    canvases, valids = [], []
    for (h, w) in ((40, 56), (64, 64)):
        img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        canvas, vh, vw = to_bucket(img, 64, 64, 1.0)
        canvases.append(canvas)
        valids.append((vh, vw))
    people = est.process_batch(
        np.stack(canvases), valid_hw=np.asarray(valids, np.int32)
    )
    assert len(people) == 2
    for plist, (vh, vw) in zip(people, valids):
        for p in plist:
            for kp in p["keypoints"].values():
                assert kp["x"] < vw and kp["y"] < vh


# --- BucketedRunner (offline mixed-size sweeps, cli eval path) ----------------


def _tiny_cfg():
    from tpupose.config import PoseConfig, ModelConfig

    return PoseConfig(
        model=ModelConfig(num_stages=1, compute_dtype="float32"),
        inference=InferenceConfig(
            scale_search=(0.5,), max_peaks=16, max_people=16
        ),
    )


def canon(people):
    return sorted(
        (
            tuple(sorted(
                (n, round(v["x"], 3), round(v["y"], 3))
                for n, v in p["keypoints"].items()
            )),
            p["num_parts"],
        )
        for p in people
    )


def test_bucketed_runner_exact_fit_matches_process_batch():
    """Images exactly bucket-sized take scale 1 with a full valid extent:
    the runner's output must equal the plain batched program's."""
    from tpupose.buckets import BucketedRunner
    from tpupose.infer import PoseEstimator

    est = PoseEstimator(_tiny_cfg())
    rng = np.random.default_rng(21)
    imgs = [(rng.random((64, 64, 3)) * 255).astype(np.uint8) for _ in range(3)]
    runner = BucketedRunner(est, buckets=((64, 64),), batch_size=3)
    got = runner.process_many(imgs)
    want = est.process_batch(np.stack(imgs))
    assert [canon(g) for g in got] == [canon(w) for w in want]


def test_bucketed_runner_reusable_after_finish():
    """finish() resets the sweep: a second process_many returns exactly
    its own inputs' results (no stale indices from the first sweep)."""
    from tpupose.buckets import BucketedRunner
    from tpupose.infer import PoseEstimator

    est = PoseEstimator(_tiny_cfg())
    rng = np.random.default_rng(33)
    runner = BucketedRunner(est, buckets=((64, 64),), batch_size=2)
    first = runner.process_many(
        [(rng.random((64, 64, 3)) * 255).astype(np.uint8) for _ in range(2)]
    )
    assert len(first) == 2
    second = runner.process_many(
        [(rng.random((48, 40, 3)) * 255).astype(np.uint8)]
    )
    assert len(second) == 1


def test_parse_buckets_rejects_malformed():
    import pytest

    with pytest.raises(ValueError, match="empty"):
        parse_buckets("")
    with pytest.raises(ValueError, match="bad bucket"):
        parse_buckets("368x368x3")
    # trailing comma / whitespace tolerated
    assert parse_buckets(" 368x368 ,") == ((368, 368),)


def test_bucketed_runner_mixed_shapes_ordered_and_bounded():
    from tpupose.buckets import BucketedRunner
    from tpupose.infer import PoseEstimator

    est = PoseEstimator(_tiny_cfg())
    rng = np.random.default_rng(22)
    shapes = [(40, 56), (64, 64), (100, 70), (64, 64), (30, 90)]
    imgs = [(rng.random(s + (3,)) * 255).astype(np.uint8) for s in shapes]
    runner = BucketedRunner(
        est, buckets=((64, 64), (64, 96)), batch_size=2
    )
    got = runner.process_many(imgs)
    assert len(got) == len(imgs)
    for plist, (h, w) in zip(got, shapes):
        for p in plist:
            for kp in p["keypoints"].values():
                assert 0 <= kp["x"] < w and 0 <= kp["y"] < h
    geoms = {k[2:4] for k in est._fns if k[0] == "batch"}
    assert geoms <= {(64, 64), (64, 96)}, geoms


# --- MicroBatcher bucket path -------------------------------------------------


def test_microbatcher_buckets_bound_the_cache():
    """Heterogeneous request shapes land in one bucket geometry: the
    estimator compiles ONE batched program geometry, and every response
    carries original-image coordinates."""
    from tpupose.config import PoseConfig, ModelConfig
    from tpupose.infer import PoseEstimator
    from tpupose.serve import MicroBatcher

    cfg = PoseConfig(
        model=ModelConfig(num_stages=1, compute_dtype="float32"),
        inference=InferenceConfig(
            scale_search=(0.5,), max_peaks=16, max_people=16
        ),
    )
    est = PoseEstimator(cfg)
    batcher = MicroBatcher(
        est, max_batch=4, window_ms=50.0, buckets=((64, 64),)
    )
    try:
        rng = np.random.default_rng(3)
        shapes = [(40, 56), (64, 64), (52, 48), (128, 96)]
        imgs = [
            (rng.random(s + (3,)) * 255).astype(np.uint8) for s in shapes
        ]
        with concurrent.futures.ThreadPoolExecutor(4) as pool:
            results = list(pool.map(batcher.submit, imgs))
        assert len(results) == 4
        for plist, (h, w) in zip(results, shapes):
            for p in plist:
                for kp in p["keypoints"].values():
                    # coords are in ORIGINAL image space (the 128x96
                    # request was downscaled into the bucket and mapped
                    # back)
                    assert 0 <= kp["x"] < w and 0 <= kp["y"] < h
    finally:
        batcher.close()
    batch_keys = [k for k in est._fns if k[0] == "batch"]
    geoms = {(k[2], k[3]) for k in batch_keys}
    assert geoms == {(64, 64)}, batch_keys
