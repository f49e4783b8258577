"""Spatially-sharded forward (parallel/spatial.py) on the virtual mesh.

The SPMD-partitioned forward must equal the unsharded forward exactly:
convs/pools are local ops, XLA inserts the halo exchange, and no
reduction order changes.
"""

import numpy as np
import jax
import jax.numpy as jnp

from tpupose.models import OpenPose
from tpupose.parallel.spatial import build_spatial_forward, spatial_mesh


def _tiny_model_and_input(h=64, w=64):
    model = OpenPose(num_stages=2, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, h, w, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    return model, params, x


def test_spatial_forward_matches_unsharded():
    model, params, x = _tiny_model_and_input()
    want_paf, want_heat = jax.jit(
        lambda p, x: model.apply({"params": p}, x)[-1]
    )(params, x)

    mesh = spatial_mesh(8)
    fwd = build_spatial_forward(model, mesh)
    got_paf, got_heat = fwd(params, x)

    np.testing.assert_allclose(
        np.asarray(got_paf), np.asarray(want_paf), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_heat), np.asarray(want_heat), atol=1e-5
    )


def test_spatial_forward_device_count_invariance():
    model, params, x = _tiny_model_and_input()
    outs = []
    for n in (1, 2, 8):
        fwd = build_spatial_forward(model, spatial_mesh(n))
        paf, heat = fwd(params, x)
        outs.append((np.asarray(paf), np.asarray(heat)))
    for paf, heat in outs[1:]:
        np.testing.assert_allclose(paf, outs[0][0], atol=1e-5)
        np.testing.assert_allclose(heat, outs[0][1], atol=1e-5)


def test_spatial_estimator_large_image_1100():
    """The round-2 VERDICT missing #5 'decode ceiling' probe: a >=1100^2
    image through the FULL spatially-sharded path on the 8-device mesh —
    pyramid forwards (the reference resizes to scale*boxsize regardless
    of input size, so the CNN cost is fixed), then the scale-space decode
    at the 1104^2 output geometry: the 38-channel full-res PAF upsample
    is never materialised (ScaleSpace readout), the peaks stage streams
    the (18, 1104^2) masked-score compaction through the two-stage
    blockwise path, and coordinates land in 1104-space. Result must
    match the serial program."""
    from tpupose.config import (
        InferenceConfig, ModelConfig, PoseConfig,
    )
    from tpupose.infer import PoseEstimator
    from tpupose.parallel.spatial import SpatialPoseEstimator

    cfg = PoseConfig(
        model=ModelConfig(num_stages=1, compute_dtype="float32"),
        inference=InferenceConfig(scale_search=(0.5, 1.0)),
    )
    est = PoseEstimator(cfg)
    sp = SpatialPoseEstimator(est, spatial_mesh(8))
    img = (np.random.default_rng(7).random((1104, 1104, 3)) * 255).astype(
        np.uint8
    )
    a = est.process(img)["people"]
    b = sp.process(img)["people"]
    assert len(a) == len(b)
    for pa, pb in zip(a, b):
        assert pa["num_parts"] == pb["num_parts"]
        assert abs(pa["score"] - pb["score"]) < 1e-3
        for name, kp in pa["keypoints"].items():
            assert name in pb["keypoints"]
            kb = pb["keypoints"][name]
            assert abs(kp["x"] - kb["x"]) <= 1 and abs(kp["y"] - kb["y"]) <= 1
            # coordinates live in the large-image space
            assert 0 <= kp["x"] < 1104 and 0 <= kp["y"] < 1104


def test_spatial_estimator_process():
    """End-to-end: SpatialPoseEstimator.process == PoseEstimator.process
    on the same (random-init) params."""
    from tpupose.infer import PoseEstimator
    from tpupose.parallel.spatial import SpatialPoseEstimator
    from tpupose.config import with_scales

    est = PoseEstimator(cfg=with_scales((0.5, 1.0)))
    sp = SpatialPoseEstimator(est, spatial_mesh(4))
    img = (np.random.default_rng(3).random((128, 96, 3)) * 255).astype(np.uint8)
    a = est.process(img)["people"]
    b = sp.process(img)["people"]
    assert len(a) == len(b)
    for pa, pb in zip(a, b):
        assert pa["num_parts"] == pb["num_parts"]
        assert abs(pa["score"] - pb["score"]) < 1e-3
