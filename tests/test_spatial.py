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
