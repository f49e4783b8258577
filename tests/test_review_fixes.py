"""Regression tests for the round-1 code-review findings."""

import numpy as np
import pytest

from tpupose.config import InferenceConfig


def test_max_connections_default_covers_capacity():
    cfg = InferenceConfig()
    assert cfg.max_connections >= cfg.max_people


def test_bench_module_importable_from_package():
    from tpupose import benchmark

    assert callable(benchmark.main)
    assert callable(benchmark.get_baseline)


def test_pallas_gate_requires_tpu_backend(monkeypatch):
    """The Mosaic kernels only lower on TPU: the gate must be
    backend == 'tpu' (advisor r2: 'not cpu' would select them on GPU
    backends and fail to lower), and TPUPOSE_DISABLE_PALLAS=1 must win
    everywhere. The suite runs on the CPU backend, so all gates read
    False here regardless of env."""
    from tpupose import ops

    monkeypatch.delenv("TPUPOSE_DISABLE_PALLAS", raising=False)
    assert ops.use_pallas() is False          # cpu backend
    assert ops.use_pallas_assoc() is False
    assert ops.use_pallas_gt() is False

    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "gpu")
    assert ops.use_pallas() is False          # gpu backend: still no Mosaic
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert ops.use_pallas() is True
    monkeypatch.setenv("TPUPOSE_DISABLE_PALLAS", "1")
    assert ops.use_pallas() is False          # kill switch wins


def test_coco_eval_accepts_17kp_gt(rng):
    from tpupose import topology
    from tpupose.data import coco_eval

    # perfect prediction on a 17-kp COCO-order GT
    coco_xy = rng.uniform(50, 300, (17, 2))
    gt17 = np.concatenate([coco_xy, np.full((17, 1), 2.0)], axis=1)  # v=2 visible
    from tpupose.data.coco_prep import coco_joints_to_parts

    internal = coco_joints_to_parts(gt17.reshape(-1).tolist())
    people = [{
        "keypoints": {
            topology.PARTS[i]: {"x": internal[i, 0], "y": internal[i, 1], "score": 0.9}
            for i in range(18) if internal[i, 2] < 2
        },
        "score": 10.0,
        "num_parts": 18,
    }]
    res = coco_eval.evaluate([people], [[{"keypoints": gt17, "area": 10000.0}]])
    assert res["AP"] == pytest.approx(1.0)

    with pytest.raises(ValueError, match="17\\|18"):
        coco_eval.evaluate([people], [[{"keypoints": np.zeros((5, 3)), "area": 1.0}]])


def test_upsample_to_respects_stride():
    import jax.numpy as jnp

    from tpupose.ops.image import upsample_to

    maps = jnp.ones((1, 10, 10, 2))
    out4 = upsample_to(maps, 40, 40, 40, 40, stride=4)
    assert out4.shape == (40, 40, 2)
    out8 = upsample_to(maps, 80, 80, 64, 64, stride=8)
    assert out8.shape == (64, 64, 2)
