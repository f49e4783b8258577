"""Coverage for remaining paths: preprocessed train step, VGG npz import,
synthetic dataset tool end-to-end into the training pipeline."""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpupose.config import AugmentConfig, ModelConfig, PoseConfig, TrainConfig
from tpupose.models import OpenPose
from tpupose.models import weights as W
from tpupose.training import create_state, make_preprocessed_step

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_preprocessed_step(rng):
    cfg = PoseConfig(
        model=ModelConfig(boxsize=64, compute_dtype="float32"),
        train=TrainConfig(batch_size=2),
    )
    model = OpenPose(num_stages=1, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    state, tx = create_state(cfg, params)
    step = make_preprocessed_step(cfg, model, tx)

    batch = {
        "images_norm": jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32),
        "paf_gt": jnp.asarray(rng.normal(size=(2, 8, 8, 38)), jnp.float32),
        "heat_gt": jnp.asarray(rng.normal(size=(2, 8, 8, 19)), jnp.float32),
        "label_mask": jnp.ones((2, 8, 8), jnp.float32),
    }
    tree, losses = step(state.tree(), batch)
    assert np.isfinite(float(losses["total"]))
    assert int(tree["step"]) == 1


def test_vgg19_npz_import(tmp_path, rng):
    model = OpenPose(num_stages=1, dtype=jnp.float32)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]

    data = {}
    for name in ("conv1_1", "conv3_2"):
        k = params["vgg"][name]["kernel"]
        data[f"{name}_kernel"] = rng.normal(size=k.shape).astype(np.float32)
        data[f"{name}_bias"] = rng.normal(
            size=params["vgg"][name]["bias"].shape
        ).astype(np.float32)
    path = str(tmp_path / "vgg.npz")
    np.savez(path, **data)

    new, loaded = W.load_vgg19_imagenet_npz(path, params)
    assert loaded
    np.testing.assert_array_equal(
        np.asarray(new["vgg"]["conv1_1"]["kernel"]), data["conv1_1_kernel"]
    )
    # untouched layers keep their init
    np.testing.assert_array_equal(
        np.asarray(new["vgg"]["conv2_1"]["kernel"]),
        np.asarray(params["vgg"]["conv2_1"]["kernel"]),
    )
    _, loaded2 = W.load_vgg19_imagenet_npz("/nonexistent.npz", params)
    assert not loaded2


def test_synthetic_dataset_tool(tmp_path):
    out = str(tmp_path / "synth.h5")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_synthetic_dataset.py"),
         "--output", out, "--count", "4", "--size", "128"],
        capture_output=True, text=True, timeout=300,
        env={**os.environ, "PYTHONPATH": REPO},
    )
    assert r.returncode == 0, r.stderr[-1000:]
    from tpupose.data import hdf5 as hdf5_io, pipeline

    recs = list(hdf5_io.read_samples(out))
    assert len(recs) >= 4
    assert recs[0]["image"].shape == (128, 128, 3)
    # feeds the training pipeline
    cfg = PoseConfig(train=TrainConfig(batch_size=2),
                     augment=AugmentConfig(max_persons=3))
    batches = list(pipeline.hdf5_batches(out, cfg, target_h=128, target_w=128,
                                         epochs=1))
    assert batches and batches[0]["images"].shape == (2, 128, 128, 3)


def test_synthetic_varied_style_and_codec(tmp_path):
    """`--style varied` (the diverse source domain for the adaptation
    premise, experiments/adapt_premise_r3.py) must actually vary scene
    statistics, and `--compression none` must write uncompressed."""
    out = str(tmp_path / "varied.h5")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_synthetic_dataset.py"),
         "--output", out, "--count", "10", "--size", "128",
         "--style", "varied", "--compression", "none", "--seed", "5"],
        capture_output=True, text=True, timeout=300,
        env={**os.environ, "PYTHONPATH": REPO},
    )
    assert r.returncode == 0, r.stderr[-1000:]
    import h5py

    from tpupose.data import hdf5 as hdf5_io

    with h5py.File(out) as f:
        key = sorted(f["datum"].keys())[0]
        assert f["datum"][key]["image"].compression is None

    means = []
    seen = set()
    for rec in hdf5_io.read_samples(out):
        m = rec["image"].mean()
        if m not in seen:          # one entry per scene (records share images)
            seen.add(m)
            means.append(m)
    assert len(means) >= 6
    # backgrounds span dark AND bright scenes
    assert min(means) < 100 and max(means) > 140, means


def test_normalize_channel_order():
    """channel_order="rgb" flips incoming RGB to the BGR the weights
    expect; "bgr" is a no-op (round-1 ADVICE: the field was unread)."""
    from tpupose.ops import image as image_ops

    img = jnp.asarray(np.arange(2 * 2 * 3, dtype=np.float32).reshape(2, 2, 3))
    bgr = image_ops.normalize(img, "bgr")
    rgb = image_ops.normalize(img, "rgb")
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(bgr)[..., ::-1])
    with pytest.raises(ValueError):
        image_ops.normalize(img, "hsv")
