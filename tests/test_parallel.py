"""Multi-chip tests on the 8-device virtual CPU mesh (SURVEY.md 4d):
data-parallel training step and scale-sharded pyramid inference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpupose import topology
from tpupose.config import (
    AugmentConfig,
    InferenceConfig,
    ModelConfig,
    PoseConfig,
    TrainConfig,
    with_scales,
)
from tpupose.models import OpenPose
from tpupose.parallel import make_mesh, replicate_tree, shard_batch
from tpupose.parallel.pyramid import scale_mesh, sharded_process
from tpupose.training import create_state, make_train_step


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8  # conftest forces 8 virtual CPU devices


def test_data_parallel_step_matches_single_device(rng):
    """The sharded step must compute the same losses as unsharded."""
    cfg = PoseConfig(
        model=ModelConfig(boxsize=64, compute_dtype="float32"),
        augment=AugmentConfig(max_persons=2),
        train=TrainConfig(batch_size=8),
    )
    model = OpenPose(num_stages=1, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    state, tx = create_state(cfg, params)
    step = make_train_step(cfg, model, tx)

    n, h, w, p = 8, 96, 96, 2
    joints = np.full((n, p, 18, 3), 2.0, np.float32)
    joints[:, 0, :, 0] = rng.uniform(10, w - 10, (n, 18))
    joints[:, 0, :, 1] = rng.uniform(10, h - 10, (n, 18))
    joints[:, 0, :, 2] = 0.0
    batch = {
        "images": rng.uniform(0, 255, (n, h, w, 3)).astype(np.float32),
        "masks": np.ones((n, h, w), np.float32),
        "joints": joints,
        "centers": np.tile(np.asarray([[48.0, 48.0]], np.float32), (n, 1)),
        "scales": np.full((n,), 0.8, np.float32),
    }
    key = jax.random.PRNGKey(3)

    # the step donates its input state; give each run a private copy
    tree_a, losses_a = step(
        jax.tree.map(jnp.copy, state.tree()),
        key,
        {k: jnp.asarray(v) for k, v in batch.items()},
    )

    mesh = make_mesh()
    tree = replicate_tree(mesh, jax.tree.map(jnp.copy, state.tree()))
    sharded = shard_batch(mesh, batch)
    tree_b, losses_b = step(tree, key, sharded)

    np.testing.assert_allclose(
        float(losses_a["total"]), float(losses_b["total"]), rtol=1e-4
    )
    la = jax.tree_util.tree_leaves(tree_a["params"])
    lb = jax.tree_util.tree_leaves(tree_b["params"])
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_padded_batch_full_mesh_matches_unsharded(rng):
    """Batch 10 on 8 devices: padded to 16 and sharded over the FULL mesh
    must reproduce the unsharded batch-10 losses and params exactly
    (padded rows are masked out; the loss divisor stays 10)."""
    from tpupose.parallel.sharding import pad_batch

    cfg = PoseConfig(
        model=ModelConfig(boxsize=64, compute_dtype="float32"),
        augment=AugmentConfig(max_persons=2),
        train=TrainConfig(batch_size=10),
    )
    model = OpenPose(num_stages=1, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    state, tx = create_state(cfg, params)

    n, h, w, p = 10, 96, 96, 2
    joints = np.full((n, p, 18, 3), 2.0, np.float32)
    joints[:, 0, :, 0] = rng.uniform(10, w - 10, (n, 18))
    joints[:, 0, :, 1] = rng.uniform(10, h - 10, (n, 18))
    joints[:, 0, :, 2] = 0.0
    batch = {
        "images": rng.uniform(0, 255, (n, h, w, 3)).astype(np.float32),
        "masks": np.ones((n, h, w), np.float32),
        "joints": joints,
        "centers": np.tile(np.asarray([[48.0, 48.0]], np.float32), (n, 1)),
        "scales": np.full((n,), 0.8, np.float32),
    }
    key = jax.random.PRNGKey(5)

    step = make_train_step(cfg, model, tx, loss_denom=n)
    tree_a, losses_a = step(
        jax.tree.map(jnp.copy, state.tree()),
        key,
        {k: jnp.asarray(v) for k, v in batch.items()},
    )

    mesh = make_mesh()
    padded, n_real = pad_batch(batch, mesh.devices.size)
    assert n_real == n and padded["images"].shape[0] == 16
    tree = replicate_tree(mesh, jax.tree.map(jnp.copy, state.tree()))
    tree_b, losses_b = step(tree, key, shard_batch(mesh, padded))

    np.testing.assert_allclose(
        float(losses_a["total"]), float(losses_b["total"]), rtol=1e-4
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(tree_a["params"]),
        jax.tree_util.tree_leaves(tree_b["params"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_scale_mesh_sizing():
    # 8 devices: 4 scales -> mesh 4; 3 scales -> 3; 5 -> 5; 1 -> 1
    assert scale_mesh(4).devices.size == 4
    assert scale_mesh(3).devices.size == 3
    assert scale_mesh(1).devices.size == 1


def test_sharded_pyramid_device_count_invariance(rng):
    """The scale-sharded pyramid program must give identical results on a
    1-device and a multi-device mesh (XLA SPMD correctness) — the
    multi-chip analogue of the reference's serial pyramid."""
    from tpupose.parallel.pyramid import build_sharded_pyramid_fn

    cfg = PoseConfig(
        model=ModelConfig(boxsize=64, compute_dtype="float32"),
        inference=InferenceConfig(scale_search=(0.5, 1.0), max_peaks=16,
                                  max_people=16),
    )
    model = OpenPose(num_stages=1, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    image = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)

    tables = {}
    for n_dev in (1, 2):
        mesh = make_mesh(n_dev)
        fn = build_sharded_pyramid_fn(model, cfg, mesh, 64, 64)
        tables[n_dev] = jax.device_get(fn(params, jnp.asarray(image)))

    for k in tables[1]:
        np.testing.assert_allclose(
            tables[1][k], tables[2][k], atol=1e-4, err_msg=k
        )


def test_data_scale_mesh_2d_matches_single_device(rng):
    """DP x scale-parallel composed in ONE program: the batched pyramid
    on a 2-D ('data', 'scale') mesh — 2-way image batch x 2-way scales
    on 4 devices — must reproduce the same program run on one device."""
    from tpupose.parallel.pyramid import (
        build_sharded_pyramid_batch_fn,
        data_scale_mesh,
    )
    from jax.sharding import Mesh

    cfg = PoseConfig(
        model=ModelConfig(boxsize=64, compute_dtype="float32"),
        inference=InferenceConfig(scale_search=(0.5, 1.0), max_peaks=16,
                                  max_people=16),
    )
    model = OpenPose(num_stages=1, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    images = rng.integers(0, 255, (2, 64, 64, 3)).astype(np.uint8)

    mesh_2d = data_scale_mesh(2, devices=jax.devices()[:4])
    assert dict(mesh_2d.shape) == {"data": 2, "scale": 2}
    mesh_1 = Mesh(
        np.asarray(jax.devices()[:1]).reshape(1, 1), ("data", "scale")
    )

    tables = {}
    for name, mesh in (("one", mesh_1), ("grid", mesh_2d)):
        fn = build_sharded_pyramid_batch_fn(model, cfg, mesh, 2, 64, 64)
        tables[name] = jax.device_get(fn(params, jnp.asarray(images)))

    for k in tables["one"]:
        np.testing.assert_allclose(
            tables["one"][k], tables["grid"][k], atol=1e-4, err_msg=k
        )


def test_sharded_process_batch_pads_to_data_axis(rng):
    """3 images on a ('data'=2, 'scale'=2) mesh: the odd batch pads to 4
    rows on-device and returns exactly 3 results."""
    from tpupose.infer import PoseEstimator
    from tpupose.parallel.pyramid import data_scale_mesh, sharded_process_batch

    cfg = PoseConfig(
        model=ModelConfig(num_stages=1, compute_dtype="float32"),
        inference=InferenceConfig(scale_search=(0.5, 1.0), max_peaks=16,
                                  max_people=16),
    )
    est = PoseEstimator(cfg)
    images = rng.integers(0, 255, (3, 64, 64, 3)).astype(np.uint8)
    out = sharded_process_batch(
        est, images, data_scale_mesh(2, devices=jax.devices()[:4])
    )
    assert len(out) == 3
    assert all(isinstance(o["people"], list) for o in out)
