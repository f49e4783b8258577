"""Training-path tests: loss parity, MultiSGD multipliers, frozen-VGG
domain-adaptation mode, end-to-end jitted step with on-device GT, and
Orbax checkpoint round-trip (SURVEY.md section 4e)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpupose.config import AugmentConfig, ModelConfig, PoseConfig, TrainConfig
from tpupose.models import OpenPose
from tpupose.training import (
    checkpoint,
    create_state,
    make_train_step,
    param_labels,
    stagewise_losses,
)
from tpupose.training.optimizer import multipliers, step_decay_schedule


SMALL = PoseConfig(
    model=ModelConfig(boxsize=64, compute_dtype="float32"),
    augment=AugmentConfig(max_persons=3),
    train=TrainConfig(batch_size=2, base_lr=1e-4),
)


def small_batch(rng, n=2, h=96, w=96, p=3):
    joints = np.full((n, p, 18, 3), 2.0, np.float32)
    joints[:, 0, :, 0] = rng.uniform(10, w - 10, (n, 18))
    joints[:, 0, :, 1] = rng.uniform(10, h - 10, (n, 18))
    joints[:, 0, :, 2] = 0.0
    return {
        "images": rng.uniform(0, 255, (n, h, w, 3)).astype(np.float32),
        "masks": np.ones((n, h, w), np.float32),
        "joints": joints,
        "centers": np.tile(np.asarray([[w / 2, h / 2]], np.float32), (n, 1)),
        "scales": np.full((n,), 0.8, np.float32),
    }


@pytest.fixture(scope="module")
def setup():
    model = OpenPose(num_stages=2, dtype=jnp.float32)
    x = jnp.zeros((1, SMALL.model.boxsize, SMALL.model.boxsize, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    return model, params


def test_stagewise_loss_matches_numpy(setup, rng):
    n, l = 2, 8
    paf_p = rng.normal(size=(n, l, l, 38)).astype(np.float32)
    heat_p = rng.normal(size=(n, l, l, 19)).astype(np.float32)
    paf_gt = rng.normal(size=(n, l, l, 38)).astype(np.float32)
    heat_gt = rng.normal(size=(n, l, l, 19)).astype(np.float32)
    mask = (rng.uniform(size=(n, l, l)) > 0.3).astype(np.float32)

    outputs = [(jnp.asarray(paf_p), jnp.asarray(heat_p))] * 2
    losses = stagewise_losses(
        outputs, jnp.asarray(paf_gt * mask[..., None]),
        jnp.asarray(heat_gt * mask[..., None]), jnp.asarray(mask)
    )
    ref_paf = ((paf_p * mask[..., None] - paf_gt * mask[..., None]) ** 2).sum() / n / 2
    ref_heat = ((heat_p * mask[..., None] - heat_gt * mask[..., None]) ** 2).sum() / n / 2
    np.testing.assert_allclose(float(losses["stage1_L1"]), ref_paf, rtol=1e-5)
    np.testing.assert_allclose(float(losses["stage2_L2"]), ref_heat, rtol=1e-5)
    np.testing.assert_allclose(
        float(losses["total"]), 2 * (ref_paf + ref_heat), rtol=1e-5
    )


def test_param_labels_and_multipliers(setup):
    _, params = setup
    labels = param_labels(params)
    flat = jax.tree_util.tree_flatten_with_path(labels)[0]
    seen = {v for _, v in flat}
    assert seen == {
        "vgg_w", "vgg_b", "cpm_w", "cpm_b",
        "stage1_w", "stage1_b", "stageT_w", "stageT_b",
    }
    m = multipliers(TrainConfig())
    assert m["stageT_w"] == 4.0 and m["stageT_b"] == 8.0
    mf = multipliers(TrainConfig().frozen_vgg())
    assert mf["vgg_w"] == 0.0 and mf["vgg_b"] == 0.0 and mf["stageT_w"] == 4.0


def test_lr_schedule():
    cfg = TrainConfig(base_lr=1e-3, lr_gamma=0.5, lr_step=100)
    s = step_decay_schedule(cfg)
    assert float(s(0)) == pytest.approx(1e-3)
    assert float(s(99)) == pytest.approx(1e-3)
    assert float(s(100)) == pytest.approx(5e-4)
    assert float(s(250)) == pytest.approx(2.5e-4)


def test_train_step_decreases_loss(setup):
    model, params = setup
    # the jitted step donates its input state; give it a private copy so
    # the module-scoped fixture params stay alive for other tests
    state, tx = create_state(SMALL, jax.tree.map(jnp.copy, params))
    step = make_train_step(SMALL, model, tx)
    batch = {k: jnp.asarray(v) for k, v in small_batch(np.random.default_rng(2)).items()}

    tree = state.tree()
    losses = []
    for i in range(4):
        tree, metrics = step(tree, jax.random.PRNGKey(7), batch)  # fixed aug
        losses.append(float(metrics["total"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    assert int(tree["step"]) == 4
    assert set(metrics) == {
        "stage1_L1", "stage1_L2", "stage2_L1", "stage2_L2", "total"
    }


def test_frozen_vgg_is_bit_frozen(setup):
    model, params = setup
    cfg = dataclasses.replace(SMALL, train=SMALL.train.frozen_vgg())
    state, tx = create_state(cfg, jax.tree.map(jnp.copy, params))
    step = make_train_step(cfg, model, tx)
    batch = {k: jnp.asarray(v) for k, v in small_batch(np.random.default_rng(3)).items()}

    tree, _ = step(state.tree(), jax.random.PRNGKey(0), batch)
    for name, leaf in tree["params"]["vgg"].items():
        for wname, w in leaf.items():
            np.testing.assert_array_equal(
                np.asarray(w), np.asarray(params["vgg"][name][wname]),
                err_msg=f"vgg/{name}/{wname} changed while frozen",
            )
    # non-frozen groups must move
    moved = np.abs(
        np.asarray(tree["params"]["stage2_L1"]["conv1"]["kernel"])
        - np.asarray(params["stage2_L1"]["conv1"]["kernel"])
    ).max()
    assert moved > 0


def test_checkpoint_roundtrip(tmp_path, setup):
    _, params = setup
    tree = {
        "params": {"a": jnp.arange(6.0).reshape(2, 3)},
        "opt_state": {"m": jnp.ones((2, 3))},
        "step": jnp.int32(17),
    }
    d = str(tmp_path / "ckpt")
    assert checkpoint.latest_step(d) is None
    step = checkpoint.save(d, jax.device_get(tree))
    assert step == 17
    template = jax.tree.map(np.zeros_like, jax.device_get(tree))
    restored = checkpoint.restore(d, template)
    np.testing.assert_array_equal(restored["params"]["a"], np.arange(6.0).reshape(2, 3))
    assert int(restored["step"]) == 17
