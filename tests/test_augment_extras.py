"""Extra augmentation/optimizer coverage: label-grid mask sampling parity
and gradient accumulation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpupose.config import ModelConfig, PoseConfig, TrainConfig
from tpupose.gt import augment as A
from tpupose.reference_impl import gt_np


def test_mask_grid_sampling_matches_fullres_pointsample(rng):
    """Direct label-grid sampling == point-sampling the full-res warp at
    the grid centres (same gather, 64x cheaper)."""
    model = ModelConfig()
    msk = (rng.uniform(size=(300, 400)) > 0.4).astype(np.float32)
    m = gt_np.affine_matrix_np((200.0, 150.0), 0.9, 20.0, False, model.boxsize)
    m = jnp.asarray(m, jnp.float32)

    lbl = np.asarray(
        A.sample_mask_at_label_grid(jnp.asarray(msk), m, model.label_size,
                                    model.stride)
    )
    s = model.stride
    idx = np.arange(model.label_size) * s + s / 2 - 0.5
    inv = np.linalg.inv(np.vstack([np.asarray(m), [0, 0, 1]]))[:2]
    xs, ys = np.meshgrid(idx, idx)
    sx = inv[0, 0] * xs + inv[0, 1] * ys + inv[0, 2]
    sy = inv[1, 0] * xs + inv[1, 1] * ys + inv[1, 2]
    x0 = np.floor(sx).astype(int)
    y0 = np.floor(sy).astype(int)
    fx, fy = sx - x0, sy - y0

    def g(yy, xx):
        inside = (xx >= 0) & (xx < 400) & (yy >= 0) & (yy < 300)
        return np.where(inside, msk[np.clip(yy, 0, 299), np.clip(xx, 0, 399)], 1.0)

    ref = ((g(y0, x0) * (1 - fx) + g(y0, x0 + 1) * fx) * (1 - fy)
           + (g(y0 + 1, x0) * (1 - fx) + g(y0 + 1, x0 + 1) * fx) * fy)
    np.testing.assert_allclose(lbl, ref, atol=1e-3)


def test_gradient_accumulation(rng):
    """accum_steps=2: params move only every second step, and the applied
    update equals the mean of the two micro-batch gradients."""
    import optax

    from tpupose.training.optimizer import make_optimizer

    cfg = TrainConfig(batch_size=2, accum_steps=2, base_lr=1e-2,
                      momentum=0.0, weight_decay=0.0)
    # single-group toy params routed through the stageT path
    params = {"stage2_L1": {"conv1": {"kernel": jnp.ones((2, 2))}}}
    tx = make_optimizer(cfg, params)
    state = tx.init(params)

    g1 = {"stage2_L1": {"conv1": {"kernel": jnp.full((2, 2), 1.0)}}}
    g2 = {"stage2_L1": {"conv1": {"kernel": jnp.full((2, 2), 3.0)}}}

    up1, state = tx.update(g1, state, params)
    assert float(jnp.abs(jax.tree.leaves(up1)[0]).max()) == 0.0  # accumulating
    up2, state = tx.update(g2, state, params)
    # mean grad = 2.0; stageT_w multiplier = 4 -> update = -lr*4*2 = -0.08
    np.testing.assert_allclose(np.asarray(jax.tree.leaves(up2)[0]),
                               -0.08, rtol=1e-5)
