"""Parity: on-device GT generation vs the NumPy twin (SURVEY.md 4b).

Covers putGaussianMaps/putVecMaps rasterisation and the affine
augmentation (matrix composition, image warp, joint transform with L/R
flip swap).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpupose import topology
from tpupose.config import AugmentConfig, ModelConfig
from tpupose.gt import augment as A
from tpupose.gt import rasterize as R
from tpupose.reference_impl import gt_np


@pytest.fixture(scope="module")
def joints3(rng=np.random.default_rng(5)):
    """3 persons + padding rows, some joints absent."""
    j = np.zeros((5, 18, 3))
    j[:3, :, 0] = rng.uniform(0, 368, (3, 18))
    j[:3, :, 1] = rng.uniform(0, 368, (3, 18))
    j[:3, :, 2] = rng.choice([0.0, 1.0, 2.0], (3, 18), p=[0.6, 0.2, 0.2])
    j[3:, :, 2] = 2.0  # padding persons: absent
    return j


def test_gaussian_maps_parity(joints3):
    model, aug = ModelConfig(), AugmentConfig()
    ref = gt_np.put_gaussian_maps_np(joints3, model, aug)
    got = R.put_gaussian_maps(
        jnp.asarray(joints3, jnp.float32), model.label_size, model.stride, aug.sigma
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


def test_vector_maps_parity(joints3):
    model, aug = ModelConfig(), AugmentConfig()
    ref = gt_np.put_vector_maps_np(joints3, model, aug)
    got = R.put_vector_maps(
        jnp.asarray(joints3, jnp.float32), model.label_size, model.stride, aug.paf_thre
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5)


def test_create_labels_masked(joints3):
    model, aug = ModelConfig(), AugmentConfig()
    mask = np.zeros((46, 46), np.float32)
    mask[:23] = 1.0
    paf, heat = R.create_labels(
        jnp.asarray(joints3, jnp.float32)[None],
        jnp.asarray(mask)[None],
    )
    assert paf.shape == (1, 46, 46, 38) and heat.shape == (1, 46, 46, 19)
    assert np.abs(np.asarray(paf)[0, 23:]).max() == 0
    assert np.abs(np.asarray(heat)[0, 23:]).max() == 0
    ref = gt_np.create_heatmaps_np(joints3, mask, model, aug)
    np.testing.assert_allclose(np.asarray(paf)[0], ref[:, :, :38], atol=2e-5)
    np.testing.assert_allclose(np.asarray(heat)[0], ref[:, :, 38:], atol=1e-5)


@pytest.mark.parametrize("flip", [False, True])
@pytest.mark.parametrize("degrees,scale", [(0.0, 1.0), (25.0, 0.8), (-40.0, 1.3)])
def test_affine_matrix_parity(flip, degrees, scale):
    aug = AugmentConfig()
    params = {
        "scale_mult": jnp.float32(scale),
        "degrees": jnp.float32(degrees),
        "perturb": jnp.asarray([7.0, -12.0], jnp.float32),
        "flip": jnp.asarray(flip),
    }
    center = jnp.asarray([150.0, 210.0])
    scale_provided = jnp.float32(0.9)
    got = np.asarray(A.affine_matrix(center, scale_provided, params, aug, 368))
    total_scale = aug.target_dist / 0.9 * scale
    ref = gt_np.affine_matrix_np(
        (150.0, 210.0), total_scale, degrees, flip, 368, (7.0, -12.0)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


def test_warp_image_parity(rng):
    img = rng.uniform(0, 255, (200, 300, 3)).astype(np.float32)
    ref_m = gt_np.affine_matrix_np((150.0, 100.0), 1.2, 30.0, False, 128)
    ref = gt_np.warp_image_np(img, ref_m, 128, (127.0, 127.0, 127.0))
    got = A.warp_image(jnp.asarray(img), jnp.asarray(ref_m, jnp.float32), 128, 127.0)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-2)


def test_transform_joints_flip_swap():
    joints = np.zeros((1, 18, 3))
    joints[0, topology.PART_INDEX["Lwri"]] = (100.0, 50.0, 0.0)
    joints[0, topology.PART_INDEX["Rwri"]] = (20.0, 50.0, 1.0)
    identity = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    out = np.asarray(
        A.transform_joints(jnp.asarray(joints, jnp.float32), identity,
                           jnp.asarray(True), 368)
    )
    # after flip-label swap, Rwri slot holds the old Lwri position
    assert out[0, topology.PART_INDEX["Rwri"], 0] == 100.0
    assert out[0, topology.PART_INDEX["Lwri"], 0] == 20.0
    ref = gt_np.transform_joints_np(joints, np.asarray(identity), True, 368)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_augment_batch_end_to_end(rng):
    model, aug = ModelConfig(), AugmentConfig()
    n, h, w = 2, 256, 320
    images = rng.uniform(0, 255, (n, h, w, 3)).astype(np.float32)
    masks = np.ones((n, h, w), np.float32)
    joints = np.full((n, 4, 18, 3), 2.0, np.float32)
    joints[:, 0, :, 0] = rng.uniform(50, 250, (n, 18))
    joints[:, 0, :, 1] = rng.uniform(50, 200, (n, 18))
    joints[:, 0, :, 2] = 0.0
    centers = np.asarray([[160.0, 128.0], [150.0, 120.0]], np.float32)
    scales = np.asarray([0.6, 0.8], np.float32)

    img_a, lbl_m, jts_a = A.augment_batch(
        jax.random.PRNGKey(0),
        jnp.asarray(images), jnp.asarray(masks), jnp.asarray(joints),
        jnp.asarray(centers), jnp.asarray(scales), model, aug,
    )
    assert img_a.shape == (n, 368, 368, 3)
    assert lbl_m.shape == (n, 46, 46)
    assert jts_a.shape == (n, 4, 18, 3)
    # deterministic eval mode: same call twice -> identical
    img_b, _, _ = A.augment_batch(
        jax.random.PRNGKey(0),
        jnp.asarray(images), jnp.asarray(masks), jnp.asarray(joints),
        jnp.asarray(centers), jnp.asarray(scales), model, aug, training=False,
    )
    img_c, _, _ = A.augment_batch(
        jax.random.PRNGKey(1),
        jnp.asarray(images), jnp.asarray(masks), jnp.asarray(joints),
        jnp.asarray(centers), jnp.asarray(scales), model, aug, training=False,
    )
    np.testing.assert_array_equal(np.asarray(img_b), np.asarray(img_c))
    # pixels outside the source map to gray
    assert (np.abs(np.asarray(img_a) - 128.0) < 256.0).all()
    # rasterise the augmented batch on device
    paf, heat = R.create_labels(jts_a, lbl_m)
    assert np.isfinite(np.asarray(paf)).all() and np.isfinite(np.asarray(heat)).all()
