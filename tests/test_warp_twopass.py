"""Round-2 warp rewrite: two-pass dense-hat resampling.

Pins (a) bit-level parity between the device two-pass warp and its
NumPy twin, (b) closeness to the exact 4-corner bilinear on smooth
images (the two formulations sample the same bilinear surface, so they
may differ only sub-pixel — large diffs would mean a geometry bug),
(c) cv2.flip translation semantics (x' = out-1-x), and (d) the
fold_in key scheme that keeps padded batches augmentation-identical.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpupose.config import AugmentConfig, ModelConfig
from tpupose.gt import augment as A
from tpupose.reference_impl import gt_np


@pytest.mark.parametrize("degrees,scale,sw", [(25.0, 0.8, 96), (-37.0, 1.6, 90)])
def test_twopass_matches_numpy_twin(rng, degrees, scale, sw):
    img = rng.uniform(0, 255, (80, sw, 3)).astype(np.float32)
    m = gt_np.affine_matrix_np((40.0, 45.0), scale, degrees, False, 64, (3.0, -2.0))
    ref = gt_np.warp_image_twopass_np(img, m, 64, 127.0)
    got = A.warp_image_twopass(
        jnp.asarray(img), jnp.asarray(m, jnp.float32), 64, 127.0
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-2)


def test_twopass_close_to_exact_on_smooth_images(rng):
    """On a locally-linear image both warps agree to interpolation error."""
    yy, xx = np.mgrid[0:120, 0:120].astype(np.float32)
    img = np.stack([0.7 * xx + 0.1 * yy, 0.9 * yy, xx * 0.2 + 50], -1)
    m = gt_np.affine_matrix_np((60.0, 60.0), 1.1, 30.0, False, 96)
    exact = A.warp_image(jnp.asarray(img), jnp.asarray(m, jnp.float32), 96, 0.0)
    two = A.warp_image_twopass(jnp.asarray(img), jnp.asarray(m, jnp.float32), 96, 0.0)
    # identical except along the constant-border seam (sub-pixel border
    # blending differs in the corner triangles)
    interior = np.asarray(exact[2:-2, 2:-2]) - np.asarray(two[2:-2, 2:-2])
    assert np.abs(interior).max() < 1e-2


def test_flip_is_exact_mirror():
    """flip with identity scale/rot about the image centre must equal
    img[:, ::-1] exactly (cv2.flip semantics: x' = out-1-x)."""
    rng = np.random.default_rng(0)
    out = 64
    img = rng.uniform(0, 255, (out, out, 3)).astype(np.float32)
    params = {
        "scale_mult": jnp.float32(1.0),
        "degrees": jnp.float32(0.0),
        "perturb": jnp.zeros((2,), jnp.float32),
        "flip": jnp.asarray(True),
    }
    aug = AugmentConfig(target_dist=0.6)
    # scale = target_dist / scale_provided * 1.0 == 1  =>  scale_provided = 0.6
    m = A.affine_matrix(
        jnp.asarray([out / 2.0, out / 2.0]), jnp.float32(0.6), params, aug, out
    )
    for warp in (A.warp_image, A.warp_image_twopass):
        got = np.asarray(warp(jnp.asarray(img), m, out, 0.0))
        np.testing.assert_allclose(got, img[:, ::-1], atol=1e-3)
    # and the twin composes the same matrix
    m_np = gt_np.affine_matrix_np((out / 2.0, out / 2.0), 1.0, 0.0, True, out)
    np.testing.assert_allclose(np.asarray(m), m_np, atol=1e-5)


def test_padded_batch_augments_real_samples_identically(rng):
    """fold_in keys: augmenting a batch padded for mesh divisibility must
    produce the same outputs for the real samples as the unpadded batch."""
    model = ModelConfig(boxsize=64)
    aug = AugmentConfig(max_persons=2)
    n, h, w = 3, 72, 72
    images = rng.uniform(0, 255, (n, h, w, 3)).astype(np.float32)
    masks = np.ones((n, h, w), np.float32)
    joints = np.full((n, 2, 18, 3), 2.0, np.float32)
    centers = np.tile(np.asarray([[36.0, 36.0]], np.float32), (n, 1))
    scales = np.full((n,), 0.8, np.float32)

    from tpupose.parallel.sharding import pad_batch

    batch = {
        "images": images, "masks": masks, "joints": joints,
        "centers": centers, "scales": scales,
    }
    padded, n_real = pad_batch(batch, 4)
    assert n_real == n and padded["images"].shape[0] == 4
    assert padded["masks"][n:].max() == 0  # padded rows are loss-inert

    key = jax.random.PRNGKey(7)
    outs = A.augment_batch(
        key, jnp.asarray(images), jnp.asarray(masks), jnp.asarray(joints),
        jnp.asarray(centers), jnp.asarray(scales), model, aug,
    )
    outs_p = A.augment_batch(
        key, *(jnp.asarray(padded[k]) for k in
               ("images", "masks", "joints", "centers", "scales")),
        model, aug,
    )
    for a, b in zip(outs, outs_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b)[:n], atol=1e-5)
