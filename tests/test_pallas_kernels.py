"""Pallas kernel parity tests (interpreter mode on CPU, SURVEY.md 5.2:
interpret-mode tests catch OOB indexing before TPU runs)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpupose.decode.peaks import find_peaks, gaussian_blur
from tpupose.gt.rasterize import create_labels
from tpupose.ops.pallas_gt import create_labels_pallas
from tpupose.ops.pallas_peaks import find_peaks_pallas


def test_pallas_peaks_matches_jnp(rng):
    base = rng.normal(size=(64, 80, 19)).astype(np.float32)
    heat = np.stack(
        [
            np.asarray(gaussian_blur(base[:, :, c : c + 1], 4.0))[:, :, 0]
            for c in range(19)
        ],
        -1,
    ) * 3.0
    ref = find_peaks(heat, max_peaks=32)
    got = find_peaks_pallas(heat, max_peaks=32, interpret=True)
    for k in ("xs", "ys", "scores"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(ref[k]), atol=1e-5, err_msg=k
        )
    np.testing.assert_array_equal(np.asarray(got["valid"]), np.asarray(ref["valid"]))
    assert int(np.asarray(ref["valid"]).sum()) > 0


def test_pallas_peaks_empty(rng):
    heat = np.zeros((48, 48, 19), np.float32)
    got = find_peaks_pallas(heat, max_peaks=8, interpret=True)
    assert not np.asarray(got["valid"]).any()


def test_pallas_gt_matches_jnp(rng):
    j = np.full((2, 5, 18, 3), 2.0, np.float32)
    j[:, :3, :, 0] = rng.uniform(0, 368, (2, 3, 18))
    j[:, :3, :, 1] = rng.uniform(0, 368, (2, 3, 18))
    j[:, :3, :, 2] = rng.choice([0.0, 1.0, 2.0], (2, 3, 18), p=[0.6, 0.2, 0.2])
    mask = rng.uniform(size=(2, 46, 46)).astype(np.float32)

    paf_ref, heat_ref = create_labels(jnp.asarray(j), jnp.asarray(mask))
    paf_got, heat_got = create_labels_pallas(
        jnp.asarray(j), jnp.asarray(mask), interpret=True
    )
    np.testing.assert_allclose(np.asarray(heat_got), np.asarray(heat_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(paf_got), np.asarray(paf_ref), atol=1e-5)
