"""Fused pyramid-to-peak-scores kernel parity (interpret mode).

Must equal the XLA matrix path: same constant matrices, same HIGHEST-
precision matmuls, same NMS — identical masked-score STRUCTURE (peak
positions) with values to f32 rounding.
"""

import numpy as np
import jax
import jax.numpy as jnp

from tpupose.decode.peaks import masked_scores
from tpupose.decode.scalespace import ScaleSpace, pyramid_heat_maps
from tpupose.ops.image import scale_sizes
from tpupose.ops.pallas_pyramid_peaks import pyramid_peak_scores_pallas

SIZES = scale_sizes(368, 368, (0.5, 1.0, 1.5, 2.0), 368, 8)


def _maps(rng, c=18):
    out = []
    for rh, rw, ph, pw in SIZES:
        m = rng.normal(size=(ph // 8, pw // 8, c)).astype(np.float32)
        m = (m + np.roll(m, 1, 0) + np.roll(m, 1, 1)) / 3.0
        out.append(m * 0.3)
    return out


def test_pyramid_peaks_kernel_matches_matrix_path():
    rng = np.random.default_rng(0)
    maps = _maps(rng)
    geoms = tuple(s[:2] for s in SIZES)
    space = ScaleSpace([jnp.asarray(m) for m in maps], geoms, (368, 368))
    parts, smooth = pyramid_heat_maps(space, sigma=3.0)
    want = np.asarray(masked_scores(parts, smooth, 0.1))

    got = np.asarray(
        pyramid_peak_scores_pallas(
            tuple(jnp.moveaxis(jnp.asarray(m), -1, 0) for m in maps),
            geoms,
            (368, 368),
            sigma=3.0,
            thre1=0.1,
            interpret=True,
        )
    )
    # identical peak structure
    np.testing.assert_array_equal(np.isfinite(got), np.isfinite(want))
    # identical scores at the peaks (f32 rounding)
    mask = np.isfinite(want)
    np.testing.assert_allclose(got[mask], want[mask], atol=2e-5)


def test_pyramid_peaks_kernel_nonsquare():
    h, w = 240, 368
    sizes = scale_sizes(h, w, (0.5, 1.0), 368, 8)
    rng = np.random.default_rng(1)
    maps = [
        (rng.normal(size=(ph // 8, pw // 8, 18)).astype(np.float32)) * 0.3
        for rh, rw, ph, pw in sizes
    ]
    geoms = tuple(s[:2] for s in sizes)
    space = ScaleSpace([jnp.asarray(m) for m in maps], geoms, (h, w))
    parts, smooth = pyramid_heat_maps(space, sigma=3.0)
    want = np.asarray(masked_scores(parts, smooth, 0.1))
    got = np.asarray(
        pyramid_peak_scores_pallas(
            tuple(jnp.moveaxis(jnp.asarray(m), -1, 0) for m in maps),
            geoms, (h, w), sigma=3.0, thre1=0.1, interpret=True,
        )
    )
    np.testing.assert_array_equal(np.isfinite(got), np.isfinite(want))
    mask = np.isfinite(want)
    np.testing.assert_allclose(got[mask], want[mask], atol=2e-5)
