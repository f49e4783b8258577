"""Gaussian-smoothed NMS peak finding (jnp, static shapes).

TPU-native rebuild of the reference decode's peak stage (SURVEY.md C6):
per part channel, smooth with a sigma=3 gaussian (scipy ``reflect``
border semantics), keep strict-or-equal local maxima against the four
shifted neighbours above ``thre1``, and report the *unsmoothed* score.

Dynamic peak lists become fixed-capacity (18, K) tables selected with
``top_k`` plus validity masks (SURVEY.md section 7 "hard parts"). A
fused Pallas kernel backs the smoothing+NMS hot path on TPU; this module
is the reference jnp implementation and the fallback.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tpupose import topology



def gaussian_kernel1d(sigma: float, truncate: float = 4.0) -> np.ndarray:
    """scipy.ndimage-compatible 1D gaussian (normalised, radius=trunc*sigma)."""
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(maps: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable gaussian over (H, W, C) with scipy 'reflect' borders."""
    k = jnp.asarray(gaussian_kernel1d(sigma))
    r = (k.shape[0] - 1) // 2
    c = maps.shape[-1]

    x = jnp.pad(maps, ((r, r), (r, r), (0, 0)), mode="symmetric")
    x = x[None]  # NHWC

    kh = k.reshape(-1, 1, 1, 1) * jnp.ones((1, 1, 1, c), k.dtype)
    kw = k.reshape(1, -1, 1, 1) * jnp.ones((1, 1, 1, c), k.dtype)
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
    # HIGHEST precision: on TPU the default f32 conv uses bf16 multiplies,
    # which perturbs plateau NMS comparisons away from the scipy reference.
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )
    return x[0]


@partial(jax.jit, static_argnames=("max_peaks", "sigma", "thre1"))
def find_peaks(
    heatmap: jnp.ndarray,
    max_peaks: int = 96,
    sigma: float = 3.0,
    thre1: float = 0.1,
) -> dict[str, jnp.ndarray]:
    """(H, W, 19) averaged heatmap -> fixed-capacity peak tables.

    Returns dict with xs/ys (18, K) int32, scores (18, K) f32 (unsmoothed
    map values), valid (18, K) bool. Slots are score-descending.
    """
    parts = heatmap[:, :, : topology.NUM_PARTS]
    h, w = parts.shape[0], parts.shape[1]
    smooth = gaussian_blur(parts, sigma)

    z = jnp.zeros_like(smooth)
    up = jnp.concatenate([z[:1], smooth[:-1]], axis=0)      # shifted down
    down = jnp.concatenate([smooth[1:], z[:1]], axis=0)     # shifted up
    left = jnp.concatenate([z[:, :1], smooth[:, :-1]], axis=1)
    right = jnp.concatenate([smooth[:, 1:], z[:, :1]], axis=1)

    is_peak = (
        (smooth >= up)
        & (smooth >= down)
        & (smooth >= left)
        & (smooth >= right)
        & (smooth > thre1)
    )

    scores = jnp.where(is_peak, parts, -jnp.inf)            # (H, W, 18)
    flat = scores.reshape(h * w, -1).T                      # (18, H*W)
    top_scores, top_idx = jax.lax.top_k(flat, max_peaks)    # (18, K)
    valid = jnp.isfinite(top_scores)
    ys = top_idx // w
    xs = top_idx % w
    return {
        "xs": xs.astype(jnp.int32),
        "ys": ys.astype(jnp.int32),
        "scores": jnp.where(valid, top_scores, 0.0).astype(jnp.float32),
        "valid": valid,
    }
