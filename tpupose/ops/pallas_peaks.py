"""Fused gaussian-smooth + NMS peak kernel (Pallas TPU).

The decode's peak stage (SURVEY.md C6) reads the averaged heatmap once
and needs three derived quantities: the sigma=3-smoothed map, the
4-neighbour local-max test, and the thresholded scores. As separate XLA
ops each materialises an (H, W) intermediate in HBM; this kernel keeps
one part channel resident in VMEM and emits only the masked score map
(-inf off-peak), which feeds straight into ``lax.top_k``.

Grid: one program per part channel. Each program:
  1. loads its (H, W) channel into VMEM,
  2. separable 25-tap gaussian blur (scipy-compatible kernel, symmetric
     'reflect' borders) via two shifted-accumulate passes,
  3. NMS against the four shifted neighbours (zero borders, reference
     semantics) + thre1 threshold,
  4. writes score = original value where peak else -inf.

Falls back to the jnp implementation on CPU (tests run the kernel in
interpreter mode for parity).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpupose.decode.peaks import gaussian_kernel1d


def _peaks_kernel(taps: np.ndarray, thre1: float, hm_ref, out_ref, smooth_ref):
    h, w = hm_ref.shape
    r = (len(taps) - 1) // 2
    x = hm_ref[:, :]

    # --- horizontal blur (reflect borders) --------------------------------
    padded = jnp.pad(x, ((0, 0), (r, r)), mode="symmetric")  # (h, w + 2r)
    acc = jnp.zeros((h, w), jnp.float32)
    for k in range(len(taps)):
        acc = acc + taps[k] * jax.lax.dynamic_slice(padded, (0, k), (h, w))
    # --- vertical blur ------------------------------------------------------
    padded = jnp.pad(acc, ((r, r), (0, 0)), mode="symmetric")
    sm = jnp.zeros((h, w), jnp.float32)
    for k in range(len(taps)):
        sm = sm + taps[k] * jax.lax.dynamic_slice(padded, (k, 0), (h, w))
    smooth_ref[:, :] = sm

    # --- NMS: >= all four zero-border shifted neighbours, > thre1 ----------
    z_row = jnp.zeros((1, w), jnp.float32)
    z_col = jnp.zeros((h, 1), jnp.float32)
    up = jnp.concatenate([z_row, sm[:-1, :]], axis=0)
    down = jnp.concatenate([sm[1:, :], z_row], axis=0)
    left = jnp.concatenate([z_col, sm[:, :-1]], axis=1)
    right = jnp.concatenate([sm[:, 1:], z_col], axis=1)
    is_peak = (
        (sm >= up) & (sm >= down) & (sm >= left) & (sm >= right) & (sm > thre1)
    )
    out_ref[:, :] = jnp.where(is_peak, x, -jnp.inf)


@functools.partial(
    jax.jit, static_argnames=("sigma", "thre1", "interpret")
)
def peak_scores_pallas(
    heatmap: jnp.ndarray,  # (H, W, C) part channels only
    sigma: float = 3.0,
    thre1: float = 0.1,
    interpret: bool = False,
) -> jnp.ndarray:
    """(H, W, C) -> (C, H, W) masked score maps (-inf off-peak)."""
    taps = tuple(float(t) for t in gaussian_kernel1d(sigma))
    h, w, c = heatmap.shape
    maps = jnp.moveaxis(heatmap, -1, 0).astype(jnp.float32)  # (C, H, W)

    kernel = functools.partial(_peaks_kernel, np.asarray(taps, np.float32), thre1)
    out, _ = pl.pallas_call(
        kernel,
        grid=(c,),
        in_specs=[
            pl.BlockSpec((None, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((c, h, w), jnp.float32),
            jax.ShapeDtypeStruct((c, h, w), jnp.float32),  # smoothed (debug)
        ),
        interpret=interpret,
    )(maps)
    return out


def find_peaks_pallas(
    heatmap: jnp.ndarray,
    max_peaks: int = 96,
    sigma: float = 3.0,
    thre1: float = 0.1,
    interpret: bool = False,
) -> dict[str, jnp.ndarray]:
    """Drop-in for decode.peaks.find_peaks backed by the fused kernel."""
    from tpupose import topology

    parts = heatmap[:, :, : topology.NUM_PARTS]
    h, w = parts.shape[0], parts.shape[1]
    scores = peak_scores_pallas(parts, sigma=sigma, thre1=thre1, interpret=interpret)
    flat = scores.reshape(scores.shape[0], h * w)        # (18, H*W)
    top_scores, top_idx = jax.lax.top_k(flat, max_peaks)
    valid = jnp.isfinite(top_scores)
    return {
        "xs": (top_idx % w).astype(jnp.int32),
        "ys": (top_idx // w).astype(jnp.int32),
        "scores": jnp.where(valid, top_scores, 0.0).astype(jnp.float32),
        "valid": valid,
    }
