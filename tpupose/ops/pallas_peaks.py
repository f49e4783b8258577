"""Fused gaussian-smooth + NMS peak kernel (Pallas TPU).

The decode's peak stage (SURVEY.md C6) reads the averaged heatmap once
and needs three derived quantities: the sigma=3-smoothed map, the
4-neighbour local-max test, and the thresholded scores. As separate XLA
ops each materialises an (H, W) intermediate in HBM; this kernel keeps
one part channel resident in VMEM and emits only the masked score map
(-inf off-peak), which feeds the scan-order slot compaction.

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


def _peaks_kernel(taps: np.ndarray, thre1: float, hm_ref, out_ref, acc_ref, sm_ref):
    # hm_ref holds the channel pre-padded with reflect borders (Mosaic has
    # no `rev` lowering, so the reflect-pad happens outside the kernel);
    # blur + NMS + threshold all fuse in this one VMEM residency.
    # Static slices only (no lax.dynamic_slice lowering), and the tap loops
    # accumulate IN PLACE into VMEM scratch so the 25-tap unroll keeps a
    # 2-buffer live set instead of 25 temporaries (scoped-vmem OOM).
    r = (len(taps) - 1) // 2
    ph, pw = hm_ref.shape
    h, w = ph - 2 * r, pw - 2 * r

    # --- horizontal blur: (h+2r, w) keeping vertical pad rows --------------
    acc_ref[:, :] = taps[0] * hm_ref[:, 0:w]
    for k in range(1, len(taps)):
        acc_ref[:, :] = acc_ref[:, :] + taps[k] * hm_ref[:, k : k + w]
    # --- vertical blur -------------------------------------------------------
    sm_ref[:, :] = taps[0] * acc_ref[0:h, :]
    for k in range(1, len(taps)):
        sm_ref[:, :] = sm_ref[:, :] + taps[k] * acc_ref[k : k + h, :]

    # --- NMS: >= all four zero-border shifted neighbours, > thre1 ----------
    sm = sm_ref[:, :]
    z_row = jnp.zeros((1, w), jnp.float32)
    z_col = jnp.zeros((h, 1), jnp.float32)
    up = jnp.concatenate([z_row, sm[:-1, :]], axis=0)
    down = jnp.concatenate([sm[1:, :], z_row], axis=0)
    left = jnp.concatenate([z_col, sm[:, :-1]], axis=1)
    right = jnp.concatenate([sm[:, 1:], z_col], axis=1)
    is_peak = (
        (sm >= up) & (sm >= down) & (sm >= left) & (sm >= right) & (sm > thre1)
    )
    x = hm_ref[r : r + h, r : r + w]  # original (unsmoothed) values
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
    r = (len(taps) - 1) // 2
    h, w, c = heatmap.shape
    maps = jnp.moveaxis(heatmap, -1, 0).astype(jnp.float32)  # (C, H, W)
    # reflect-pad outside the kernel (Mosaic cannot lower lax.rev)
    maps = jnp.pad(maps, ((0, 0), (r, r), (r, r)), mode="symmetric")

    kernel = functools.partial(_peaks_kernel, np.asarray(taps, np.float32), thre1)
    out = pl.pallas_call(
        kernel,
        grid=(c,),
        in_specs=[
            pl.BlockSpec((None, h + 2 * r, w + 2 * r), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, h, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((h + 2 * r, w), jnp.float32),   # horizontal-blur acc
            pltpu.VMEM((h, w), jnp.float32),            # smoothed map
        ],
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
    from tpupose.decode.peaks import peak_tables

    scores = peak_scores_pallas(parts, sigma=sigma, thre1=thre1, interpret=interpret)
    flat = scores.reshape(scores.shape[0], h * w)        # (18, H*W)
    return peak_tables(flat, w, max_peaks)
