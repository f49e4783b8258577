"""Fused Pallas pyramid-to-peak-scores kernel.

The scale-space peaks stage (decode/scalespace.py::pyramid_heat_maps +
decode/peaks.py::masked_scores) computes, per part channel,

    avg    = sum_s  (Wy_s @ M_s) @ WxT_s / n
    smooth = sum_s  (Ay_s @ M_s) @ BxT_s / n      (blur folded into A/B)

then 4-neighbour NMS + threshold. As XLA ops the per-scale (H, Wl)
intermediates, both full-res maps and the five shifted NMS operands all
round-trip HBM (~4 ms/batch-8 measured). This kernel runs the whole
chain in ONE VMEM residency per (image, channel): the low-res maps and
the constant resize/blur matrices stream in, the matmuls ride the MXU
at HIGHEST precision (same arithmetic as the XLA einsum path), and only
the masked score map (-inf off-peak) is written back — the input to the
slot compaction.

Matrices are passed PRE-TRANSPOSED on the right (WxT = (Wl, H)) so the
kernel never transposes (Mosaic-friendly).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(n_scales: int, thre1: float, *refs):
    # refs: maps_s x n_scales, then per scale (Wy, WxT, Ay, BxT), then
    # out_ref, then scratch (avg, smooth).
    maps = refs[:n_scales]
    mats = refs[n_scales : n_scales + 4 * n_scales]
    out_ref = refs[n_scales + 4 * n_scales]
    avg_ref, sm_ref = refs[n_scales + 4 * n_scales + 1 :]
    h, w = out_ref.shape

    dot = lambda a, b: jax.lax.dot(  # noqa: E731
        a, b, precision=jax.lax.Precision.HIGHEST
    )
    inv_n = 1.0 / float(n_scales)
    for s in range(n_scales):
        m = maps[s][:, :].astype(jnp.float32)
        wy, wxt, ay, bxt = (r[:, :] for r in mats[4 * s : 4 * s + 4])
        a_contrib = dot(dot(wy, m), wxt) * inv_n
        s_contrib = dot(dot(ay, m), bxt) * inv_n
        if s == 0:
            avg_ref[:, :] = a_contrib
            sm_ref[:, :] = s_contrib
        else:
            avg_ref[:, :] = avg_ref[:, :] + a_contrib
            sm_ref[:, :] = sm_ref[:, :] + s_contrib

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
    out_ref[:, :] = jnp.where(is_peak, avg_ref[:, :], -jnp.inf)


@functools.partial(
    jax.jit, static_argnames=("sigma", "thre1", "out_hw", "geoms", "interpret")
)
def pyramid_peak_scores_pallas(
    maps: tuple[jnp.ndarray, ...],   # per scale (C, Hl, Wl) part channels
    geoms: tuple[tuple[int, int], ...],
    out_hw: tuple[int, int],
    sigma: float = 3.0,
    thre1: float = 0.1,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-scale low-res part maps -> (C, H*W) masked peak scores."""
    from tpupose.decode.scalespace import (
        gaussian_reflect_matrix,
        resize_chain_matrix,
    )

    n_scales = len(maps)
    c = maps[0].shape[0]
    h, w = out_hw
    gy = gaussian_reflect_matrix(h, sigma)
    gx = gaussian_reflect_matrix(w, sigma)

    mat_args = []
    mat_specs = []
    for m, (rh, rw) in zip(maps, geoms):
        hl, wl = m.shape[1], m.shape[2]
        wy = resize_chain_matrix(hl, rh, h)               # (H, Hl)
        wx = resize_chain_matrix(wl, rw, w)               # (W, Wl)
        for arr in (wy, wx.T.copy(), gy @ wy, (gx @ wx).T.copy()):
            arr = np.ascontiguousarray(arr, np.float32)
            mat_args.append(jnp.asarray(arr))
            mat_specs.append(
                pl.BlockSpec(arr.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
            )

    map_specs = [
        pl.BlockSpec((None, m.shape[1], m.shape[2]), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM)
        for m in maps
    ]

    kernel = functools.partial(_kernel, n_scales, thre1)
    out = pl.pallas_call(
        kernel,
        grid=(c,),
        in_specs=map_specs + mat_specs,
        out_specs=pl.BlockSpec((None, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, h, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((h, w), jnp.float32),    # averaged map
            pltpu.VMEM((h, w), jnp.float32),    # blurred map
        ],
        interpret=interpret,
    )(*[m.astype(jnp.float32) for m in maps], *mat_args)
    return out.reshape(c, h * w)
