"""Fused GT rasterisation kernel (Pallas TPU): putGaussianMaps + putVecMaps.

The jnp GT path (tpupose.gt.rasterize) materialises (P, 18, L, L) and
(P, 19, L, L) intermediates in HBM before reducing over persons. This
kernel rasterises one sample per grid program entirely in VMEM: the
per-person gaussian and PAF-band partials never leave the chip core,
and only the final (19 + 38)-channel labels are written back — the
"batched on-device preprocessing" of BASELINE.json at full fusion.

Semantics identical to the jnp path (and the NumPy twin): exp cutoff at
ln(100), max-combine over persons, background complement, paf_thre band
with count-averaging, v=2 rows absent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpupose import topology

_EXP_CUTOFF = 4.6052


def _gt_kernel(
    label_size: int,
    stride: int,
    sigma: float,
    paf_thre: float,
    joints_ref,   # (P, 18, 3) f32 in VMEM
    heat_ref,     # (19, L, L) f32 out
    paf_ref,      # (38, L, L) f32 out
):
    l = label_size
    s = float(stride)
    jx = joints_ref[:, :, 0]                       # (P, 18)
    jy = joints_ref[:, :, 1]
    present = joints_ref[:, :, 2] < 2.0

    col = jax.lax.broadcasted_iota(jnp.float32, (l, l), 1)
    row = jax.lax.broadcasted_iota(jnp.float32, (l, l), 0)
    gx = col * s + s / 2.0 - 0.5                   # image-space grid
    gy = row * s + s / 2.0 - 0.5

    # --- heatmaps: per part, max over persons ------------------------------
    denom = 2.0 * sigma * sigma
    fg_max = jnp.zeros((l, l), jnp.float32)
    for part in range(topology.NUM_PARTS):
        x = jx[:, part][:, None, None]             # (P, 1, 1)
        y = jy[:, part][:, None, None]
        ok = present[:, part][:, None, None]
        d2 = (gx[None] - x) ** 2 + (gy[None] - y) ** 2
        expo = d2 / denom
        val = jnp.where((expo <= _EXP_CUTOFF) & ok, jnp.exp(-expo), 0.0)
        channel = jnp.clip(val.max(axis=0), 0.0, 1.0)
        heat_ref[part, :, :] = channel
        fg_max = jnp.maximum(fg_max, channel)
    heat_ref[topology.NUM_PARTS, :, :] = 1.0 - fg_max

    # --- PAFs: per limb, count-averaged band -------------------------------
    colg = col                                      # label-grid coords
    rowg = row
    thre = paf_thre / s
    for k, (pa, pb) in enumerate(topology.LIMBS):
        ax = (jx[:, pa] + 0.5) / s - 0.5            # (P,)
        ay = (jy[:, pa] + 0.5) / s - 0.5
        bx = (jx[:, pb] + 0.5) / s - 0.5
        by = (jy[:, pb] + 0.5) / s - 0.5
        ok = present[:, pa] & present[:, pb]

        dx = bx - ax
        dy = by - ay
        norm = jnp.sqrt(dx * dx + dy * dy)
        okn = ok & (norm >= 1e-8)
        ns = jnp.maximum(norm, 1e-8)
        ux = (dx / ns)[:, None, None]
        uy = (dy / ns)[:, None, None]

        px = colg[None] - ax[:, None, None]         # (P, L, L)
        py = rowg[None] - ay[:, None, None]
        along = px * ux + py * uy
        perp = jnp.abs(px * uy - py * ux)
        band = (
            (perp <= thre)
            & (along >= 0.0)
            & (along <= norm[:, None, None])
            & okn[:, None, None]
        ).astype(jnp.float32)

        cnt = band.sum(axis=0)
        inv = 1.0 / jnp.maximum(cnt, 1.0)
        paf_ref[2 * k, :, :] = (band * ux).sum(axis=0) * inv
        paf_ref[2 * k + 1, :, :] = (band * uy).sum(axis=0) * inv


@functools.partial(
    jax.jit,
    static_argnames=("label_size", "stride", "sigma", "paf_thre", "interpret"),
)
def create_labels_pallas(
    joints: jnp.ndarray,          # (N, P, 18, 3)
    mask: jnp.ndarray,            # (N, L, L)
    label_size: int = 46,
    stride: int = 8,
    sigma: float = 7.0,
    paf_thre: float = 8.0,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in for gt.rasterize.create_labels backed by the fused kernel."""
    n, p = joints.shape[0], joints.shape[1]
    l = label_size
    kernel = functools.partial(_gt_kernel, l, stride, sigma, paf_thre)

    heat, paf = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((None, p, topology.NUM_PARTS, 3), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, topology.NUM_HEAT_CHANNELS, l, l),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, topology.NUM_PAF_CHANNELS, l, l),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, topology.NUM_HEAT_CHANNELS, l, l), jnp.float32),
            jax.ShapeDtypeStruct((n, topology.NUM_PAF_CHANNELS, l, l), jnp.float32),
        ),
        interpret=interpret,
    )(joints.astype(jnp.float32))

    heat = jnp.moveaxis(heat, 1, -1) * mask[..., None]
    paf = jnp.moveaxis(paf, 1, -1) * mask[..., None]
    return paf, heat
