"""Fused GT rasterisation kernel (Pallas TPU): putGaussianMaps + putVecMaps.

The jnp GT path (tpupose.gt.rasterize) materialises (P, 18, L, L) and
(P, 19, L, L) intermediates in HBM before reducing over persons. This
kernel rasterises with a (sample, person) grid: each program folds one
person's gaussians and PAF bands into the sample's output block, which
stays resident in VMEM across the person loop (the K-loop accumulation
pattern) — per-person partials never reach HBM.

Mosaic constraints honoured: per-person quantities are read as scalars
(no sublane+lane broadcasts), iota is integer, only static slices.

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
    joints_ref,   # (18, 3) this person's joints, VMEM
    mask_ref,     # (L, L) miss-mask, VMEM
    heat_ref,     # (19, L, L) out block, revisited across persons
    paf_ref,      # (38, L, L) out block, revisited across persons
    fg_ref,       # (L, L) scratch: running max over parts/persons
    count_ref,    # (19, L, L) scratch: PAF band counts
):
    l = label_size
    s = float(stride)
    person = pl.program_id(1)
    n_persons = pl.num_programs(1)

    col = jax.lax.broadcasted_iota(jnp.int32, (l, l), 1).astype(jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, (l, l), 0).astype(jnp.float32)
    gx = col * s + s / 2.0 - 0.5                   # image-space grid
    gy = row * s + s / 2.0 - 0.5

    @pl.when(person == 0)
    def _init():
        heat_ref[:, :, :] = jnp.zeros((topology.NUM_HEAT_CHANNELS, l, l), jnp.float32)
        paf_ref[:, :, :] = jnp.zeros((topology.NUM_PAF_CHANNELS, l, l), jnp.float32)
        fg_ref[:, :] = jnp.zeros((l, l), jnp.float32)
        count_ref[:, :, :] = jnp.zeros((topology.NUM_LIMBS, l, l), jnp.float32)

    denom = 2.0 * sigma * sigma
    # --- heatmaps: fold this person's gaussians (max-combine) ---------------
    for part in range(topology.NUM_PARTS):
        x = joints_ref[part, 0]
        y = joints_ref[part, 1]
        ok = (joints_ref[part, 2] < 2.0).astype(jnp.float32)
        d2 = (gx - x) ** 2 + (gy - y) ** 2
        expo = d2 / denom
        val = jnp.where(expo <= _EXP_CUTOFF, jnp.exp(-expo), 0.0) * ok
        channel = jnp.maximum(heat_ref[part, :, :], val)
        heat_ref[part, :, :] = channel
        fg_ref[:, :] = jnp.maximum(fg_ref[:, :], channel)

    # --- PAFs: fold this person's limb bands --------------------------------
    thre = paf_thre / s
    for k, (pa, pb) in enumerate(topology.LIMBS):
        ax = (joints_ref[pa, 0] + 0.5) / s - 0.5
        ay = (joints_ref[pa, 1] + 0.5) / s - 0.5
        bx = (joints_ref[pb, 0] + 0.5) / s - 0.5
        by = (joints_ref[pb, 1] + 0.5) / s - 0.5
        dx = bx - ax
        dy = by - ay
        norm = jnp.sqrt(dx * dx + dy * dy)
        ok = (
            (joints_ref[pa, 2] < 2.0)
            & (joints_ref[pb, 2] < 2.0)
            & (norm >= 1e-8)
        ).astype(jnp.float32)
        ns = jnp.maximum(norm, 1e-8)
        ux = dx / ns
        uy = dy / ns

        px = col - ax
        py = row - ay
        along = px * ux + py * uy
        perp = jnp.abs(px * uy - py * ux)
        band = (
            (perp <= thre).astype(jnp.float32)
            * (along >= 0.0).astype(jnp.float32)
            * (along <= norm).astype(jnp.float32)
            * ok
        )
        paf_ref[2 * k, :, :] = paf_ref[2 * k, :, :] + band * ux
        paf_ref[2 * k + 1, :, :] = paf_ref[2 * k + 1, :, :] + band * uy
        count_ref[k, :, :] = count_ref[k, :, :] + band

    # --- finalise on the last person: count-average PAFs, background,
    # and the miss-mask multiply, all fused in this VMEM residency ------------
    @pl.when(person == n_persons - 1)
    def _finish():
        m = mask_ref[:, :]
        heat_ref[topology.NUM_PARTS, :, :] = (1.0 - fg_ref[:, :]) * m
        for part in range(topology.NUM_PARTS):
            heat_ref[part, :, :] = heat_ref[part, :, :] * m
        for k in range(topology.NUM_LIMBS):
            inv = m / jnp.maximum(count_ref[k, :, :], 1.0)
            paf_ref[2 * k, :, :] = paf_ref[2 * k, :, :] * inv
            paf_ref[2 * k + 1, :, :] = paf_ref[2 * k + 1, :, :] * inv


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
        grid=(n, p),
        in_specs=[
            pl.BlockSpec((None, None, topology.NUM_PARTS, 3),
                         lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, l, l), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, topology.NUM_HEAT_CHANNELS, l, l),
                         lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, topology.NUM_PAF_CHANNELS, l, l),
                         lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, topology.NUM_HEAT_CHANNELS, l, l), jnp.float32),
            jax.ShapeDtypeStruct((n, topology.NUM_PAF_CHANNELS, l, l), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((l, l), jnp.float32),                     # fg max
            pltpu.VMEM((topology.NUM_LIMBS, l, l), jnp.float32),  # counts
        ],
        interpret=interpret,
    )(joints.astype(jnp.float32), mask.astype(jnp.float32))

    return jnp.moveaxis(paf, 1, -1), jnp.moveaxis(heat, 1, -1)
