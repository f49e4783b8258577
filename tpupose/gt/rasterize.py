"""Batched on-device GT rasterisation: putGaussianMaps / putVecMaps.

TPU-native rebuild of the reference's ``py_rmpe_heatmapper.py``
(SURVEY.md C12). The reference loops per-person/per-part in Python on
the CPU — the historical training bottleneck its ZeroMQ server existed
to hide. Here the whole batch rasterises on device in one fused XLA
program (BASELINE.json: "batched on-device preprocessing ... without a
CPU bottleneck"):

  * heatmaps: exp(-d^2 / 2 sigma^2) per (person, part) on the stride-8
    grid with the reference's exp(-4.6052) cutoff, max-combined over
    persons, clipped to 1, background = 1 - max(parts);
  * PAFs: per-limb unit vectors painted in a paf_thre-wide band along
    the bone, count-averaged where persons overlap;
  * the miss-mask multiplies into all 57 channels.

Joints are (P, 18, 3) = (x, y, v) in input-image pixels; v < 2 means
present (reference visibility encoding). Absent persons are padding
rows with v = 2.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tpupose import topology
from tpupose.config import AugmentConfig, ModelConfig

_EXP_CUTOFF = 4.6052  # reference: skip where d^2/(2 sigma^2) > ln(100)


def _label_grid(label_size: int, stride: int):
    xs = jnp.arange(label_size, dtype=jnp.float32) * stride + stride / 2.0 - 0.5
    gx = jnp.broadcast_to(xs[None, :], (label_size, label_size))
    gy = jnp.broadcast_to(xs[:, None], (label_size, label_size))
    return gx, gy


def put_gaussian_maps(
    joints: jnp.ndarray, label_size: int, stride: int, sigma: float
) -> jnp.ndarray:
    """(P, 18, 3) -> (label, label, 19) heatmaps."""
    gx, gy = _label_grid(label_size, stride)
    x = joints[:, :, 0][:, :, None, None]              # (P, 18, 1, 1)
    y = joints[:, :, 1][:, :, None, None]
    present = (joints[:, :, 2] < 2.0)[:, :, None, None]

    d2 = (gx - x) ** 2 + (gy - y) ** 2                 # (P, 18, L, L)
    expo = d2 / (2.0 * sigma * sigma)
    val = jnp.where((expo <= _EXP_CUTOFF) & present, jnp.exp(-expo), 0.0)
    parts = val.max(axis=0)                            # (18, L, L)
    parts = jnp.clip(parts, 0.0, 1.0)
    background = 1.0 - parts.max(axis=0)               # (L, L)
    heat = jnp.concatenate([parts, background[None]], axis=0)
    return jnp.moveaxis(heat, 0, -1)                   # (L, L, 19)


def put_vector_maps(
    joints: jnp.ndarray, label_size: int, stride: int, paf_thre: float
) -> jnp.ndarray:
    """(P, 18, 3) -> (label, label, 38) PAFs."""
    limbs = jnp.asarray(topology.LIMBS)                # (19, 2)
    ja = joints[:, limbs[:, 0]]                        # (P, 19, 3)
    jb = joints[:, limbs[:, 1]]

    s = float(stride)
    ax = (ja[..., 0] + 0.5) / s - 0.5                  # label-grid coords
    ay = (ja[..., 1] + 0.5) / s - 0.5
    bx = (jb[..., 0] + 0.5) / s - 0.5
    by = (jb[..., 1] + 0.5) / s - 0.5
    present = (ja[..., 2] < 2.0) & (jb[..., 2] < 2.0)  # (P, 19)

    dx = bx - ax
    dy = by - ay
    norm = jnp.sqrt(dx * dx + dy * dy)
    ok = present & (norm >= 1e-8)
    norm_safe = jnp.maximum(norm, 1e-8)
    ux = dx / norm_safe                                # (P, 19)
    uy = dy / norm_safe

    idx = jnp.arange(label_size, dtype=jnp.float32)
    gx = jnp.broadcast_to(idx[None, :], (label_size, label_size))
    gy = jnp.broadcast_to(idx[:, None], (label_size, label_size))

    px = gx[None, None] - ax[:, :, None, None]         # (P, 19, L, L)
    py = gy[None, None] - ay[:, :, None, None]
    along = px * ux[:, :, None, None] + py * uy[:, :, None, None]
    perp = jnp.abs(px * uy[:, :, None, None] - py * ux[:, :, None, None])
    band = (
        (perp <= paf_thre / s)
        & (along >= 0.0)
        & (along <= norm[:, :, None, None])
        & ok[:, :, None, None]
    )

    bandf = band.astype(jnp.float32)
    vec_x = (bandf * ux[:, :, None, None]).sum(axis=0)  # (19, L, L)
    vec_y = (bandf * uy[:, :, None, None]).sum(axis=0)
    count = bandf.sum(axis=0)
    denom = jnp.maximum(count, 1.0)
    vec_x = vec_x / denom
    vec_y = vec_y / denom

    paf = jnp.stack([vec_x, vec_y], axis=1)            # (19, 2, L, L)
    paf = paf.reshape(2 * topology.NUM_LIMBS, label_size, label_size)
    return jnp.moveaxis(paf, 0, -1)                    # (L, L, 38)


@partial(jax.jit, static_argnames=("label_size", "stride", "sigma", "paf_thre"))
def create_labels(
    joints: jnp.ndarray,          # (N, P, 18, 3)
    mask: jnp.ndarray,            # (N, L, L) loss mask in [0, 1]
    label_size: int = 46,
    stride: int = 8,
    sigma: float = 7.0,
    paf_thre: float = 8.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched labels: (N, L, L, 38) PAF GT and (N, L, L, 19) heat GT,
    each multiplied by the miss-mask (reference semantics)."""
    heat = jax.vmap(lambda j: put_gaussian_maps(j, label_size, stride, sigma))(joints)
    paf = jax.vmap(lambda j: put_vector_maps(j, label_size, stride, paf_thre))(joints)
    return paf * mask[..., None], heat * mask[..., None]


def labels_for_config(
    joints: jnp.ndarray,
    mask: jnp.ndarray,
    model: ModelConfig,
    aug: AugmentConfig,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    return create_labels(
        joints,
        mask,
        label_size=model.label_size,
        stride=model.stride,
        sigma=aug.sigma,
        paf_thre=aug.paf_thre,
    )
