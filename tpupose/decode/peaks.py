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

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tpupose import topology


def _slot_mode() -> str:
    """How masked score maps become fixed-capacity peak tables.

    ``scan`` (default) — cumsum + one-hot matmul compaction in row-major
    scan order: the reference's ``np.nonzero`` peak ordering, and ~10x
    cheaper on TPU than the full-sort ``top_k`` (which is k-independent
    there, ~30 ms/batch-8 — measured round 2). Scan order also makes
    greedy tie-breaks match the reference's stable candidate sort.

    ``topk`` — the round-1 score-descending ``lax.top_k`` path.

    Both fill the leading ``count`` slots with the complete peak set
    whenever it fits, which is all the adaptive two-tier decode relies
    on. On capacity overflow (never seen on real scenes: K=96 vs <=30
    peaks) ``scan`` keeps the first K in scan order, ``topk`` the K
    highest-scored; the uncapped reference keeps all.
    """
    s = os.environ.get("TPUPOSE_PEAK_SLOTS")
    return s if s in ("scan", "topk") else "scan"


def compact_peaks(
    scores: jnp.ndarray, w: int, max_peaks: int
) -> dict[str, jnp.ndarray]:
    """(C, H*W) masked score maps (-inf off-peak) -> peak tables.

    TPU-native slot filling: a prefix sum assigns each peak its scan-
    order slot, and a one-hot (C, K, N) x (C, N, 3) matmul (HIGHEST
    precision: each output is one 1.0*value product, so coordinates and
    scores are exact) moves x/y/score into the fixed-capacity tables —
    no sort, no scatter, no gather.
    """
    c, n = scores.shape
    valid = jnp.isfinite(scores)
    slot = jnp.cumsum(valid, axis=-1, dtype=jnp.int32) - 1      # (C, N)
    count = valid.sum(axis=-1).astype(jnp.int32)                # (C,)
    oh = (
        (slot[:, :, None] == jax.lax.broadcasted_iota(jnp.int32, (c, n, max_peaks), 2))
        & valid[:, :, None]
    ).astype(jnp.float32)                                       # (C, N, K)
    # Batched (N x K) x (N,) contractions whose right operands XLA
    # generates in-fusion (iotas and the masked map) — slotting pixel
    # indices instead of coordinate columns avoids materialising a
    # (C, N, 3) values tensor; xs/ys are derived on the tiny (C, K)
    # table. Indices ride f32 through the MXU, so they must stay below
    # 2^24 to be exact: the linear index qualifies for every normal map
    # (368^2 = 135k), and beyond that the row/column indices are slotted
    # separately (each exact for any axis < 2^24).
    dot = lambda rhs: jax.lax.dot_general(  # noqa: E731
        oh,
        rhs,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,
    )                                                           # (C, K)
    sc = dot(jnp.where(valid, scores, 0.0))
    if n < (1 << 24):
        pos_i = dot(jax.lax.broadcasted_iota(jnp.float32, (c, n), 1)).astype(
            jnp.int32
        )
        xs = pos_i % w
        ys = pos_i // w
    else:
        lin = jax.lax.broadcasted_iota(jnp.int32, (c, n), 1)
        xs = dot((lin % w).astype(jnp.float32)).astype(jnp.int32)
        ys = dot((lin // w).astype(jnp.float32)).astype(jnp.int32)
    valid_out = (
        jax.lax.broadcasted_iota(jnp.int32, (c, max_peaks), 1) < count[:, None]
    )
    return {
        "xs": xs,
        "ys": ys,
        "scores": jnp.where(valid_out, sc, 0.0).astype(jnp.float32),
        "valid": valid_out,
    }


def peak_tables(scores: jnp.ndarray, w: int, max_peaks: int) -> dict[str, jnp.ndarray]:
    """Masked (C, H*W) score maps -> fixed-capacity tables (see _slot_mode)."""
    if _slot_mode() == "scan":
        return compact_peaks(scores, w, max_peaks)
    top_scores, top_idx = jax.lax.top_k(scores, max_peaks)
    valid = jnp.isfinite(top_scores)
    return {
        "xs": (top_idx % w).astype(jnp.int32),
        "ys": (top_idx // w).astype(jnp.int32),
        "scores": jnp.where(valid, top_scores, 0.0).astype(jnp.float32),
        "valid": valid,
    }



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
    map values), valid (18, K) bool. Slots are in row-major scan order
    (the reference's ``np.nonzero`` ordering); see ``_slot_mode``.
    """
    parts = heatmap[:, :, : topology.NUM_PARTS]
    smooth = gaussian_blur(parts, sigma)
    return nms_tables(parts, smooth, max_peaks, thre1)


def masked_scores(
    parts: jnp.ndarray,     # (H, W, 18) unsmoothed averaged map (scores)
    smooth: jnp.ndarray,    # (H, W, 18) sigma-blurred map (NMS field)
    thre1: float,
) -> jnp.ndarray:
    """4-neighbour local-max NMS + threshold -> (18, H*W) masked scores
    (-inf off-peak)."""
    h, w = parts.shape[0], parts.shape[1]
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
    return scores.reshape(h * w, -1).T                      # (18, H*W)


def nms_tables(
    parts: jnp.ndarray,
    smooth: jnp.ndarray,
    max_peaks: int,
    thre1: float,
) -> dict[str, jnp.ndarray]:
    """4-neighbour local-max NMS + threshold -> fixed-capacity tables."""
    w = parts.shape[1]
    return peak_tables(masked_scores(parts, smooth, thre1), w, max_peaks)


def peak_tables_tiered(
    flat: jnp.ndarray,      # (C, N) masked scores, any leading channel dim
    w: int,
    max_peaks: int,
    tiers: tuple[int, ...] = (16,),
) -> dict[str, jnp.ndarray]:
    """Adaptive-capacity slot compaction (scan mode).

    The one-hot compaction matmul streams an (N, K) contraction per
    channel; K=96 prices a worst case real scenes never reach (<= ~30
    peaks). A runtime ``lax.cond`` compacts at the smallest tier whose
    capacity holds EVERY channel's count and zero-pads the tables to
    ``max_peaks`` — bitwise identical (slots beyond the count are zero /
    invalid in both paths). Call this OUTSIDE any vmap (under vmap the
    cond becomes a select and every tier executes): for batched maps
    flatten (B, C, N) -> (B*C, N) first.
    """
    caps = tuple(sorted({t for t in tiers if 0 < t < max_peaks}))
    if not caps or _slot_mode() != "scan":
        return peak_tables(flat, w, max_peaks)

    def pad_to_full(tables):
        k = tables["xs"].shape[-1]
        if k == max_peaks:
            return tables
        pad = [(0, 0)] * (tables["xs"].ndim - 1) + [(0, max_peaks - k)]
        return {key: jnp.pad(v, pad) for key, v in tables.items()}

    from tpupose.decode.tiers import cond_chain

    max_count = jnp.isfinite(flat).sum(axis=-1).max()
    at_cap = lambda cap: lambda f: pad_to_full(  # noqa: E731
        compact_peaks(f, w, cap)
    )
    return cond_chain(
        caps, max_count, at_cap, lambda f: peak_tables(f, w, max_peaks), flat
    )


def find_peaks_scalespace(
    space,                  # ScaleSpace of per-scale low-res heat outputs
    max_peaks: int = 96,
    sigma: float = 3.0,
    thre1: float = 0.1,
) -> dict[str, jnp.ndarray]:
    """Peak tables straight from the per-scale low-res heat maps.

    The averaged full-res map and its blur are computed as per-scale
    constant-weight-matrix matmuls (``scalespace.pyramid_heat_maps``) —
    the four per-scale upsamples and the 25-tap blur conv are never
    materialised. Same NMS/threshold/compaction tail as ``find_peaks``;
    values match the materialised pipeline to f32 matmul rounding.
    """
    from tpupose.decode.scalespace import pyramid_heat_maps

    parts_space = space.map_scales(lambda m: m[..., : topology.NUM_PARTS])
    parts, smooth = pyramid_heat_maps(parts_space, sigma)
    return nms_tables(parts, smooth, max_peaks, thre1)
