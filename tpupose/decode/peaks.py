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
    highest-scored; the uncapped reference keeps all. The product path
    (``peak_tables_tiered``, called outside vmap) guards this with a
    runtime overflow cond that falls back to ``topk`` so the strongest
    peaks are never dropped.

    NOTE: read at TRACE time and baked into jit-compiled programs; set
    the env var before the first decode call of the process.
    """
    s = os.environ.get("TPUPOSE_PEAK_SLOTS")
    return s if s in ("scan", "topk") else "scan"


def compact_peaks(
    scores: jnp.ndarray, w: int, max_peaks: int
) -> dict[str, jnp.ndarray]:
    """(C, H*W) masked score maps (-inf off-peak) -> peak tables.

    TPU-native slot filling, two-stage: block-local prefix sums via a
    triangular MXU matmul assign scan-order slots within 512-px blocks
    (no multi-pass HBM cumsum over N), a narrow local one-hot moves each
    block's peaks into per-block mini-tables, and a second (tiny)
    compaction over the B*K1 candidates builds the final tables. Scan
    (row-major) order is preserved exactly: blocks are contiguous pixel
    ranges. A runtime ``lax.cond`` falls back to the single-stage path
    when any block holds more than K1 peaks (a >=8-peaks-per-1.4-rows
    density no real scene reaches) — call outside vmap to keep the cond
    a real branch; under vmap both paths execute.
    """
    c, n = scores.shape
    block = 512
    local_cap = min(8, max_peaks)
    padded = -(-n // block) * block
    # two-stage pays off once N spans several blocks; the linear index
    # ranges over the BLOCK-PADDED size and must stay f32-exact
    # (< 2^24) — giant (spatial-tiling) maps use the single-stage path,
    # which slots row/col indices separately
    if 4 * block < n and padded < (1 << 24):
        sc_p = jnp.pad(scores, ((0, 0), (0, padded - n)),
                       constant_values=-jnp.inf)
        v = jnp.isfinite(sc_p).reshape(c, -1, block)            # (C, B, L)
        counts_b = v.sum(axis=-1).astype(jnp.int32)             # (C, B)
        return jax.lax.cond(
            (counts_b <= local_cap).all(),
            lambda s: _compact_two_stage(
                s, v, counts_b, w, n, max_peaks, block, local_cap
            ),
            lambda s: _compact_single(s, w, max_peaks),
            scores,
        )
    return _compact_single(scores, w, max_peaks)


def _compact_two_stage(
    scores, v, counts_b, w: int, n: int, max_peaks: int,
    block: int, local_cap: int,
) -> dict[str, jnp.ndarray]:
    c = scores.shape[0]
    b = v.shape[1]
    l = block
    # block-local inclusive prefix sums as ONE triangular matmul (exact:
    # counts <= 512 in f32), instead of an HBM-multipass cumsum over N
    tri = jnp.asarray(
        np.tril(np.ones((l, l), np.float32)).T
    )                                                           # [j, i] = j <= i
    prefix = jax.lax.dot_general(
        v.astype(jnp.float32).reshape(c * b, l), tri,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(c, b, l).astype(jnp.int32)
    local_slot = prefix - 1                                     # (C, B, L)
    base = jnp.cumsum(counts_b, axis=-1) - counts_b             # (C, B) excl
    count = counts_b.sum(axis=-1)                               # (C,)

    # stage 1: per-block mini-tables of [linear index, score]
    oh1 = (
        (local_slot[..., None]
         == jax.lax.broadcasted_iota(jnp.int32, (c, b, l, local_cap), 3))
        & v[..., None]
    ).astype(jnp.float32)                                       # (C, B, L, K1)
    lin = jax.lax.broadcasted_iota(jnp.float32, (c, b, l), 2) + (
        jax.lax.broadcasted_iota(jnp.float32, (c, b, l), 1) * l
    )
    sc_p = jnp.where(v, jnp.pad(
        scores, ((0, 0), (0, b * l - n)), constant_values=0.0
    ).reshape(c, b, l), 0.0)
    pos1 = (oh1 * lin[..., None]).sum(axis=2)                   # (C, B, K1)
    sc1 = (oh1 * sc_p[..., None]).sum(axis=2)
    valid1 = (
        jax.lax.broadcasted_iota(jnp.int32, (c, b, local_cap), 2)
        < counts_b[..., None]
    )

    # stage 2: compact the (C, B*K1) candidates at their global slots
    gslot = base[..., None] + jax.lax.broadcasted_iota(
        jnp.int32, (c, b, local_cap), 2
    )
    m = b * local_cap
    oh2 = (
        (gslot.reshape(c, m)[..., None]
         == jax.lax.broadcasted_iota(jnp.int32, (c, m, max_peaks), 2))
        & valid1.reshape(c, m)[..., None]
    ).astype(jnp.float32)                                       # (C, M, K)
    dot2 = lambda rhs: jax.lax.dot_general(  # noqa: E731
        oh2, rhs,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,
    )
    pos = dot2(pos1.reshape(c, m)).astype(jnp.int32)            # (C, K)
    sc = dot2(sc1.reshape(c, m))
    valid_out = (
        jax.lax.broadcasted_iota(jnp.int32, (c, max_peaks), 1) < count[:, None]
    )
    return {
        "xs": pos % w,
        "ys": pos // w,
        "scores": jnp.where(valid_out, sc, 0.0).astype(jnp.float32),
        "valid": valid_out,
    }


def _compact_single(
    scores: jnp.ndarray, w: int, max_peaks: int
) -> dict[str, jnp.ndarray]:
    """Single-stage compaction: global cumsum + (C, N, K) one-hot dots.
    The fallback for tiny maps and for block overflow."""
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

    def topk_tables(f):
        """Capacity-overflow guard: a channel holds more peaks than
        max_peaks can seat (never seen on real scenes). Scan-order
        compaction would keep the FIRST K in scan order — i.e. drop by
        position, possibly losing the strongest peaks — while the
        uncapped reference keeps all. Fall back to score-descending
        top_k so only the WEAKEST overflow peaks are dropped. This cond
        sits outside any vmap (real branch; the top_k's ~30 ms/batch-8
        cost is only ever paid on overflow)."""
        top_scores, top_idx = jax.lax.top_k(f, max_peaks)
        valid = jnp.isfinite(top_scores)
        return {
            "xs": (top_idx % w).astype(jnp.int32),
            "ys": (top_idx // w).astype(jnp.int32),
            "scores": jnp.where(valid, top_scores, 0.0).astype(jnp.float32),
            "valid": valid,
        }

    def full_cap(f):
        return jax.lax.cond(
            max_count <= max_peaks,
            lambda x: peak_tables(x, w, max_peaks),
            topk_tables,
            f,
        )

    at_cap = lambda cap: lambda f: pad_to_full(  # noqa: E731
        compact_peaks(f, w, cap)
    )
    return cond_chain(caps, max_count, at_cap, full_cap, flat)


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
