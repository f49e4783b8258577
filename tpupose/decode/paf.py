"""PAF line-integral limb scoring + greedy bipartite matching (jnp).

TPU-native rebuild of the reference decode's connection stage
(SURVEY.md C7): for each of 19 limbs, every candidate (A, B) peak pair is
scored by sampling the limb's PAF channels at ``mid_num`` points along
the segment, dotted with the unit direction; pairs pass if >=80% of
midpoints exceed ``thre2`` and the distance-priored mean score is
positive; accepted greedily best-first with endpoint exclusivity.

All limbs are scored in one vmapped, batched gather (the reference's
triple python loop), and the order-sensitive greedy accept is a masked
``lax.scan`` over score-sorted candidates — sequential but tiny.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

from tpupose import ops as _ops
from tpupose import topology
from tpupose.decode.scalespace import ScaleSpace, sample_avg


def _paf_sampler() -> str:
    """How midpoint values are read out of the PAF map.

    ``gather`` — the literal ``paf[iy, ix]`` advanced-index. XLA lowers
    it to serialized scalar gathers on TPU: ~36 ms/batch-8 at K=32 and
    O(K^2) beyond (measured round 2) — the decode's dominant cost.

    ``onehot`` — the TPU-native formulation: point sampling is a
    one-hot row-selection matmul on the MXU (exact: each output sums one
    1.0*value product at HIGHEST precision), so the whole K x K x M
    integral rides the systolic array instead of the gather unit. Default
    on every non-CPU backend; CPU keeps the gather (fast there, and the
    twin-parity suites run on CPU).

    NOTE: read at TRACE time and baked into jit-compiled programs (the
    ``decode_maps`` caches, ``PoseEstimator._fns``). Set the env var
    before the first decode call of the process; toggling later has no
    effect on already-compiled programs.
    """
    s = os.environ.get("TPUPOSE_PAF_SAMPLER")
    if s in ("gather", "onehot"):
        return s
    return "gather" if jax.default_backend() == "cpu" else "onehot"


def _sample_points_onehot(paf_xy: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray):
    """Exact ``paf_xy[iy, ix]`` via two one-hot contractions (MXU).

    paf_xy (H, W, 2); iy/ix int32 of any shape S -> (*S, 2). The row
    selection is a (P, H) @ (H, W*2) matmul at HIGHEST precision (the
    single nonzero product is 1.0 * value, so the result is bit-exact);
    the column selection is a masked reduce over W on the VPU.
    """
    h, w = paf_xy.shape[0], paf_xy.shape[1]
    shape = iy.shape
    iyf = iy.reshape(-1)
    ixf = ix.reshape(-1)
    p = iyf.shape[0]
    oh_y = (
        jax.lax.broadcasted_iota(jnp.int32, (p, h), 1) == iyf[:, None]
    ).astype(paf_xy.dtype)
    rows = jax.lax.dot(
        oh_y, paf_xy.reshape(h, w * 2), precision=jax.lax.Precision.HIGHEST
    ).reshape(p, w, 2)
    oh_x = jax.lax.broadcasted_iota(jnp.int32, (p, w), 1) == ixf[:, None]
    out = jnp.where(oh_x[:, :, None], rows, 0.0).sum(axis=1)
    return out.reshape(*shape, 2)


def _limb_pair_scores(
    paf_xy,                   # (H, W, 2) this limb's PAF channels, or a
                              # per-limb ScaleSpace of low-res (Hl, Wl, 2)
    ax, ay, asc, avalid,      # (K,) candidate A table
    bx, by, bsc, bvalid,      # (K,) candidate B table
    mid_num: int,
    thre2: float,
    min_ratio: float,
    height: float,
):
    """Score all K x K pairs of one limb. Returns (score_prior, ok, pair_score)."""
    axf = ax.astype(jnp.float32)
    ayf = ay.astype(jnp.float32)
    bxf = bx.astype(jnp.float32)
    byf = by.astype(jnp.float32)

    dx = bxf[None, :] - axf[:, None]                    # (K, K)
    dy = byf[None, :] - ayf[:, None]
    norm = jnp.sqrt(dx * dx + dy * dy)
    norm_safe = jnp.maximum(norm, 1e-8)
    ux = dx / norm_safe
    uy = dy / norm_safe

    t = jnp.linspace(0.0, 1.0, mid_num)                 # (M,)
    k = axf.shape[0]
    # --- pick the point sampler + whether all K*K*M midpoints fuse into
    # one call. Same rounded/clipped integer sample points in every mode.
    if isinstance(paf_xy, ScaleSpace):
        # Scale-space readout: evaluate the scale-averaged chained
        # bilinear directly on the low-res per-scale maps (linearity —
        # see decode/scalespace.py); values are the f32 evaluation of
        # the same interpolant (~bf16 eps from the bf16-materialised
        # pipeline). At the small tiers all midpoints go through ONE
        # weighted-one-hot matmul per scale (fewer ops, smaller
        # compile); at the K=96 fallback tier that row matrix would be
        # (K^2*M, Hl) ~ 9.6 GB for a batch of 8, so it chunks per
        # midpoint instead.
        out_h, out_w = paf_xy.out_hw
        sampler = partial(sample_avg, paf_xy)
        fuse_all = k * k * mid_num <= 16384
        # Crowd tiers (K >= 96): the chunked HBM readout below costs
        # ~289 ms/batch-8; the fused VMEM kernel evaluates the same
        # interpolant ~10x faster (ops/pallas_sample.py). Trace-time
        # gate, like _paf_sampler.
        scale_space_fused = (not fuse_all) and _ops.use_pallas_sample()
    else:
        scale_space_fused = False
        out_h, out_w = paf_xy.shape[0], paf_xy.shape[1]
        # The full-res one-hot matmul materialises a (K*K, W, 2) f32
        # intermediate per limb (x batch under vmap) — ~7.7 GB at the
        # K=96 tier for a batch of 16, an HBM OOM. Beyond this area
        # budget the (rare, dense-crowd) tier uses the gather sampler;
        # values are bit-identical either way.
        if _paf_sampler() == "onehot" and k * k * out_w <= 1024 * 1024:
            # per-midpoint chunks measured faster than one fused matmul
            # at full-res (4.1 vs 5.1 ms/batch-8 at K=32, round 2)
            sampler = partial(_sample_points_onehot, paf_xy)
            fuse_all = False
        else:
            sampler = lambda iy, ix: paf_xy[iy, ix]     # noqa: E731
            fuse_all = True

    def sample_clipped(my, mx):
        ix = jnp.clip(jnp.round(mx).astype(jnp.int32), 0, out_w - 1)
        iy = jnp.clip(jnp.round(my).astype(jnp.int32), 0, out_h - 1)
        return sampler(iy, ix)

    if fuse_all:
        sampled = sample_clipped(
            ayf[:, None, None] + dy[:, :, None] * t,    # (K, K, M)
            axf[:, None, None] + dx[:, :, None] * t,
        )                                               # (K, K, M, 2)
    elif scale_space_fused:
        from tpupose.ops.pallas_sample import fused_sample_avg

        my = ayf[:, None, None] + dy[:, :, None] * t
        mx = axf[:, None, None] + dx[:, :, None] * t
        iy = jnp.clip(jnp.round(my).astype(jnp.int32), 0, out_h - 1)
        ix = jnp.clip(jnp.round(mx).astype(jnp.int32), 0, out_w - 1)
        sampled = fused_sample_avg(paf_xy, iy, ix)      # (K, K, M, 2)
    else:
        sampled = jnp.stack(
            [
                sample_clipped(ayf[:, None] + dy * t[m], axf[:, None] + dx * t[m])
                for m in range(mid_num)
            ],
            axis=-2,
        )                                               # (K, K, M, 2)
    score_mid = sampled[..., 0] * ux[:, :, None] + sampled[..., 1] * uy[:, :, None]

    mean = score_mid.mean(axis=-1)
    prior = mean + jnp.minimum(0.5 * height / norm_safe - 1.0, 0.0)
    crit1 = (score_mid > thre2).sum(axis=-1) > min_ratio * mid_num
    ok = (
        crit1
        & (prior > 0)
        & avalid[:, None]
        & bvalid[None, :]
        & (norm > 1e-8)
    )
    pair_score = prior + asc[:, None] + bsc[None, :]
    return prior, ok, pair_score


def _greedy_accept(prior, ok, n_a, n_b, max_conn: int, scan_cap: int):
    """Order-sensitive greedy accept over score-sorted candidate pairs.

    Returns fixed-size (max_conn,) tables: a_slot, b_slot, score, valid —
    in acceptance (= score-descending) order.
    """
    k = prior.shape[0]
    flat = jnp.where(ok, prior, -jnp.inf).reshape(-1)
    cap = min(scan_cap, flat.shape[0])
    top_scores, top_idx = jax.lax.top_k(flat, cap)
    ai = top_idx // k
    bi = top_idx % k

    limit = jnp.minimum(n_a, n_b)

    def step(carry, inp):
        used_a, used_b, out_a, out_b, out_s, out_v, n = carry
        s, i, j = inp
        accept = (
            jnp.isfinite(s)
            & jnp.logical_not(used_a[i])
            & jnp.logical_not(used_b[j])
            & (n < limit)
        )
        used_a = used_a.at[i].set(used_a[i] | accept)
        used_b = used_b.at[j].set(used_b[j] | accept)
        out_a = jnp.where(accept, out_a.at[n].set(i), out_a)
        out_b = jnp.where(accept, out_b.at[n].set(j), out_b)
        out_s = jnp.where(accept, out_s.at[n].set(s), out_s)
        out_v = jnp.where(accept, out_v.at[n].set(True), out_v)
        n = n + accept.astype(jnp.int32)
        return (used_a, used_b, out_a, out_b, out_s, out_v, n), None

    init = (
        jnp.zeros((k,), bool),
        jnp.zeros((k,), bool),
        jnp.zeros((max_conn,), jnp.int32),
        jnp.zeros((max_conn,), jnp.int32),
        jnp.zeros((max_conn,), jnp.float32),
        jnp.zeros((max_conn,), bool),
        jnp.int32(0),
    )
    (_, _, out_a, out_b, out_s, out_v, _), _ = jax.lax.scan(
        step, init, (top_scores, ai, bi)
    )
    return out_a, out_b, out_s, out_v


def _limb_channels(paf: jnp.ndarray, paf_chans) -> jnp.ndarray:
    """(H, W, 38) -> (19, H, W, 2) per-limb channel pairs."""
    stacked = jnp.stack(
        [paf[:, :, paf_chans[:, 0]], paf[:, :, paf_chans[:, 1]]], axis=-1
    )                                         # (H, W, 19, 2)
    return jnp.moveaxis(stacked, 2, 0)        # (19, H, W, 2)


def pair_scores(
    paf,                       # (H, W, 38), or a ScaleSpace of low-res maps
    peaks: dict[str, jnp.ndarray],
    mid_num: int = 10,
    thre2: float = 0.05,
    min_ratio: float = 0.8,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Phase 1 (the point readout): all-limb pair tables.

    Returns (prior (19, K, K), ok (19, K, K), n_a (19,), n_b (19,)).
    """
    part_pairs, paf_chans = topology.decode_limb_tables()
    part_pairs = jnp.asarray(part_pairs)
    paf_chans = jnp.asarray(paf_chans)
    scale_space = isinstance(paf, ScaleSpace)
    h = paf.out_hw[0] if scale_space else paf.shape[0]

    xs_a = peaks["xs"][part_pairs[:, 0]]     # (19, K)
    ys_a = peaks["ys"][part_pairs[:, 0]]
    sc_a = peaks["scores"][part_pairs[:, 0]]
    va_a = peaks["valid"][part_pairs[:, 0]]
    xs_b = peaks["xs"][part_pairs[:, 1]]
    ys_b = peaks["ys"][part_pairs[:, 1]]
    sc_b = peaks["scores"][part_pairs[:, 1]]
    va_b = peaks["valid"][part_pairs[:, 1]]

    if scale_space:
        paf_limb = paf.map_scales(lambda m: _limb_channels(m, paf_chans))
    else:
        paf_limb = _limb_channels(paf, paf_chans)   # (19, H, W, 2)

    def one_limb(paf_xy, ax, ay, asc, av, bx, by, bsc, bv):
        prior, ok, _ = _limb_pair_scores(
            paf_xy, ax, ay, asc, av, bx, by, bsc, bv,
            mid_num, thre2, min_ratio, float(h),
        )
        return prior, ok, av.sum().astype(jnp.int32), bv.sum().astype(jnp.int32)

    return jax.vmap(one_limb)(
        paf_limb, xs_a, ys_a, sc_a, va_a, xs_b, ys_b, sc_b, va_b
    )


def greedy_all(
    prior: jnp.ndarray,        # (19, K, K)
    ok: jnp.ndarray,
    n_a: jnp.ndarray,
    n_b: jnp.ndarray,
    max_conn: int,
    scan_cap: int,
) -> dict[str, jnp.ndarray]:
    """Phase 2: greedy acceptance per limb (sequential scan of the
    top-``scan_cap`` score-sorted candidates)."""
    out_a, out_b, out_s, out_v = jax.vmap(
        lambda p, o, na, nb: _greedy_accept(p, o, na, nb, max_conn, scan_cap)
    )(prior, ok, n_a, n_b)
    return {"a_slot": out_a, "b_slot": out_b, "score": out_s, "valid": out_v}


@partial(jax.jit, static_argnames=("mid_num", "thre2", "min_ratio", "scan_cap"))
def score_limbs(
    paf: jnp.ndarray,          # (H, W, 38)
    peaks: dict[str, jnp.ndarray],
    mid_num: int = 10,
    thre2: float = 0.05,
    min_ratio: float = 0.8,
    scan_cap: int = 512,
) -> dict[str, jnp.ndarray]:
    """All-limb connection tables in decode order.

    Returns dict of (19, K) arrays: a_slot, b_slot (peak slots within the
    endpoint part channels), score, valid — acceptance-ordered per limb.
    """
    k = peaks["xs"].shape[1]
    prior, ok, n_a, n_b = pair_scores(paf, peaks, mid_num, thre2, min_ratio)
    return greedy_all(prior, ok, n_a, n_b, k, scan_cap)
