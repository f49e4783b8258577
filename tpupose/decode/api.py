"""Decode composition: averaged maps -> people (device) -> JSON (host).

Composes peaks -> PAF scoring -> assembly into one jitted device function
with fixed-capacity outputs, plus host-side conversion to the reference's
keypoint-JSON contract (SURVEY.md C5-C8; BASELINE.json config 3).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tpupose import topology
from tpupose.config import InferenceConfig
from tpupose.decode import assemble as _assemble
from tpupose.decode import paf as _paf
from tpupose.decode import peaks as _peaks
from tpupose.decode.tiers import cond_chain


def _masked_peak_scores(heatmap, cfg: InferenceConfig) -> jnp.ndarray:
    """Per-image masked peak-score map, (C, H*W) with -inf off-peak.

    Table building (slot compaction) happens OUTSIDE any vmap via
    ``peaks.peak_tables_tiered`` so its adaptive-capacity cond stays a
    real branch — this helper is the vmap-safe part."""
    from tpupose.decode.scalespace import ScaleSpace, pyramid_heat_maps
    from tpupose.ops import use_pallas

    if isinstance(heatmap, ScaleSpace):
        # per-scale low-res inputs: the averaged map + its blur are
        # weight-matrix matmuls (avg/blur folded into constant resize
        # matrices). On TPU the matmuls + NMS run in one fused Pallas
        # residency per channel (ops/pallas_pyramid_peaks.py).
        parts_space = heatmap.map_scales(
            lambda m: m[..., : topology.NUM_PARTS]
        )
        if use_pallas():
            from tpupose.ops.pallas_pyramid_peaks import (
                pyramid_peak_scores_pallas,
            )

            maps = tuple(jnp.moveaxis(m, -1, 0) for m in parts_space.maps)
            return pyramid_peak_scores_pallas(
                maps, parts_space.geoms, parts_space.out_hw,
                sigma=cfg.peak_sigma, thre1=cfg.thre1,
            )
        parts, smooth = pyramid_heat_maps(parts_space, cfg.peak_sigma)
        return _peaks.masked_scores(parts, smooth, cfg.thre1)
    parts = heatmap[:, :, : topology.NUM_PARTS]
    if use_pallas():
        from tpupose.ops.pallas_peaks import peak_scores_pallas

        scores = peak_scores_pallas(
            parts, sigma=cfg.peak_sigma, thre1=cfg.thre1
        )
        return scores.reshape(scores.shape[0], -1)
    smooth = _peaks.gaussian_blur(parts, cfg.peak_sigma)
    return _peaks.masked_scores(parts, smooth, cfg.thre1)


def _heat_width(heatmap) -> int:
    """Image width: (H, W, C) / (B, H, W, C) array or ScaleSpace."""
    from tpupose.decode.scalespace import ScaleSpace

    if isinstance(heatmap, ScaleSpace):
        return heatmap.out_hw[1]
    return heatmap.shape[2] if heatmap.ndim == 4 else heatmap.shape[1]


def _find_peaks(heatmap, cfg: InferenceConfig) -> dict[str, jnp.ndarray]:
    flat = _masked_peak_scores(heatmap, cfg)
    return _peaks.peak_tables_tiered(
        flat, _heat_width(heatmap), cfg.max_peaks, cfg.peak_compact_tiers
    )


# Greedy-scan fast tier: when every limb has at most this many candidate
# pairs passing the PAF criteria, a scan of this length enumerates ALL of
# them — provably identical to the full-length scan (extra slots hold
# -inf and are never accepted). The 512-step scan was ~39 of the 75 ms
# PAF stage at K=32 (measured round 2).
_GREEDY_FAST_CAP = 128


def _post_peaks(
    paf,
    peaks: dict[str, jnp.ndarray],
    cfg: InferenceConfig,
    batched: bool,
) -> dict[str, jnp.ndarray]:
    """PAF pair scoring + greedy assembly at the capacity of ``peaks``.

    The sequential greedy scan's length adapts at runtime (lax.cond,
    outside any vmap) to the number of passing candidate pairs. On TPU
    the two sequential stages (greedy accept + assembly) run in the
    fused Pallas association kernel (ops/pallas_assoc.py); the lax.scan
    formulation is the CPU/debug fallback and the parity oracle.
    """
    from tpupose.ops import use_pallas_assoc

    k = peaks["xs"].shape[-1]
    max_conn = min(cfg.max_connections, k)
    cap_full = min(512, k * k)
    cap_fast = min(_GREEDY_FAST_CAP, cap_full)
    scan_people = max(cfg.max_people, cfg.scan_people_capacity)

    def p1(paf, pk):
        return _paf.pair_scores(
            paf, pk, mid_num=cfg.mid_num, thre2=cfg.thre2,
            min_ratio=cfg.connect_min_ratio,
        )

    prior, ok, n_a, n_b = (
        jax.vmap(p1)(paf, peaks) if batched else p1(paf, peaks)
    )

    def run_pallas(cap):
        from tpupose.ops.pallas_assoc import assoc_pallas

        pr, okb, nab, nbb = (
            (prior, ok, n_a, n_b) if batched
            else (prior[None], ok[None], n_a[None], n_b[None])
        )
        pk_scores = peaks["scores"] if batched else peaks["scores"][None]
        b = pr.shape[0]
        part_pairs, _ = topology.decode_limb_tables()
        pp = jnp.asarray(part_pairs)
        flat = jnp.where(okb, pr, -jnp.inf).reshape(b, topology.NUM_LIMBS, k * k)
        ts, idx = jax.lax.top_k(flat, cap)
        ta = idx // k
        tb = idx % k
        sa = jnp.take_along_axis(pk_scores[:, pp[:, 0]], ta, axis=-1)
        sb = jnp.take_along_axis(pk_scores[:, pp[:, 1]], tb, axis=-1)
        raw = assoc_pallas(
            ts, ta, tb, sa, sb, jnp.minimum(nab, nbb),
            k_slots=k, n_conn=max_conn, max_people=scan_people,
            interpret=jax.default_backend() == "cpu",
        )
        people = _assemble.cull_and_compact(
            raw["rows"], raw["score"], raw["cnt"], raw["active"],
            raw["stamp"], cfg.min_subset_cnt, cfg.min_subset_score,
        )
        out = {key: v[:, : cfg.max_people] for key, v in people.items()}
        return out if batched else {key: v[0] for key, v in out.items()}

    def run_lax(cap):
        def one(prior, ok, na, nb, pk):
            conns = _paf.greedy_all(prior, ok, na, nb, max_conn, cap)
            people = _assemble.assemble(
                pk,
                conns,
                max_people=scan_people,
                min_cnt=cfg.min_subset_cnt,
                min_score=cfg.min_subset_score,
            )
            # kept rows are compacted to the front in creation order;
            # return the configured output capacity
            return {key: v[: cfg.max_people] for key, v in people.items()}

        if batched:
            return jax.vmap(one)(prior, ok, n_a, n_b, peaks)
        return one(prior, ok, n_a, n_b, peaks)

    run = run_pallas if use_pallas_assoc() else run_lax

    if cap_fast >= cap_full:
        return run(cap_full)
    max_ok_per_limb = ok.sum(axis=(-2, -1)).max()
    return jax.lax.cond(
        max_ok_per_limb <= cap_fast,
        lambda _: run(cap_fast),
        lambda _: run(cap_full),
        None,
    )


def _remap_rows(rows: jnp.ndarray, from_k: int, to_k: int) -> jnp.ndarray:
    """Global peak ids part*from_k+slot -> part*to_k+slot (slot < from_k)."""
    return jnp.where(rows >= 0, (rows // from_k) * to_k + rows % from_k, rows)


def _tier_caps(cfg: InferenceConfig) -> tuple[int, ...]:
    """Ascending reduced pair capacities below max_peaks; () = disabled."""
    return tuple(sorted({t for t in cfg.pair_tiers if 0 < t < cfg.max_peaks}))


def _two_tier_post_peaks(paf, peaks, cfg: InferenceConfig, batched: bool):
    """Adaptive multi-tier pair scoring + assembly.

    The K x K x mid_num PAF point readout is the decode's dominant cost
    on TPU and scales O(K^2) (round 2: ~360 ms/batch-8 at K=96 via
    gather on full-res maps; ~40 ms at K=32). When every part channel
    holds <= `t` valid peaks for a tier capacity `t` — peak slots are
    compacted to the front, so slicing the leading `t` keeps them all —
    the reduced-capacity path scores exactly the same candidate pairs
    and produces bitwise-identical people. Nested runtime ``lax.cond``s
    pick the smallest adequate tier (typical scenes fit the K=8 micro
    tier: 64 candidate pairs/limb instead of 9216); in the batched
    program the conds sit OUTSIDE the vmap (inside they would become
    selects and execute every tier).
    """
    caps = _tier_caps(cfg)
    if not caps:
        return _post_peaks(paf, peaks, cfg, batched)

    def at_tier(ks):
        def run(paf):
            sliced = {key: v[..., :ks] for key, v in peaks.items()}
            people = _post_peaks(paf, sliced, cfg, batched)
            return {
                **people,
                "rows": _remap_rows(people["rows"], ks, cfg.max_peaks),
            }

        return run

    def big(paf):
        return _post_peaks(paf, peaks, cfg, batched)

    max_count = peaks["valid"].sum(axis=-1).max()
    return cond_chain(caps, max_count, at_tier, big, paf)


def decode_impl(
    heatmap, paf, cfg: InferenceConfig
) -> dict[str, jnp.ndarray]:
    """Averaged maps -> fixed-size people tables.

    ``heatmap``/``paf`` are either materialised full-res maps —
    (H, W, 19) and (H, W, 38) — or ``ScaleSpace``s of per-scale low-res
    network outputs (the product path: the full-res upsample is never
    materialised; see decode/scalespace.py). Both may be mixed.

    Pure (un-jitted) implementation — compose under jit freely. Under
    vmap the internal lax.cond degrades to executing both tiers; use
    ``decode_impl_batch`` for batched maps instead. Output dict:
    rows/score/cnt/valid people tables plus the peak tables
    (peak_xs/peak_ys/peak_scores) needed to resolve global peak ids.
    """
    peaks = _find_peaks(heatmap, cfg)
    people = _two_tier_post_peaks(paf, peaks, cfg, batched=False)
    return {
        **people,
        "peak_xs": peaks["xs"],
        "peak_ys": peaks["ys"],
        "peak_scores": peaks["scores"],
    }


def _grouped_post_peaks(pafs, peaks, cfg: InferenceConfig, groups: int):
    """Per-group adaptive tiers: argsort images by peak count (on-device,
    no host sync), split into ``groups`` contiguous sub-batches, give each
    its own tier cond-chain, unpermute. A lone crowded image then drags
    only its group — not the whole batch — onto the O(K^2) dense tier.
    Bitwise identical to the single-group path: tier capacity never
    changes values when the group's counts fit it, and the permutation is
    exact."""
    b = peaks["valid"].shape[0]
    groups = min(groups, b)
    counts = peaks["valid"].sum(axis=-1).max(axis=-1)   # (B,) peaks/channel
    order = jnp.argsort(counts)
    inv = jnp.argsort(order)
    pk_s = {k: jnp.take(v, order, axis=0) for k, v in peaks.items()}
    paf_s = jax.tree.map(lambda m: jnp.take(m, order, axis=0), pafs)

    outs = []
    start = 0
    for g in range(groups):
        size = b // groups + (1 if g < b % groups else 0)
        sl = slice(start, start + size)
        start += size
        pk_g = {k: v[sl] for k, v in pk_s.items()}
        paf_g = jax.tree.map(lambda m: m[sl], paf_s)
        outs.append(_two_tier_post_peaks(paf_g, pk_g, cfg, batched=True))
    cat = {k: jnp.concatenate([o[k] for o in outs], axis=0) for k in outs[0]}
    return {k: jnp.take(v, inv, axis=0) for k, v in cat.items()}


def decode_impl_batch(
    heatmaps, pafs, cfg: InferenceConfig, valid_hw=None
) -> dict[str, jnp.ndarray]:
    """Batched decode with adaptive tier choice per density-sorted group
    (``cfg.decode_groups``; default 1 = one choice for the whole batch).
    Peak-compaction capacity stays batch-global (it is cheap).

    ``valid_hw`` (optional, (B, 2) int32) restricts peak finding to the
    per-image top-left rectangle ``[0, vh) x [0, vw)`` — the shape-bucket
    serving path pads heterogeneous images bottom/right into one canvas
    (the reference's own padRightDownCorner convention), and the mask
    keeps the gray margin from ever emitting peaks. The valid region is
    a top-left rectangle, so every PAF line integral between two valid
    peaks stays inside it and needs no mask of its own.
    """
    flats = jax.vmap(lambda h: _masked_peak_scores(h, cfg))(heatmaps)
    b, c, n = flats.shape
    if valid_hw is not None:
        w = _heat_width(heatmaps)
        lin = jnp.arange(n, dtype=jnp.int32)
        inside = (
            ((lin // w)[None, :] < valid_hw[:, :1])
            & ((lin % w)[None, :] < valid_hw[:, 1:])
        )  # (B, N)
        flats = jnp.where(inside[:, None, :], flats, -jnp.inf)
    tables = _peaks.peak_tables_tiered(
        flats.reshape(b * c, n), _heat_width(heatmaps), cfg.max_peaks,
        cfg.peak_compact_tiers,
    )
    peaks = {k: v.reshape(b, c, -1) for k, v in tables.items()}
    if cfg.decode_groups > 1 and b > 1:
        caps = _tier_caps(cfg)
        if cfg.decode_group_adaptive and caps:
            # Grouping only changes the program when images land on
            # DIFFERENT tiers; a uniform batch pays the argsort/permute
            # + sub-batch dispatch (measured 12-25 %) for bitwise the
            # same result. One runtime cond keeps uniform batches on the
            # single-group program; the predicate is a per-image tier
            # index (number of tiers the image's peak count exceeds).
            counts = peaks["valid"].sum(axis=-1).max(axis=-1)  # (B,)
            tier_idx = sum(
                (counts > t).astype(jnp.int32) for t in caps
            )
            people = jax.lax.cond(
                tier_idx.min() == tier_idx.max(),
                lambda pf: _two_tier_post_peaks(pf, peaks, cfg, batched=True),
                lambda pf: _grouped_post_peaks(pf, peaks, cfg, cfg.decode_groups),
                pafs,
            )
        else:
            people = _grouped_post_peaks(pafs, peaks, cfg, cfg.decode_groups)
    else:
        people = _two_tier_post_peaks(pafs, peaks, cfg, batched=True)
    return {
        **people,
        "peak_xs": peaks["xs"],
        "peak_ys": peaks["ys"],
        "peak_scores": peaks["scores"],
    }


decode_maps = jax.jit(decode_impl, static_argnames=("cfg",))
decode_maps_batch = jax.jit(decode_impl_batch, static_argnames=("cfg",))


def to_people(result: dict[str, np.ndarray]) -> list[dict]:
    """Device tables -> the reference's keypoint-JSON contract."""
    rows = np.asarray(result["rows"])
    score = np.asarray(result["score"])
    cnt = np.asarray(result["cnt"])
    valid = np.asarray(result["valid"])
    xs = np.asarray(result["peak_xs"]).reshape(-1)
    ys = np.asarray(result["peak_ys"]).reshape(-1)
    ss = np.asarray(result["peak_scores"]).reshape(-1)

    people = []
    for j in range(rows.shape[0]):
        if not valid[j]:
            continue
        kps = {}
        for p in range(topology.NUM_PARTS):
            pid = int(rows[j, p])
            if pid >= 0:
                kps[topology.PARTS[p]] = {
                    "x": float(xs[pid]),
                    "y": float(ys[pid]),
                    "score": float(ss[pid]),
                }
        people.append(
            {"keypoints": kps, "score": float(score[j]), "num_parts": int(cnt[j])}
        )
    return people
