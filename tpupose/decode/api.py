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


def decode_impl(
    heatmap: jnp.ndarray, paf: jnp.ndarray, cfg: InferenceConfig
) -> dict[str, jnp.ndarray]:
    """(H, W, 19) heatmap + (H, W, 38) PAF -> fixed-size people tables.

    Pure (un-jitted) implementation — compose under jit/vmap freely.
    Output dict: rows/score/cnt/valid people tables plus the peak tables
    (peak_xs/peak_ys/peak_scores) needed to resolve global peak ids.
    """
    from tpupose.ops import use_pallas

    if use_pallas():
        from tpupose.ops.pallas_peaks import find_peaks_pallas

        peaks = find_peaks_pallas(
            heatmap, max_peaks=cfg.max_peaks, sigma=cfg.peak_sigma, thre1=cfg.thre1
        )
    else:
        peaks = _peaks.find_peaks(
            heatmap, max_peaks=cfg.max_peaks, sigma=cfg.peak_sigma, thre1=cfg.thre1
        )
    conns = _paf.score_limbs(
        paf,
        peaks,
        mid_num=cfg.mid_num,
        thre2=cfg.thre2,
        min_ratio=cfg.connect_min_ratio,
    )
    if cfg.max_connections < cfg.max_peaks:
        conns = {k: v[:, : cfg.max_connections] for k, v in conns.items()}
    people = _assemble.assemble(
        peaks,
        conns,
        max_people=max(cfg.max_people, cfg.scan_people_capacity),
        min_cnt=cfg.min_subset_cnt,
        min_score=cfg.min_subset_score,
    )
    # kept rows are compacted to the front in creation order; return the
    # configured output capacity
    people = {k: v[: cfg.max_people] for k, v in people.items()}
    return {
        **people,
        "peak_xs": peaks["xs"],
        "peak_ys": peaks["ys"],
        "peak_scores": peaks["scores"],
    }


decode_maps = jax.jit(decode_impl, static_argnames=("cfg",))


@partial(jax.jit, static_argnames=("cfg",))
def decode_maps_batch(
    heatmaps: jnp.ndarray, pafs: jnp.ndarray, cfg: InferenceConfig
) -> dict[str, jnp.ndarray]:
    """Batched decode: (N, H, W, 19) + (N, H, W, 38) -> batched tables."""
    return jax.vmap(lambda h, p: decode_impl(h, p, cfg))(heatmaps, pafs)


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
