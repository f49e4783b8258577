"""Greedy skeleton assembly (jnp, fixed-capacity lax.scan).

TPU-native rebuild of the reference decode's subset stage (SURVEY.md C8):
accepted limb connections are folded, limb-major in decode order, into
"subset" rows of 18 global-peak-id slots plus running score and part
count. A connection either extends an existing row, merges two disjoint
rows, or (for the first 17 decode limbs) seeds a new person. Rows with
fewer than ``min_subset_cnt`` parts or mean score below
``min_subset_score`` are culled.

The reference's dynamic row list becomes a fixed (max_people, ...) table
with an active mask; its sequential merge loop becomes one ``lax.scan``
over the flattened (limb, connection) stream. Global peak ids are encoded
as ``part * K + slot``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tpupose import topology


@partial(jax.jit, static_argnames=("max_people", "min_cnt", "min_score"))
def assemble(
    peaks: dict[str, jnp.ndarray],
    connections: dict[str, jnp.ndarray],
    max_people: int = 96,
    min_cnt: int = 4,
    min_score: float = 0.4,
) -> dict[str, jnp.ndarray]:
    """Fold connection tables into people.

    Returns dict: rows (P, 18) int32 global peak ids (-1 = missing),
    score (P,), cnt (P,), valid (P,) — culled and compacted to the front
    in creation order.
    """
    part_pairs, _ = topology.decode_limb_tables()
    part_pairs = jnp.asarray(part_pairs)          # (19, 2)
    k = peaks["xs"].shape[1]                      # pid stride (peak slots)
    c = connections["a_slot"].shape[1]            # connections per limb
    n_limbs = topology.NUM_LIMBS

    # Flatten (limb, conn) -> scan stream, limb-major (decode order).
    limb_idx = jnp.repeat(jnp.arange(n_limbs), c)                 # (19C,)
    a_part = part_pairs[limb_idx, 0]
    b_part = part_pairs[limb_idx, 1]
    a_slot = connections["a_slot"].reshape(-1)
    b_slot = connections["b_slot"].reshape(-1)
    conn_score = connections["score"].reshape(-1)
    conn_valid = connections["valid"].reshape(-1)
    pid_a = a_part * k + a_slot
    pid_b = b_part * k + b_slot
    cand_score = peaks["scores"].reshape(-1)                      # (18K,)
    sc_a = cand_score[pid_a]
    sc_b = cand_score[pid_b]
    can_seed = limb_idx < 17   # last two decode limbs never seed people

    p = max_people
    arange_p = jnp.arange(p)
    big_stamp = jnp.int32(1 << 30)

    def step(carry, inp):
        rows, score, cnt, active, stamp, next_stamp = carry
        (ap, bp, pa, pb, cs, sa, sb, valid, seed_ok) = inp

        match = active & ((rows[:, ap] == pa) | (rows[:, bp] == pb))
        found = match.sum()
        # j1/j2 = the two OLDEST matching rows by creation stamp — the
        # reference iterates its subset list in creation order, and after
        # a merge frees a slot, slot order no longer equals creation order
        # (round-1 ADVICE finding).
        stamped = jnp.where(match, stamp, big_stamp)
        j1 = jnp.argmin(stamped)
        stamped2 = jnp.where(match & (arange_p != j1), stamp, big_stamp)
        j2 = jnp.argmin(stamped2)

        # --- case split (reference demo_image.py subset loop) -------------
        # found == 1: extend j1 with b, only if j1's b-slot differs
        # found == 2: merge if the rows are disjoint, else extend j1
        #             unconditionally
        # found >= 3: the reference's if/elif chain does NOTHING
        row_j1 = rows[j1]
        needs_b = row_j1[bp] != pb
        overlap = ((rows[j1] >= 0) & (rows[j2] >= 0)).sum() > 0

        do_new = valid & (found == 0) & seed_ok
        do_one = valid & (
            ((found == 1) & needs_b) | ((found == 2) & overlap)
        )
        do_merge = valid & (found == 2) & jnp.logical_not(overlap)

        # new row at first free slot
        free = jnp.argmin(active)                    # first False
        has_free = jnp.logical_not(active[free])
        do_new = do_new & has_free

        # --- apply: extend row j1 ----------------------------------------
        rows = jnp.where(do_one, rows.at[j1, bp].set(pb), rows)
        cnt = jnp.where(do_one, cnt.at[j1].add(1), cnt)
        score = jnp.where(do_one, score.at[j1].add(sb + cs), score)

        # --- apply: merge j2 into j1 --------------------------------------
        merged_row = jnp.where(rows[j2] >= 0, rows[j2], rows[j1])
        rows = jnp.where(do_merge, rows.at[j1].set(merged_row), rows)
        cnt = jnp.where(do_merge, cnt.at[j1].add(cnt[j2]), cnt)
        score = jnp.where(do_merge, score.at[j1].add(score[j2] + cs), score)
        rows = jnp.where(do_merge, rows.at[j2].set(-1), rows)
        cnt = jnp.where(do_merge, cnt.at[j2].set(0), cnt)
        score = jnp.where(do_merge, score.at[j2].set(0.0), score)
        active = jnp.where(do_merge, active.at[j2].set(False), active)

        # --- apply: seed new row ------------------------------------------
        new_row = jnp.full((topology.NUM_PARTS,), -1, jnp.int32)
        new_row = new_row.at[ap].set(pa).at[bp].set(pb)
        rows = jnp.where(do_new, rows.at[free].set(new_row), rows)
        cnt = jnp.where(do_new, cnt.at[free].set(2), cnt)
        score = jnp.where(do_new, score.at[free].set(sa + sb + cs), score)
        active = jnp.where(do_new, active.at[free].set(True), active)
        stamp = jnp.where(do_new, stamp.at[free].set(next_stamp), stamp)
        next_stamp = next_stamp + do_new.astype(jnp.int32)

        return (rows, score, cnt, active, stamp, next_stamp), None

    init = (
        jnp.full((p, topology.NUM_PARTS), -1, jnp.int32),
        jnp.zeros((p,), jnp.float32),
        jnp.zeros((p,), jnp.int32),
        jnp.zeros((p,), bool),
        jnp.full((p,), big_stamp, jnp.int32),
        jnp.int32(0),
    )
    (rows, score, cnt, active, stamp, _), _ = jax.lax.scan(
        step,
        init,
        (a_part, b_part, pid_a, pid_b, conn_score, sc_a, sc_b, conn_valid, can_seed),
    )

    return cull_and_compact(rows, score, cnt, active, stamp, min_cnt, min_score)


def cull_and_compact(
    rows: jnp.ndarray,      # (..., P, 18) i32
    score: jnp.ndarray,     # (..., P) f32
    cnt: jnp.ndarray,       # (..., P) i32
    active: jnp.ndarray,    # (..., P) bool
    stamp: jnp.ndarray,     # (..., P) i32 creation stamps (big = never)
    min_cnt: int,
    min_score: float,
) -> dict[str, jnp.ndarray]:
    """Reference culling (cnt < min_cnt or score/cnt < min_score) +
    compaction of kept rows to the front in creation (stamp) order.
    Parallel (one sort) — shared by the lax and Pallas association
    paths; supports leading batch dims."""
    big_stamp = jnp.int32(1 << 30)
    keep = active & (cnt >= min_cnt) & (score / jnp.maximum(cnt, 1) >= min_score)
    order = jnp.argsort(jnp.where(keep, stamp, big_stamp), axis=-1, stable=True)
    take = lambda v: jnp.take_along_axis(v, order, axis=-1)  # noqa: E731
    return {
        "rows": jnp.take_along_axis(rows, order[..., None], axis=-2),
        "score": take(jnp.where(keep, score, 0.0)),
        "cnt": take(jnp.where(keep, cnt, 0)),
        "valid": take(keep),
    }
