"""Fused Pallas association kernel: greedy accept + skeleton assembly.

The decode's two order-sensitive stages — per-limb greedy acceptance of
score-sorted candidate pairs (reference ``demo_image.py`` connection
loop) and limb-major subset assembly (SURVEY.md C7/C8) — are
sequential by CONTRACT: the reference's output depends on processing
order. As XLA ``lax.scan``s they cost ~30-90 us per iteration on the
chip (loop-carried state round-trips HBM every step): 10.8 ms of the
19.5 ms batch-8 decode, measured round 2, and unrolling does not help.

This kernel runs both stages inside ONE VMEM residency per image:

  * phase 1 — greedy accept, vectorised ACROSS the 19 limbs (their
    used-endpoint masks are independent), one loop over the sorted
    candidate stream;
  * phase 2 — assembly over the (limb, connection) stream in decode
    order against a (18, P) transposed people table.

Every "scatter" is a masked broadcast (one-hot vector ops) and every
dynamic read is a masked reduce, so nothing touches lanes dynamically —
the Mosaic-friendly formulation of the reference's pointer-chasing
loops. Semantics mirror ``decode/paf.py::_greedy_accept`` and
``decode/assemble.py::assemble`` exactly (same tie-breaks: first
minimum); parity is pinned by tests against the lax implementations.

The cull + creation-order compaction stays outside (XLA sort — it is
parallel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpupose import topology

_BIG = np.int32(1 << 30)


def _first_where(mask, iota, size):
    """Index of the first True lane (== size when none) — argmin tie-break."""
    return jnp.min(jnp.where(mask, iota, size))


def _assoc_kernel(
    k_slots: int,       # peak-slot stride (pid = part * k_slots + slot)
    n_conn: int,        # connections kept per limb (C)
    max_people: int,    # P
    # --- refs ---
    ts_ref,             # (19, CAP) f32 sorted candidate priors, -inf invalid
    ta_ref,             # (19, CAP) i32 A slot
    tb_ref,             # (19, CAP) i32 B slot
    sa_ref,             # (19, CAP) f32 endpoint-A peak score
    sb_ref,             # (19, CAP) f32 endpoint-B peak score
    lim_ref,            # (1, 19)  i32 min(n_a, n_b)
    ap_ref,             # (19, 1) i32 limb A part ids (constant)
    bp_ref,             # (19, 1) i32 limb B part ids (constant)
    rows_ref,           # out (18, P) i32
    score_ref,          # out (1, P) f32
    cnt_ref,            # out (1, P) i32
    active_ref,         # out (1, P) i32
    stamp_ref,          # out (1, P) i32
    used_a_ref,         # scratch (19, K) i32
    used_b_ref,         # scratch (19, K) i32
    conn_pa_ref,        # scratch (19, C) i32
    conn_pb_ref,        # scratch (19, C) i32
    conn_cs_ref,        # scratch (19, C) f32
    conn_sa_ref,        # scratch (19, C) f32
    conn_sb_ref,        # scratch (19, C) f32
    conn_v_ref,         # scratch (19, C) i32
):
    n_limbs = topology.NUM_LIMBS
    n_parts = topology.NUM_PARTS
    cap = ts_ref.shape[1]
    p = max_people
    ap_const = ap_ref[:, :]                                   # (19, 1)
    bp_const = bp_ref[:, :]

    iota_k = jax.lax.broadcasted_iota(jnp.int32, (n_limbs, k_slots), 1)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (n_limbs, n_conn), 1)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (n_limbs, n_conn), 0)
    iota_p = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    iota18 = jax.lax.broadcasted_iota(jnp.int32, (n_parts, 1), 0)

    # ---------------- phase 1: greedy accept, all limbs in parallel --------
    used_a_ref[:, :] = jnp.zeros((n_limbs, k_slots), jnp.int32)
    used_b_ref[:, :] = jnp.zeros((n_limbs, k_slots), jnp.int32)
    conn_pa_ref[:, :] = jnp.zeros((n_limbs, n_conn), jnp.int32)
    conn_pb_ref[:, :] = jnp.zeros((n_limbs, n_conn), jnp.int32)
    conn_cs_ref[:, :] = jnp.zeros((n_limbs, n_conn), jnp.float32)
    conn_sa_ref[:, :] = jnp.zeros((n_limbs, n_conn), jnp.float32)
    conn_sb_ref[:, :] = jnp.zeros((n_limbs, n_conn), jnp.float32)
    conn_v_ref[:, :] = jnp.zeros((n_limbs, n_conn), jnp.int32)
    limits = lim_ref[0, :].reshape(n_limbs, 1)                # (19, 1)

    iota_cap = jax.lax.broadcasted_iota(jnp.int32, (n_limbs, cap), 1)

    def greedy_step(s, nacc):
        # nacc: (19, 1) i32 accepted-so-far. Column s is read with a
        # masked reduce (Mosaic has no dynamic_slice lowering).
        oh_s = (iota_cap == s)
        oh_si = oh_s.astype(jnp.int32)
        oh_sf = oh_s.astype(jnp.float32)
        col = lambda ref, oh: jnp.sum(  # noqa: E731
            ref[:, :] * oh, axis=1, keepdims=True
        )
        # score: keep -inf semantics (masked sum would give nan/0) —
        # select then min+max reduce: where(oh, ts, -inf).max()
        score = jnp.max(
            jnp.where(oh_s, ts_ref[:, :], -jnp.inf), axis=1, keepdims=True
        )
        ai = col(ta_ref, oh_si)
        bi = col(tb_ref, oh_si)
        sa = col(sa_ref, oh_sf)
        sb = col(sb_ref, oh_sf)
        oh_a = (iota_k == ai).astype(jnp.int32)               # (19, K)
        oh_b = (iota_k == bi).astype(jnp.int32)
        hit_a = jnp.sum(used_a_ref[:, :] * oh_a, axis=1, keepdims=True)
        hit_b = jnp.sum(used_b_ref[:, :] * oh_b, axis=1, keepdims=True)
        accept = (
            jnp.isfinite(score)
            & (hit_a == 0)
            & (hit_b == 0)
            & (nacc < limits)
        )                                                     # (19, 1)
        acc_i = accept.astype(jnp.int32)
        used_a_ref[:, :] = used_a_ref[:, :] | (oh_a * acc_i)
        used_b_ref[:, :] = used_b_ref[:, :] | (oh_b * acc_i)
        wr = (iota_c == nacc) & accept                        # (19, C)
        conn_pa_ref[:, :] = jnp.where(wr, ap_const * k_slots + ai, conn_pa_ref[:, :])
        conn_pb_ref[:, :] = jnp.where(wr, bp_const * k_slots + bi, conn_pb_ref[:, :])
        conn_cs_ref[:, :] = jnp.where(wr, score, conn_cs_ref[:, :])
        conn_sa_ref[:, :] = jnp.where(wr, sa, conn_sa_ref[:, :])
        conn_sb_ref[:, :] = jnp.where(wr, sb, conn_sb_ref[:, :])
        conn_v_ref[:, :] = conn_v_ref[:, :] | wr.astype(jnp.int32)
        return nacc + acc_i

    jax.lax.fori_loop(
        0, cap, greedy_step, jnp.zeros((n_limbs, 1), jnp.int32)
    )

    # ---------------- phase 2: assembly over the (limb, conn) stream -------
    rows_ref[:, :] = jnp.full((n_parts, p), -1, jnp.int32)
    score_ref[:, :] = jnp.zeros((1, p), jnp.float32)
    cnt_ref[:, :] = jnp.zeros((1, p), jnp.int32)
    active_ref[:, :] = jnp.zeros((1, p), jnp.int32)
    stamp_ref[:, :] = jnp.full((1, p), _BIG, jnp.int32)

    def asm_step(t, next_stamp):
        l = t // n_conn
        q = t % n_conn
        oh_lq = ((iota_l == l) & (iota_c == q)).astype(jnp.int32)   # (19, C)
        oh_lqf = oh_lq.astype(jnp.float32)
        pa = jnp.sum(conn_pa_ref[:, :] * oh_lq)
        pb = jnp.sum(conn_pb_ref[:, :] * oh_lq)
        cs = jnp.sum(conn_cs_ref[:, :] * oh_lqf)
        sa = jnp.sum(conn_sa_ref[:, :] * oh_lqf)
        sb = jnp.sum(conn_sb_ref[:, :] * oh_lqf)
        valid = jnp.sum(conn_v_ref[:, :] * oh_lq) > 0
        oh_l = (jax.lax.broadcasted_iota(jnp.int32, (n_limbs, 1), 0) == l)
        ap = jnp.sum(ap_const * oh_l.astype(jnp.int32))
        bp = jnp.sum(bp_const * oh_l.astype(jnp.int32))
        seed_ok = l < 17      # last two decode limbs never seed people

        oh_ap = (iota18 == ap).astype(jnp.int32)               # (18, 1)
        oh_bp = (iota18 == bp).astype(jnp.int32)

        rows = rows_ref[:, :]
        active = active_ref[:, :]
        stamp = stamp_ref[:, :]
        rows_ap = jnp.sum(rows * oh_ap, axis=0, keepdims=True)  # (1, P)
        rows_bp = jnp.sum(rows * oh_bp, axis=0, keepdims=True)
        match = (active > 0) & ((rows_ap == pa) | (rows_bp == pb))
        found = jnp.sum(match.astype(jnp.int32))

        stamped = jnp.where(match, stamp, _BIG)
        m1 = jnp.min(stamped)
        j1 = _first_where(stamped == m1, iota_p, p)
        oh_j1 = (iota_p == j1)
        stamped2 = jnp.where(match & ~oh_j1, stamp, _BIG)
        m2 = jnp.min(stamped2)
        j2 = _first_where(stamped2 == m2, iota_p, p)
        oh_j2 = (iota_p == j2)

        row_j1 = jnp.sum(rows * oh_j1.astype(jnp.int32), axis=1, keepdims=True)
        row_j2 = jnp.sum(rows * oh_j2.astype(jnp.int32), axis=1, keepdims=True)
        needs_b = jnp.sum(row_j1 * oh_bp) != pb
        overlap = jnp.sum(((row_j1 >= 0) & (row_j2 >= 0)).astype(jnp.int32)) > 0

        free = _first_where(active == 0, iota_p, p)
        has_free = free < p
        oh_free = (iota_p == free)

        do_new = valid & (found == 0) & seed_ok & has_free
        do_one = valid & (
            ((found == 1) & needs_b) | ((found == 2) & overlap)
        )
        do_merge = valid & (found == 2) & ~overlap

        score_p = score_ref[:, :]
        cnt_p = cnt_ref[:, :]

        # extend row j1 with endpoint B
        w_one = do_one & oh_j1                                  # (1, P)
        rows = jnp.where(w_one & (oh_bp > 0), pb, rows)
        cnt_p = cnt_p + w_one.astype(jnp.int32)
        score_p = score_p + jnp.where(w_one, sb + cs, 0.0)

        # merge j2 into j1 (reads before writes; j1 != j2 when found == 2)
        merged = jnp.where(row_j2 >= 0, row_j2, row_j1)         # (18, 1)
        cnt_j2 = jnp.sum(cnt_p * oh_j2.astype(jnp.int32))
        score_j2 = jnp.sum(score_p * oh_j2.astype(jnp.float32))
        w_m1 = do_merge & oh_j1
        w_m2 = do_merge & oh_j2
        rows = jnp.where(w_m1, merged, rows)
        cnt_p = cnt_p + jnp.where(w_m1, cnt_j2, 0)
        score_p = score_p + jnp.where(w_m1, score_j2 + cs, 0.0)
        rows = jnp.where(w_m2, -1, rows)
        cnt_p = jnp.where(w_m2, 0, cnt_p)
        score_p = jnp.where(w_m2, 0.0, score_p)
        active = jnp.where(w_m2, 0, active)

        # seed a new row at the first free slot
        new_row = jnp.where(oh_ap > 0, pa, jnp.where(oh_bp > 0, pb, -1))
        w_new = do_new & oh_free
        rows = jnp.where(w_new, new_row, rows)
        cnt_p = jnp.where(w_new, 2, cnt_p)
        score_p = jnp.where(w_new, sa + sb + cs, score_p)
        active = jnp.where(w_new, 1, active)
        stamp = jnp.where(w_new, next_stamp, stamp)

        rows_ref[:, :] = rows
        score_ref[:, :] = score_p
        cnt_ref[:, :] = cnt_p
        active_ref[:, :] = active
        stamp_ref[:, :] = stamp
        return next_stamp + do_new.astype(jnp.int32)

    jax.lax.fori_loop(0, n_limbs * n_conn, asm_step, jnp.int32(0))


@functools.partial(
    jax.jit,
    static_argnames=("k_slots", "n_conn", "max_people", "interpret"),
)
def assoc_pallas(
    ts: jnp.ndarray,        # (B, 19, CAP) f32 sorted priors (-inf invalid)
    ta: jnp.ndarray,        # (B, 19, CAP) i32
    tb: jnp.ndarray,        # (B, 19, CAP) i32
    sa: jnp.ndarray,        # (B, 19, CAP) f32
    sb: jnp.ndarray,        # (B, 19, CAP) f32
    limits: jnp.ndarray,    # (B, 19) i32
    k_slots: int,
    n_conn: int,
    max_people: int,
    interpret: bool = False,
) -> dict[str, jnp.ndarray]:
    """Batched fused association. Returns raw (uncompacted) people state:
    rows (B, P, 18) i32, score (B, P) f32, cnt (B, P) i32,
    active (B, P) bool, stamp (B, P) i32 — feed to
    ``assemble.cull_and_compact``."""
    b, n_limbs, cap = ts.shape
    p = max_people
    n_parts = topology.NUM_PARTS
    kernel = functools.partial(_assoc_kernel, k_slots, n_conn, p)
    spec2 = lambda r, c: pl.BlockSpec(  # noqa: E731
        (None, r, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    rows_t, score, cnt, active, stamp = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            spec2(n_limbs, cap),
            spec2(n_limbs, cap),
            spec2(n_limbs, cap),
            spec2(n_limbs, cap),
            spec2(n_limbs, cap),
            spec2(1, n_limbs),
            pl.BlockSpec((n_limbs, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_limbs, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            spec2(n_parts, p),
            spec2(1, p),
            spec2(1, p),
            spec2(1, p),
            spec2(1, p),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_parts, p), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, p), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, p), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, p), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, p), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_limbs, k_slots), jnp.int32),
            pltpu.VMEM((n_limbs, k_slots), jnp.int32),
            pltpu.VMEM((n_limbs, n_conn), jnp.int32),
            pltpu.VMEM((n_limbs, n_conn), jnp.int32),
            pltpu.VMEM((n_limbs, n_conn), jnp.float32),
            pltpu.VMEM((n_limbs, n_conn), jnp.float32),
            pltpu.VMEM((n_limbs, n_conn), jnp.float32),
            pltpu.VMEM((n_limbs, n_conn), jnp.int32),
        ],
        interpret=interpret,
    )(
        ts.astype(jnp.float32),
        ta.astype(jnp.int32),
        tb.astype(jnp.int32),
        sa.astype(jnp.float32),
        sb.astype(jnp.float32),
        limits.astype(jnp.int32).reshape(b, 1, n_limbs),
        jnp.asarray(np.asarray(topology.decode_limb_tables()[0])[:, 0:1],
                    jnp.int32),
        jnp.asarray(np.asarray(topology.decode_limb_tables()[0])[:, 1:2],
                    jnp.int32),
    )
    return {
        "rows": jnp.swapaxes(rows_t, 1, 2),        # (B, P, 18)
        "score": score[:, 0, :],
        "cnt": cnt[:, 0, :],
        "active": active[:, 0, :] > 0,
        "stamp": stamp[:, 0, :],
    }
