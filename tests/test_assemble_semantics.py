"""Constructed assembly edge cases vs the NumPy twin (round-2 VERDICT
weak #4 / ADVICE creation-order finding).

Fuzz fields rarely produce ``found >= 3`` matches or merge-then-seed
slot reuse, so these scenarios build the peak/connection tables
directly (identical inputs to both implementations) and pin:

  * found == 3: the reference's if/elif chain does NOTHING — the
    connection is dropped, no extend/merge.
  * after a merge frees a low slot and a new person is seeded into it,
    j1/j2 selection must follow CREATION order (the reference iterates
    its subset list, which is creation-ordered), not slot order.
"""

import numpy as np

from tpupose import topology
from tpupose.config import InferenceConfig
from tpupose.decode.api import to_people
from tpupose.decode.assemble import assemble
from tpupose.reference_impl import decode_np

K = 4  # peak slots per part (jnp capacity)
C = 4  # connection slots per limb


class Scenario:
    """Builds identical peak/connection tables for both implementations."""

    def __init__(self):
        self.peaks: dict[int, list[tuple[float, float, float]]] = {
            p: [] for p in range(topology.NUM_PARTS)
        }
        self.conns: dict[int, list[tuple[int, int, float]]] = {
            k: [] for k in range(topology.NUM_LIMBS)
        }

    def peak(self, part: int, x: float, y: float, score: float) -> int:
        """Returns the slot of the new peak within its part channel."""
        self.peaks[part].append((x, y, score))
        return len(self.peaks[part]) - 1

    def conn(self, limb: int, a_slot: int, b_slot: int, score: float):
        self.conns[limb].append((a_slot, b_slot, score))

    # --- jnp tables -----------------------------------------------------------
    def jnp_tables(self):
        xs = np.zeros((18, K), np.int32)
        ys = np.zeros((18, K), np.int32)
        sc = np.zeros((18, K), np.float32)
        va = np.zeros((18, K), bool)
        for p, lst in self.peaks.items():
            for s, (x, y, v) in enumerate(lst):
                xs[p, s], ys[p, s], sc[p, s], va[p, s] = int(x), int(y), v, True
        peaks = {"xs": xs, "ys": ys, "scores": sc, "valid": va}
        a = np.zeros((19, C), np.int32)
        b = np.zeros((19, C), np.int32)
        s = np.zeros((19, C), np.float32)
        v = np.zeros((19, C), bool)
        for k, lst in self.conns.items():
            for i, (ai, bi, cs) in enumerate(lst):
                a[k, i], b[k, i], s[k, i], v[k, i] = ai, bi, cs, True
        conns = {"a_slot": a, "b_slot": b, "score": s, "valid": v}
        return peaks, conns

    # --- twin tables ----------------------------------------------------------
    def np_tables(self):
        part_pairs, _ = topology.decode_limb_tables()
        all_peaks = []
        gid = 0
        offsets = {}
        for p in range(topology.NUM_PARTS):
            offsets[p] = gid
            lst = []
            for x, y, v in self.peaks[p]:
                lst.append((int(x), int(y), float(v), gid))
                gid += 1
            all_peaks.append(lst)
        connection_all = []
        for k in range(topology.NUM_LIMBS):
            pa, pb = part_pairs[k]
            rows = [
                [offsets[pa] + ai, offsets[pb] + bi, cs, ai, bi]
                for ai, bi, cs in self.conns[k]
            ]
            connection_all.append(
                np.asarray(rows, np.float64).reshape(-1, 5)
            )
        return all_peaks, connection_all

    def run_both(self, min_cnt=2, min_score=0.0):
        peaks, conns = self.jnp_tables()
        got_tables = assemble(
            {k: np.asarray(v) for k, v in peaks.items()},
            conns,
            max_people=16,
            min_cnt=min_cnt,
            min_score=min_score,
        )
        got = to_people(
            {
                **{k: np.asarray(v) for k, v in got_tables.items()},
                "peak_xs": peaks["xs"],
                "peak_ys": peaks["ys"],
                "peak_scores": peaks["scores"],
            }
        )
        all_peaks, connection_all = self.np_tables()
        cfg = InferenceConfig(min_subset_cnt=min_cnt, min_subset_score=min_score)
        subset, cand = decode_np.assemble_np(all_peaks, connection_all, [], cfg)
        ref = decode_np.people_json(subset, cand)
        return got, ref


def canon(people):
    out = []
    for p in people:
        kps = tuple(
            sorted(
                (n, v["x"], v["y"], round(v["score"], 4))
                for n, v in p["keypoints"].items()
            )
        )
        out.append((kps, p["num_parts"], round(p["score"], 4)))
    return out  # NOT sorted: creation order is part of the contract


def test_found_three_is_a_noop():
    """A connection matching three subset rows must change nothing."""
    sc = Scenario()
    p1a = sc.peak(1, 10, 10, 1.0)
    p1b = sc.peak(1, 40, 10, 1.0)
    p2a = sc.peak(2, 10, 40, 1.0)
    p2b = sc.peak(2, 40, 40, 1.0)
    p14 = sc.peak(14, 80, 10, 1.0)
    p16 = sc.peak(16, 80, 40, 1.0)

    # limb 0 = (1, 2): two seeds, then a cross connection that matches
    # both rows with overlap -> unconditional extend of the older row,
    # duplicating peak p2b across rows (the reference reaches this state
    # the same way).
    sc.conn(0, p1a, p2a, 0.9)
    sc.conn(0, p1b, p2b, 0.8)
    sc.conn(0, p1a, p2b, 0.7)
    # limb 14 = (14, 16): third row
    sc.conn(14, p14, p16, 0.9)
    # limb 17 = (2, 16): matches rows 1+2 on part 2 (duplicated p2b) and
    # row 3 on part 16 -> found == 3 -> the reference does NOTHING
    sc.conn(17, p2b, p16, 0.95)

    got, ref = sc.run_both()
    assert canon(got) == canon(ref)
    # pin the expected shape: 3 people, the found==3 connection dropped
    assert len(ref) == 3
    assert ref[2]["num_parts"] == 2  # row 3 was never extended


def test_merge_then_seed_uses_creation_order():
    """After a merge frees a low slot and a seed reuses it, j1 selection
    must follow creation order (reference list order), not slot order."""
    sc = Scenario()
    p1 = sc.peak(1, 10, 10, 1.0)
    p2 = sc.peak(2, 10, 40, 1.0)
    p3 = sc.peak(3, 10, 70, 1.0)
    p4 = sc.peak(4, 10, 100, 1.0)
    p5 = sc.peak(5, 200, 10, 1.0)
    p6a = sc.peak(6, 200, 40, 1.0)
    p6b = sc.peak(6, 240, 40, 1.0)
    p7 = sc.peak(7, 200, 70, 1.0)

    sc.conn(0, p1, p2, 0.9)    # limb (1,2): row A  (slot 0, stamp 0)
    sc.conn(3, p3, p4, 0.9)    # limb (3,4): row B  (slot 1, stamp 1)
    sc.conn(4, p5, p6a, 0.9)   # limb (5,6): row C  (slot 2, stamp 2)
    sc.conn(2, p2, p3, 0.9)    # limb (2,3): merges B into A, frees slot 1
    sc.conn(5, p6b, p7, 0.9)   # limb (6,7): seeds row D into slot 1 (stamp 3)
    # limb (6,7) second connection: matches C on part 6 and D on part 7,
    # overlap on part 6 -> extend j1. Creation order says j1 = C (older),
    # so C gains part 7; slot order would wrongly pick D (lower slot).
    sc.conn(5, p6a, p7, 0.8)

    got, ref = sc.run_both()
    assert canon(got) == canon(ref)
    people_by_parts = {p["num_parts"] for p in ref}
    assert people_by_parts == {4, 3, 2}  # merged A+B, extended C, seeded D
