"""Scan-order peak compaction (cumsum + one-hot matmul) contract.

The TPU path fills peak tables by prefix-sum slot assignment instead of
``lax.top_k`` (k-independent full sort, ~30 ms/batch-8 on the chip —
round 2). The compaction must (a) produce exactly the finite entries of
the masked score map, (b) in row-major scan order — the reference's
``np.nonzero`` ordering (reference_impl/decode_np.py::find_peaks_np) —
(c) with exact coordinates and scores, and (d) agree with the ``topk``
mode on the peak *set* whenever the capacity holds it.
"""

import numpy as np
import jax.numpy as jnp

from tpupose.decode.peaks import compact_peaks, peak_tables


def _masked_scores(rng, c=18, h=46, w=46, density=0.01):
    vals = rng.random((c, h * w)).astype(np.float32) + 0.1
    mask = rng.random((c, h * w)) < density
    return np.where(mask, vals, -np.inf).astype(np.float32)


def test_compaction_matches_nonzero_scan_order():
    rng = np.random.default_rng(0)
    w = 46
    scores = _masked_scores(rng)
    got = compact_peaks(jnp.asarray(scores), w, 96)
    for c in range(scores.shape[0]):
        (idx,) = np.nonzero(np.isfinite(scores[c]))
        n = len(idx)
        assert int(np.asarray(got["valid"])[c].sum()) == n
        np.testing.assert_array_equal(np.asarray(got["xs"])[c, :n], idx % w)
        np.testing.assert_array_equal(np.asarray(got["ys"])[c, :n], idx // w)
        np.testing.assert_array_equal(
            np.asarray(got["scores"])[c, :n], scores[c, idx]
        )
        # invalid tail is zeroed
        np.testing.assert_array_equal(np.asarray(got["scores"])[c, n:], 0.0)


def test_compaction_set_equals_topk(monkeypatch):
    rng = np.random.default_rng(1)
    w = 46
    scores = _masked_scores(rng, density=0.02)
    monkeypatch.setenv("TPUPOSE_PEAK_SLOTS", "scan")
    a = peak_tables(jnp.asarray(scores), w, 96)
    monkeypatch.setenv("TPUPOSE_PEAK_SLOTS", "topk")
    b = peak_tables(jnp.asarray(scores), w, 96)
    for c in range(scores.shape[0]):
        sa = {
            (int(x), int(y), float(s))
            for x, y, s, v in zip(
                np.asarray(a["xs"])[c], np.asarray(a["ys"])[c],
                np.asarray(a["scores"])[c], np.asarray(a["valid"])[c],
            )
            if v
        }
        sb = {
            (int(x), int(y), float(s))
            for x, y, s, v in zip(
                np.asarray(b["xs"])[c], np.asarray(b["ys"])[c],
                np.asarray(b["scores"])[c], np.asarray(b["valid"])[c],
            )
            if v
        }
        assert sa == sb


def test_compaction_overflow_keeps_first_k_in_scan_order():
    w = 10
    c, n, k = 1, 100, 4
    scores = np.full((c, n), -np.inf, np.float32)
    hits = [3, 17, 20, 41, 77, 98]
    scores[0, hits] = np.arange(len(hits), dtype=np.float32) + 1.0
    got = compact_peaks(jnp.asarray(scores), w, k)
    assert np.asarray(got["valid"])[0].all()
    np.testing.assert_array_equal(
        np.asarray(got["xs"])[0], np.asarray(hits[:k]) % w
    )
    np.testing.assert_array_equal(
        np.asarray(got["scores"])[0], np.asarray([1.0, 2.0, 3.0, 4.0])
    )


def test_tiered_compaction_matches_full():
    """peak_tables_tiered == full-capacity compaction (+ zero pad),
    both when the tier fits and when it overflows to the fallback."""
    from tpupose.decode.peaks import peak_tables_tiered

    w, k = 46, 96
    # sparse: <= 16 peaks/channel -> tier selected
    rng = np.random.default_rng(3)
    sparse = _masked_scores(rng, density=0.004)
    a = {k2: np.asarray(v) for k2, v in peak_tables_tiered(
        jnp.asarray(sparse), w, k, (16,)).items()}
    b = {k2: np.asarray(v) for k2, v in peak_tables_tiered(
        jnp.asarray(sparse), w, k, ()).items()}
    for key in a:
        np.testing.assert_array_equal(a[key], b[key], err_msg=key)

    # dense: one channel with > 16 peaks -> fallback path
    dense = sparse.copy()
    dense[0, :40] = 1.0
    c = {k2: np.asarray(v) for k2, v in peak_tables_tiered(
        jnp.asarray(dense), w, k, (16,)).items()}
    d = {k2: np.asarray(v) for k2, v in peak_tables_tiered(
        jnp.asarray(dense), w, k, ()).items()}
    for key in c:
        np.testing.assert_array_equal(c[key], d[key], err_msg=key)


def test_two_stage_matches_single_stage():
    """Large-N maps take the blockwise two-stage path; it must equal the
    single-stage compaction bitwise — including peaks straddling block
    boundaries and a block-overflow fallback."""
    from tpupose.decode.peaks import _compact_single, compact_peaks

    w, k = 368, 96
    n = 368 * 368
    rng = np.random.default_rng(5)
    scores = np.full((4, n), -np.inf, np.float32)
    # sparse channel + peaks packed around block boundaries
    for c in range(3):
        idx = rng.choice(n, size=12, replace=False)
        scores[c, idx] = rng.random(12).astype(np.float32) + 0.1
    scores[0, 510:514] = 0.5   # straddles the 512-px block edge
    a = {k2: np.asarray(v) for k2, v in compact_peaks(
        jnp.asarray(scores), w, k).items()}
    b = {k2: np.asarray(v) for k2, v in _compact_single(
        jnp.asarray(scores), w, k).items()}
    for key in a:
        np.testing.assert_array_equal(a[key], b[key], err_msg=key)

    # dense block: > 8 peaks inside one 512-px block -> runtime fallback
    scores[3, 1024:1044] = 1.0
    c2 = {k2: np.asarray(v) for k2, v in compact_peaks(
        jnp.asarray(scores), w, k).items()}
    d2 = {k2: np.asarray(v) for k2, v in _compact_single(
        jnp.asarray(scores), w, k).items()}
    for key in c2:
        np.testing.assert_array_equal(c2[key], d2[key], err_msg=key)


def test_tiered_overflow_falls_back_to_topk():
    """When a channel holds MORE peaks than max_peaks can seat, the
    tiered product path must keep the K strongest (score-descending
    top_k), not the first K in scan order — dropping only the weakest
    overflow peaks (the uncapped reference keeps all; strongest-first
    is the closest capped semantics). ADVICE r2 peaks.py:40."""
    from tpupose.decode.peaks import peak_tables_tiered

    w, k = 10, 4
    scores = np.full((1, 100), -np.inf, np.float32)
    hits = [3, 17, 20, 41, 77, 98]
    # strongest peaks LAST in scan order: scan-compaction would drop them
    scores[0, hits] = np.arange(len(hits), dtype=np.float32) + 1.0
    got = {k2: np.asarray(v) for k2, v in peak_tables_tiered(
        jnp.asarray(scores), w, k, (2,)).items()}
    assert got["valid"][0].all()
    np.testing.assert_array_equal(
        got["scores"][0], np.asarray([6.0, 5.0, 4.0, 3.0])
    )
    np.testing.assert_array_equal(
        got["xs"][0], np.asarray([hits[5], hits[4], hits[3], hits[2]]) % w
    )

    # no overflow -> unchanged scan-order semantics through the same path
    fits = np.full((1, 100), -np.inf, np.float32)
    fits[0, [3, 17, 20]] = [5.0, 1.0, 3.0]
    got2 = {k2: np.asarray(v) for k2, v in peak_tables_tiered(
        jnp.asarray(fits), w, k, (2,)).items()}
    assert int(got2["valid"][0].sum()) == 3
    np.testing.assert_array_equal(got2["scores"][0, :3], [5.0, 1.0, 3.0])


def test_compaction_empty():
    scores = np.full((18, 46 * 46), -np.inf, np.float32)
    got = compact_peaks(jnp.asarray(scores), 46, 96)
    assert not np.asarray(got["valid"]).any()
    np.testing.assert_array_equal(np.asarray(got["scores"]), 0.0)
