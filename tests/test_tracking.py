"""PoseTracker: stable ids over synthetic trajectories (tpupose/tracking.py).

Host-side greedy nearest-neighbour matching on normalised keypoint
distance — the video path's beyond-reference id layer. These tests run
pure NumPy-free logic and pin: id stability under motion, crossing
resolution by proximity, retirement after max_missed, no id reuse, and
the EMA smoothing contract.
"""

from tpupose.tracking import PoseTracker


def person(x, y, spread=40.0, score=1.0):
    """A synthetic 4-keypoint person centred at (x, y)."""
    return {
        "keypoints": {
            "nose": {"x": x, "y": y - spread, "score": 0.9},
            "neck": {"x": x, "y": y, "score": 0.9},
            "Rhip": {"x": x - spread / 4, "y": y + spread, "score": 0.9},
            "Lhip": {"x": x + spread / 4, "y": y + spread, "score": 0.9},
        },
        "score": score,
        "num_parts": 4,
    }


def ids(people):
    return [p["track_id"] for p in people]


def test_stable_ids_under_motion():
    tr = PoseTracker()
    a0 = tr.update([person(50, 100), person(300, 100)])
    assert sorted(ids(a0)) == [0, 1]
    for step in range(1, 10):
        out = tr.update([person(50 + 3 * step, 100), person(300 - 3 * step, 100)])
        assert ids(out) == ids(a0)   # same order in, same ids out


def test_crossing_resolved_by_proximity():
    tr = PoseTracker()
    first = tr.update([person(100, 100), person(200, 100)])
    # swap list order; positions barely moved -> ids follow positions
    out = tr.update([person(201, 100), person(101, 100)])
    assert ids(out) == [first[1]["track_id"], first[0]["track_id"]]


def test_retirement_and_no_id_reuse():
    tr = PoseTracker(max_missed=2)
    a = tr.update([person(100, 100)])
    tid = a[0]["track_id"]
    for _ in range(3):
        assert tr.update([]) == []
    # track retired: same position now gets a NEW id
    b = tr.update([person(100, 100)])
    assert b[0]["track_id"] != tid


def test_reacquire_within_missed_window():
    tr = PoseTracker(max_missed=5)
    a = tr.update([person(100, 100)])
    tr.update([])
    tr.update([])
    b = tr.update([person(104, 102)])
    assert b[0]["track_id"] == a[0]["track_id"]


def test_new_person_gets_new_id():
    tr = PoseTracker()
    tr.update([person(100, 100)])
    out = tr.update([person(100, 100), person(500, 400)])
    assert sorted(ids(out)) == [0, 1]


def test_far_jump_opens_new_track():
    """A detection beyond max_cost of every track is a new person."""
    tr = PoseTracker(max_cost=0.5)
    tr.update([person(100, 100)])
    out = tr.update([person(1000, 900)])
    assert out[0]["track_id"] == 1


def test_smoothing_ema():
    tr = PoseTracker(smoothing=0.5)
    tr.update([person(100, 100)])
    out = tr.update([person(110, 100)])
    # EMA: 0.5*old + 0.5*new
    assert abs(out[0]["keypoints"]["neck"]["x"] - 105.0) < 1e-9
    assert abs(out[0]["keypoints"]["neck"]["y"] - 100.0) < 1e-9
    # scores ride through untouched
    assert out[0]["keypoints"]["neck"]["score"] == 0.9


def test_smoothing_validation():
    import pytest

    with pytest.raises(ValueError):
        PoseTracker(smoothing=1.0)


def test_sparse_track_keeps_id_under_motion():
    """A person detected with ONE keypoint has zero bbox extent; the
    min_diag floor keeps pixel-scale motion matchable (radius
    max_cost * min_diag px/frame) instead of opening a new id every
    frame."""

    def solo(x):
        return {"keypoints": {"nose": {"x": x, "y": 100.0, "score": 0.9}},
                "score": 1.0, "num_parts": 1}

    tr = PoseTracker()
    a = tr.update([solo(100.0)])
    for step in range(1, 6):
        out = tr.update([solo(100.0 + 3.0 * step)])
        assert out[0]["track_id"] == a[0]["track_id"]
