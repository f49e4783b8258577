"""RLE codec tests: native C library vs pure-NumPy twin, round-trips,
and COCO-convention pins (column-major, zero-run first, delta string)."""

import numpy as np
import pytest

from tpupose.data import rle


@pytest.fixture(scope="module")
def masks(rng=np.random.default_rng(11)):
    out = [
        (rng.uniform(size=(37, 53)) > 0.6).astype(np.uint8),
        np.zeros((16, 16), np.uint8),
        np.ones((16, 16), np.uint8),
    ]
    blob = np.zeros((64, 48), np.uint8)
    blob[10:40, 5:30] = 1
    out.append(blob)
    return out


def test_native_builds():
    assert rle.native_available(), "cc should be present in this image"


def test_encode_decode_roundtrip(masks):
    for m in masks:
        counts = rle.encode(m)
        back = rle.decode(counts, *m.shape)
        np.testing.assert_array_equal(back, m)


def test_string_roundtrip(masks):
    for m in masks:
        counts = rle.encode(m)
        s = rle.to_string(counts)
        counts2 = rle.from_string(s)
        np.testing.assert_array_equal(counts, counts2)
        np.testing.assert_array_equal(rle.decode(counts2, *m.shape), m)


def test_native_matches_numpy_twin(masks, monkeypatch):
    for m in masks:
        c_native = rle.encode(m)
        s_native = rle.to_string(c_native)
        a_native = rle.area(c_native)
        d_native = rle.decode(c_native, *m.shape)

        monkeypatch.setattr(rle, "_lib", None)
        monkeypatch.setattr(rle, "_lib_failed", True)  # force numpy path
        c_np = rle.encode(m)
        np.testing.assert_array_equal(c_native, c_np)
        np.testing.assert_array_equal(rle.to_string(c_np), np.frombuffer(s_native, np.uint8).tobytes())
        assert rle.area(c_np) == a_native == int(m.sum())
        np.testing.assert_array_equal(rle.decode(c_np, *m.shape), d_native)
        monkeypatch.undo()


def test_column_major_convention():
    # 2x3 mask with a single pixel at (row 1, col 0): column-major flat
    # stream is [0,1,0,0,0,0] -> counts [1,1,4]
    m = np.zeros((2, 3), np.uint8)
    m[1, 0] = 1
    counts = rle.encode(m)
    np.testing.assert_array_equal(counts, [1, 1, 4])


def test_decode_coco_dict():
    m = np.zeros((5, 4), np.uint8)
    m[2:4, 1:3] = 1
    counts = rle.encode(m)
    obj = {"size": [5, 4], "counts": rle.to_string(counts)}
    np.testing.assert_array_equal(rle.decode_coco(obj), m)
    obj2 = {"size": [5, 4], "counts": [int(c) for c in counts]}
    np.testing.assert_array_equal(rle.decode_coco(obj2), m)


def test_merge_and_malformed():
    a = np.zeros((4, 4), np.uint8)
    a[0, 0] = 1
    b = np.zeros((4, 4), np.uint8)
    b[3, 3] = 1
    u = rle.merge([a, b])
    assert u.sum() == 2 and u[0, 0] == 1 and u[3, 3] == 1
    with pytest.raises(ValueError):
        rle.decode(np.asarray([3, 2], np.uint32), 4, 4)  # doesn't cover 16
