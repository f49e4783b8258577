"""Native `.tpr` record container: writer/reader round-trip, native vs
pure-Python twin parity, the pre-padded fast feed path vs the HDF5 feed
(bit-identical batches), shard semantics, and malformed-file errors.

The format replaces HDF5 on the training feed's hot path because HDF5
inflates behind a single lock (SURVEY.md §2.3 data plane;
BASELINE.md round-3 feed audit); `native/feed.cpp` decompresses batches
with C++ threads straight into the batch arrays."""

import dataclasses
import json
import os
import struct
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from tpupose.config import DEFAULT, AugmentConfig, TrainConfig
from tpupose.data import hdf5 as hdf5_io
from tpupose.data import pipeline, tpr


def _samples(n=8, h=96, w=112, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        p = int(rng.integers(1, 4))
        out.append({
            "image": rng.integers(0, 255, (h, w, 3), dtype=np.uint8),
            "mask": rng.integers(0, 255, (h, w), dtype=np.uint8),
            "joints": rng.uniform(0, w, (p, 18, 3)).astype(np.float32),
            "center": rng.uniform(0, w, 2).astype(np.float32),
            "scale_provided": np.float32(rng.uniform(0.4, 1.2)),
            "areas": rng.uniform(50, 500, p).astype(np.float32),
        })
    return out


def _assert_sample_equal(a, b):
    np.testing.assert_array_equal(a["image"], b["image"])
    np.testing.assert_array_equal(a["mask"], b["mask"])
    np.testing.assert_allclose(a["joints"], b["joints"], atol=1e-6)
    np.testing.assert_allclose(a["center"], b["center"], atol=1e-6)
    np.testing.assert_allclose(
        float(a["scale_provided"]), float(b["scale_provided"]), atol=1e-6
    )
    np.testing.assert_allclose(a["areas"], b["areas"], atol=1e-4)


@pytest.mark.parametrize("compression", ["zlib", "none"])
def test_roundtrip(tmp_path, compression):
    path = str(tmp_path / "ds.tpr")
    samples = _samples()
    n = tpr.write_samples(path, samples, compression=compression)
    assert n == len(samples) == tpr.num_samples(path)
    back = list(tpr.read_samples(path))
    for a, b in zip(samples, back):
        _assert_sample_equal(a, b)


def test_native_vs_python_twin(tmp_path, monkeypatch):
    """The C++ reader and the mmap+zlib Python twin must agree byte-for-
    byte on the same file (the data/rle.py twin pattern)."""
    path = str(tmp_path / "ds.tpr")
    samples = _samples(seed=3)
    tpr.write_samples(path, samples)

    native = list(tpr.read_samples(path))
    monkeypatch.setenv("TPUPOSE_NO_NATIVE_FEED", "1")
    twin = list(tpr.read_samples(path))
    for a, b in zip(native, twin):
        _assert_sample_equal(a, b)

    # batch API parity too
    r_twin = tpr.TprReader(path)
    assert r_twin._py is not None  # env var actually forced the twin
    monkeypatch.delenv("TPUPOSE_NO_NATIVE_FEED")
    r_nat = tpr.TprReader(path)
    h, w = r_nat.dims(0)
    idx = np.asarray([3, 0, 2], np.uint64)
    img_a = np.zeros((3, h, w, 3), np.uint8)
    msk_a = np.zeros((3, h, w), np.uint8)
    img_b = np.zeros_like(img_a)
    msk_b = np.zeros_like(msk_a)
    r_nat.read_batch_into(idx, img_a, msk_a, threads=3)
    r_twin.read_batch_into(idx, img_b, msk_b)
    np.testing.assert_array_equal(img_a, img_b)
    np.testing.assert_array_equal(msk_a, msk_b)
    r_nat.close()
    r_twin.close()


def test_shuffle_and_static_flag(tmp_path):
    path = str(tmp_path / "ds.tpr")
    tpr.write_samples(path, _samples(n=12))
    with tpr.TprReader(path) as r:
        assert r.static_shapes  # all records share (96, 112)
    plain = [s["image"].sum() for s in tpr.read_samples(path)]
    shuffled = [s["image"].sum() for s in tpr.read_samples(path,
                                                           shuffle_seed=4)]
    assert sorted(plain) == sorted(shuffled) and plain != shuffled

    mixed = _samples(n=2) + _samples(n=2, h=64, w=64, seed=9)
    path2 = str(tmp_path / "mixed.tpr")
    tpr.write_samples(path2, mixed)
    with tpr.TprReader(path2) as r:
        assert not r.static_shapes


def test_malformed_files(tmp_path):
    bad = tmp_path / "bad.tpr"
    bad.write_bytes(b"not a tpr file at all, just bytes")
    with pytest.raises(ValueError, match="malformed|cannot open"):
        tpr.TprReader(str(bad))

    # valid header, index pointing past EOF
    trunc = tmp_path / "trunc.tpr"
    trunc.write_bytes(tpr.HEADER.pack(tpr.MAGIC, 0, 0, 10, 1 << 40))
    with pytest.raises(ValueError, match="malformed|cannot open"):
        tpr.TprReader(str(trunc))

    # corrupt a zlib stream in a valid file -> inflate error on read
    path = str(tmp_path / "ok.tpr")
    tpr.write_samples(path, _samples(n=2))
    with tpr.TprReader(path) as r:
        e0 = (r._py._entries[0] if r._py is not None else None)
    raw = bytearray(open(path, "rb").read())
    # image blob of record 0 starts right after the header
    start = tpr.HEADER.size
    raw[start + 8:start + 16] = b"\xff" * 8
    open(path, "wb").write(bytes(raw))
    with tpr.TprReader(path) as r:
        with pytest.raises(ValueError, match="inflate|malformed"):
            r.read(0)


def test_geometry_size_invariant(tmp_path):
    """A corrupted index entry whose raw sizes exceed its (h, w)
    geometry must be rejected BEFORE decompression — readers size their
    buffers from the geometry, so this is the buffer-overflow guard in
    native/feed.cpp::tpf_read (and the twin's mirror)."""
    path = str(tmp_path / "ds.tpr")
    tpr.write_samples(path, _samples(n=2, h=32, w=32))
    raw = bytearray(open(path, "rb").read())
    magic, flags, _, count, index_off = tpr.HEADER.unpack_from(raw, 0)
    e = list(tpr.ENTRY.unpack_from(raw, index_off))
    e[8], e[9] = 4, 4               # shrink geometry, keep raw sizes
    tpr.ENTRY.pack_into(raw, index_off, *e)
    open(path, "wb").write(bytes(raw))
    for env in ({}, {"TPUPOSE_NO_NATIVE_FEED": "1"}):
        for k, v in env.items():
            os.environ[k] = v
        try:
            with tpr.TprReader(path) as r:
                with pytest.raises(ValueError, match="malformed"):
                    r.read(0)
                buf = np.zeros((1, 4, 4, 3), np.uint8)
                with pytest.raises(ValueError):
                    r.read_batch_into([0], buf, None)
        finally:
            for k in env:
                os.environ.pop(k, None)


def test_prepadded_feed_matches_hdf5(tmp_path):
    """pack_tpr --pre-pad + tpr_batches fast path must yield batches
    bit-identical to the HDF5 feed (same shuffle seed, same shard)."""
    h5 = str(tmp_path / "ds.h5")
    env = {**os.environ, "PYTHONPATH": REPO, "JAX_PLATFORMS": "cpu"}
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/make_synthetic_dataset.py"),
         "--output", h5, "--count", "10", "--size", "150", "--seed", "2"],
        check=True, env=env, capture_output=True,
    )
    tp = str(tmp_path / "ds368.tpr")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/pack_tpr.py"),
         "--input", h5, "--output", tp,
         "--pre-pad", "368", "368", "--max-persons", "8"],
        check=True, env=env, capture_output=True,
    )
    cfg = dataclasses.replace(
        DEFAULT, train=TrainConfig(batch_size=4),
        augment=AugmentConfig(max_persons=8),
    )
    ref = list(pipeline.hdf5_batches(h5, cfg, epochs=1, num_workers=1))
    fast = list(pipeline.dataset_batches(tp, cfg, epochs=1))
    assert len(ref) == len(fast) > 0
    for a, b in zip(ref, fast):
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]),
                                          np.asarray(b[k]), err_msg=k)

    # shard slices agree with the hdf5 contract
    r0 = list(pipeline.hdf5_batches(h5, cfg, epochs=1, shard=(0, 2),
                                    num_workers=1))
    f0 = list(pipeline.dataset_batches(tp, cfg, epochs=1, shard=(0, 2)))
    f1 = list(pipeline.dataset_batches(tp, cfg, epochs=1, shard=(1, 2)))
    assert len(r0) == len(f0) == len(f1)
    for a, b in zip(r0, f0):
        np.testing.assert_array_equal(a["images"], b["images"])

    # generic (non-prepadded) tpr path agrees as well
    tp2 = str(tmp_path / "ds.tpr")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/pack_tpr.py"),
         "--input", h5, "--output", tp2],
        check=True, env=env, capture_output=True,
    )
    generic = list(pipeline.dataset_batches(tp2, cfg, epochs=1,
                                            num_workers=1))
    for a, b in zip(ref, generic):
        np.testing.assert_array_equal(a["images"], b["images"])


def test_feed_errors(tmp_path):
    cfg = dataclasses.replace(
        DEFAULT, train=TrainConfig(batch_size=4),
        augment=AugmentConfig(max_persons=8),
    )
    path = str(tmp_path / "small.tpr")
    tpr.write_samples(path, _samples(n=3))
    with pytest.raises(ValueError, match="fewer records"):
        pipeline.tpr_batches(path, cfg, shard=(0, 8))
    empty = str(tmp_path / "empty.tpr")
    tpr.write_samples(empty, [])
    with pytest.raises(ValueError, match="empty"):
        pipeline.tpr_batches(empty, cfg)


def _read_index(path):
    """Parse the file's index table -> list of entry tuples."""
    raw = open(path, "rb").read()
    _, _, _, count, index_off = tpr.HEADER.unpack_from(raw, 0)
    return raw, [
        tpr.ENTRY.unpack_from(raw, index_off + i * tpr.ENTRY.size)
        for i in range(count)
    ], index_off


@pytest.mark.parametrize("native", [True, False])
@pytest.mark.parametrize("compression", ["zlib", "none"])
def test_crc_detects_payload_corruption(tmp_path, monkeypatch, native,
                                        compression):
    """A byte flip inside an image/mask payload must raise, never return
    plausible wrong pixels — the round-3 fuzz documented raw-codec flips
    (and zlib-happy flips) passing silently; the per-payload crc32 in the
    entry's reserved field closes that."""
    if not native:
        monkeypatch.setenv("TPUPOSE_NO_NATIVE_FEED", "1")
    elif not tpr.native_available():
        pytest.skip("no native feed")
    path = str(tmp_path / "c.tpr")
    samples = _samples(n=4, seed=3)
    tpr.write_samples(path, samples, compression=compression)
    good, entries, _ = _read_index(path)
    rng = np.random.default_rng(0)
    for i, e in enumerate(entries):
        for off, csize in ((e[0], e[1]), (e[3], e[4])):  # img, mask blobs
            raw = bytearray(good)
            pos = off + int(rng.integers(0, csize))
            raw[pos] ^= 0xFF
            open(path, "wb").write(bytes(raw))
            with tpr.TprReader(path) as r:
                try:
                    img, mask = r.read(i)
                except ValueError:
                    continue  # detected: crc mismatch or inflate failure
                # undetected read must still be bit-correct (impossible for
                # crc32 + a single byte flip — this is the hard assert)
                np.testing.assert_array_equal(img, samples[i]["image"])
                np.testing.assert_array_equal(mask, samples[i]["mask"])
                raise AssertionError("flip neither detected nor corrected")


def test_pre_crc_files_still_read(tmp_path):
    """reserved=0 means 'unchecked': files written before the crc field
    existed (or by third-party writers) keep reading — v01 compatible."""
    path = str(tmp_path / "old.tpr")
    samples = _samples(n=3, seed=5)
    tpr.write_samples(path, samples)
    good, entries, index_off = _read_index(path)
    raw = bytearray(good)
    for i, e in enumerate(entries):  # zero every reserved field
        tpr.ENTRY.pack_into(raw, index_off + i * tpr.ENTRY.size,
                            *e[:12], 0)
    open(path, "wb").write(bytes(raw))
    for i, back in enumerate(tpr.read_samples(path)):
        _assert_sample_equal(back, samples[i])


def test_corruption_fuzz(tmp_path):
    """Random byte corruption anywhere in the file must produce clean
    ValueErrors or (for payload-region flips that keep zlib happy)
    plausible data — NEVER a crash of the native reader. Every offset
    class is hit: header, payloads, index. (Payload flips are now also
    *detected* via the per-payload crc32 — test_crc_detects_payload_
    corruption asserts that; this fuzz keeps the no-crash contract.)"""
    path = str(tmp_path / "fuzz.tpr")
    tpr.write_samples(path, _samples(n=6, seed=1))
    good = open(path, "rb").read()
    rng = np.random.default_rng(0)
    for trial in range(60):
        raw = bytearray(good)
        for _ in range(int(rng.integers(1, 8))):
            pos = int(rng.integers(0, len(raw)))
            raw[pos] = int(rng.integers(0, 256))
        open(path, "wb").write(bytes(raw))
        try:
            with tpr.TprReader(path) as r:
                for i in range(min(r.count, 6)):
                    img, mask = r.read(i)
                    r.meta(i)
                if 0 < r.count <= 6:
                    h, w = r.dims(0)
                    if all(r.dims(i) == (h, w) for i in range(r.count)):
                        imgs = np.zeros((r.count, h, w, 3), np.uint8)
                        r.read_batch_into(np.arange(r.count), imgs, None,
                                          threads=3)
        except (ValueError, MemoryError, json.JSONDecodeError,
                UnicodeDecodeError, OverflowError):
            pass  # clean rejection is the contract


def test_concurrent_readers_are_thread_safe(tmp_path):
    """The native reader is read-only over an mmap: concurrent reads
    from many Python threads (each releasing the GIL into the C
    library) must return bit-identical data."""
    import concurrent.futures

    path = str(tmp_path / "mt.tpr")
    samples = _samples(n=10, seed=7)
    tpr.write_samples(path, samples)
    with tpr.TprReader(path) as r:
        def job(k):
            i = k % len(samples)
            img, mask = r.read(i)
            return i, img, mask

        with concurrent.futures.ThreadPoolExecutor(8) as pool:
            for i, img, mask in pool.map(job, range(80)):
                np.testing.assert_array_equal(img, samples[i]["image"])
                np.testing.assert_array_equal(mask, samples[i]["mask"])


def _prepad_tpr(tmp_path, size=64, count=8, persons=3):
    h5 = str(tmp_path / "src.h5")
    env = {**os.environ, "PYTHONPATH": REPO, "JAX_PLATFORMS": "cpu"}
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/make_synthetic_dataset.py"),
         "--output", h5, "--count", str(count), "--size", str(size),
         "--seed", "11"],
        check=True, env=env, capture_output=True,
    )
    tp = str(tmp_path / "src.tpr")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/pack_tpr.py"),
         "--input", h5, "--output", tp,
         "--pre-pad", str(size), str(size), "--max-persons", str(persons)],
        check=True, env=env, capture_output=True,
    )
    return tp


def test_feed_state_roundtrip(tmp_path):
    """TprBatches is checkpointable (the Grain duck-type): consuming K
    batches, saving state, and resuming in a fresh feed must continue
    the exact uninterrupted sequence across an epoch boundary."""
    from tpupose.data.grain_pipeline import is_checkpointable

    tp = _prepad_tpr(tmp_path)
    cfg = dataclasses.replace(
        DEFAULT, train=TrainConfig(batch_size=2),
        augment=AugmentConfig(max_persons=3),
    )

    def mk():
        return pipeline.dataset_batches(tp, cfg, target_h=64, target_w=64,
                                        epochs=3)

    feed = mk()
    assert is_checkpointable(feed)
    ref = [next(feed) for _ in range(15)]
    feed.close()

    feed = mk()
    head = [next(feed) for _ in range(7)]
    state = feed.get_state()
    feed.close()
    feed = mk()
    feed.set_state(state)
    tail = [next(feed) for _ in range(8)]
    feed.close()
    for a, b in zip(ref, head + tail):
        np.testing.assert_array_equal(a["images"], b["images"])
        np.testing.assert_array_equal(a["joints"], b["joints"])

    exhausted = list(pipeline.dataset_batches(tp, cfg, target_h=64,
                                              target_w=64, epochs=1))
    with tpr.TprReader(tp) as r:
        assert len(exhausted) == r.count // 2


def test_train_loop_resumes_tpr_data_position(tmp_path):
    """End-to-end: a preempted tpr-fed train run resumes from both the
    model step AND the data position (same contract as the Grain feed,
    tests/test_grain_pipeline.py)."""
    from tpupose.config import ModelConfig, PoseConfig
    from tpupose.training import loop

    tp = _prepad_tpr(tmp_path)
    cfg = PoseConfig(
        model=ModelConfig(num_stages=1),
        train=TrainConfig(batch_size=2, base_lr=1e-5, checkpoint_every=2,
                          log_every=10, max_steps=100),
        augment=AugmentConfig(max_persons=3),
    )

    consumed: list[tuple] = []

    class Spy(pipeline.TprBatches):
        def __next__(self):
            b = super().__next__()
            consumed.append(tuple(np.round(b["scales"], 4).tolist()))
            return b

    def mk():
        inner = pipeline.dataset_batches(tp, cfg, target_h=64, target_w=64,
                                         epochs=10, shuffle_seed=9)
        inner.__class__ = Spy
        return inner

    workdir = str(tmp_path / "run")
    loop.train(cfg, mk(), workdir=workdir, max_steps=2, use_mesh=False)
    first = list(consumed)
    assert len(first) == 2
    loop.train(cfg, mk(), workdir=workdir, max_steps=4, use_mesh=False)
    resumed = consumed[len(first):]
    assert len(resumed) == 2

    consumed.clear()
    feed = mk()
    uninterrupted = [next(feed) and consumed[-1] for _ in range(4)]
    feed.close()
    assert first + resumed == uninterrupted


def test_closed_reader_and_exhausted_feed(tmp_path):
    """A closed reader must raise (never hand a NULL handle to the C
    library), and a drained TprBatches must keep raising StopIteration
    instead of blocking on its empty queue."""
    path = str(tmp_path / "ds.tpr")
    tpr.write_samples(path, _samples(n=4))
    r = tpr.TprReader(path)
    r.close()
    buf = np.zeros((1, 96, 112, 3), np.uint8)
    for call in (lambda: r.read(0), lambda: r.meta(0), lambda: r.dims(0),
                 lambda: r.read_batch_into([0], buf, None)):
        with pytest.raises(ValueError, match="closed"):
            call()

    tp = _prepad_tpr(tmp_path)
    cfg = dataclasses.replace(
        DEFAULT, train=TrainConfig(batch_size=2),
        augment=AugmentConfig(max_persons=3),
    )
    feed = pipeline.dataset_batches(tp, cfg, target_h=64, target_w=64,
                                    epochs=1)
    n = sum(1 for _ in feed)
    assert n > 0
    for _ in range(3):
        with pytest.raises(StopIteration):
            next(feed)
    # set_state revives an exhausted feed
    feed.set_state(b'{"epoch": 0, "offset": 0}')
    assert next(feed)["images"].shape[0] == 2
    feed.close()


def test_read_batch_into_validation(tmp_path):
    path = str(tmp_path / "ds.tpr")
    tpr.write_samples(path, _samples(n=4))
    with tpr.TprReader(path) as r:
        h, w = r.dims(0)
        good = np.zeros((2, h, w, 3), np.uint8)
        with pytest.raises(ValueError):
            r.read_batch_into([0, 1, 2], good, None)      # leading axis < n
        with pytest.raises(ValueError):
            r.read_batch_into([0], np.zeros((1, h, w, 3), np.float32), None)
        with pytest.raises(ValueError, match="out of range|index"):
            r.read_batch_into([99], good[:1], None)
