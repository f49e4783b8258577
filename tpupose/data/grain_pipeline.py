"""Grain-backed training feed: deterministic, checkpointable, sharded.

SURVEY.md §2.3 names Grain as the data-plane replacement for the
reference's ZeroMQ sample server (C14/C15 — `py_rmpe_server.py` +
`DataGeneratorClient`). Throughput-wise the thread pipeline in
``data/pipeline.py`` is already ample (augmentation + GT rasterisation
run on-device inside the train step, so the host only reads/pads/stacks);
what Grain adds is *operational*:

  * a **checkpointable iterator** — ``get_state()/set_state()`` give
    exact mid-epoch resume after preemption (the thread pipeline, like
    the reference's generator, restarts the epoch from scratch);
  * deterministic, seeded global shuffle with epoch reshuffling;
  * first-class **shard options** for multi-host training (each process
    reads a disjoint record slice, same contract as
    ``pipeline.hdf5_batches(shard=...)``);
  * optional multiprocess record prep (``worker_count > 0``) for wide
    hosts, with spawn-safe lazily-opened HDF5 handles.

The yielded batches match the ``make_train_step`` contract exactly
(images/masks uint8, joints/centers/scales f32 — see
``pipeline.batch_samples``), so ``training.loop.train`` consumes either
feed unchanged; when the feed is a :class:`GrainBatches` the loop also
checkpoints/restores the iterator state alongside the model state
(``training/checkpoint.py``).
"""

from __future__ import annotations

import os
from typing import Any, Iterator

import numpy as np

from tpupose.config import PoseConfig
from tpupose.data import hdf5 as hdf5_io

try:  # grain is optional at import time; hdf5_grain_batches requires it
    import grain.python as _grain

    _MapBase: type = _grain.MapTransform
except Exception:  # pragma: no cover - grain always present in the image
    _MapBase = object


class Hdf5Source:
    """Random-access Grain data source over the packed-HDF5 dataset.

    Picklable (ships to spawned worker processes holding only the path);
    the h5py handle and the sorted key table are opened lazily per
    process — h5py handles must not cross a fork/spawn boundary.
    """

    def __init__(self, path: str):
        self._path = os.path.abspath(path)
        self._pid: int | None = None
        self._file = None
        self._keys: list[str] | None = None

    def _ensure_open(self):
        if self._file is None or self._pid != os.getpid():
            import h5py

            self._file = h5py.File(self._path, "r")
            self._keys = sorted(self._file["datum"].keys())
            self._pid = os.getpid()

    def __len__(self) -> int:
        self._ensure_open()
        return len(self._keys)

    def __getitem__(self, index: int) -> dict:
        self._ensure_open()
        return hdf5_io.parse_record(self._file["datum"][self._keys[index]])

    # grain embeds repr(data_source) in the serialized iterator state;
    # the default object repr carries a memory address, which would make
    # states from different processes spuriously distinct
    def __repr__(self) -> str:  # pragma: no cover - cosmetic
        return f"Hdf5Source({self._path!r})"

    def __getstate__(self):
        return {"path": self._path}

    def __setstate__(self, state):
        self._path = state["path"]
        self._pid = None
        self._file = None
        self._keys = None


class PadForBatch(_MapBase):
    """Per-sample pad/cast to the static batch contract (plural keys so
    Grain's Batch op stacks directly into ``make_train_step`` input).

    A module-level ``grain.MapTransform`` subclass so it pickles to
    spawned worker processes (``worker_count > 0``)."""

    def __init__(self, target_h: int, target_w: int, max_persons: int):
        self._h = target_h
        self._w = target_w
        self._p = max_persons

    def map(self, sample: dict) -> dict[str, np.ndarray]:
        p = hdf5_io.pad_sample(sample, self._h, self._w, self._p)
        return {
            "images": np.asarray(p["image"], np.uint8),
            "masks": np.round(p["mask"] * 255.0).astype(np.uint8),
            "joints": np.asarray(p["joints"], np.float32),
            "centers": np.asarray(p["center"], np.float32),
            "scales": np.float32(p["scale_provided"]),
        }


class GrainBatches:
    """Iterable over batches + the checkpointable iterator handle.

    ``training.loop.train`` duck-types on ``get_state``/``set_state`` to
    persist the data position in every checkpoint; ``iterator`` exposes
    the raw ``PyGrainDatasetIterator`` for Orbax's grain handler.
    """

    def __init__(self, loader):
        self._loader = loader
        self._it = iter(loader)

    @property
    def iterator(self):
        return self._it

    def __iter__(self) -> Iterator[dict[str, np.ndarray]]:
        return self

    def __next__(self) -> dict[str, np.ndarray]:
        return next(self._it)

    def get_state(self) -> bytes:
        return self._it.get_state()

    def set_state(self, state: bytes) -> None:
        self._it.set_state(state)


def _shard_options(shard: tuple[int, int] | str | None):
    import grain.python as grain

    if shard is None:
        return grain.NoSharding()
    if shard == "auto":
        return grain.ShardByJaxProcess(drop_remainder=True)
    s_idx, s_cnt = shard
    if not 0 <= s_idx < s_cnt:
        raise ValueError(f"bad shard {shard!r}")
    # drop_remainder: every shard sees num_records // count records per
    # epoch, keeping multi-host feeds in lockstep (a ragged shard would
    # leave one host inside a collective the others never enter)
    return grain.ShardOptions(
        shard_index=s_idx, shard_count=s_cnt, drop_remainder=True
    )


def hdf5_grain_batches(
    path: str,
    cfg: PoseConfig,
    target_h: int = 368,
    target_w: int = 368,
    epochs: int | None = None,
    shuffle_seed: int | None = 0,
    shard: tuple[int, int] | str | None = None,
    worker_count: int = 0,
    read_buffer: int = 8,
) -> GrainBatches:
    """The Grain training feed: packed HDF5 -> checkpointable batches.

    Mirrors ``pipeline.hdf5_batches``'s contract (same batch dict, same
    shard semantics, ``epochs=None`` = run forever) and additionally
    supports exact mid-epoch resume via ``GrainBatches.get_state``.
    ``worker_count=0`` preps records on the consumer thread (Grain still
    read-aheads ``read_buffer`` batches); ``worker_count>0`` spawns that
    many prep processes.
    """
    import grain.python as grain

    source = Hdf5Source(path)
    n = len(source)
    if shard == "auto":
        import jax

        if n < jax.process_count():
            raise ValueError(
                f"dataset {path!r} has fewer records ({n}) than processes"
            )
    sampler = grain.IndexSampler(
        num_records=n,
        shard_options=_shard_options(shard),
        shuffle=shuffle_seed is not None,
        seed=0 if shuffle_seed is None else shuffle_seed,
        num_epochs=epochs,
    )
    loader = grain.DataLoader(
        data_source=source,
        sampler=sampler,
        operations=[
            PadForBatch(target_h, target_w, cfg.augment.max_persons),
            grain.Batch(cfg.train.batch_size, drop_remainder=True),
        ],
        worker_count=worker_count,
        read_options=grain.ReadOptions(
            num_threads=max(1, min(16, read_buffer)),
            prefetch_buffer_size=read_buffer,
        ),
    )
    return GrainBatches(loader)


def is_checkpointable(batches: Any) -> bool:
    """Whether a feed supports exact-position checkpoint/resume."""
    return hasattr(batches, "get_state") and hasattr(batches, "set_state")
