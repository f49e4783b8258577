"""Host-side data-feed throughput: thread pipeline vs Grain feed, by codec.

The on-chip train step runs at ~151 samples/s (batch 16, BASELINE.md
round 3); the host feed must sustain more than that or training goes
input-bound. This measures records/s through both feeds on a realistic
368x368 packed dataset, CPU-only (the feed never touches the chip), and
sweeps the writer's HDF5 compression codec — decompression dominates
the read path, so the codec sets the feed ceiling.

Run: PYTHONPATH=. python experiments/feed_bench_r3.py
"""

import json
import os
import tempfile
import time

import numpy as np

from tpupose.config import AugmentConfig, PoseConfig, TrainConfig
from tpupose.data import hdf5 as hdf5_io, pipeline
from tpupose.data.grain_pipeline import hdf5_grain_batches

N_RECORDS = 192
BATCH = 16
H = W = 368


def build_dataset(path: str, compression) -> None:
    rng = np.random.default_rng(0)
    with hdf5_io.SampleWriter(path, compression=compression) as w:
        for i in range(N_RECORDS):
            img = rng.integers(0, 255, (H, W, 3), np.uint8)
            mask = np.ones((H, W), np.float32)
            joints = rng.uniform(10, 350, (3, 18, 3)).astype(np.float32)
            joints[..., 2] = 1.0
            w.add(img, mask, joints, np.float32([W / 2, H / 2]),
                  np.float32(0.8 + i / 1000))


def drain(feed, n_batches: int) -> float:
    it = iter(feed)
    next(it)  # warm: open files, fill prefetch
    t0 = time.perf_counter()
    for _ in range(n_batches):
        next(it)
    dt = time.perf_counter() - t0
    return n_batches * BATCH / dt


def main() -> None:
    tmp = tempfile.mkdtemp()
    cfg = PoseConfig(train=TrainConfig(batch_size=BATCH),
                     augment=AugmentConfig())
    n_batches = (3 * N_RECORDS) // BATCH - 2

    results = {}
    for codec in ("gzip", "lzf", None):
        name = codec or "none"
        path = os.path.join(tmp, f"feed_{name}.h5")
        build_dataset(path, codec)
        results[f"thread_{name}"] = drain(
            pipeline.hdf5_batches(path, cfg, epochs=4, shuffle_seed=0),
            n_batches,
        )
        results[f"file_mb_{name}"] = os.path.getsize(path) / 1e6

    # Grain feed on the default codec (lzf): consumer-thread prep vs
    # spawned prep workers (workers pay IPC for ~0.5 MB/record arrays)
    path = os.path.join(tmp, "feed_lzf.h5")
    for workers in (0, 2, 4):
        results[f"grain_lzf_w{workers}"] = drain(
            hdf5_grain_batches(path, cfg, epochs=4, shuffle_seed=0,
                               worker_count=workers),
            n_batches,
        )
    results = {k: round(v, 1) for k, v in results.items()}
    results["train_step_samples_per_s"] = 151  # batch-16 on-chip rate
    print(json.dumps(results))


if __name__ == "__main__":
    main()
