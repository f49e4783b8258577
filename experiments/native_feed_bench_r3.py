"""Native `.tpr` feed vs the HDF5 thread feed, records/s on the host.

Round-3 follow-through on the feed audit (`feed_bench_r3.py`): HDF5
inflate is single-threaded behind h5py's lock (lzf ~185 rec/s vs the
151 samples/s batch-16 train step). `native/feed.cpp` mmaps the
framework's own `.tpr` container and inflates whole batches with C++
threads directly into the batch arrays; pre-padded files also delete
the per-sample cv2 pad/stack work. This measures:

  hdf5_lzf / hdf5_none     — the round-3 baseline feeds
  tpr_zlib_t{1,4,8}        — pre-padded .tpr fast path by thread count
  tpr_raw_t8               — uncompressed .tpr (mmap-speed ceiling)
  tpr_generic              — non-prepadded .tpr through pad_sample

Run: PYTHONPATH=. JAX_PLATFORMS=cpu python experiments/native_feed_bench_r3.py
"""

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

from tpupose.config import AugmentConfig, PoseConfig, TrainConfig
from tpupose.data import hdf5 as hdf5_io, pipeline

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_RECORDS = 192
BATCH = 16
H = W = 368


def build_h5(path: str, compression) -> None:
    rng = np.random.default_rng(0)
    with hdf5_io.SampleWriter(path, compression=compression) as w:
        for i in range(N_RECORDS):
            img = rng.integers(0, 255, (H, W, 3), np.uint8)
            mask = np.ones((H, W), np.float32)
            joints = rng.uniform(10, 350, (3, 18, 3)).astype(np.float32)
            joints[..., 2] = 1.0
            w.add(img, mask, joints, np.float32([W / 2, H / 2]),
                  np.float32(0.8 + i / 1000))


def pack(src: str, dst: str, *extra: str) -> None:
    subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools/pack_tpr.py"),
         "--input", src, "--output", dst, *extra],
        check=True, env={**os.environ, "PYTHONPATH": ROOT},
        capture_output=True,
    )


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
    results: dict = {}

    h5 = {}
    for codec in ("lzf", None):
        name = codec or "none"
        h5[name] = os.path.join(tmp, f"feed_{name}.h5")
        build_h5(h5[name], codec)
        results[f"hdf5_{name}"] = drain(
            pipeline.hdf5_batches(h5[name], cfg, epochs=4, shuffle_seed=0),
            n_batches,
        )

    tpr_pad = os.path.join(tmp, "feed_pad.tpr")
    pack(h5["lzf"], tpr_pad, "--pre-pad", str(H), str(W))
    for t in (1, 4, 8):
        results[f"tpr_zlib_t{t}"] = drain(
            pipeline.tpr_batches(tpr_pad, cfg, epochs=4, shuffle_seed=0,
                                 threads=t),
            n_batches,
        )
    results["tpr_zlib_mb"] = os.path.getsize(tpr_pad) / 1e6

    tpr_raw = os.path.join(tmp, "feed_raw.tpr")
    pack(h5["lzf"], tpr_raw, "--pre-pad", str(H), str(W),
         "--compression", "none")
    results["tpr_raw_t8"] = drain(
        pipeline.tpr_batches(tpr_raw, cfg, epochs=4, shuffle_seed=0,
                             threads=8),
        n_batches,
    )
    results["tpr_raw_mb"] = os.path.getsize(tpr_raw) / 1e6

    tpr_gen = os.path.join(tmp, "feed_gen.tpr")
    pack(h5["lzf"], tpr_gen)
    results["tpr_generic"] = drain(
        pipeline.dataset_batches(tpr_gen, cfg, epochs=4, shuffle_seed=0),
        n_batches,
    )

    results = {k: round(v, 1) for k, v in results.items()}
    results["train_step_samples_per_s"] = 151  # batch-16 on-chip rate
    print(json.dumps(results))


if __name__ == "__main__":
    main()
