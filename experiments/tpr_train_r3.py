"""On-chip training throughput by feed: HDF5 thread feed vs native .tpr.

The batch-32 train step computes at ~156 samples/s (BASELINE.md round
3); the HDF5-lzf feed reads ~185 records/s uncontended and drops well
below that on a loaded host — i.e. the reference-format feed can leave
the chip input-bound exactly when it matters. This trains the real
model on the chip (full on-device aug+GT+fwd+bwd+update) from both
feeds and reports achieved samples/s, plus each feed's standalone read
rate in the same session for the input-bound diagnosis.

Run (chip): PYTHONPATH=. python experiments/tpr_train_r3.py
"""

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

N_RECORDS = 640
BATCH = 32
STEPS = 120
H = W = 368


def build_h5(path: str) -> None:
    from tpupose.data import hdf5 as hdf5_io

    rng = np.random.default_rng(0)
    with hdf5_io.SampleWriter(path, compression="lzf") as w:
        for i in range(N_RECORDS):
            img = rng.integers(0, 255, (H, W, 3), np.uint8)
            mask = np.ones((H, W), np.float32)
            joints = rng.uniform(10, 350, (3, 18, 3)).astype(np.float32)
            joints[..., 2] = 1.0
            w.add(img, mask, joints, np.float32([W / 2, H / 2]),
                  np.float32(0.8 + i / 1000))


def feed_rate(feed, n_batches: int) -> float:
    it = iter(feed)
    next(it)
    t0 = time.perf_counter()
    for _ in range(n_batches):
        next(it)
    return n_batches * BATCH / (time.perf_counter() - t0)


def train_rate(cfg, feed, workdir: str) -> dict:
    """Steady-state rate from the on_step log timestamps (log_every=10);
    the span from step 10 to the last log excludes compile + warmup.
    on_step fires after a device_get of that step's losses, so each
    timestamp marks true completion of the logged step."""
    from tpupose.training import loop

    marks: list[tuple[int, float]] = []

    def on_step(step, logged):
        marks.append((step, time.perf_counter()))

    t0 = time.time()
    out = loop.train(cfg, feed, workdir=workdir, max_steps=STEPS,
                     on_step=on_step)
    wall = time.time() - t0
    steady = [m for m in marks if m[0] >= 10]
    (s0, t_first), (s1, t_last) = steady[0], steady[-1]
    sps = (s1 - s0) / (t_last - t_first)
    return {
        "steady_steps_per_sec": round(sps, 3),
        "steady_samples_per_sec": round(sps * BATCH, 1),
        "wall_s": round(wall, 1),
        "loss": round(float(out["last_losses"]["total"]), 1),
    }


def main() -> None:
    import dataclasses

    import jax

    from tpupose.config import DEFAULT, TrainConfig
    from tpupose.data import pipeline

    print("backend:", jax.default_backend(), flush=True)
    tmp = tempfile.mkdtemp()
    h5 = os.path.join(tmp, "train.h5")
    build_h5(h5)
    tp = os.path.join(tmp, "train.tpr")
    subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools/pack_tpr.py"),
         "--input", h5, "--output", tp, "--pre-pad", str(H), str(W)],
        check=True, env={**os.environ, "PYTHONPATH": ROOT,
                         "JAX_PLATFORMS": "cpu"},
    )

    cfg = dataclasses.replace(
        DEFAULT,
        train=TrainConfig(batch_size=BATCH, base_lr=1e-5,
                          checkpoint_every=10**6, log_every=10),
    )
    results = {}

    # standalone read rates, same session/host conditions
    results["feed_only_hdf5_lzf_rps"] = round(
        feed_rate(pipeline.hdf5_batches(h5, cfg, epochs=None), 12), 1
    )
    results["feed_only_tpr_rps"] = round(
        feed_rate(pipeline.tpr_batches(tp, cfg, epochs=None), 12), 1
    )

    results["train_hdf5"] = train_rate(
        cfg, pipeline.hdf5_batches(h5, cfg, epochs=None),
        os.path.join(tmp, "wd_h5"),
    )
    results["train_tpr"] = train_rate(
        cfg, pipeline.tpr_batches(tp, cfg, epochs=None),
        os.path.join(tmp, "wd_tpr"),
    )
    results["batch"] = BATCH
    results["steps"] = STEPS
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
