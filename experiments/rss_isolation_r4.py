"""RSS-growth isolation (round-4 soak follow-up).

The TPU soak shows host RSS growing ~0.3 MB/image while the SAME
serving stack over a no-device stub holds RSS flat (serve_soak_r4.py
--fake-estimator).  This probe fills in the remaining cells of the
isolation matrix:

  mode=estimator  bare PoseEstimator.process_batch hot loop on the
                  default backend — no HTTP server, no batcher, no PNG
                  decode.  Growth here at the soak's per-image rate
                  clears the serving stack.
  mode=raw        pure jax device_put -> jit(matmul-ish) -> device_get
                  loop moving the same byte volume as an 8x368x368x3
                  batch — ZERO tpupose code.  Growth here pins the
                  leak on the runtime client / tunnel, not tpupose.
  mode=estimator with JAX_PLATFORMS=cpu
                  same tpupose host code over the local CPU backend —
                  flat RSS here is the complementary control.

Run:  PYTHONPATH=.:/root/.axon_site python experiments/rss_isolation_r4.py \
          [--ckpt DIR] [--mode estimator|raw] [--windows N] [--window-s S]
"""

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for ln in f:
            if ln.startswith("VmRSS"):
                return int(ln.split()[1]) / 1024.0
    return -1.0


def run_windows(step, batch_imgs, windows, window_s):
    t_start = time.perf_counter()
    recs = []
    for w in range(windows):
        n = 0
        t0 = time.perf_counter()
        while time.perf_counter() - t0 < window_s:
            step()
            n += 1
        rec = {"window": w, "elapsed_s": round(time.perf_counter() - t_start, 1),
               "batches": n,
               "img_per_s": round(batch_imgs * n / window_s, 1),
               "rss_mb": round(rss_mb(), 1)}
        recs.append(rec)
        print("window:", json.dumps(rec), flush=True)

    growth = recs[-1]["rss_mb"] - recs[0]["rss_mb"]
    imgs = sum(batch_imgs * r["batches"] for r in recs[1:])
    print(json.dumps({"rss_first_mb": recs[0]["rss_mb"],
                      "rss_last_mb": recs[-1]["rss_mb"],
                      "growth_mb": round(growth, 1),
                      "imgs_after_first_window": imgs,
                      "mb_per_img": round(growth / max(imgs, 1), 4)}),
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="/tmp/fl_base/checkpoints")
    ap.add_argument("--mode", choices=("estimator", "raw"), default="estimator")
    ap.add_argument("--windows", type=int, default=5)
    ap.add_argument("--window-s", type=float, default=30.0)
    args = ap.parse_args()

    import jax

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)

    if args.mode == "raw":
        import jax.numpy as jnp

        # same host->device byte volume as one 8x368x368x3 uint8 batch,
        # shaped for a single big matmul so the device side is trivial
        x = rng.integers(0, 255, (8 * 368 * 368 * 3 // 1024, 1024),
                         dtype=np.uint8)
        w = rng.normal(0, 1, (1024, 128)).astype(np.float32)
        f = jax.jit(lambda a, b: (a.astype(jnp.bfloat16) @ b.astype(jnp.bfloat16)).sum(0))
        w_dev = jax.device_put(w)

        def step():
            np.asarray(f(jax.device_put(x), w_dev))

        step()
        print("warm done, rss_mb:", round(rss_mb(), 1), flush=True)
        run_windows(step, 8, args.windows, args.window_s)
        return

    from tpupose.config import DEFAULT, single_scale
    from tpupose.infer import PoseEstimator
    from tpupose.training.checkpoint import restore_params

    params = restore_params(args.ckpt) if os.path.isdir(args.ckpt) else None
    est = PoseEstimator(single_scale(DEFAULT), params=params)

    batch = rng.integers(0, 255, (8, 368, 368, 3), dtype=np.uint8)
    est.process_batch(batch)  # compile + warm
    print("warm done, rss_mb:", round(rss_mb(), 1), flush=True)
    run_windows(lambda: est.process_batch(batch), 8, args.windows,
                args.window_s)


if __name__ == "__main__":
    main()
