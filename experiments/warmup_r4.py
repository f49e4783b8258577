"""serve --warmup evidence: what cold-start costs a live request, and
that warmup moves that cost off the request path.

One process, one estimator, the serving bucket ladder's 368x368 canvas:

  1. ``warmup_estimator`` compiles each (bucket x pow2-batch) program,
     logging each compile's wall time — the latency a LIVE request
     would have paid on a cold server (each program compiles exactly
     once per process; warmup runs the same ``process_batch`` call the
     micro-batcher dispatches, so the jit-cache keys match —
     tests/test_serve.py::test_warmup_covers_every_batcher_program).
  2. A real request then rides MicroBatcher.submit against the warmed
     estimator — the steady-state latency, orders of magnitude under
     the compile times above and safely inside any sane
     --request-timeout-s.

Run (chip):  PYTHONPATH=. python experiments/warmup_r4.py
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np

from tpupose.config import with_scales
from tpupose.infer import PoseEstimator
from tpupose.serve import MicroBatcher, warmup_estimator

BUCKETS = ((368, 368),)
MAX_BATCH = 8


def main() -> None:
    import jax

    print("devices:", jax.devices())
    est = PoseEstimator(cfg=with_scales((1.0,)))

    compile_times: list[float] = []

    def log(msg: str) -> None:
        print(msg, flush=True)
        compile_times.append(float(msg.split(":")[-1].rstrip("s")))

    t0 = time.perf_counter()
    n = warmup_estimator(est, BUCKETS, max_batch=MAX_BATCH, log=log)
    t_warm = time.perf_counter() - t0
    print(f"warmed {n} programs in {t_warm:.1f}s "
          f"(max single compile {max(compile_times):.1f}s)")

    mb = MicroBatcher(est, max_batch=MAX_BATCH, window_ms=2.0,
                      buckets=BUCKETS)
    try:
        rng = np.random.default_rng(0)
        lat = []
        for i in range(12):
            img = (rng.random((300, 340, 3)) * 255).astype(np.uint8)
            t = time.perf_counter()
            mb.submit(img, timeout_s=30.0)
            lat.append(time.perf_counter() - t)
        lat_ms = sorted(1e3 * x for x in lat)
        print(f"post-warmup request latency ms: first={1e3 * lat[0]:.1f} "
              f"p50={lat_ms[len(lat_ms) // 2]:.1f} max={lat_ms[-1]:.1f}")
        print(f"cold-vs-warm: an unwarmed server's first request pays "
              f"{min(compile_times):.0f}-{max(compile_times):.0f}s of "
              f"compile; warmed, the first request took "
              f"{1e3 * lat[0]:.0f} ms")
    finally:
        mb.close()


if __name__ == "__main__":
    main()
