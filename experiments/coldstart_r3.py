"""Serving cold-start with the persistent compilation cache (round 3).

Two fresh subprocesses build the same single-scale serving program
against the same cache directory: the first pays the real XLA compile,
the second should reload the executable from disk. Reports
time-to-first-response for both.

Usage: python experiments/coldstart_r3.py
"""

import os
import shutil
import subprocess
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys, time
import numpy as np
t0 = time.perf_counter()
from tpupose.config import with_scales
from tpupose.infer import PoseEstimator
est = PoseEstimator(with_scales((1.0,)))
img = np.full((8, 368, 368, 3), 128, np.uint8)
t1 = time.perf_counter()
est.process_batch(img)          # compile (or cache reload) + run
t2 = time.perf_counter()
est.process_batch(img)          # warm dispatch
t3 = time.perf_counter()
print(f"import+init {t1-t0:6.1f}s  first-batch {t2-t1:6.1f}s  "
      f"steady {t3-t2:6.2f}s", flush=True)
"""


def run_child(cache_dir: str) -> str:
    env = dict(os.environ)
    env["TPUPOSE_COMPILE_CACHE"] = cache_dir
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, "-u", "-c", CHILD], capture_output=True, text=True,
        env=env, timeout=4000,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    return out.stdout.strip().splitlines()[-1]


if __name__ == "__main__":
    cache = tempfile.mkdtemp(prefix="tpupose_coldstart_cache_")
    try:
        print("cold (empty cache):", run_child(cache), flush=True)
        print("warm (cached)     :", run_child(cache), flush=True)
    finally:
        shutil.rmtree(cache, ignore_errors=True)
