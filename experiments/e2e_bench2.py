"""End-to-end throughput after the two-tier decode."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax
from tpupose.benchmark import synthetic_scene
from tpupose.config import DEFAULT
from tpupose.infer import PoseEstimator

def stream_ips(est, batch, scales, n=16):
    for _ in est.stream([batch] * 3, scales=scales):
        pass
    t0 = time.perf_counter()
    done = 0
    for people in est.stream([batch] * n, scales=scales):
        done += len(people)
    return done / (time.perf_counter() - t0)

print("backend:", jax.default_backend(), flush=True)
image, _, _ = synthetic_scene()
batch = np.stack([image] * 8)
est = PoseEstimator(DEFAULT)
print(f"single-scale: {stream_ips(est, batch, (1.0,)):.2f} img/s", flush=True)
print(f"4-scale:      {stream_ips(est, batch, None, n=10):.2f} img/s", flush=True)
