"""Single-scale on-device throughput vs batch size (round-3 probe).

The bench's single-scale line runs batch 16 (381 img/s on-device,
~52 % model-FLOPs MFU). This sweeps the batch to see whether 32/64
push closer to the conv ceiling.

Usage: python experiments/single_scale_batch_r3.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpupose.benchmark import synthetic_scene
from tpupose.infer import PoseEstimator

if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    image, _, _ = synthetic_scene()
    est = PoseEstimator()
    for n in (8, 16, 32, 64):
        batch = np.stack([image] * n)
        fn = est._batch_fn(n, image.shape[0], image.shape[1], (1.0,))
        imgs = jnp.asarray(batch)
        out = fn(est.params, imgs)
        jax.device_get(out["cnt"].sum())
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(est.params, imgs)
        jax.device_get(out["cnt"].sum())
        dt = (time.perf_counter() - t0) / iters
        print(f"batch {n:3d}: {n/dt:7.1f} img/s on-device "
              f"({dt*1e3/n:5.2f} ms/img)", flush=True)
