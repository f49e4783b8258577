"""Round-3 probe: does a larger batch lift the 4-scale pyramid's MFU?

The per-conv profile (fwd_profile_r3.py) shows the small pyramid scales
run their stage convs at low MXU utilisation (23x23 spatial at batch 8);
batch is the only free axis that grows those ops. This times the FULL
fused 4-scale program (forwards + scale-space decode readout) with
device-resident inputs at batch 8/16/32 — pure compute ceiling, no
transfer (the wall bench stays batch 8: larger batches are
transfer-bound through the sandbox relay).

Usage: python experiments/pyramid_batch_r3.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from tpupose.config import DEFAULT
from tpupose.infer import PoseEstimator
from tpupose.utils.flops import PEAK_BF16_FLOPS, pyramid_flops

H = W = 368


def main():
    est = PoseEstimator(DEFAULT)
    fl = pyramid_flops(H, W, DEFAULT.inference.scale_search)
    rng = np.random.default_rng(0)
    for n in (8, 16, 32):
        imgs = rng.integers(0, 255, (n, H, W, 3), dtype=np.uint8)
        imgs_dev = jax.device_put(imgs)
        fn = est._batch_fn(n, H, W, DEFAULT.inference.scale_search)
        out = fn(est.params, imgs_dev)
        jax.device_get(jax.tree.leaves(out)[0])  # compile + sync
        t0 = time.perf_counter()
        iters = 10
        for _ in range(iters):
            out = fn(est.params, imgs_dev)
        jax.device_get(jax.tree.leaves(out)[0])
        dt = (time.perf_counter() - t0) / iters
        ips = n / dt
        mfu = ips * fl / PEAK_BF16_FLOPS * 100
        print(f"batch {n:2d}: {dt*1e3:7.1f} ms/batch  {ips:6.1f} img/s "
              f"on-device  MFU {mfu:4.1f} %", flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    main()
