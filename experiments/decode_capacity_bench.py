"""Isolate the single-scale throughput regression: scan capacity effect."""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpupose import topology
from tpupose.benchmark import synthetic_scene
from tpupose.config import DEFAULT
from tpupose.infer import PoseEstimator
from tpupose.ops import image as image_ops


def stream_ips(est, batch, scales, n=16):
    for _ in est.stream([batch] * 3, scales=scales):
        pass
    t0 = time.perf_counter()
    done = 0
    for people in est.stream([batch] * n, scales=scales):
        done += len(people)
    return done / (time.perf_counter() - t0)


def main():
    print("backend:", jax.default_backend(), flush=True)
    image, _, _ = synthetic_scene()
    batch = np.stack([image] * 8)

    for cap, conns in ((256, 96), (96, 96), (256, 48), (96, 48)):
        cfg = dataclasses.replace(
            DEFAULT,
            inference=dataclasses.replace(
                DEFAULT.inference,
                scan_people_capacity=cap,
                max_connections=conns,
            ),
        )
        est = PoseEstimator(cfg)
        ips = stream_ips(est, batch, (1.0,))
        print(f"cap={cap} conns={conns}: single-scale {ips:.2f} img/s", flush=True)

    # maps-only ceiling (no decode): forward + upsample + transfer
    est = PoseEstimator(DEFAULT)
    model, mcfg = est.model, est.cfg.model
    (rh, rw, _, _) = image_ops.scale_sizes(368, 368, (1.0,), 368, 8)[0]

    @jax.jit
    def maps_only(params, imgs):
        x = image_ops.normalize(imgs)
        x = image_ops.resize_bilinear(x, rh, rw)
        x, _ = image_ops.pad_right_down(x, 8, image_ops.PAD_NORM)
        paf, heat = model.apply({"params": params}, x)[-1]
        return jnp.sum(paf) + jnp.sum(heat)

    b = jnp.asarray(batch)
    _ = float(maps_only(est.params, b))
    t0 = time.perf_counter()
    pending = []
    for _ in range(16):
        pending.append(maps_only(est.params, b))
    _ = [float(p) for p in pending]
    dt = time.perf_counter() - t0
    print(f"maps-only fwd (batch 8, pipelined): {16*8/dt:.2f} img/s", flush=True)


if __name__ == "__main__":
    main()
