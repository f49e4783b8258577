"""Round-3 forward-pass layer profile: where the ~28 % non-MXU time goes.

The 4-scale product path is forward-bound (~115 ms of the ~131 ms
on-device batch-8 program, ~72 % conv MFU).  Squeezing the headline
further requires knowing which conv shapes underperform the MXU peak.
This experiment times

  * every distinct conv shape in the network (jitted alone, scalar
    sync), at each pyramid scale's resolution, batch 8, bf16 — and its
    individual MFU;
  * the max-pools (bandwidth-bound, never counted in model FLOPs);
  * model segments (VGG, VGG+CPM, full N-stage) so the sum-of-parts can
    be compared with the fused whole (XLA fusion residual).

All timings chain dispatches and force one scalar device_get at the end
(axon relay: block_until_ready acknowledges dispatch, not completion).

Usage: python experiments/fwd_profile_r3.py [convs|segments|all]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpupose.models import OpenPose
from tpupose.utils.flops import PEAK_BF16_FLOPS, forward_flops

B = 8
# pyramid input sizes for a 368x368 image at scale_search (.5, 1, 1.5, 2)
SIZES = (184, 368, 552, 736)


def timed_scalar(fn, *args, steps=50):
    """Mean seconds per call of jitted fn returning a scalar."""
    out = fn(*args)
    jax.device_get(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.device_get(out)
    return (time.perf_counter() - t0) / steps


def conv_time(h, w, cin, cout, k, steps=50):
    """Time one bf16 SAME conv (+bias+relu, as the model runs it)."""
    kern = jnp.asarray(
        np.random.default_rng(0).normal(size=(k, k, cin, cout)) * 0.05,
        jnp.bfloat16,
    )
    bias = jnp.zeros((cout,), jnp.bfloat16)
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(B, h, w, cin)), jnp.bfloat16
    )

    @jax.jit
    def f(x, kern, bias):
        y = jax.lax.conv_general_dilated(
            x, kern, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jax.nn.relu(y + bias).astype(jnp.float32).sum()

    dt = timed_scalar(f, x, kern, bias, steps=steps)
    flops = 2 * B * h * w * cin * cout * k * k
    return dt, flops / dt / PEAK_BF16_FLOPS * 100


def pool_time(h, w, c, steps=50):
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(B, h, w, c)), jnp.bfloat16
    )

    @jax.jit
    def f(x):
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        ).astype(jnp.float32).sum()

    dt = timed_scalar(f, x, steps=steps)
    gb = B * h * w * c * 2 * 1.25 / 1e9          # read + quarter-write
    return dt, gb / dt                            # GB/s


def convs():
    print("=== per-conv-shape timing (batch 8, bf16, conv+bias+relu) ===",
          flush=True)
    total_predicted = {s: 0.0 for s in SIZES}
    for s in SIZES:
        print(f"--- pyramid size {s} ---", flush=True)
        f8 = s // 8
        # (label, h, w, cin, cout, k, count-in-model)
        shapes = [
            ("conv1_1", s, s, 3, 64, 3, 1),
            ("conv1_2", s, s, 64, 64, 3, 1),
            ("conv2_1", s // 2, s // 2, 64, 128, 3, 1),
            ("conv2_2", s // 2, s // 2, 128, 128, 3, 1),
            ("conv3_1", s // 4, s // 4, 128, 256, 3, 1),
            ("conv3_x", s // 4, s // 4, 256, 256, 3, 3),
            ("conv4_1", f8, f8, 256, 512, 3, 1),
            ("conv4_2", f8, f8, 512, 512, 3, 1),
            ("cpm_1", f8, f8, 512, 256, 3, 1),
            ("cpm_2", f8, f8, 256, 128, 3, 1),
            ("s1_3x3", f8, f8, 128, 128, 3, 6),
            ("s1_1x1a", f8, f8, 128, 512, 1, 2),
            ("s1_head38", f8, f8, 512, 38, 1, 1),
            ("s1_head19", f8, f8, 512, 19, 1, 1),
            ("sT_7x7in", f8, f8, 185, 128, 7, 10),
            ("sT_7x7", f8, f8, 128, 128, 7, 40),
            ("sT_1x1", f8, f8, 128, 128, 1, 10),
            ("sT_head38", f8, f8, 128, 38, 1, 5),
            ("sT_head19", f8, f8, 128, 19, 1, 5),
        ]
        for label, h, w, cin, cout, k, n in shapes:
            dt, mfu = conv_time(h, w, cin, cout, k)
            total_predicted[s] += dt * n
            print(f"  {label:9s} {h:4d}x{w:<4d} {cin:3d}->{cout:3d} k{k}  "
                  f"{dt*1e3:7.3f} ms  MFU {mfu:5.1f} %  x{n} = "
                  f"{dt*n*1e3:7.2f} ms", flush=True)
        for label, h, w, c in [
            ("pool1", s, s, 64), ("pool2", s // 2, s // 2, 128),
            ("pool3", s // 4, s // 4, 256),
        ]:
            dt, gbs = pool_time(h, w, c)
            total_predicted[s] += dt
            print(f"  {label:9s} {h:4d}x{w:<4d} c{c:<3d}      "
                  f"{dt*1e3:7.3f} ms  {gbs:6.0f} GB/s", flush=True)
        print(f"  sum-of-parts forward @ {s}: "
              f"{total_predicted[s]*1e3:7.1f} ms", flush=True)
    print("sum-of-parts 4-scale forward:",
          f"{sum(total_predicted.values())*1e3:7.1f} ms", flush=True)


def segments():
    print("=== model segments (batch 8, fused jit) ===", flush=True)
    model = OpenPose()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 368, 368, 3)))[
        "params"
    ]

    from tpupose.models.openpose import CPMFeature, VGGBackbone

    vgg = VGGBackbone()
    vgg_p = {"params": params["vgg"]}
    cpm = CPMFeature()
    cpm_p = {"params": params["cpm"]}

    for s in SIZES:
        x = jnp.asarray(
            np.random.default_rng(1).normal(size=(B, s, s, 3)), jnp.bfloat16
        )
        f_vgg = jax.jit(
            lambda x: vgg.apply(vgg_p, x).astype(jnp.float32).sum()
        )
        f_vc = jax.jit(
            lambda x: cpm.apply(cpm_p, vgg.apply(vgg_p, x))
            .astype(jnp.float32).sum()
        )
        f_full = jax.jit(
            lambda x: sum(
                o.astype(jnp.float32).sum()
                for pair in model.apply({"params": params}, x)
                for o in pair
            )
        )
        dt_v = timed_scalar(f_vgg, x, steps=30)
        dt_vc = timed_scalar(f_vc, x, steps=30)
        dt_f = timed_scalar(f_full, x, steps=30)
        fl = B * forward_flops(s, s)
        print(f"size {s}: vgg {dt_v*1e3:7.2f} ms | +cpm {dt_vc*1e3:7.2f} ms"
              f" | full {dt_f*1e3:7.2f} ms  (stages {((dt_f-dt_vc))*1e3:7.2f}"
              f" ms)  MFU {fl/dt_f/PEAK_BF16_FLOPS*100:5.1f} %", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    if mode in ("segments", "all"):
        segments()
    if mode in ("convs", "all"):
        convs()
