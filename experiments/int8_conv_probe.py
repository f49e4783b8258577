"""Probe: does int8 buy conv throughput on this chip (TPU v5e: 394
TOPS int8 vs 197 TFLOPS bf16 peak)?

The 4-scale product path is forward-bound (~115 of ~131 ms on-device at
~72 % conv MFU), so the only remaining headline lever is the conv rate
itself. This times representative model shapes — VGG stack at pyramid
resolutions + the 7x7 stage blocks — as bf16 vs int8
(preferred_element_type=int32) lax.conv calls, on-device, chained
dispatch, one sync.

Usage: python experiments/int8_conv_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# (label, batch, H, W, Cin, Cout, k)
SHAPES = [
    ("vgg conv1_2 368^2 64->64 3x3", 1, 368, 368, 64, 64, 3),
    ("vgg conv2_2 184^2 128 3x3", 1, 184, 184, 128, 128, 3),
    ("vgg conv3_x 92^2 256 3x3", 1, 92, 92, 256, 256, 3),
    ("vgg conv4_1 46^2 256->512 3x3", 1, 46, 46, 256, 512, 3),
    ("stage 46^2 185->128 7x7 b8", 8, 46, 46, 185, 128, 7),
    ("stage 46^2 128 7x7 b8", 8, 46, 46, 128, 128, 7),
    ("vgg conv3_x 92^2 256 3x3 b8", 8, 92, 92, 256, 256, 3),
]


def conv(x, w, pe):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pe,
    )


def bench(fn, x, w, iters=30):
    out = fn(x, w)
    jax.device_get(jnp.sum(out, dtype=jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x, w)
    jax.device_get(jnp.sum(out, dtype=jnp.float32))
    return (time.perf_counter() - t0) / iters


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    for label, b, h, wd, cin, cout, k in SHAPES:
        flops = 2.0 * b * h * wd * cin * cout * k * k
        xf = rng.normal(size=(b, h, wd, cin)).astype(np.float32)
        wf = (rng.normal(size=(k, k, cin, cout)) * 0.05).astype(np.float32)
        xi = rng.integers(-127, 127, size=(b, h, wd, cin), dtype=np.int8)
        wi = rng.integers(-127, 127, size=(k, k, cin, cout), dtype=np.int8)

        t_bf = bench(
            jax.jit(lambda x, w: conv(x, w, jnp.float32)),
            jnp.asarray(xf, jnp.bfloat16), jnp.asarray(wf, jnp.bfloat16),
        )
        try:
            t_i8 = bench(
                jax.jit(lambda x, w: conv(x, w, jnp.int32)),
                jnp.asarray(xi), jnp.asarray(wi),
            )
            ratio = f"{t_bf / t_i8:4.2f}x"
            i8_ms = f"{t_i8 * 1e3:7.3f}"
            i8_tops = f"{flops / t_i8 / 1e12:6.1f}"
        except Exception as e:
            ratio, i8_ms, i8_tops = "FAIL", "-", "-"
            print("  int8 failed:", type(e).__name__, str(e)[:120])
        print(
            f"{label:32s} bf16 {t_bf*1e3:7.3f} ms ({flops/t_bf/1e12:6.1f} TF/s)"
            f"  int8 {i8_ms} ms ({i8_tops} TOP/s)  int8 speedup {ratio}",
            flush=True,
        )
