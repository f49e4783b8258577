"""Round-5: fused Pallas block-1 kernel vs XLA on the chip (VERDICT
next #3 — conv1_1 ~1.4% MFU + conv1_2 + pool1, the last measured
forward-path frontier; fold_conv1_r4 was the XLA-level negative).

Measures the isolated block-1 segment (conv1_1+relu+conv1_2+relu+pool)
for the four pyramid geometries at product batch sizes, XLA vs the
fused kernel, plus numeric parity on-chip.

Run: PYTHONPATH=. python experiments/block1_pallas_r5.py
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp
import numpy as np

from tpupose.ops.pallas_block1 import block1_reference, fused_block1


def bench(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    k1 = rng.normal(0, 0.2, (3, 3, 3, 64)).astype(np.float32)
    b1 = rng.normal(0, 0.1, (64,)).astype(np.float32)
    k2 = rng.normal(0, 0.05, (3, 3, 64, 64)).astype(np.float32)
    b2 = rng.normal(0, 0.1, (64,)).astype(np.float32)

    ref_j = jax.jit(block1_reference)
    out = {}
    # device-resident operands: on the tunneled backend a host numpy
    # arg costs a ~13 MB transfer per call (~65 ms/img at 368^2 b8),
    # which swamps the ~0.5 ms kernel under test (first run's mistake)
    k1d, b1d, k2d, b2d = map(jax.device_put, (k1, b1, k2, b2))
    # the four pyramid canvas heights at 368 boxsize (0.5/1/1.5/2x),
    # batch 8 = the product pyramid's per-scale batch
    for (h, w, bs) in [(184, 184, 8), (368, 368, 8), (552, 552, 8),
                       (736, 736, 8), (368, 368, 1), (368, 368, 16)]:
        x = rng.normal(0, 0.3, (bs, h, w, 3)).astype(np.float32)
        xd = jax.device_put(x)
        ms_xla = bench(ref_j, xd, k1d, b1d, k2d, b2d)
        ms_pal = bench(fused_block1, xd, k1d, b1d, k2d, b2d)
        # on-chip parity vs f32
        truth = np.asarray(
            jax.jit(lambda *a: block1_reference(*a, dtype=jnp.float32))(
                x[:1], k1, b1, k2, b2), np.float32)
        d_pal = float(np.abs(np.asarray(
            fused_block1(x[:1], k1, b1, k2, b2), np.float32) - truth).max())
        d_xla = float(np.abs(np.asarray(
            ref_j(x[:1], k1, b1, k2, b2), np.float32) - truth).max())
        key = f"{h}x{w}_b{bs}"
        out[key] = {"xla_ms": round(ms_xla, 3), "pallas_ms": round(ms_pal, 3),
                    "speedup": round(ms_xla / ms_pal, 2),
                    "err_pallas": round(d_pal, 5), "err_xla": round(d_xla, 5)}
        print(f"{key:14s} xla {ms_xla:8.3f} ms  pallas {ms_pal:8.3f} ms  "
              f"x{ms_xla / ms_pal:5.2f}   err p/x {d_pal:.4f}/{d_xla:.4f}",
              flush=True)

    # 4-scale segment total at batch 8 (the headline path's block-1 cost)
    seg_x = sum(out[f"{s}x{s}_b8"]["xla_ms"] for s in (184, 368, 552, 736))
    seg_p = sum(out[f"{s}x{s}_b8"]["pallas_ms"] for s in (184, 368, 552, 736))
    out["pyramid_segment"] = {"xla_ms": round(seg_x, 2),
                              "pallas_ms": round(seg_p, 2),
                              "speedup": round(seg_x / seg_p, 2)}
    print(f"4-scale block-1 segment b8: {seg_x:.2f} -> {seg_p:.2f} ms "
          f"(x{seg_x / seg_p:.2f})", flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
