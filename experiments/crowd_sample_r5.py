"""Round-5: fused VMEM point-readout on the crowd decode tiers.

Round 3 priced the dense-crowd decode (dense_decode_r3_tpu.log):
past 32 peaks/channel the chunked HBM scale-space readout costs
134 ms/batch-8 on the K=64 tier and 289 ms on K=96 — the 3.1x cliff the
serving doc's operating envelope warns about. ops/pallas_sample.py
(round 5) keeps every one-hot intermediate VMEM-resident; this run
prices the SAME scenes through the SAME decode with the kernel off/on,
checks people-level parity on-chip, and extends the table to a K=128
tier (uniformly-crowded traffic headroom the envelope doc can cite).

Usage (chip): PYTHONPATH=/root/repo:/root/.axon_site \
    python experiments/crowd_sample_r5.py
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from dense_decode_r3 import dense_scene_scalespace  # noqa: E402 (same dir)

from tpupose.config import DEFAULT
from tpupose.decode.api import decode_impl_batch


def measure(cfg, heat_ss, paf_ss, iters=15):
    fn = jax.jit(lambda h, p: decode_impl_batch(h, p, cfg))
    out = fn(heat_ss, paf_ss)
    jax.device_get(out["cnt"].sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(heat_ss, paf_ss)
    jax.device_get(out["cnt"].sum())
    dt = (time.perf_counter() - t0) / iters
    return dt, jax.device_get(out)


def people_parity(a, b):
    """Decoded people tables must agree: same valid mask, same peak-slot
    rows for valid people, scores to 1e-3 (the readouts agree to ~1e-5;
    greedy accept can only flip on exact threshold ties)."""
    va, vb = np.asarray(a["valid"]), np.asarray(b["valid"])
    if va.shape != vb.shape or (va != vb).any():
        return False, "valid-mask mismatch"
    ra = np.where(va[..., None], np.asarray(a["rows"]), -1)
    rb = np.where(vb[..., None], np.asarray(b["rows"]), -1)
    if (ra != rb).any():
        return False, f"rows mismatch ({int((ra != rb).sum())} slots)"
    sa = np.where(va, np.asarray(a["score"]), 0.0)
    sb = np.where(vb, np.asarray(b["score"]), 0.0)
    d = float(np.abs(sa - sb).max())
    if d > 1e-3:
        return False, f"score max delta {d}"
    return True, "ok"


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    batch = 8
    out = {}
    for n_people, tiers, cap, label in (
        (33, (8, 32, 64), 96, "K=64"),
        (60, (8, 32, 64), 96, "K=64"),
        (60, (8, 32), 96, "K=96"),
        (90, (8, 32), 96, "K=96"),
        (100, (8, 32, 64, 96), 128, "K=128"),
        (120, (8, 32, 64, 96), 128, "K=128"),
    ):
        heat_ss, paf_ss = dense_scene_scalespace(n_people, batch)
        cfg = dataclasses.replace(
            DEFAULT.inference, pair_tiers=tiers, max_peaks=cap)
        os.environ["TPUPOSE_PALLAS_SAMPLE"] = "0"
        dt_off, out_off = measure(cfg, heat_ss, paf_ss)
        os.environ["TPUPOSE_PALLAS_SAMPLE"] = "1"
        dt_on, out_on = measure(cfg, heat_ss, paf_ss)
        same, why = people_parity(out_off, out_on)
        key = f"P{n_people}_{label}"
        out[key] = {
            "hbm_ms": round(dt_off * 1e3, 1),
            "vmem_ms": round(dt_on * 1e3, 1),
            "speedup": round(dt_off / dt_on, 2),
            "parity": why,
        }
        print(
            f"P={n_people:3d} {label:6s} chunked-HBM {dt_off*1e3:7.1f} ms  "
            f"fused-VMEM {dt_on*1e3:7.1f} ms  x{dt_off/dt_on:5.2f}  "
            f"people-parity: {why}",
            flush=True,
        )
        if not same:
            print(f"  !! parity failure at {key}", flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
