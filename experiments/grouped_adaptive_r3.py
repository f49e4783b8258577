"""Adaptive grouped decode (round-3 follow-through on grouped_decode_r3):
``decode_group_adaptive`` wraps the grouped path in one runtime lax.cond
on tier uniformity, so a density-uniform batch runs the single-group
program (grouping cannot change any tier choice then) while mixed
batches keep the per-group tiers. This prices both branches on the chip
against the forced-grouped and ungrouped programs.

One jitted function with static cfg: each of the 3 configs compiles
ONCE and is reused across all scenarios (the ScaleSpace geometry is
identical), instead of grouped_decode_r3.measure's per-call jit wrapper.

Usage: TPUPOSE_COMPILE_CACHE=/tmp/tpupose_jax_cache \
       python experiments/grouped_adaptive_r3.py
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from tpupose.config import DEFAULT
from tpupose.decode.api import decode_impl_batch

from grouped_decode_r3 import mixed_scene_scalespace  # noqa: E402

_run = jax.jit(decode_impl_batch, static_argnames="cfg")


def measure(cfg, heat_ss, paf_ss, iters=15):
    out = _run(heat_ss, paf_ss, cfg)
    people = np.asarray(jax.device_get(out["valid"])).sum(-1)
    jax.device_get(out["cnt"].sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = _run(heat_ss, paf_ss, cfg)
    jax.device_get(out["cnt"].sum())
    return (time.perf_counter() - t0) / iters, people


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    cfgs = {
        "groups=1": dataclasses.replace(
            DEFAULT.inference, decode_groups=1, decode_group_adaptive=False
        ),
        "groups=8 forced": dataclasses.replace(
            DEFAULT.inference, decode_groups=8, decode_group_adaptive=False
        ),
        "groups=8 adaptive": dataclasses.replace(
            DEFAULT.inference, decode_groups=8, decode_group_adaptive=True
        ),
    }
    scenarios = {
        "uniform sparse (6)": (6,) * 8,          # adaptive -> ungrouped branch
        "uniform mid (20)": (20,) * 8,           # adaptive -> ungrouped branch
        "7 sparse + 1 crowd(45)": (6, 6, 6, 6, 6, 6, 6, 45),  # -> grouped
        "6 sparse + 2 mid(20)": (6, 6, 6, 6, 6, 6, 20, 20),   # -> grouped
    }
    for name, counts in scenarios.items():
        heat_ss, paf_ss = mixed_scene_scalespace(counts)
        rows = []
        for label, cfg in cfgs.items():
            t_c0 = time.perf_counter()
            dt, people = measure(cfg, heat_ss, paf_ss)
            rows.append((label, dt, people, time.perf_counter() - t_c0))
        base = rows[0][1]
        for label, dt, people, wall in rows:
            print(
                f"{name:24s} {label:18s} decode {dt*1e3:7.1f} ms/batch-8"
                f"  ({8/dt:6.1f} img/s, {base/dt:4.2f}x vs groups=1)"
                f"  [incl-compile {wall:5.1f}s]",
                flush=True,
            )
