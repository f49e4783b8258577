"""Density-grouped batched decode (round-3 follow-through on the
dense-scene cliff): one crowded image in an otherwise-sparse batch drags
the whole batch onto its O(K^2) tier when the tier choice is
batch-granular. ``InferenceConfig.decode_groups`` argsorts images by
peak count on-device, splits the batch into contiguous groups, and gives
each group its own tier cond-chain (bitwise identical; see
tests/test_decode_two_tier.py).

This experiment prices the realistic worst case on the chip: batch 8
with 7 sparse scenes (6 people) + 1 crowd (45 people -> K=64 tier),
decode_groups = 1 / 2 / 4 / 8, plus the uniform-sparse control (the
grouping overhead when it buys nothing).

Usage: python experiments/grouped_decode_r3.py
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpupose.config import DEFAULT
from tpupose.decode.api import decode_impl_batch
from tpupose.decode.scalespace import ScaleSpace
from tpupose.gt.rasterize import put_gaussian_maps, put_vector_maps
from tpupose.ops.image import scale_sizes

SIZE = 368


def scene_joints(n_people: int, rng) -> np.ndarray:
    cols = int(np.ceil(np.sqrt(n_people)))
    pitch = SIZE / (cols + 1)
    joints = np.full((n_people, 18, 3), 2.0, np.float32)
    for p in range(n_people):
        cx = pitch * (p % cols + 1) + rng.uniform(-6, 6)
        cy = pitch * (p // cols + 1) + rng.uniform(-6, 6)
        for k in range(18):
            joints[p, k] = (
                cx + ((k % 5) - 2) * 6.0,
                cy + ((k // 5) - 1.5) * 7.0,
                0.0,
            )
    return joints


def mixed_scene_scalespace(counts, seed: int = 0):
    """ScaleSpace batch with counts[i] people in image i."""
    rng = np.random.default_rng(seed)
    sizes = scale_sizes(SIZE, SIZE, DEFAULT.inference.scale_search,
                        DEFAULT.model.boxsize, DEFAULT.model.stride)
    heat_scales = [[] for _ in sizes]
    paf_scales = [[] for _ in sizes]
    for n_people in counts:
        joints = scene_joints(n_people, rng)
        for si, (rh, rw, ph, pw) in enumerate(sizes):
            f = rh / SIZE
            j = joints.copy()
            j[:, :, :2] *= f
            label = ph // DEFAULT.model.stride
            heat_scales[si].append(np.asarray(put_gaussian_maps(
                jnp.asarray(j), label, DEFAULT.model.stride,
                DEFAULT.augment.sigma * f,
            ), np.float32))
            paf_scales[si].append(np.asarray(put_vector_maps(
                jnp.asarray(j), label, DEFAULT.model.stride,
                max(DEFAULT.augment.paf_thre * f, 1.0),
            ), np.float32))
    geoms = [s[:2] for s in sizes]
    heat_ss = ScaleSpace(
        [jnp.asarray(np.stack(h)) for h in heat_scales], geoms, (SIZE, SIZE)
    )
    paf_ss = ScaleSpace(
        [jnp.asarray(np.stack(p)) for p in paf_scales], geoms, (SIZE, SIZE)
    )
    return heat_ss, paf_ss


def measure(cfg, heat_ss, paf_ss, iters=15):
    fn = jax.jit(lambda h, p: decode_impl_batch(h, p, cfg))
    out = fn(heat_ss, paf_ss)
    people = np.asarray(jax.device_get(out["valid"])).sum(-1)
    jax.device_get(out["cnt"].sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(heat_ss, paf_ss)
    jax.device_get(out["cnt"].sum())
    return (time.perf_counter() - t0) / iters, people


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    scenarios = {
        "7 sparse + 1 crowd(45)": (6, 6, 6, 6, 6, 6, 6, 45),
        "uniform sparse (6)": (6,) * 8,
        "6 sparse + 2 mid(20)": (6, 6, 6, 6, 6, 6, 20, 20),
    }
    for name, counts in scenarios.items():
        heat_ss, paf_ss = mixed_scene_scalespace(counts)
        base = None
        for groups in (1, 2, 4, 8):
            cfg = dataclasses.replace(DEFAULT.inference, decode_groups=groups)
            dt, people = measure(cfg, heat_ss, paf_ss)
            base = base or dt
            print(
                f"{name:24s} groups={groups}  decode {dt*1e3:7.1f} ms/batch-8"
                f"  ({8/dt:6.1f} img/s, {base/dt:4.2f}x)  "
                f"people={people.tolist()}",
                flush=True,
            )
