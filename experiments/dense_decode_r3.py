"""Dense-scene decode characterization (round-2 VERDICT weak #2 / #4).

The pair-tier ladder (K=8/32 -> 96) is batch-granular: one image with
> 32 peaks in any part channel drags the whole batch onto the top tier.
Real crowd scenes (~20-30 people) sit near the 32 boundary. This
experiment prices the full product decode (scale-space readout, Pallas
kernels) at controlled crowd densities and evaluates a K=64 middle tier.

Scene construction: P people rasterised through the GT path at every
pyramid scale's label grid -> a ScaleSpace identical in structure to the
network-output decode input, with exactly P gaussian peaks per part
channel (people laid out on a separated grid).

All timings are on-device: inputs device-resident, chained dispatch,
one scalar sync (axon-relay rule). Usage:
  python experiments/dense_decode_r3.py
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


def dense_scene_scalespace(n_people: int, batch: int, seed: int = 0):
    """(heat ScaleSpace, paf ScaleSpace) with ~n_people peaks/channel."""
    rng = np.random.default_rng(seed)
    cols = int(np.ceil(np.sqrt(n_people)))
    pitch = SIZE / (cols + 1)
    sizes = scale_sizes(SIZE, SIZE, DEFAULT.inference.scale_search,
                        DEFAULT.model.boxsize, DEFAULT.model.stride)

    heat_scales = [[] for _ in sizes]
    paf_scales = [[] for _ in sizes]
    for b in range(batch):
        joints = np.full((n_people, 18, 3), 2.0, np.float32)
        for p in range(n_people):
            cx = pitch * (p % cols + 1) + rng.uniform(-6, 6)
            cy = pitch * (p // cols + 1) + rng.uniform(-6, 6)
            # compact star of parts around the centre (all 18 visible)
            for k in range(18):
                joints[p, k] = (
                    cx + ((k % 5) - 2) * 6.0,
                    cy + ((k // 5) - 1.5) * 7.0,
                    0.0,
                )
        for si, (rh, rw, ph, pw) in enumerate(sizes):
            f = rh / SIZE
            j = joints.copy()
            j[:, :, :2] *= f
            label = ph // DEFAULT.model.stride
            heat = put_gaussian_maps(
                jnp.asarray(j), label, DEFAULT.model.stride,
                DEFAULT.augment.sigma * f,
            )
            paf = put_vector_maps(
                jnp.asarray(j), label, DEFAULT.model.stride,
                max(DEFAULT.augment.paf_thre * f, 1.0),
            )
            heat_scales[si].append(np.asarray(heat, np.float32))
            paf_scales[si].append(np.asarray(paf, np.float32))

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
    n_people = int(np.asarray(out["valid"]).sum(axis=-1).mean())
    max_peaks = int(np.asarray(out["peak_xs"].shape[-1]))
    jax.device_get(out["cnt"].sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(heat_ss, paf_ss)
    jax.device_get(out["cnt"].sum())
    dt = (time.perf_counter() - t0) / iters
    return dt, n_people, max_peaks


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    batch = 8
    tier_sets = {
        "tiers(8,32)": DEFAULT.inference.pair_tiers,
        "tiers(8,32,64)": (8, 32, 64),
    }
    counts = (6, 12, 20, 30)
    if len(sys.argv) > 1 and sys.argv[1] == "cliff":
        counts = (33, 45, 60)       # past the K=32 boundary
    elif len(sys.argv) > 1 and sys.argv[1] == "mid":
        counts = (12, 20)
        tier_sets = {"tiers(8,16,32,64)": (8, 16, 32, 64),
                     "tiers(8,32,64)": (8, 32, 64)}
    for n_people in counts:
        heat_ss, paf_ss = dense_scene_scalespace(n_people, batch)
        # actual peak counts (max over channels) — what the tier cond sees
        from tpupose.decode.api import _find_peaks

        pk = jax.jit(
            lambda h: _find_peaks(h, DEFAULT.inference)["valid"].sum(-1).max()
        )(heat_ss.map_scales(lambda m: m[0]))
        n_pk = int(jax.device_get(pk))
        for label, tiers in tier_sets.items():
            cfg = dataclasses.replace(DEFAULT.inference, pair_tiers=tiers)
            dt, found, _ = measure(cfg, heat_ss, paf_ss)
            print(
                f"P={n_people:2d} (max {n_pk:2d} peaks/ch) {label:15s} "
                f"decode {dt*1e3:7.1f} ms/batch-{batch}  "
                f"({batch/dt:6.1f} img/s)  people/img={found}",
                flush=True,
            )
