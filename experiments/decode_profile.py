"""TPU profile of the decode stages (peaks / PAF scoring / assembly),
batch-8 vmapped at 368^2 — the decode is ~55 ms/image and dominates the
product path (round-2 finding)."""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpupose.benchmark import synthetic_scene
from tpupose.config import DEFAULT
from tpupose.decode import assemble as A, paf as PF, peaks as PK
from tpupose.ops.pallas_peaks import find_peaks_pallas


def timeit(label, fn, *args, iters=10):
    def reduced(*a):
        return jnp.sum(jax.tree.leaves(fn(*a))[0].astype(jnp.float32))

    _ = float(jax.device_get(reduced(*args)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = reduced(*args)
    _ = float(jax.device_get(out))
    print(f"{label:34s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms/batch-8",
          flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    icfg = DEFAULT.inference
    _, heat, paf = synthetic_scene()
    heats = jnp.asarray(np.stack([heat] * 8))
    pafs = jnp.asarray(np.stack([paf] * 8))

    jpeaks = jax.jit(jax.vmap(
        lambda h: PK.find_peaks(h, max_peaks=96, sigma=3.0, thre1=0.1)))
    timeit("peaks XLA", jpeaks, heats)
    ppeaks = jax.jit(jax.vmap(
        lambda h: find_peaks_pallas(h, max_peaks=96, sigma=3.0, thre1=0.1)))
    timeit("peaks Pallas", ppeaks, heats)

    peaks = jpeaks(heats)

    jscore = jax.jit(jax.vmap(lambda p, pk: PF.score_limbs(
        p, pk, mid_num=10, thre2=0.05, min_ratio=0.8)))
    timeit("paf score_limbs", jscore, pafs, peaks)

    conns = jscore(pafs, peaks)

    jasm_small = jax.jit(jax.vmap(lambda pk, cn: A.assemble(
        pk, cn, max_people=96, min_cnt=4, min_score=0.4)))
    timeit("assemble cap=96", jasm_small, peaks, conns)
    jasm = jax.jit(jax.vmap(lambda pk, cn: A.assemble(
        pk, cn, max_people=256, min_cnt=4, min_score=0.4)))
    timeit("assemble cap=256", jasm, peaks, conns)

    # connection truncation effect on assembly (fewer scan steps)
    conns32 = {k: v[:, :, :32] for k, v in conns.items()}
    jasm32 = jax.jit(jax.vmap(lambda pk, cn: A.assemble(
        pk, cn, max_people=256, min_cnt=4, min_score=0.4)))
    timeit("assemble cap=256 conns=32", jasm32, peaks, conns32)


if __name__ == "__main__":
    main()
