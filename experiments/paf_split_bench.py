"""Split the K=32 PAF stage: pair scoring (gather) vs greedy scan."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from tpupose import topology
from tpupose.benchmark import synthetic_scene
from tpupose.decode import paf as PF, peaks as PK

def timeit(label, fn, *args, iters=20):
    def reduced(*a):
        return jnp.sum(jax.tree.leaves(fn(*a))[0].astype(jnp.float32))
    _ = float(jax.device_get(reduced(*args)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = reduced(*args)
    _ = float(jax.device_get(out))
    print(f"{label:34s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms/batch-8", flush=True)

print("backend:", jax.default_backend(), flush=True)
_, heat, paf = synthetic_scene()
heats = jnp.asarray(np.stack([heat] * 8))
pafs = jnp.asarray(np.stack([paf] * 8))
jpeaks = jax.jit(jax.vmap(lambda h: PK.find_peaks(h, 96, 3.0, 0.1)))
peaks = {k: jnp.asarray(np.asarray(v)[:, :, :32]) for k, v in jax.device_get(jpeaks(heats)).items()}

part_pairs, paf_chans = topology.decode_limb_tables()
part_pairs = jnp.asarray(part_pairs); paf_chans = jnp.asarray(paf_chans)

def scores_only(paf, pk):
    h = paf.shape[0]
    paf_limb = jnp.stack([paf[:, :, paf_chans[:, 0]], paf[:, :, paf_chans[:, 1]]], axis=-1)
    paf_limb = jnp.moveaxis(paf_limb, 2, 0)
    def one(paf_xy, ax, ay, asc, av, bx, by, bsc, bv):
        return PF._limb_pair_scores(paf_xy, ax, ay, asc, av, bx, by, bsc, bv,
                                    10, 0.05, 0.8, float(h))[:2]
    args = []
    for side in (0, 1):
        for key in ("xs", "ys", "scores", "valid"):
            args.append(pk[key][part_pairs[:, side]])
    return jax.vmap(one)(paf_limb, *args)

jscores = jax.jit(jax.vmap(scores_only))
timeit("pair scores only (gather)", jscores, pafs, peaks)

full = jax.jit(jax.vmap(lambda p, pk: PF.score_limbs(p, pk, mid_num=10, thre2=0.05,
                                                     min_ratio=0.8)))
timeit("score_limbs full (scan_cap=512)", full, pafs, peaks)
full128 = jax.jit(jax.vmap(lambda p, pk: PF.score_limbs(p, pk, mid_num=10, thre2=0.05,
                                                        min_ratio=0.8, scan_cap=128)))
timeit("score_limbs scan_cap=128", full128, pafs, peaks)
