"""Decode-stage breakdown with scale-space inputs (batch 8, on-chip).
Forces device_get per measurement (axon relay)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/tpupose_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np, jax.numpy as jnp
from tpupose.benchmark import synthetic_scene
from tpupose.config import DEFAULT
from tpupose.decode import peaks as PK
from tpupose.decode.api import decode_impl_batch, _two_tier_post_peaks
from tpupose.decode.scalespace import ScaleSpace
from tpupose.ops.image import scale_sizes
import cv2

icfg = DEFAULT.inference
SIZES = scale_sizes(368, 368, icfg.scale_search, 368, 8)
_, heat, paf = synthetic_scene()

def lows(full, c):
    out = []
    for rh, rw, ph, pw in SIZES:
        m = cv2.resize(full, (pw // 8, ph // 8), interpolation=cv2.INTER_LINEAR)
        out.append(np.stack([m] * 8))  # batch 8
    return out

geoms = [s[:2] for s in SIZES]
hs = ScaleSpace([jnp.asarray(m) for m in lows(heat, 19)], geoms, (368, 368))
ps = ScaleSpace([jnp.asarray(m) for m in lows(paf, 38)], geoms, (368, 368))

def timeit(label, fn, *args, iters=20):
    def reduced(*a):
        out = fn(*a)
        leaves = jax.tree.leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
    r = jax.jit(reduced)
    _ = float(jax.device_get(r(*args)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = r(*args)
    _ = float(jax.device_get(out))
    print(f"{label:30s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms/batch-8", flush=True)

timeit("full decode (scalespace)", lambda h, p: decode_impl_batch(h, p, icfg), hs, ps)
timeit("peaks only (matrix+NMS+compact)",
       lambda h: jax.vmap(lambda x: PK.find_peaks_scalespace(x, icfg.max_peaks, icfg.peak_sigma, icfg.thre1))(h), hs)
peaks = jax.jit(jax.vmap(lambda x: PK.find_peaks_scalespace(x, icfg.max_peaks, icfg.peak_sigma, icfg.thre1)))(hs)
peaks = jax.tree.map(lambda x: x, peaks)
timeit("post-peaks (PAF+greedy+assembly)",
       lambda p: _two_tier_post_peaks(p, peaks, icfg, batched=True), ps)
