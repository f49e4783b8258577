"""A/B the product path: fullres PAF readout vs scale-space readout.
Batch 8, 368^2, 4 scales, on-chip (device_get-forced timing)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/tpupose_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import dataclasses
import numpy as np, jax.numpy as jnp
from tpupose.benchmark import synthetic_scene
from tpupose.config import DEFAULT
from tpupose.infer import PoseEstimator

N = 8
image, _, _ = synthetic_scene()
base = np.stack([image] * N)
batches = [jnp.asarray((base + 7 * i) % 255) for i in range(10)]
est = PoseEstimator()

for readout in ("fullres", "scalespace"):
    cfg = dataclasses.replace(
        DEFAULT, inference=dataclasses.replace(DEFAULT.inference, paf_readout=readout)
    )
    e = PoseEstimator(cfg=cfg, params=est.params)
    fn = e._batch_fn(N, 368, 368)
    out = fn(e.params, batches[0])
    _ = jax.device_get(out)  # warm + force
    t0 = time.perf_counter()
    for b in batches:
        out = fn(e.params, b)
    _ = jax.device_get(out)
    dt = (time.perf_counter() - t0) / len(batches)
    print(f"{readout:12s} {dt*1e3:8.1f} ms/batch-{N}  ({N/dt:6.1f} img/s)", flush=True)
