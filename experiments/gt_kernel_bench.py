"""Pallas GT kernel (mask fused) vs XLA fallback, and peaks kernel vs
XLA blur+NMS, on the chip."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from tpupose.gt import rasterize as R
from tpupose.ops.pallas_gt import create_labels_pallas
from tpupose.ops.pallas_peaks import peak_scores_pallas
from tpupose.decode import peaks as PK
from tpupose.benchmark import synthetic_scene

def timeit(label, fn, *args, iters=20):
    def reduced(*a):
        return jnp.sum(jax.tree.leaves(fn(*a))[0])
    _ = float(jax.device_get(reduced(*args)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = reduced(*args)
    _ = float(jax.device_get(out))
    print(f"{label:30s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms", flush=True)

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)
n, p = 10, 24
joints = np.full((n, p, 18, 3), 2.0, np.float32)
joints[:, :4, :, 0] = rng.uniform(10, 350, (n, 4, 18))
joints[:, :4, :, 1] = rng.uniform(10, 350, (n, 4, 18))
joints[:, :4, :, 2] = 0.0
mask = rng.uniform(0.5, 1.0, (n, 46, 46)).astype(np.float32)
joints = jnp.asarray(joints); mask = jnp.asarray(mask)

xla_gt = jax.jit(lambda j, m: R.create_labels(j, m, label_size=46, stride=8,
                                              sigma=7.0, paf_thre=8.0))
pal_gt = jax.jit(lambda j, m: create_labels_pallas(j, m, label_size=46, stride=8,
                                                   sigma=7.0, paf_thre=8.0))
timeit("GT XLA", xla_gt, joints, mask)
timeit("GT Pallas (mask fused)", pal_gt, joints, mask)
a = jax.device_get(xla_gt(joints, mask)); b = jax.device_get(pal_gt(joints, mask))
print("GT parity:", float(np.abs(np.asarray(a[0])-np.asarray(b[0])).max()),
      float(np.abs(np.asarray(a[1])-np.asarray(b[1])).max()), flush=True)

_, heat, _ = synthetic_scene()
heats = jnp.asarray(np.stack([heat] * 8))
xla_peaks = jax.jit(jax.vmap(lambda h: PK.find_peaks(h, 96, 3.0, 0.1)))
timeit("peaks XLA (incl topk)", xla_peaks, heats)
pal_scores = jax.jit(jax.vmap(lambda h: peak_scores_pallas(h[:, :, :18])))
timeit("peaks Pallas kernel only", pal_scores, heats)
