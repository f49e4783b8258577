"""Decompose the batched 4-scale product program: forwards vs upsample/avg
vs decode (batch 8, 368^2, real chip). Decides whether low-res PAF
sampling (skip the 38-channel x8 upsample) is worth the refactor.

Axon-relay gotcha: block_until_ready returns at dispatch-ack, not
completion — every measurement must fetch a value (device_get)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tpupose_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp
from tpupose import topology
from tpupose.benchmark import synthetic_scene
from tpupose.config import DEFAULT
from tpupose.decode.api import decode_impl_batch
from tpupose.models import OpenPose
from tpupose.ops import image as image_ops

N = 8
H = W = 368
mcfg = DEFAULT.model
icfg = DEFAULT.inference
model = OpenPose(num_stages=mcfg.num_stages, dtype=jnp.bfloat16)
params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3), jnp.float32))["params"]
sizes = image_ops.scale_sizes(H, W, icfg.scale_search, mcfg.boxsize, mcfg.stride)


def fwd_scales(params, imgs_u8, upsample: bool, avg_decode: bool):
    x0 = image_ops.normalize(imgs_u8, mcfg.channel_order)
    heat_avg = jnp.zeros((N, H, W, topology.NUM_HEAT_CHANNELS))
    paf_avg = jnp.zeros((N, H, W, topology.NUM_PAF_CHANNELS))
    acc = 0.0
    ns = float(len(sizes))
    up = lambda m, rh, rw: image_ops.upsample_to(m[None], rh, rw, H, W, mcfg.stride)
    for rh, rw, _, _ in sizes:
        x = image_ops.resize_bilinear(x0, rh, rw)
        x, _ = image_ops.pad_right_down(x, mcfg.stride, image_ops.PAD_NORM)
        paf, heat = model.apply({"params": params}, x)[-1]
        if upsample:
            heat_avg = heat_avg + jax.vmap(lambda m: up(m, rh, rw))(heat) / ns
            paf_avg = paf_avg + jax.vmap(lambda m: up(m, rh, rw))(paf) / ns
        else:
            acc = acc + jnp.sum(heat.astype(jnp.float32)) + jnp.sum(paf.astype(jnp.float32))
    if not upsample:
        return acc
    if avg_decode:
        out = decode_impl_batch(heat_avg, paf_avg, icfg)
        return sum(jnp.sum(v.astype(jnp.float32)) for v in out.values())
    return jnp.sum(heat_avg) + jnp.sum(paf_avg)


variants = {
    "forwards only (no upsample)": jax.jit(lambda p, x: fwd_scales(p, x, False, False)),
    "forwards + upsample/avg": jax.jit(lambda p, x: fwd_scales(p, x, True, False)),
    "full (fwd+up+decode)": jax.jit(lambda p, x: fwd_scales(p, x, True, True)),
}


def main():
    print("backend:", jax.default_backend(), "sizes:", sizes, flush=True)
    image, _, _ = synthetic_scene()
    base = np.stack([image] * N)
    batches = [jnp.asarray((base + 7 * i) % 255) for i in range(10)]
    for label, fn in variants.items():
        float(jax.device_get(fn(params, batches[0])))  # warm + force
        t0 = time.perf_counter()
        for b in batches:
            out = fn(params, b)
        _ = float(jax.device_get(out))
        dt = (time.perf_counter() - t0) / len(batches)
        print(f"{label:32s} {dt*1e3:8.1f} ms/batch-{N}  ({N/dt:6.1f} img/s)", flush=True)


if __name__ == "__main__":
    main()
