"""Granular TPU profile of the train step components + NaN diagnosis."""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpupose.config import DEFAULT
from tpupose.data.pipeline import synthetic_batches
from tpupose.gt import augment as A
from tpupose.gt import rasterize as R
from tpupose.models import OpenPose
from tpupose.training import create_state, make_train_step


def timeit(label, fn, *args, iters=10):
    # reduce on device before fetching: device_get of a full-size output
    # costs ~65 ms over the tunnel and would pollute the timing
    def reduced(*a):
        return jnp.sum(jax.tree.leaves(fn(*a))[0])

    out = reduced(*args)
    _ = float(jax.device_get(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = reduced(*args)
    _ = float(jax.device_get(out))
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:28s} {dt*1e3:8.2f} ms", flush=True)
    return out


def main():
    print("backend:", jax.default_backend(), flush=True)
    cfg = DEFAULT
    batch = next(iter(synthetic_batches(cfg)))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    key = jax.random.PRNGKey(0)
    mcfg, acfg = cfg.model, cfg.augment

    for method in ("twopass", "exact"):
        a = dataclasses.replace(acfg, warp_method=method)

        @jax.jit
        def aug_only(key, batch, a=a):
            return A.augment_batch(
                key, batch["images"].astype(jnp.float32),
                batch["masks"].astype(jnp.float32) / 255.0,
                batch["joints"], batch["centers"], batch["scales"],
                mcfg, a,
            )
        timeit(f"augment_batch[{method}]", aug_only, key, batch)

    # bare batched twopass warp (same as warp_bench variant D)
    affine = jnp.tile(jnp.asarray([[0.9, -0.2, 30.0], [0.2, 0.9, -10.0]]), (10, 1, 1))

    @jax.jit
    def warp_only(imgs, affines):
        return jax.vmap(lambda i, m: A.warp_image_twopass(i, m, 368, 128.0))(
            imgs, affines
        )
    timeit("warp_twopass bare", warp_only, batch["images"].astype(jnp.float32), affine)

    # full steps + loss traces
    for method in ("exact", "twopass"):
        cfg_m = dataclasses.replace(
            cfg, augment=dataclasses.replace(acfg, warp_method=method)
        )
        model = OpenPose(num_stages=6, dtype=jnp.bfloat16)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 368, 368, 3)))["params"]
        state, tx = create_state(cfg_m, params)
        step = make_train_step(cfg_m, model, tx, loss_denom=10)
        tree = state.tree()
        losses_hist = []
        for i in range(8):
            tree, losses = step(tree, jax.random.fold_in(key, i), batch)
            losses_hist.append(float(jax.device_get(losses["total"])))
        print(f"step[{method}] losses:", [round(x, 2) for x in losses_hist], flush=True)
        t0 = time.perf_counter()
        for i in range(10):
            tree, losses = step(tree, jax.random.fold_in(key, 100 + i), batch)
        _ = float(jax.device_get(losses["total"]))
        print(f"step[{method}] {(time.perf_counter()-t0)/10*1e3:.1f} ms/step", flush=True)


if __name__ == "__main__":
    main()
