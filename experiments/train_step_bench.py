"""TPU train-step timing after the round-2 warp rewrite.

Full default config (6 stages, batch 10, 368^2, on-device aug+GT),
comparing warp_method twopass vs exact in context. VERDICT round-1
target: <= ~110 ms/step (>= 90 samples/s).
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpupose.config import DEFAULT, PoseConfig
from tpupose.data.pipeline import synthetic_batches
from tpupose.models import OpenPose
from tpupose.training import create_state, make_train_step


def bench(cfg: PoseConfig, label: str, steps=20):
    model = OpenPose(num_stages=cfg.model.num_stages,
                     dtype=jnp.dtype(cfg.model.compute_dtype))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 368, 368, 3)))["params"]
    state, tx = create_state(cfg, params)
    step = make_train_step(cfg, model, tx, loss_denom=cfg.train.batch_size)
    tree = state.tree()
    batch = next(iter(synthetic_batches(cfg)))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    key = jax.random.PRNGKey(1)

    tree, losses = step(tree, key, batch)
    _ = float(jax.device_get(losses["total"]))     # compile + sync
    t0 = time.perf_counter()
    for i in range(steps):
        tree, losses = step(tree, jax.random.fold_in(key, i), batch)
    total = float(jax.device_get(losses["total"]))  # sync once
    dt = (time.perf_counter() - t0) / steps
    print(f"{label:10s} {dt*1e3:7.1f} ms/step  "
          f"{cfg.train.batch_size/dt:6.1f} samples/s  loss={total:.1f}",
          flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    bench(DEFAULT, "twopass")
    exact = dataclasses.replace(
        DEFAULT, augment=dataclasses.replace(DEFAULT.augment, warp_method="exact")
    )
    bench(exact, "exact")
