"""On-chip A/B: conv1_1 space-to-depth fold (round 4). RESULT: NEGATIVE.

Measured (experiments/fold_conv1_r4_tpu.log): fold=on is 0.94x on the
4-scale batch-8 forward set (112.6 -> 120.2 ms), 0.93x single-scale
b16, 0.93x on the train step. The 4x nominal FLOPs of the 75%-zero
scattered kernel outweigh the contraction-depth gain — XLA's native
lowering of the 3-channel conv is already better at these shapes.
fold_conv1 stays opt-in/off; equivalence remains pinned in
tests/test_model.py so the probe is reproducible.

The round-3 ceiling analysis (BASELINE.md) pinned the forward's biggest
remaining loss on conv1_1: a 3-input-channel 3x3 conv contracts 27
values — <=27/128 of the MXU's systolic depth — and measures ~1.3% MFU,
costing ~8-11 ms of the 119 ms batch-8 4-scale forwards.
FoldedConv3x3 computes the identical 27-tap dot products at half
resolution with a 108-deep contraction (space-to-depth; equivalence
pinned to float rounding in tests/test_model.py).

This probe times the device-resident flagship forwards with the fold
ON vs OFF:
  a) the 4-scale pyramid forward set, batch 8 (the headline's compute)
  b) the single-scale 368^2 forward, batch 16
  c) the full fused train step, batch 16 (fwd+bwd+update)

Run:  PYTHONPATH=.:/root/.axon_site python experiments/fold_conv1_r4.py
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np


def timed(fn, *args, iters=30, warm=2):
    """Median-of-3 rounds; each round dispatches `iters` calls and fetches
    only the last result — on the tunneled backend block_until_ready is
    not a reliable sync (first version of this probe measured 0.5 ms for
    a 60 ms program), but execution is in dispatch order on one stream,
    so device_get of the final scalar bounds the whole chain."""
    import jax

    for _ in range(warm):
        jax.device_get(fn(*args))
    rounds = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        jax.device_get(out)
        rounds.append((time.perf_counter() - t0) / iters)
    rounds.sort()
    return 1e3 * rounds[1]


def main():
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), flush=True)
    from tpupose.models.openpose import OpenPose

    scales = (0.5, 1.0, 1.5, 2.0)
    box = 368
    rng = np.random.default_rng(0)
    results = {}

    m_off = OpenPose(num_stages=6)
    m_on = OpenPose(num_stages=6, fold_conv1=True)
    dummy = jnp.zeros((1, box, box, 3), jnp.float32)
    params = jax.device_put(m_off.init(jax.random.PRNGKey(0), dummy)["params"])

    # a) 4-scale forward set, batch 8
    imgs = [jax.device_put(rng.normal(0, 0.3, (8, int(box * s), int(box * s), 3))
                           .astype(np.float32)) for s in scales]

    def fwd_pyr(model):
        @jax.jit
        def f(params, xs):
            outs = [model.apply({"params": params}, x)[-1] for x in xs]
            # scalar result: keeps the per-iteration fetch off the timing
            return sum(o[0].sum() + o[1].sum() for o in outs)
        return f

    for tag, m in (("off", m_off), ("on", m_on)):
        t0 = time.perf_counter()
        ms = timed(fwd_pyr(m), params, imgs)
        results[f"pyr4_b8_ms_{tag}"] = round(ms, 2)
        print(f"4-scale fwd b8 fold={tag}: {ms:.1f} ms "
              f"({8e3 / ms:.1f} img/s dev)  [compile+run {time.perf_counter()-t0:.0f}s]",
              flush=True)

    # b) single-scale 368^2 forward, batch 16
    x16 = jax.device_put(rng.normal(0, 0.3, (16, box, box, 3)).astype(np.float32))
    for tag, m in (("off", m_off), ("on", m_on)):
        f = jax.jit(lambda p, x, m=m: sum(
            o.sum() for o in m.apply({"params": p}, x)[-1]))
        ms = timed(f, params, x16)
        results[f"single_b16_ms_{tag}"] = round(ms, 2)
        print(f"single fwd b16 fold={tag}: {ms:.1f} ms ({16e3 / ms:.1f} img/s dev)",
              flush=True)

    # c) full train step, batch 16 (same pattern as tpupose/benchmark.py)
    import dataclasses

    from tpupose.config import DEFAULT
    from tpupose.data.pipeline import synthetic_batches
    from tpupose.training.train import create_state, make_train_step

    cfg = dataclasses.replace(
        DEFAULT, train=dataclasses.replace(DEFAULT.train, batch_size=16))
    batch = {k: jnp.asarray(v) for k, v in next(iter(synthetic_batches(cfg)))
             .items()}
    params_host = jax.device_get(params)
    for tag, fold in (("off", False), ("on", True)):
        m = OpenPose(num_stages=6, fold_conv1=fold)
        # the step donates its state tree — each arm needs its own buffers
        state, tx = create_state(cfg, jax.device_put(params_host))
        step = make_train_step(cfg, m, tx, loss_denom=16)
        tree = state.tree()
        key = jax.random.PRNGKey(1)
        tree, losses = step(tree, key, batch)
        jax.device_get(losses["total"])
        iters = 20
        t0 = time.perf_counter()
        for i in range(iters):
            tree, losses = step(tree, jax.random.fold_in(key, i), batch)
        jax.device_get(losses["total"])
        ms = 1e3 * (time.perf_counter() - t0) / iters
        results[f"train_b16_ms_{tag}"] = round(ms, 2)
        print(f"train step b16 fold={tag}: {ms:.1f} ms "
              f"({16e3 / ms:.1f} samples/s dev)", flush=True)

    if "pyr4_b8_ms_on" in results:
        results["pyr4_speedup"] = round(
            results["pyr4_b8_ms_off"] / results["pyr4_b8_ms_on"], 3)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
