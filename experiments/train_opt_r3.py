"""Round-3 train-step optimization study (VERDICT r2 next-round #1).

Round-2 state: full step 113.7 ms at batch 10 (88 samples/s, ~36 % MFU
at 816 GFLOP/sample fwd+bwd) vs 63 % end-to-end / ~72 % conv MFU on the
inference path. This experiment decomposes the step and measures the
levers:

  * batch scaling (10 / 16 / 32),
  * head dtype (f32 reference heads vs bf16 heads, f32 loss accum),
  * stage remat (memory-for-FLOPs),
  * stage decomposition: aug+GT prologue, forward, fwd+bwd, update.

All timings force a device_get per measured region (axon relay:
block_until_ready acknowledges dispatch, not completion). Steps chain
through donated state so dispatch pipelines; one sync at the end.

Usage: python experiments/train_opt_r3.py [scaling|decomp|all]
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
from tpupose.data.pipeline import synthetic_batches
from tpupose.models import OpenPose
from tpupose.training import create_state, make_train_step
from tpupose.training.train import make_preprocessed_step
from tpupose.utils.flops import PEAK_BF16_FLOPS, forward_flops

FWD = forward_flops(368, 368)          # 272 GFLOP
STEP = 3 * FWD                          # fwd+bwd approx


def make(cfg, head_dtype=jnp.float32, remat=False):
    model = OpenPose(
        num_stages=cfg.model.num_stages,
        dtype=jnp.dtype(cfg.model.compute_dtype),
        head_dtype=head_dtype,
        remat=remat,
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 368, 368, 3))
    )["params"]
    return model, params


def batch_for(cfg):
    b = next(iter(synthetic_batches(cfg)))
    return {k: jnp.asarray(v) for k, v in b.items()}


def timed(fn, *args, steps=20, chain=None):
    """fn(*args) repeated; chain(out)->new args threads state. Returns s."""
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])       # compile+sync
    if chain is not None:
        args = chain(out, args)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
        if chain is not None:
            args = chain(out, args)
    jax.device_get(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / steps


def full_step_time(cfg, head_dtype, remat, steps=20):
    model, params = make(cfg, head_dtype, remat)
    state, tx = create_state(cfg, params)
    step = make_train_step(cfg, model, tx, loss_denom=cfg.train.batch_size)
    tree = state.tree()
    batch = batch_for(cfg)
    key = jax.random.PRNGKey(1)

    tree, losses = step(tree, key, batch)
    jax.device_get(losses["total"])
    t0 = time.perf_counter()
    for i in range(steps):
        tree, losses = step(tree, jax.random.fold_in(key, i), batch)
    jax.device_get(losses["total"])
    return (time.perf_counter() - t0) / steps


def scaling():
    print("=== batch scaling x head dtype x remat (full step) ===", flush=True)
    for n in (10, 16, 32):
        for hd, hd_name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
            for remat in (False, True):
                cfg = dataclasses.replace(
                    DEFAULT,
                    train=dataclasses.replace(DEFAULT.train, batch_size=n),
                )
                try:
                    dt = full_step_time(cfg, hd, remat)
                except Exception as e:  # OOM etc.
                    print(f"b{n:2d} head={hd_name:4s} remat={int(remat)}  "
                          f"FAILED: {type(e).__name__}: {str(e)[:120]}",
                          flush=True)
                    continue
                sps = n / dt
                mfu = sps * STEP / PEAK_BF16_FLOPS * 100
                print(f"b{n:2d} head={hd_name:4s} remat={int(remat)}  "
                      f"{dt*1e3:7.1f} ms/step  {sps:6.1f} samples/s  "
                      f"MFU {mfu:4.1f} %", flush=True)


def decomp():
    print("=== step decomposition (batch 10 / 32, f32 heads) ===", flush=True)
    from tpupose.gt import augment as gt_augment
    from tpupose.gt import rasterize as gt_rasterize
    from tpupose.ops import image as image_ops
    from tpupose.training import loss as loss_lib

    for n in (10, 32):
        cfg = dataclasses.replace(
            DEFAULT, train=dataclasses.replace(DEFAULT.train, batch_size=n)
        )
        model, params = make(cfg)
        batch = batch_for(cfg)
        mc, ac = cfg.model, cfg.augment

        def aug_gt_impl(key, batch):
            imgs, mask, joints = gt_augment.augment_batch(
                key, batch["images"].astype(jnp.float32),
                batch["masks"].astype(jnp.float32) / 255.0,
                batch["joints"], batch["centers"], batch["scales"], mc, ac,
            )
            paf_gt, heat_gt = gt_rasterize.create_labels(
                joints, mask, label_size=mc.label_size, stride=mc.stride,
                sigma=ac.sigma, paf_thre=ac.paf_thre,
            )
            return image_ops.normalize(imgs, mc.channel_order), paf_gt, heat_gt, mask

        aug_gt = jax.jit(aug_gt_impl)
        # sync on a scalar — device_get of a full batch rides the ~25 MB/s
        # relay and would swamp the measurement
        aug_gt_s = jax.jit(
            lambda key, batch: sum(x.sum() for x in aug_gt_impl(key, batch))
        )

        key = jax.random.PRNGKey(1)
        dt_aug = timed(
            aug_gt_s, key, batch,
            chain=lambda out, args: (jax.random.fold_in(args[0], 1), args[1]),
        )

        imgs_n, paf_gt, heat_gt, mask = aug_gt(key, batch)
        jax.device_get(mask.sum())

        fwd = jax.jit(
            lambda p, x: sum(
                o.astype(jnp.float32).sum()
                for pair in model.apply({"params": p}, x) for o in pair
            )
        )
        dt_fwd = timed(fwd, params, imgs_n)

        def loss_fn(p, x, pg, hg, m):
            outs = model.apply({"params": p}, x)
            return loss_lib.stagewise_losses(outs, pg, hg, m, n)["total"]

        vg = jax.jit(jax.value_and_grad(loss_fn))
        dt_fb = timed(vg, params, imgs_n, paf_gt, heat_gt, mask)

        state, tx = create_state(cfg, params)
        pstep = make_preprocessed_step(cfg, model, tx)
        tree = state.tree()
        pbatch = {"images_norm": imgs_n, "paf_gt": paf_gt,
                  "heat_gt": heat_gt, "label_mask": mask}
        tree, losses = pstep(tree, pbatch)
        jax.device_get(losses["total"])
        t0 = time.perf_counter()
        for _ in range(20):
            tree, losses = pstep(tree, pbatch)
        jax.device_get(losses["total"])
        dt_pstep = (time.perf_counter() - t0) / 20

        mfu_f = n * FWD / dt_fwd / PEAK_BF16_FLOPS * 100
        mfu_fb = n * STEP / dt_fb / PEAK_BF16_FLOPS * 100
        print(f"b{n:2d}: aug+GT {dt_aug*1e3:6.1f} ms | fwd {dt_fwd*1e3:6.1f} ms"
              f" ({mfu_f:4.1f}% MFU) | fwd+bwd {dt_fb*1e3:6.1f} ms"
              f" ({mfu_fb:4.1f}% MFU) | fwd+bwd+update {dt_pstep*1e3:6.1f} ms",
              flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    if mode in ("decomp", "all"):
        decomp()
    if mode in ("scaling", "all"):
        scaling()
