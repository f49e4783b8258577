"""Round-3 end-to-end proof (re-run with the complete log committed — round-2 VERDICT missing #3) on the chip: synthetic-domain training from
random init through the full pipeline (HDF5 -> prefetch -> on-device
two-pass-warp aug + GT -> fused train step -> checkpoints), then OKS AP
with the framework's own decoder and REAL (estimated-bbox) areas.

Round-1: AP 0.463; round-2: AP 0.559 (3000 steps, 2-stage variant). This re-run captures the FULL log including the eval output, lands the round-3 decode (K=64 tier, advisor fixes) and the async checkpointing in the measured path.
"""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import dataclasses

import numpy as np


def main():
    import jax

    print("backend:", jax.default_backend(), flush=True)
    train_ds = "/tmp/r3_train.h5"
    eval_ds = "/tmp/r3_eval.h5"
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    for path, count, seed in ((train_ds, 120, 0), (eval_ds, 6, 99)):
        if not os.path.exists(path):
            subprocess.run(
                [sys.executable, os.path.join(ROOT, "tools/make_synthetic_dataset.py"),
                 "--output", path, "--count", str(count), "--seed", str(seed)],
                check=True, env=env,
            )

    from tpupose.config import DEFAULT, ModelConfig, TrainConfig
    from tpupose.data import coco_eval, hdf5 as hdf5_io, pipeline
    from tpupose.infer import PoseEstimator
    from tpupose.training import loop

    cfg = dataclasses.replace(
        DEFAULT,
        model=ModelConfig(num_stages=2),
        train=TrainConfig(batch_size=10, base_lr=1e-4, clip_norm=5.0,
                          checkpoint_every=1000, log_every=200),
    )
    t0 = time.time()
    batches = pipeline.hdf5_batches(train_ds, cfg)
    result = loop.train(cfg, batches, workdir="/tmp/r3_run", max_steps=3000)
    print(f"trained {result['steps']} steps @ "
          f"{result['steps_per_sec']:.2f} steps/s "
          f"({result['steps_per_sec']*cfg.train.batch_size:.1f} samples/s), "
          f"total loss {result['last_losses'].get('total'):.1f}", flush=True)

    est = PoseEstimator(cfg, params=result["state"]["params"])
    preds, gts = [], []
    for rec in hdf5_io.read_samples(eval_ds):
        out = est.process(rec["image"])
        preds.append(out["people"])
        gts.append([
            {"keypoints": j, "area": float(a)}
            for j, a in zip(rec["joints"], rec["areas"])
            if (j[:, 2] < 2).any()
        ])
    res = coco_eval.evaluate(preds, gts)
    n_det = sum(len(p) for p in preds)
    n_gt = sum(len(g) for g in gts)
    print(json.dumps({**{k: round(v, 3) for k, v in res.items()},
                      "detections": n_det, "gt_persons": n_gt,
                      "wall_minutes": round((time.time() - t0) / 60, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
