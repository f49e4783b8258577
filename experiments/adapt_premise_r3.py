"""Round-3 domain-adaptation premise demonstration (SURVEY C21).

BASELINE.json config 5's premise is "adapt a generically-pretrained
backbone to a new domain with a frozen/LR-damped VGG base". No real
COCO-pretrained weights can exist in this sandbox (no network), so the
round-1/2 runs could only show the *mechanics* (freeze verified,
losses fall) — transfer itself failed because a backbone trained on ONE
synthetic style has no style-invariant features to transfer
(BASELINE.md round 1, honest negative).

This experiment makes the premise demonstrable in-sandbox by making the
SOURCE domain diverse (`--style varied`: per-scene randomized
background brightness/texture, figure color/thickness, distractors), so
the pretrained backbone must learn style-invariant structure — the
stand-in for "generic pretrained". Then, at EQUAL small-data budget on
the unseen target domain (`--style light`):

  arm 1: fine-tune from the pretrained base, VGG frozen (the
         reference's config-5 recipe)
  arm 2: train from random init (the control)

and report OKS AP on held-out target-domain scenes, plus source-domain
retention for the fine-tuned model. The reference's claim is arm 1 >>
arm 2 — pretrained features make small-data adaptation work.

Run (chip): PYTHONPATH=. python experiments/adapt_premise_r3.py
"""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import dataclasses

BASE_STEPS = 10000
ADAPT_STEPS = 800


def make_ds(path, count, seed, style):
    if os.path.exists(path):
        return
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools/make_synthetic_dataset.py"),
         "--output", path, "--count", str(count), "--seed", str(seed),
         "--style", style],
        check=True, env=env,
    )


def evaluate(est, eval_ds):
    from tpupose.data import coco_eval, hdf5 as hdf5_io

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
    res["detections"] = sum(len(p) for p in preds)
    res["gt_persons"] = sum(len(g) for g in gts)
    return {k: round(float(v), 3) for k, v in res.items()}


def main():
    import jax

    print("backend:", jax.default_backend(), flush=True)
    ds = {
        "A_train": ("/tmp/adapt_A_train.h5", 320, 0, "varied"),
        "A_eval": ("/tmp/adapt_A_eval.h5", 6, 97, "varied"),
        "B_train": ("/tmp/adapt_B_train.h5", 16, 55, "light"),
        "B_eval": ("/tmp/adapt_B_eval.h5", 6, 99, "light"),
    }
    for path, count, seed, style in ds.values():
        make_ds(path, count, seed, style)

    from tpupose.config import DEFAULT, ModelConfig, TrainConfig
    from tpupose.data import pipeline
    from tpupose.infer import PoseEstimator
    from tpupose.training import loop

    cfg = dataclasses.replace(
        DEFAULT,
        model=ModelConfig(num_stages=2),
        train=TrainConfig(batch_size=10, base_lr=1e-4, clip_norm=5.0,
                          checkpoint_every=2000, log_every=400),
    )
    t0 = time.time()
    out = {}

    # --- pretrain on the diverse source domain -------------------------
    base = loop.train(cfg, pipeline.hdf5_batches(ds["A_train"][0], cfg),
                      workdir="/tmp/adapt_base", max_steps=BASE_STEPS)
    print(f"base: {base['steps']} steps, "
          f"loss {base['last_losses']['total']:.1f}", flush=True)
    base_params = base["state"]["params"]
    est = PoseEstimator(cfg, params=base_params)
    out["base_on_A"] = evaluate(est, ds["A_eval"][0])
    out["base_on_B_zeroshot"] = evaluate(est, ds["B_eval"][0])
    print("base_on_A:", json.dumps(out["base_on_A"]), flush=True)
    print("base_on_B_zeroshot:", json.dumps(out["base_on_B_zeroshot"]),
          flush=True)

    # --- arm 1: fine-tune from base, VGG frozen (config-5 recipe) ------
    ft_cfg = dataclasses.replace(cfg, train=cfg.train.frozen_vgg())
    ft = loop.train(ft_cfg, pipeline.hdf5_batches(ds["B_train"][0], ft_cfg),
                    workdir="/tmp/adapt_ft", max_steps=ADAPT_STEPS,
                    params=base_params)
    est_ft = PoseEstimator(cfg, params=ft["state"]["params"])
    out["finetune_on_B"] = evaluate(est_ft, ds["B_eval"][0])
    out["finetune_on_A_retention"] = evaluate(est_ft, ds["A_eval"][0])
    print("finetune_on_B:", json.dumps(out["finetune_on_B"]), flush=True)
    print("finetune_on_A_retention:",
          json.dumps(out["finetune_on_A_retention"]), flush=True)

    # --- arm 2: same budget from random init (control) -----------------
    scratch = loop.train(cfg, pipeline.hdf5_batches(ds["B_train"][0], cfg),
                         workdir="/tmp/adapt_scratch", max_steps=ADAPT_STEPS)
    est_s = PoseEstimator(cfg, params=scratch["state"]["params"])
    out["scratch_on_B"] = evaluate(est_s, ds["B_eval"][0])
    print("scratch_on_B:", json.dumps(out["scratch_on_B"]), flush=True)

    out["wall_minutes"] = round((time.time() - t0) / 60, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
