"""Round-4 flagship accuracy run: the full 6-stage model through the
e2e adaptation pipeline at statistical scale (round-3 VERDICT next #1).

Round 3 demonstrated the adaptation premise (SURVEY C21 /
BASELINE.json config 5) on a 2-STAGE variant over 12 held-out images —
statistically thin and not the model the bench/dryrun exercise. This
run closes both gaps and the 4-scale justification (VERDICT missing #4)
in one protocol:

  * model: the FULL 6-stage flagship (ModelConfig defaults)
  * held-out eval: 120 target-domain scenes + 60 source-domain scenes
    (>= 200 GT persons total), generated with seeds disjoint from
    training
  * arms: pretrain on diverse source (A, 'varied') -> zero-shot on
    target (B, 'light') -> frozen-VGG fine-tune on 16 B scenes (the
    reference's config-5 recipe) -> source retention -> scratch control
    at the same adaptation budget
  * every AP with a PAIRED image-bootstrap 95% CI
    (tpupose.data.coco_eval.bootstrap, 1000 resamples); deltas
    (finetune - zeroshot, finetune - scratch, 4-scale - 1-scale,
    retention - base) come from the same resamples so shared image
    variance cancels
  * each arm evaluated at BOTH the 4-scale product pyramid and
    single-scale, measuring the AP the headline path buys

Feeds ride the native .tpr container (pre-padded) so the 1-core host
keeps up with the chip. Run (chip):
  PYTHONPATH=. python experiments/flagship_eval_r4.py
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

# env overrides exist so a CPU smoke run can exercise the full protocol
# in minutes; the committed chip log uses the defaults
BASE_STEPS = int(os.environ.get("FL_BASE_STEPS", 10000))
ADAPT_STEPS = int(os.environ.get("FL_ADAPT_STEPS", 800))
N_BOOT = int(os.environ.get("FL_N_BOOT", 1000))
N_EVAL_A = int(os.environ.get("FL_N_EVAL_A", 60))
N_EVAL_B = int(os.environ.get("FL_N_EVAL_B", 120))
N_STAGES = int(os.environ.get("FL_STAGES", 6))
SCALES_4 = (0.5, 1.0, 1.5, 2.0)
SCALES_1 = (1.0,)
EVAL_BATCH = 8


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


def to_tpr(h5_path):
    tpr_path = h5_path.replace(".h5", ".tpr")
    if not os.path.exists(tpr_path):
        env = {**os.environ, "JAX_PLATFORMS": "cpu"}
        subprocess.run(
            [sys.executable, os.path.join(ROOT, "tools/pack_tpr.py"),
             "--input", h5_path, "--output", tpr_path,
             "--pre-pad", "368", "368"],
            check=True, env=env,
        )
    return tpr_path


def load_eval(ds_path):
    """Eval dataset -> (images (N, H, W, 3) u8, gts) with one entry per
    unique image (the packer writes one record per main person; dedupe
    on pixel content so each scene is evaluated once)."""
    from tpupose.data import hdf5 as hdf5_io

    images, gts, seen = [], [], set()
    for rec in hdf5_io.read_samples(ds_path):
        key = hash(rec["image"].tobytes())
        if key in seen:
            continue
        seen.add(key)
        images.append(rec["image"])
        gts.append([
            {"keypoints": j, "area": float(a)}
            for j, a in zip(rec["joints"], rec["areas"])
            if (j[:, 2] < 2).any()
        ])
    return np.stack(images), gts


def predict(est, images, scales):
    """Batched inference at a fixed batch size (one compile per scale
    set): pad the tail batch by repeating the last image."""
    people = []
    n = len(images)
    for i in range(0, n, EVAL_BATCH):
        chunk = images[i:i + EVAL_BATCH]
        k = len(chunk)
        if k < EVAL_BATCH:
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], EVAL_BATCH - k, axis=0)]
            )
        people.extend(est.process_batch(chunk, scales=scales)[:k])
    return people


def ci_str(value, lo, hi):
    return f"{value:.3f} [{lo:.3f}, {hi:.3f}]"


def main():
    import jax

    print("backend:", jax.default_backend(), flush=True)
    t0 = time.time()

    ds = {
        "A_train": ("/tmp/fl_A_train.h5", 320, 0, "varied"),
        "A_eval": ("/tmp/fl_A_eval.h5", N_EVAL_A, 97, "varied"),
        "B_train": ("/tmp/fl_B_train.h5", 16, 55, "light"),
        "B_eval": ("/tmp/fl_B_eval.h5", N_EVAL_B, 99, "light"),
    }
    for path, count, seed, style in ds.values():
        make_ds(path, count, seed, style)
    a_train = to_tpr(ds["A_train"][0])
    b_train = to_tpr(ds["B_train"][0])

    from tpupose.config import DEFAULT, TrainConfig, with_scales
    from tpupose.data import coco_eval, pipeline
    from tpupose.infer import PoseEstimator
    from tpupose.training import loop

    # FULL flagship: 6 stages (ModelConfig defaults), reference batch 10
    from tpupose.config import ModelConfig

    cfg = dataclasses.replace(
        DEFAULT,
        model=ModelConfig(num_stages=N_STAGES),
        train=TrainConfig(batch_size=10, base_lr=1e-4, clip_norm=5.0,
                          checkpoint_every=5000, log_every=500),
    )
    cfg = with_scales(SCALES_4, cfg)

    imgs_a, gts_a = load_eval(ds["A_eval"][0])
    imgs_b, gts_b = load_eval(ds["B_eval"][0])
    print(f"eval sets: A {len(imgs_a)} images / "
          f"{sum(len(g) for g in gts_a)} persons, "
          f"B {len(imgs_b)} images / {sum(len(g) for g in gts_b)} persons",
          flush=True)

    # --- pretrain the 6-stage flagship on the diverse source domain ----
    t = time.time()
    base = loop.train(cfg, pipeline.dataset_batches(a_train, cfg),
                      workdir="/tmp/fl_base", max_steps=BASE_STEPS)
    print(f"base: {base['steps']} steps, "
          f"loss {base['last_losses']['total']:.1f}, "
          f"{time.time() - t:.0f}s", flush=True)
    base_params = base["state"]["params"]
    est_base = PoseEstimator(cfg, params=base_params)

    # --- arm 1: frozen-VGG fine-tune on 16 target scenes ---------------
    t = time.time()
    ft_cfg = dataclasses.replace(cfg, train=cfg.train.frozen_vgg())
    ft = loop.train(ft_cfg, pipeline.dataset_batches(b_train, ft_cfg),
                    workdir="/tmp/fl_ft", max_steps=ADAPT_STEPS,
                    params=base_params)
    est_ft = PoseEstimator(cfg, params=ft["state"]["params"])
    print(f"finetune: {ft['steps']} steps, {time.time() - t:.0f}s",
          flush=True)

    # --- arm 2: scratch control at the same budget ----------------------
    t = time.time()
    scratch = loop.train(cfg, pipeline.dataset_batches(b_train, cfg),
                         workdir="/tmp/fl_scratch", max_steps=ADAPT_STEPS)
    est_s = PoseEstimator(cfg, params=scratch["state"]["params"])
    print(f"scratch: {scratch['steps']} steps, {time.time() - t:.0f}s",
          flush=True)

    # --- predictions (batched; 4-scale AND single-scale per arm) -------
    t = time.time()
    preds_b = {
        "zeroshot_4s": predict(est_base, imgs_b, SCALES_4),
        "zeroshot_1s": predict(est_base, imgs_b, SCALES_1),
        "finetune_4s": predict(est_ft, imgs_b, SCALES_4),
        "finetune_1s": predict(est_ft, imgs_b, SCALES_1),
        "scratch_4s": predict(est_s, imgs_b, SCALES_4),
    }
    preds_a = {
        "base_4s": predict(est_base, imgs_a, SCALES_4),
        "base_1s": predict(est_base, imgs_a, SCALES_1),
        "retention_4s": predict(est_ft, imgs_a, SCALES_4),
    }
    print(f"inference: {time.time() - t:.0f}s", flush=True)

    # --- paired bootstrap ----------------------------------------------
    t = time.time()
    boot_b = coco_eval.bootstrap(preds_b, gts_b, n_boot=N_BOOT, seed=0)
    boot_a = coco_eval.bootstrap(preds_a, gts_a, n_boot=N_BOOT, seed=0)
    print(f"bootstrap ({N_BOOT} resamples): {time.time() - t:.0f}s",
          flush=True)

    out = {"n_images": {"A": len(imgs_a), "B": len(imgs_b)},
           "n_persons": {"A": sum(len(g) for g in gts_a),
                         "B": sum(len(g) for g in gts_b)},
           "arms": {}, "deltas": {}}

    for boot, names in ((boot_b, preds_b), (boot_a, preds_a)):
        for name in names:
            lo, hi = boot["ci"][name]
            out["arms"][name] = {
                "AP": round(boot["value"][name], 4),
                "ci95": [round(lo, 4), round(hi, 4)],
            }
            print(f"{name:16s} AP {ci_str(boot['value'][name], lo, hi)}",
                  flush=True)

    def delta(boot, a, b, label):
        d = boot["samples"][a] - boot["samples"][b]
        lo, hi = np.percentile(d, [2.5, 97.5])
        val = boot["value"][a] - boot["value"][b]
        out["deltas"][label] = {
            "delta": round(float(val), 4),
            "ci95": [round(float(lo), 4), round(float(hi), 4)],
            "exceeds_ci": bool(lo > 0),
        }
        print(f"delta {label:34s} {ci_str(val, lo, hi)}"
              f"{'  **' if lo > 0 else ''}", flush=True)

    delta(boot_b, "finetune_4s", "zeroshot_4s", "adaptation (ft - zeroshot)")
    delta(boot_b, "finetune_4s", "scratch_4s", "pretraining (ft - scratch)")
    delta(boot_b, "finetune_4s", "finetune_1s", "4scale - 1scale (finetuned)")
    delta(boot_b, "zeroshot_4s", "zeroshot_1s", "4scale - 1scale (zeroshot)")
    delta(boot_a, "base_4s", "base_1s", "4scale - 1scale (source)")
    delta(boot_a, "retention_4s", "base_4s", "retention - base (source)")

    # full summaries for the record (all COCO lines, not just AP)
    out["full"] = {
        name: {k: round(float(v), 3)
               for k, v in coco_eval.evaluate(p, gts_b).items()}
        for name, p in preds_b.items()
    }
    out["wall_minutes"] = round((time.time() - t0) / 60, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
