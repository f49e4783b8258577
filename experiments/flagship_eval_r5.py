"""Round-5 flagship accuracy story (round-4 VERDICT next #1 + #2).

Round 4 left two open accuracy questions:

  1. The 6-stage flagship's source AP (0.277 at 4-scale / 0.370 at
     1-scale) trailed round 3's 2-STAGE toy (0.700) — but the two were
     never compared under one protocol (different eval sets). Is the
     flagship undertrained at the 10k-step budget, or does 6-stage
     from-scratch training have a recipe problem?
  2. The 4-scale pyramid helps only the adapted model (+0.093**), is
     CI-neutral zero-shot, and HURTS the base model on source (-0.093).
     The r4 full tables hint why: 4-scale collapses AP_L (0.446 ->
     0.196 zero-shot) while lifting AP_M. Hypothesis: scale brittleness
     of an undertrained base; it should shrink with training budget.

This run settles both on ONE protocol — the exact round-4 eval sets
(seeds 97/99: 60 source scenes / 120 target scenes, 355 GT persons),
recipe (batch 10, lr 1e-4, clip 5, frozen-VGG 800-step adaptation) and
paired image-bootstrap CIs — with three pretraining arms:

  * s2_10k : 2-stage model, 10k steps (the round-3 toy, on this protocol)
  * s6_10k : 6-stage flagship, 10k steps (the round-4 base, replicated)
  * s6_30k : 6-stage flagship, 30k steps at batch 16 (the budget probe;
             ~3x steps, ~4.8x samples over s6_10k)

Every arm is evaluated on BOTH domains at 1-scale and the 4-scale
product pyramid (s6_30k additionally at 2-scale), zero-shot and after
the config-5 fine-tune, with per-person-size breakdowns (AP_M / AP_L)
for the pyramid question. Per-head training losses are logged for the
6-stage arms (stage-wise underfit diagnosis).

Reference contract: SURVEY C21 / BASELINE.json configs 4-5 (the
adaptation premise), BASELINE.json:8 (the 4-scale product path).

Run (chip):  PYTHONPATH=. python experiments/flagship_eval_r5.py
CPU smoke:   FL_BASE_STEPS=20 FL_LONG_STEPS=30 FL_ADAPT_STEPS=10 \
             FL_N_BOOT=50 FL_N_EVAL_A=6 FL_N_EVAL_B=8 JAX_PLATFORMS=cpu \
             PYTHONPATH=. python experiments/flagship_eval_r5.py
"""

import dataclasses
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np

BASE_STEPS = int(os.environ.get("FL_BASE_STEPS", 10000))
LONG_STEPS = int(os.environ.get("FL_LONG_STEPS", 30000))
# FL_CONT=1: budget-probe arm continues the s6_10k checkpoint (same
# batch 10 recipe, workdir copied) to LONG_STEPS instead of training a
# separate batch-16 arm from scratch — budget differs by STEPS ONLY and
# the first 10k steps are shared, so the budget delta is a paired
# continuation. Used on the tunneled sandbox where a fresh 30k-step
# batch-16 arm does not fit the round's wall clock (~330 ms/step
# end-to-end with tunnel transfer + one transient ~25-min outage
# observed mid-run).
CONT = os.environ.get("FL_CONT", "") not in ("", "0")
# FL_SKIP_2S=1 drops the 2-scale extra sets (one more ~10-min tunnel
# compile); the per-size AP_M/AP_L tables carry the pyramid mechanism.
SKIP_2S = os.environ.get("FL_SKIP_2S", "") not in ("", "0")
ADAPT_STEPS = int(os.environ.get("FL_ADAPT_STEPS", 800))
N_BOOT = int(os.environ.get("FL_N_BOOT", 1000))
N_EVAL_A = int(os.environ.get("FL_N_EVAL_A", 60))
N_EVAL_B = int(os.environ.get("FL_N_EVAL_B", 120))
WORKROOT = os.environ.get("FL_WORKROOT", "/tmp/fl5")
SCALES_4 = (0.5, 1.0, 1.5, 2.0)
SCALES_2 = (0.5, 1.0)
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
    # NOTE: no persistent compile cache here. On the tunneled axon
    # backend it cannot shortcut remote compiles (coldstart_r3_tpu.log)
    # and enabling it stalled the first train-step compile >19 min in
    # this round's first launch attempt (executable serialization through
    # the tunnel); prediction-compile dedupe comes from est_for() below.
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

    from tpupose.config import DEFAULT, ModelConfig, TrainConfig, with_scales
    from tpupose.data import coco_eval, pipeline
    from tpupose.infer import PoseEstimator
    from tpupose.training import loop

    imgs_a, gts_a = load_eval(ds["A_eval"][0])
    imgs_b, gts_b = load_eval(ds["B_eval"][0])
    print(f"eval sets: A {len(imgs_a)} images / "
          f"{sum(len(g) for g in gts_a)} persons, "
          f"B {len(imgs_b)} images / {sum(len(g) for g in gts_b)} persons",
          flush=True)

    def cfg_for(stages, batch):
        c = dataclasses.replace(
            DEFAULT,
            model=ModelConfig(num_stages=stages),
            train=TrainConfig(batch_size=batch, base_lr=1e-4, clip_norm=5.0,
                              checkpoint_every=5000, log_every=500),
        )
        return with_scales(SCALES_4, c)

    # --- pretraining arms ------------------------------------------------
    long_name = f"s6_{LONG_STEPS // 1000}k"
    if CONT:
        arm_specs = (
            ("s2_10k", 2, 10, BASE_STEPS),
            ("s6_10k", 6, 10, BASE_STEPS),
            (long_name, 6, 10, LONG_STEPS),
        )
        # the budget arm resumes the s6_10k trajectory in its own workdir
        import shutil

        src, dst = f"{WORKROOT}_s6_10k", f"{WORKROOT}_{long_name}"
        if os.path.isdir(src) and not os.path.isdir(dst):
            shutil.copytree(src, dst)
    else:
        arm_specs = (
            ("s2_10k", 2, 10, BASE_STEPS),
            ("s6_10k", 6, 10, BASE_STEPS),
            ("s6_30k", 6, 16, LONG_STEPS),
        )
    arms = {}   # name -> (cfg, base_params, ft_params)
    for name, stages, batch, steps in arm_specs:
        cfg = cfg_for(stages, batch)
        t = time.time()
        base = loop.train(cfg, pipeline.dataset_batches(a_train, cfg),
                          workdir=f"{WORKROOT}_{name}", max_steps=steps)
        heads = {k: round(float(v), 2)
                 for k, v in sorted(base["last_losses"].items())}
        print(f"{name}: {base['steps']} steps, "
              f"per-head losses {json.dumps(heads)}, "
              f"{time.time() - t:.0f}s", flush=True)
        t = time.time()
        ft_cfg = dataclasses.replace(cfg, train=cfg.train.frozen_vgg())
        ft = loop.train(ft_cfg, pipeline.dataset_batches(b_train, ft_cfg),
                        workdir=f"{WORKROOT}_{name}_ft", max_steps=ADAPT_STEPS,
                        params=base["state"]["params"])
        print(f"{name} finetune: {ft['steps']} steps, "
              f"{time.time() - t:.0f}s", flush=True)
        arms[name] = (cfg, base["state"]["params"], ft["state"]["params"])

    # --- scratch control (6-stage at the adaptation budget) --------------
    cfg6 = arms["s6_10k"][0]
    t = time.time()
    scratch = loop.train(cfg6, pipeline.dataset_batches(b_train, cfg6),
                         workdir=f"{WORKROOT}_scratch", max_steps=ADAPT_STEPS)
    print(f"scratch: {scratch['steps']} steps, {time.time() - t:.0f}s",
          flush=True)

    # --- predictions ------------------------------------------------------
    # ONE estimator per stage count: PoseEstimator's jitted programs take
    # params as a traced argument, so swapping device-resident params
    # reuses every compiled (geometry x scales) program across the
    # base/ft/scratch variants — on the tunneled backend each compile
    # costs 35-756 s (warmup_r4_tpu.log), so this is the difference
    # between ~5 prediction compiles and ~19.
    est_cache = {}

    def est_for(cfg, params):
        key = cfg.model.num_stages
        if key not in est_cache:
            est_cache[key] = PoseEstimator(cfg, params=params)
        est = est_cache[key]
        est.params = jax.device_put(params)
        return est

    t = time.time()
    preds_b = {"scratch6_4s": predict(
        est_for(cfg6, scratch["state"]["params"]), imgs_b, SCALES_4)}
    preds_a = {}
    for name, (cfg, base_p, ft_p) in arms.items():
        eb = est_for(cfg, base_p)
        preds_b[f"{name}_zeroshot_4s"] = predict(eb, imgs_b, SCALES_4)
        preds_b[f"{name}_zeroshot_1s"] = predict(eb, imgs_b, SCALES_1)
        preds_a[f"{name}_base_4s"] = predict(eb, imgs_a, SCALES_4)
        preds_a[f"{name}_base_1s"] = predict(eb, imgs_a, SCALES_1)
        if name == long_name and not SKIP_2S:
            preds_b[f"{name}_zeroshot_2s"] = predict(eb, imgs_b, SCALES_2)
            preds_a[f"{name}_base_2s"] = predict(eb, imgs_a, SCALES_2)
        ef = est_for(cfg, ft_p)
        preds_b[f"{name}_ft_4s"] = predict(ef, imgs_b, SCALES_4)
        preds_b[f"{name}_ft_1s"] = predict(ef, imgs_b, SCALES_1)
        preds_a[f"{name}_retention_4s"] = predict(ef, imgs_a, SCALES_4)
        if name == long_name and not SKIP_2S:
            preds_b[f"{name}_ft_2s"] = predict(ef, imgs_b, SCALES_2)
        print(f"predictions [{name}]: cumulative {time.time() - t:.0f}s",
              flush=True)

    # --- paired bootstrap --------------------------------------------------
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
        for name in sorted(names):
            lo, hi = boot["ci"][name]
            out["arms"][name] = {
                "AP": round(boot["value"][name], 4),
                "ci95": [round(lo, 4), round(hi, 4)],
            }
            print(f"{name:24s} AP {ci_str(boot['value'][name], lo, hi)}",
                  flush=True)

    def delta(boot, a, b, label):
        d = boot["samples"][a] - boot["samples"][b]
        lo, hi = np.percentile(d, [2.5, 97.5])
        val = boot["value"][a] - boot["value"][b]
        out["deltas"][label] = {
            "delta": round(float(val), 4),
            "ci95": [round(float(lo), 4), round(float(hi), 4)],
            "excludes_0": bool(lo > 0 or hi < 0),
        }
        mark = "  **" if (lo > 0 or hi < 0) else ""
        print(f"delta {label:44s} {ci_str(val, lo, hi)}{mark}", flush=True)

    # Q1: does the flagship beat the 2-stage under one protocol?
    for dom, boot, suffix in (("A", boot_a, "base"), ("B", boot_b, "ft")):
        for arm in ("s6_10k", long_name):
            delta(boot, f"{arm}_{suffix}_4s", f"s2_10k_{suffix}_4s",
                  f"[{dom}] {arm} - s2_10k ({suffix}, 4s)")
    # Q1b: what the budget bought
    delta(boot_a, f"{long_name}_base_4s", "s6_10k_base_4s",
          f"[A] budget {long_name} - 10k (base, 4s)")
    delta(boot_b, f"{long_name}_ft_4s", "s6_10k_ft_4s",
          f"[B] budget {long_name} - 10k (ft, 4s)")
    # Q2: when does the pyramid pay? (per arm, both domains)
    for arm in arms:
        delta(boot_a, f"{arm}_base_4s", f"{arm}_base_1s",
              f"[A] 4s - 1s ({arm} base)")
        delta(boot_b, f"{arm}_ft_4s", f"{arm}_ft_1s",
              f"[B] 4s - 1s ({arm} ft)")
        delta(boot_b, f"{arm}_zeroshot_4s", f"{arm}_zeroshot_1s",
              f"[B] 4s - 1s ({arm} zeroshot)")
    # adaptation / retention per arm (the config-5 contract)
    for arm in arms:
        delta(boot_b, f"{arm}_ft_4s", f"{arm}_zeroshot_4s",
              f"[B] adaptation ({arm})")
        delta(boot_a, f"{arm}_retention_4s", f"{arm}_base_4s",
              f"[A] retention - base ({arm})")
    delta(boot_b, "s6_10k_ft_4s", "scratch6_4s", "[B] pretraining (s6_10k)")

    # full per-size tables (AP_M / AP_L carry the pyramid mechanism)
    out["full_B"] = {
        name: {k: round(float(v), 3)
               for k, v in coco_eval.evaluate(p, gts_b).items()}
        for name, p in preds_b.items()
    }
    out["full_A"] = {
        name: {k: round(float(v), 3)
               for k, v in coco_eval.evaluate(p, gts_a).items()}
        for name, p in preds_a.items()
    }
    for dom in ("A", "B"):
        for name, tab in sorted(out[f"full_{dom}"].items()):
            print(f"full[{dom}] {name:24s} AP {tab['AP']:.3f} "
                  f"AP_M {tab.get('AP_M', -1):.3f} "
                  f"AP_L {tab.get('AP_L', -1):.3f}", flush=True)
    out["wall_minutes"] = round((time.time() - t0) / 60, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
