"""Round-5: the .tppx deployment bundle ON THE CHIP + the RSS-guard
soak (round-4 VERDICT weak #3/#4, next #4/#5).

Round 4 shipped deploy.py (jax.export StableHLO programs + weights +
manifest) with CPU-only evidence. This run drives the full deployment
story on the TPU:

  1. export the trained flagship's single-scale serving programs
     (bucket 368x368, batches 1/2/4/8) into a bundle; report wall time
     and artifact size
  2. fresh-process load -> first-request latency, vs a live estimator's
     cold compile for the same program (on the tunneled backend BOTH
     recompile server-side — jax.export re-stages StableHLO; the bundle
     buys pinned numerics and model-code-free hosts, NOT a compile
     skip; docs/serving.md states this)
  3. byte-identical HTTP replies: the bundle server and the live server
     answer the same scene bodies with identical JSON
  4. the round-4 soak protocol (8 clients, mixed shapes + crowd,
     bounded queue) against the BUNDLE server for >= 10 min, with the
     /metrics rss_mb gauge recorded per window
  5. the --max-rss-mb recycle guard firing on-chip through the real
     CLI (`python -m tpupose.serve --program ... --max-rss-mb N` ->
     drain + exit 3)

Run (chip, after experiments/flagship_eval_r5.py left its checkpoint):
  PYTHONPATH=. python experiments/tppx_onchip_r5.py \
      --ckpt /tmp/fl5_s6_30k/checkpoints --soak-s 600
CPU smoke:
  JAX_PLATFORMS=cpu PYTHONPATH=. python experiments/tppx_onchip_r5.py \
      --stages 1 --soak-s 20 --guard-port 18731
"""

import argparse
import http.client
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from serve_soak_r4 import encode, render_scenes, soak  # noqa: E402  (same dir)


def http_reply(host, port, body, path="/pose"):
    c = http.client.HTTPConnection(host, port, timeout=600)
    c.request("POST", path, body=body)
    r = c.getresponse()
    data = r.read()
    c.close()
    return r.status, data


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="/tmp/fl5_s6_30k/checkpoints")
    ap.add_argument("--stages", type=int, default=6)
    ap.add_argument("--soak-s", type=float, default=600.0)
    ap.add_argument("--bundle", default="/tmp/flagship_r5.tppx")
    ap.add_argument("--guard-port", type=int, default=18733)
    ap.add_argument("--skip-soak", action="store_true")
    args = ap.parse_args()

    import dataclasses

    import jax

    print("backend:", jax.default_backend(), flush=True)
    from tpupose.config import DEFAULT, ModelConfig, single_scale
    from tpupose.deploy import load_bundle, save_bundle
    from tpupose.infer import PoseEstimator
    from tpupose.serve import serve
    from tpupose.training.checkpoint import restore_params

    params = restore_params(args.ckpt) if os.path.isdir(args.ckpt) else None
    print("trained checkpoint:", "loaded" if params is not None else
          "ABSENT (random weights)", flush=True)

    cfg = single_scale(dataclasses.replace(
        DEFAULT, model=ModelConfig(num_stages=args.stages)))
    live = PoseEstimator(cfg, params=params)

    # --- 1. export -------------------------------------------------------
    t0 = time.time()
    manifest = save_bundle(args.bundle, live, [(368, 368)], max_batch=8)
    t_export = time.time() - t0
    size_mb = os.path.getsize(args.bundle) / 1e6
    print(f"export: {t_export:.0f}s, {size_mb:.1f} MB, programs "
          f"{sorted(p['n'] for p in manifest['programs'])}", flush=True)

    scenes = render_scenes()
    bodies = encode(scenes)

    # --- 2. load -> first request, vs live cold compile -------------------
    t0 = time.time()
    dep = load_bundle(args.bundle)
    t_load = time.time() - t0
    t0 = time.time()
    first = dep.process(scenes[0][1])
    t_first = time.time() - t0
    print(f"bundle: load {t_load:.1f}s, first request {t_first:.1f}s "
          f"({len(first['people'])} people)", flush=True)

    cold = PoseEstimator(cfg, params=live.params)
    from tpupose.buckets import to_bucket

    canvas, vh, vw = to_bucket(scenes[0][1], 368, 368, 1.0)
    t0 = time.time()
    cold.process_batch(canvas[None],
                       valid_hw=np.asarray([[vh, vw]], np.int32))
    t_cold = time.time() - t0
    print(f"live estimator cold first batch: {t_cold:.1f}s", flush=True)

    # --- 3. byte-identical HTTP replies ----------------------------------
    srv_live = serve(live, port=0, max_batch=8, buckets=((368, 368),),
                     request_timeout_s=600.0)
    srv_dep = serve(dep, port=0, max_batch=8, buckets=((368, 368),),
                    request_timeout_s=600.0)
    identical = True
    for tag, body in bodies:
        s1, d1 = http_reply(*srv_live.server_address[:2], body)
        s2, d2 = http_reply(*srv_dep.server_address[:2], body)
        same = s1 == s2 == 200 and d1 == d2
        identical &= same
        print(f"reply parity [{tag}]: live={s1} bundle={s2} "
              f"identical={same}", flush=True)
    for srv in (srv_live, srv_dep):
        srv.shutdown()
        if srv.batcher is not None:
            srv.batcher.close()
    print("HTTP replies byte-identical:", identical, flush=True)

    # --- 4. the round-4 soak against the bundle server -------------------
    out = {"export_s": round(t_export, 1), "bundle_mb": round(size_mb, 1),
           "load_s": round(t_load, 1), "first_request_s": round(t_first, 1),
           "live_cold_s": round(t_cold, 1), "replies_identical": identical}
    if not args.skip_soak:
        out["soak"] = soak(dep, scenes, args.soak_s)

    # --- 5. the recycle guard through the real CLI ------------------------
    env = dict(os.environ)
    proc = subprocess.Popen(
        [sys.executable, "-m", "tpupose.serve", "--program", args.bundle,
         "--port", str(args.guard_port), "--max-rss-mb", "64"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        cwd=ROOT,
    )
    try:
        outp, _ = proc.communicate(timeout=900)
        rc = proc.returncode
    except subprocess.TimeoutExpired:
        proc.kill()
        outp, _ = proc.communicate()
        rc = -1
    tail = outp.strip().splitlines()[-2:]
    print("guard run exit:", rc, "tail:", tail, flush=True)
    out["guard_exit"] = rc
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
