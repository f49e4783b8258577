"""Serving soak + crowd-mixed grouped-decode bench (round-3 VERDICT
weak #3 follow-through).

Part 1 — overload soak: an in-process server (micro-batcher + shape
buckets + BOUNDED queue + request deadlines) under 8 concurrent clients
posting a rotation of mixed-shape scenes INCLUDING a crowd scene, for
>= 150 s. A deliberately undersized queue keeps the server at the shed
boundary the whole run. Reported per 30 s window: request counts by
status, client-side p50/p99 latency, and the process RSS — the claims
under test are bounded p99 (no monotonic queue growth) and stable RSS
(no thread/buffer leak), with shed counts visible in /metrics.

Part 2 — crowd-mixed serving bench: the serving estimator's fused
batched program (the exact code path MicroBatcher dispatches) on a
7-sparse + 1-crowd batch, decode_groups=1 vs 2 (the
``tpupose.serve --decode-groups`` wiring). With a TRAINED model the
crowd scene's peak counts force the big pair tier; grouping confines it
to its sub-batch. Reports img/s both ways + the per-image people counts
so tier separation is verifiable.

Run (chip, after experiments/flagship_eval_r4.py left its checkpoint):
  PYTHONPATH=. python experiments/serve_soak_r4.py \
      --ckpt /tmp/fl_base/checkpoints --soak-s 150
"""

import argparse
import http.client
import json
import os
import sys
import threading
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import dataclasses

import numpy as np


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for ln in f:
            if ln.startswith("VmRSS"):
                return int(ln.split()[1]) / 1024.0
    return -1.0


def render_scenes():
    """Request rotation: three shapes + one crowd scene, varied style
    (the flagship checkpoint's training domain)."""
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    import make_synthetic_dataset as synth

    rng = np.random.default_rng(123)
    scenes = []
    for (h, w, n_people, tag) in [
        (368, 368, 2, "sparse"),
        (480, 360, 3, "tall"),
        (256, 320, 1, "small"),
        (368, 368, 24, "crowd"),
    ]:
        joints = [synth.make_person(rng, w, h)[0] for _ in range(n_people)]
        img = synth.render(rng, joints, w, h, style="varied")
        scenes.append((tag, img))
    return scenes


def encode(scenes):
    import cv2

    out = []
    for tag, img in scenes:
        ok, enc = cv2.imencode(".png", img)
        assert ok
        out.append((tag, enc.tobytes()))
    return out


def soak(est, scenes, soak_s, n_clients=8):
    from tpupose.buckets import DEFAULT_BUCKETS
    from tpupose.serve import serve

    srv = serve(est, port=0, max_batch=8, batch_window_ms=5.0,
                buckets=DEFAULT_BUCKETS, max_queue=16,
                request_timeout_s=10.0)
    host, port = srv.server_address[:2]
    bodies = encode(scenes)

    # warm every bucket program before the clock starts
    for tag, body in bodies:
        c = http.client.HTTPConnection(host, port, timeout=600)
        c.request("POST", "/pose", body=body)
        r = c.getresponse()
        r.read()
        print(f"warm {tag}: {r.status}", flush=True)

    records = []  # (t_done, status, latency_s)
    rec_lock = threading.Lock()
    stop = threading.Event()

    def client(ci):
        i = ci  # stagger rotations across clients
        while not stop.is_set():
            tag, body = bodies[i % len(bodies)]
            i += 1
            t0 = time.perf_counter()
            try:
                c = http.client.HTTPConnection(host, port, timeout=30)
                c.request("POST", "/pose", body=body)
                r = c.getresponse()
                r.read()
                status = r.status
                c.close()
            except Exception:
                status = -1
            with rec_lock:
                records.append((time.perf_counter(), status,
                                time.perf_counter() - t0))

    threads = [threading.Thread(target=client, args=(i,), daemon=True)
               for i in range(n_clients)]
    t_start = time.perf_counter()
    for t in threads:
        t.start()

    windows = []
    win = 30.0
    n_windows = max(1, int(soak_s / win))
    for wdx in range(n_windows):
        time.sleep(win)
        now = time.perf_counter()
        with rec_lock:
            recent = [r for r in records if now - win <= r[0] <= now]
        lats = sorted(r[2] * 1e3 for r in recent if r[1] == 200)
        statuses = {}
        for _, s, _ in recent:
            statuses[s] = statuses.get(s, 0) + 1
        w = {
            "window": wdx,
            "elapsed_s": round(now - t_start, 1),
            "statuses": statuses,
            "ok_p50_ms": round(lats[len(lats) // 2], 1) if lats else None,
            "ok_p99_ms": round(lats[int(len(lats) * 0.99)], 1) if lats else None,
            "rss_mb": round(rss_mb(), 1),
        }
        windows.append(w)
        print("window:", json.dumps(w), flush=True)
    stop.set()
    for t in threads:
        t.join(5.0)

    c = http.client.HTTPConnection(host, port, timeout=600)
    c.request("GET", "/metrics")
    metrics = json.loads(c.getresponse().read())
    print("final /metrics:", json.dumps(metrics), flush=True)
    srv.shutdown()
    if srv.batcher is not None:
        srv.batcher.close()

    p99s = [w["ok_p99_ms"] for w in windows if w["ok_p99_ms"]]
    rsss = [w["rss_mb"] for w in windows]
    summary = {
        "windows": len(windows),
        "p99_first_ms": p99s[0] if p99s else None,
        "p99_last_ms": p99s[-1] if p99s else None,
        "p99_max_ms": max(p99s) if p99s else None,
        "rss_first_mb": rsss[0], "rss_last_mb": rsss[-1],
        "shed_total": metrics.get("shed", 0),
        "timeouts_total": metrics.get("timeouts", 0),
        "errors_total": metrics.get("errors", 0),
        "requests_total": metrics.get("requests", 0),
    }
    print("soak summary:", json.dumps(summary), flush=True)
    return summary


def grouped_bench(params, scenes, iters=30):
    """decode_groups=1 vs 2 on the serving estimator's fused batched
    program over a 7-sparse + 1-crowd 368^2 batch."""
    import jax

    from tpupose.config import DEFAULT
    from tpupose.infer import PoseEstimator

    sparse = next(img for tag, img in scenes if tag == "sparse")
    crowd = next(img for tag, img in scenes if tag == "crowd")
    batch = np.stack([sparse] * 7 + [crowd])

    out = {}
    for groups in (1, 2):
        cfg = dataclasses.replace(
            DEFAULT,
            inference=dataclasses.replace(DEFAULT.inference,
                                          decode_groups=groups),
        )
        est = PoseEstimator(cfg, params=params)
        people = est.process_batch(batch)        # compile + warm
        counts = [len(p) for p in people]
        t0 = time.perf_counter()
        for _ in range(iters):
            est.process_batch(batch)
        dt = (time.perf_counter() - t0) / iters
        out[f"groups{groups}"] = {
            "img_per_s": round(len(batch) / dt, 1),
            "ms_per_batch8": round(dt * 1e3, 1),
            "people_per_image": counts,
        }
        print(f"groups={groups}: {json.dumps(out[f'groups{groups}'])}",
              flush=True)
    g1 = out["groups1"]["img_per_s"]
    g2 = out["groups2"]["img_per_s"]
    out["speedup_groups2"] = round(g2 / g1, 2)
    print(f"crowd-mixed serving bench: groups=2 is {out['speedup_groups2']}x "
          "groups=1", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="/tmp/fl_base/checkpoints")
    ap.add_argument("--soak-s", type=float, default=150.0)
    ap.add_argument("--skip-soak", action="store_true")
    ap.add_argument("--skip-grouped", action="store_true")
    args = ap.parse_args()

    import jax

    print("backend:", jax.default_backend(), flush=True)
    from tpupose.config import DEFAULT, single_scale
    from tpupose.infer import PoseEstimator
    from tpupose.training.checkpoint import restore_params

    params = restore_params(args.ckpt) if os.path.isdir(args.ckpt) else None
    print("trained checkpoint:", "loaded" if params is not None else
          "ABSENT (random weights; tier separation not meaningful)",
          flush=True)

    scenes = render_scenes()
    results = {}
    if not args.skip_soak:
        # single-scale serving estimator (the realtime deployment shape)
        est = PoseEstimator(single_scale(DEFAULT), params=params)
        results["soak"] = soak(est, scenes, args.soak_s)
    if not args.skip_grouped:
        results["grouped"] = grouped_bench(params, scenes)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
