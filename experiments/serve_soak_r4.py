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


def _grid_person(rng, cx, cy, size):
    """Training-sized figure at an explicit position (synth.REL layout)."""
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    import make_synthetic_dataset as synth

    from tpupose import topology

    jitter = rng.normal(0, 0.02, (18, 2))
    joints = np.zeros((18, 3))
    for name, (dx, dy) in synth.REL.items():
        i = topology.PART_INDEX[name]
        joints[i, 0] = cx + (dx + jitter[i, 0]) * size
        joints[i, 1] = cy + (dy + jitter[i, 1]) * size * 0.5
    return joints


def render_scenes():
    """Request rotation: three shapes + one crowd scene, varied style
    (the flagship checkpoint's training domain). The crowd is a spread
    grid of TRAINING-SIZED figures so the trained model actually fires
    on them (24 tiny overlapped figures decode to nothing — first
    attempt's log)."""
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    import make_synthetic_dataset as synth

    rng = np.random.default_rng(123)
    scenes = []
    for (h, w, n_people, tag) in [
        (368, 368, 2, "sparse"),
        (480, 360, 3, "tall"),
        (256, 320, 1, "small"),
    ]:
        joints = [synth.make_person(rng, w, h)[0] for _ in range(n_people)]
        img = synth.render(rng, joints, w, h, style="varied")
        scenes.append((tag, img))
    rows, cols, w, h = 3, 4, 368, 368
    joints = [
        _grid_person(rng,
                     (c + 0.5 + rng.uniform(-0.08, 0.08)) * w / cols,
                     (r + 0.55 + rng.uniform(-0.04, 0.04)) * h / rows,
                     rng.uniform(62, 78))
        for r in range(rows) for c in range(cols)
    ]
    scenes.append(("crowd", synth.render(rng, joints, w, h, style="varied")))
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
    from tpupose import buckets as _bk
    from tpupose.serve import serve

    # one 368^2 canvas: every request shape resizes into it (the bucket
    # ladder's whole point), so the compile set is the 4 power-of-two
    # batch sizes — warmed DIRECTLY below, because on the tunneled
    # remote-compile backend each program takes minutes to build and a
    # 10 s request deadline would abandon every warm-up request (first
    # soak attempt: 1140 sheds, 0 OKs, all compile)
    buckets = ((368, 368),)
    srv = serve(est, port=0, max_batch=8, batch_window_ms=5.0,
                buckets=buckets, max_queue=16, request_timeout_s=10.0)
    host, port = srv.server_address[:2]
    bodies = encode(scenes)

    for n in (1, 2, 4, 8):      # the batcher's pow2 size ladder
        t0 = time.perf_counter()
        bh, bw, s = _bk.choose_bucket(368, 368, buckets)
        canvas, vh, vw = _bk.to_bucket(scenes[0][1], bh, bw, s)
        est.process_batch(
            np.repeat(canvas[None], n, axis=0), scales=None,
            valid_hw=np.tile(np.int32([[vh, vw]]), (n, 1)),
        )
        print(f"warm batch={n}: {time.perf_counter() - t0:.0f}s", flush=True)
    # one HTTP round-trip per scene shape (all now hit warm programs)
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

    # overload burst: 4x the steady client count for 20 s against the
    # same bounded queue — the shed path must engage (503 + Retry-After)
    # and the server must return to health afterwards
    stop = threading.Event()
    burst_counts: dict[int, int] = {}
    b_lock = threading.Lock()

    def burst_client(ci):
        i = ci
        while not stop.is_set():
            tag, body = bodies[i % len(bodies)]
            i += 1
            try:
                c = http.client.HTTPConnection(host, port, timeout=30)
                c.request("POST", "/pose", body=body)
                r = c.getresponse()
                r.read()
                s = r.status
                c.close()
            except Exception:
                s = -1
            with b_lock:
                burst_counts[s] = burst_counts.get(s, 0) + 1

    burst = [threading.Thread(target=burst_client, args=(i,), daemon=True)
             for i in range(4 * n_clients)]
    for t in burst:
        t.start()
    time.sleep(20.0)
    stop.set()
    for t in burst:
        t.join(5.0)
    print("overload burst (%d clients, 20s):" % (4 * n_clients),
          json.dumps(burst_counts), flush=True)
    # post-burst health: a plain request succeeds again
    c = http.client.HTTPConnection(host, port, timeout=60)
    c.request("POST", "/pose", body=bodies[0][1])
    r = c.getresponse()
    r.read()
    print("post-burst request:", r.status, flush=True)

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
        "burst_statuses": burst_counts,
        "post_burst_status": r.status,
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
    ap.add_argument("--fake-estimator", action="store_true",
                    help="serve a no-device stub: isolates the HTTP/"
                         "batcher stack's memory behavior from the "
                         "accelerator client's")
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
        if args.fake_estimator:
            class _Fake:
                pretrained = False

                def process_batch(self, imgs, scales=None, valid_hw=None):
                    time.sleep(0.04 * len(imgs) / 8)   # ~device-rate stub
                    return [[] for _ in range(len(imgs))]

            est = _Fake()
        else:
            # single-scale serving estimator (realtime deployment shape)
            est = PoseEstimator(single_scale(DEFAULT), params=params)
        results["soak"] = soak(est, scenes, args.soak_s)
    if not args.skip_grouped:
        results["grouped"] = grouped_bench(params, scenes)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
