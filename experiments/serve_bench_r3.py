"""Micro-batched serving throughput on the chip (round-2 VERDICT weak #6).

Drives the real HTTP server (tpupose/serve.py) with concurrent clients
in both dispatch modes — locked-serial vs --max-batch micro-batching —
and reports sustained requests/sec. The micro-batcher amortises one
fused batched program (and one round-trip over the sandbox's ~29 ms
relay) across up to max_batch concurrent requests.

Usage: python experiments/serve_bench_r3.py
"""

import concurrent.futures
import http.client
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def post_image(addr, enc):
    host, port = addr
    c = http.client.HTTPConnection(host, port, timeout=600)
    c.request("POST", "/pose", body=enc)
    r = c.getresponse()
    assert r.status == 200, r.status
    return json.loads(r.read())


def drive(addr, enc, n_clients=8, n_requests=96):
    # warm (compiles every bucket size the batcher may hit)
    with concurrent.futures.ThreadPoolExecutor(n_clients) as ex:
        list(ex.map(lambda _: post_image(addr, enc), range(n_clients * 2)))
    t0 = time.perf_counter()
    with concurrent.futures.ThreadPoolExecutor(n_clients) as ex:
        list(ex.map(lambda _: post_image(addr, enc), range(n_requests)))
    dt = time.perf_counter() - t0
    return n_requests / dt


def main():
    import cv2
    import jax

    from tpupose.benchmark import synthetic_scene
    from tpupose.config import DEFAULT, with_scales
    from tpupose.infer import PoseEstimator
    from tpupose.serve import serve

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    image, _, _ = synthetic_scene()
    ok, enc = cv2.imencode(".png", image)
    assert ok
    enc = enc.tobytes()

    cfg = with_scales((1.0,))       # the realtime/serving scale set
    est = PoseEstimator(cfg)

    srv = serve(est, port=0)
    try:
        serial_rps = drive(srv.server_address[:2], enc)
        print(f"locked-serial    : {serial_rps:6.1f} req/s", flush=True)
    finally:
        srv.shutdown()

    srv = serve(est, port=0, max_batch=8, batch_window_ms=8.0, scales=(1.0,))
    try:
        batched_rps = drive(srv.server_address[:2], enc)
        print(f"micro-batched (8): {batched_rps:6.1f} req/s  "
              f"({batched_rps / serial_rps:.2f}x)", flush=True)
    finally:
        srv.shutdown()
        srv.batcher.close()


if __name__ == "__main__":
    main()
