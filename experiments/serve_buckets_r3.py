"""Shape-bucketed serving on the chip (round-3).

Heterogeneous request shapes are the open-endpoint reality: without
buckets every distinct (H, W) compiles its own fused program AND only
same-shape requests can micro-batch together. The bucket ladder maps all
shapes onto a fixed set of canvases (content top-left, gray pad masked
out of peak finding), so everything batches and the compile cache is
bounded by the ladder.

Drives the real HTTP server with 8 concurrent clients posting a cycle of
5 different image sizes, micro-batched in both modes, and reports
sustained req/s plus the number of compiled batch geometries.

Usage: TPUPOSE_COMPILE_CACHE=/tmp/tpupose_jax_cache \
       python experiments/serve_buckets_r3.py
"""

import concurrent.futures
import http.client
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


SHAPES = ((368, 368), (300, 400), (240, 320), (368, 496), (330, 250))


def post_image(addr, enc):
    host, port = addr
    c = http.client.HTTPConnection(host, port, timeout=600)
    c.request("POST", "/pose", body=enc)
    r = c.getresponse()
    assert r.status == 200, r.status
    return json.loads(r.read())


def drive(addr, encs, n_clients=8, n_requests=100):
    cycle = [encs[i % len(encs)] for i in range(n_requests)]
    # warm every shape/bucket combination the batcher may hit
    with concurrent.futures.ThreadPoolExecutor(n_clients) as ex:
        list(ex.map(lambda e: post_image(addr, e), cycle[: 4 * len(encs)]))
    t0 = time.perf_counter()
    with concurrent.futures.ThreadPoolExecutor(n_clients) as ex:
        list(ex.map(lambda e: post_image(addr, e), cycle))
    dt = time.perf_counter() - t0
    return n_requests / dt


def main():
    import cv2
    import jax

    from tpupose.benchmark import synthetic_scene
    from tpupose.buckets import DEFAULT_BUCKETS
    from tpupose.config import with_scales
    from tpupose.infer import PoseEstimator
    from tpupose.serve import serve

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    image, _, _ = synthetic_scene()
    encs = []
    for (h, w) in SHAPES:
        r = cv2.resize(image, (w, h), interpolation=cv2.INTER_LINEAR)
        ok, enc = cv2.imencode(".png", r)
        assert ok
        encs.append(enc.tobytes())

    cfg = with_scales((1.0,))       # the realtime/serving scale set

    def batch_geoms(est):
        return sorted({k[2:4] for k in est._fns if k[0] == "batch"})

    est = PoseEstimator(cfg)
    srv = serve(est, port=0, max_batch=8, batch_window_ms=8.0, scales=(1.0,))
    try:
        t0 = time.perf_counter()
        plain_rps = drive(srv.server_address[:2], encs)
        print(
            f"micro-batch, no buckets : {plain_rps:6.1f} req/s   "
            f"geometries={batch_geoms(est)}  wall={time.perf_counter()-t0:.0f}s",
            flush=True,
        )
    finally:
        srv.shutdown()
        srv.batcher.close()

    est = PoseEstimator(cfg)
    srv = serve(est, port=0, max_batch=8, batch_window_ms=8.0, scales=(1.0,),
                buckets=DEFAULT_BUCKETS)
    try:
        t0 = time.perf_counter()
        bucket_rps = drive(srv.server_address[:2], encs)
        print(
            f"micro-batch + buckets   : {bucket_rps:6.1f} req/s "
            f"({bucket_rps / plain_rps:.2f}x)  "
            f"geometries={batch_geoms(est)}  wall={time.perf_counter()-t0:.0f}s",
            flush=True,
        )
    finally:
        srv.shutdown()
        srv.batcher.close()


if __name__ == "__main__":
    main()
