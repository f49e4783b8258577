"""Headline benchmark: 368x368 multi-person images/sec/chip.

Measures the full product path (BASELINE.json metric): single-scale
368x368 CNN forward + fused multi-person decode, warm, on the available
accelerator. The baseline denominator is the reference pipeline's
per-image CPU latency — its decode stages are single-threaded
NumPy/SciPy (reproduced faithfully in tpupose.reference_impl) plus the
CNN forward; measured once on this host and cached in
``bench_baseline.json`` (SURVEY.md section 6: the reference publishes no
numbers of its own, BASELINE.json "published": {}).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# The fused Pallas decode/GT kernels are parity-validated on the real TPU
# (2026-08-16, see BASELINE.md); TPUPOSE_DISABLE_PALLAS=1 still forces the
# XLA fallback for debugging.

DEFAULT_BASELINE_CACHE = os.path.join(os.getcwd(), "bench_baseline.json")

N_WARMUP = 3
N_ITERS = 30


def synthetic_scene(size=368):
    """Deterministic 2-person 368x368 scene + matching maps for the twin."""
    import cv2

    from tpupose import topology
    from tpupose.reference_impl import gt_np

    def person(cx, cy, s=120.0):
        rel = {
            "nose": (0.0, -0.95), "neck": (0.0, -0.65),
            "Rsho": (-0.30, -0.65), "Relb": (-0.42, -0.30), "Rwri": (-0.45, 0.05),
            "Lsho": (0.30, -0.65), "Lelb": (0.42, -0.30), "Lwri": (0.45, 0.05),
            "Rhip": (-0.18, 0.10), "Rkne": (-0.20, 0.55), "Rank": (-0.20, 0.95),
            "Lhip": (0.18, 0.10), "Lkne": (0.20, 0.55), "Lank": (0.20, 0.95),
            "Reye": (-0.08, -1.02), "Leye": (0.08, -1.02),
            "Rear": (-0.17, -0.98), "Lear": (0.17, -0.98),
        }
        out = np.zeros((18, 3))
        for name, (dx, dy) in rel.items():
            out[topology.PART_INDEX[name]] = (cx + dx * s, cy + dy * s * 0.5, 0.0)
        return out

    joints = np.stack([person(120.0, 200.0), person(260.0, 180.0)])
    labels = gt_np.create_heatmaps_np(joints)
    heat = cv2.resize(labels[:, :, 38:], (size, size), interpolation=cv2.INTER_CUBIC)
    paf = cv2.resize(labels[:, :, :38], (size, size), interpolation=cv2.INTER_CUBIC)
    noise = np.random.default_rng(7).normal(size=heat.shape) * 1e-3
    image = np.clip(heat[:, :, :3] * 200 + 28, 0, 255).astype(np.uint8)
    return image, (heat + noise).astype(np.float32), paf.astype(np.float32)


def measure_baseline() -> float:
    """Reference-pipeline per-image CPU latency (seconds): NumPy/SciPy twin
    decode + single-scale CNN forward on CPU."""
    import jax

    from tpupose.config import DEFAULT
    from tpupose.models import OpenPose
    from tpupose.reference_impl import decode_np

    image, heat, paf = synthetic_scene()

    # decode stages (the reference's pure-CPU hot loops 2-3, SURVEY.md 3.1)
    for _ in range(1):
        decode_np.decode_np(heat, paf, DEFAULT.inference)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        decode_np.decode_np(heat, paf, DEFAULT.inference)
    decode_s = (time.perf_counter() - t0) / reps

    # CNN forward on host CPU (stand-in for the reference's model.predict)
    cpu = jax.devices("cpu")[0]
    import jax.numpy as jnp

    model = OpenPose(dtype=jnp.float32)
    with jax.default_device(cpu):
        x = jnp.zeros((1, 368, 368, 3), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x)["params"]
        fwd = jax.jit(lambda p, x: model.apply({"params": p}, x)[-1])
        jax.block_until_ready(fwd(params, x))
        t0 = time.perf_counter()
        jax.block_until_ready(fwd(params, x))
        fwd_s = time.perf_counter() - t0

    return decode_s + fwd_s


def get_baseline(cache_path: str) -> float:
    if os.path.exists(cache_path):
        with open(cache_path) as f:
            return json.load(f)["reference_cpu_latency_s"]
    latency = measure_baseline()
    with open(cache_path, "w") as f:
        json.dump(
            {
                "reference_cpu_latency_s": latency,
                "note": "NumPy/SciPy twin decode + CPU CNN forward, per image",
            },
            f,
            indent=2,
        )
    return latency


BATCH = 8
N_BATCHES = 24


def _enable_compile_cache():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/tpupose_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


def main(baseline_cache: str | None = None):
    _enable_compile_cache()
    from tpupose.config import single_scale
    from tpupose.infer import PoseEstimator

    image, _, _ = synthetic_scene()
    est = PoseEstimator(single_scale())
    batch = np.stack([image] * BATCH)

    # warm (compile) then measure sustained pipelined throughput
    for _ in est.stream([batch] * N_WARMUP):
        pass
    t0 = time.perf_counter()
    n_done = 0
    for people in est.stream([batch] * N_BATCHES):
        n_done += len(people)
    elapsed = time.perf_counter() - t0
    ips = n_done / elapsed

    baseline_latency = get_baseline(baseline_cache or DEFAULT_BASELINE_CACHE)
    baseline_ips = 1.0 / baseline_latency

    print(
        json.dumps(
            {
                "metric": "368x368 multi-person images/sec/chip (single-scale fwd+decode)",
                "value": round(ips, 3),
                "unit": "images/sec",
                "vs_baseline": round(ips / baseline_ips, 2),
            }
        )
    )



