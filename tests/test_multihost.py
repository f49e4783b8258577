"""2-process jax.distributed smoke test (round-1 VERDICT missing #4).

Spawns two CPU worker processes that initialise the DCN coordination
service through ``init_multihost`` (explicit process_id=0 exercising the
falsy-arg fix), run a cross-host collective, and execute one REAL
sharded train step over a global mesh. Both workers must agree on the
loss — the same program a multi-host TPU slice would run.
"""

import os
import socket
import subprocess
import sys

WORKER = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_train_step(tmp_path):
    port = _free_port()
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = os.pathsep.join(
        [repo_root] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p]
    )

    # a fingerprinted 6-record dataset for the shard="auto" leg
    import numpy as np

    from tpupose.data import hdf5 as hdf5_io

    ds = str(tmp_path / "ds.h5")
    rng = np.random.default_rng(0)
    with hdf5_io.SampleWriter(ds) as w:
        for i in range(6):
            img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
            img[:16, :16] = (i, i, i)
            joints = np.full((1, 18, 3), 2.0, np.float32)
            joints[0, :, 0] = rng.uniform(10, 54, 18)
            joints[0, :, 1] = rng.uniform(10, 54, 18)
            joints[0, :, 2] = 0.0
            w.add(img, np.full((64, 64), 255, np.uint8), joints,
                  np.asarray([32.0, 32.0], np.float32), 0.8)

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(port), ds],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    losses, shards = [], []
    for out in outs:
        marker = [ln for ln in out.splitlines() if ln.startswith("MULTIHOST_OK")]
        assert marker, out
        losses.append(float(marker[0].split()[1]))
        fps = [ln for ln in out.splitlines() if ln.startswith("SHARD_FPS")]
        assert fps, out
        shards.append({int(x) for x in fps[0].split(" ", 1)[1].split(",")})
    assert losses[0] == losses[1]  # both hosts computed the same global loss
    # shard="auto" split the epoch disjointly and covered every record
    assert not shards[0] & shards[1]
    assert shards[0] | shards[1] == set(range(6))

    # multi-host DP inference: each worker decoded its own row of the
    # global batch; together they must equal a single-process decode of
    # the same 2-image batch with the same seeds (DCN serving parity)
    import json

    got = []
    for out in outs:
        lines = [ln for ln in out.splitlines()
                 if ln.startswith("INFER_PEOPLE ")]
        assert lines, out
        got.append(json.loads(lines[0].split(" ", 1)[1]))

    from tpupose.config import (InferenceConfig, ModelConfig, PoseConfig)
    from tpupose.infer import PoseEstimator

    icfg = PoseConfig(
        model=ModelConfig(num_stages=1, compute_dtype="float32"),
        inference=InferenceConfig(
            scale_search=(0.5,), max_peaks=16, max_people=16
        ),
    )
    est = PoseEstimator(icfg)
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 255, (2, 96, 96, 3)).astype(np.uint8)
    expected = est.process_batch(imgs)
    assert json.dumps(got, sort_keys=True) == json.dumps(
        expected, sort_keys=True
    )
