"""Worker process for the 2-process jax.distributed smoke test.

Run as: python _multihost_worker.py <process_id> <port>
Prints MULTIHOST_OK <loss> on success (checked by tests/test_multihost.py).
"""

import os
import sys


def main() -> int:
    pid = int(sys.argv[1])
    port = sys.argv[2]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("XLA_FLAGS", None)       # 1 CPU device per process

    from tpupose.parallel.distributed import init_multihost, is_primary

    # explicit process_id=0 exercises the falsy-arg fix (round-1 ADVICE)
    ok = init_multihost(f"127.0.0.1:{port}", num_processes=2, process_id=pid)
    assert ok, "init_multihost returned False with explicit coordinator"

    import jax
    import jax.numpy as jnp
    import numpy as np

    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == pid
    assert is_primary() == (pid == 0)

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    sharding = NamedSharding(mesh, P("data"))

    # cross-host collective sanity: global sum over a batch sharded 1/1
    local = np.full((1, 4), float(pid + 1), np.float32)
    arr = jax.make_array_from_process_local_data(sharding, local, (2, 4))
    total = float(jax.jit(jnp.sum)(arr))
    assert total == (1.0 + 2.0) * 4, total

    # one REAL sharded train step over DCN (tiny 1-stage model)
    from tpupose.config import AugmentConfig, ModelConfig, PoseConfig, TrainConfig
    from tpupose.models import OpenPose
    from tpupose.training import create_state, make_train_step

    cfg = PoseConfig(
        model=ModelConfig(boxsize=64, compute_dtype="float32"),
        augment=AugmentConfig(max_persons=2),
        train=TrainConfig(batch_size=2),
    )
    model = OpenPose(num_stages=1, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    state, tx = create_state(cfg, params)
    step = make_train_step(cfg, model, tx, loss_denom=2)

    repl = NamedSharding(mesh, P())
    tree = jax.tree.map(lambda x: jax.device_put(x, repl), state.tree())

    rng = np.random.default_rng(7)  # same on both hosts; each keeps its row
    joints = np.full((2, 2, 18, 3), 2.0, np.float32)
    joints[:, 0, :, 0] = rng.uniform(10, 54, (2, 18))
    joints[:, 0, :, 1] = rng.uniform(10, 54, (2, 18))
    joints[:, 0, :, 2] = 0.0
    global_batch = {
        "images": rng.uniform(0, 255, (2, 64, 64, 3)).astype(np.float32),
        "masks": np.ones((2, 64, 64), np.float32),
        "joints": joints,
        "centers": np.tile(np.asarray([[32.0, 32.0]], np.float32), (2, 1)),
        "scales": np.full((2,), 0.8, np.float32),
    }
    batch = {
        k: jax.make_array_from_process_local_data(
            sharding, v[pid : pid + 1], v.shape
        )
        for k, v in global_batch.items()
    }
    tree, losses = step(tree, jax.random.PRNGKey(1), batch)
    loss = float(jax.device_get(losses["total"]))
    assert np.isfinite(loss)

    # the multi-host DATA contract: shard="auto" resolves to this
    # process's (index, count) and each host reads a disjoint slice of
    # the same shuffled epoch (parent asserts disjointness + coverage)
    if len(sys.argv) > 3:
        from tpupose.data import pipeline

        ds_cfg = PoseConfig(
            augment=AugmentConfig(max_persons=2),
            train=TrainConfig(batch_size=1),
        )
        fps = []
        for b in pipeline.hdf5_batches(
            sys.argv[3], ds_cfg, target_h=64, target_w=64, epochs=1,
            shard="auto", num_workers=1,
        ):
            fps.append(int(b["images"][0, 0, 0, 0]))
        print(f"SHARD_FPS {','.join(map(str, fps))}", flush=True)

    # multi-host DP INFERENCE over the same mesh (round-4 VERDICT next
    # #8a): the serving/eval-side DCN program. Both hosts build the
    # same estimator (same seed), feed one local row each, and decode
    # their own rows; the parent compares against a single-process
    # decode of the global batch.
    import json

    from tpupose.config import InferenceConfig
    from tpupose.infer import PoseEstimator
    from tpupose.parallel.inference import multihost_process_batch

    icfg = PoseConfig(
        model=ModelConfig(num_stages=1, compute_dtype="float32"),
        inference=InferenceConfig(
            scale_search=(0.5,), max_peaks=16, max_people=16
        ),
    )
    est = PoseEstimator(icfg)
    irng = np.random.default_rng(3)   # same on both hosts
    imgs = irng.integers(0, 255, (2, 96, 96, 3)).astype(np.uint8)
    people = multihost_process_batch(est, imgs[pid : pid + 1])
    assert len(people) == 1
    print(f"INFER_PEOPLE {json.dumps(people[0], sort_keys=True)}", flush=True)

    print(f"MULTIHOST_OK {loss:.6f}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
