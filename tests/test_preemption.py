"""Preemption recovery (SURVEY.md section 5.3): a training process
killed with SIGKILL mid-run must resume from the last COMMITTED
checkpoint on restart — Orbax writes steps atomically (tmp dir +
rename), the loop's restore-latest picks only committed steps, and
junk/incomplete step dirs left behind by a kill must not break restore.

The reference's only recovery story is epoch-checkpoint restart; it has
no protection against a kill mid-write (h5py truncates the file in
place). This pins the stronger contract the rebuild provides.
"""

import os
import signal
import subprocess
import sys
import textwrap
import time

from tpupose.training import checkpoint as ckpt_lib

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, {root!r})
    from tpupose.config import AugmentConfig, ModelConfig, PoseConfig, TrainConfig
    from tpupose.data import pipeline
    from tpupose.training import loop

    cfg = PoseConfig(
        model=ModelConfig(boxsize=64, num_stages=1, compute_dtype="float32"),
        augment=AugmentConfig(max_persons=2),
        train=TrainConfig(batch_size=2, log_every=1, checkpoint_every=2),
    )
    batches = pipeline.synthetic_batches(cfg, target_h=64, target_w=64,
                                         n_batches=200)
    loop.train(cfg, batches, workdir={workdir!r}, max_steps=200,
               use_mesh=False)
    """
)


def _small_cfg():
    from tpupose.config import (AugmentConfig, ModelConfig, PoseConfig,
                                TrainConfig)

    return PoseConfig(
        model=ModelConfig(boxsize=64, num_stages=1, compute_dtype="float32"),
        augment=AugmentConfig(max_persons=2),
        train=TrainConfig(batch_size=2, log_every=1, checkpoint_every=2),
    )


def test_sigkill_mid_training_resumes_from_committed_step(tmp_path):
    workdir = str(tmp_path / "run")
    ckpt_dir = os.path.join(workdir, "checkpoints")
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    proc = subprocess.Popen(
        [sys.executable, "-c", WORKER.format(root=ROOT, workdir=workdir)],
        env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    try:
        deadline = time.time() + 300
        latest = None
        while time.time() < deadline:
            latest = ckpt_lib.latest_step(ckpt_dir)
            if latest is not None and latest >= 2:
                break
            if proc.poll() is not None:
                raise AssertionError(
                    f"worker exited (rc={proc.returncode}) with no checkpoint"
                )
            time.sleep(1.0)
        assert latest is not None and latest >= 2, "no committed checkpoint"
        # preempt: SIGKILL, no cleanup, possibly mid-write of a later step
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()

    # junk an orbax-style tmp dir AND a non-numeric dir next to the
    # committed steps: restore must ignore both
    os.makedirs(os.path.join(ckpt_dir, "999.orbax-checkpoint-tmp-1"),
                exist_ok=True)
    os.makedirs(os.path.join(ckpt_dir, "not-a-step"), exist_ok=True)

    committed = ckpt_lib.latest_step(ckpt_dir)
    assert committed is not None and committed >= 2
    assert committed % 2 == 0  # only checkpoint_every multiples commit

    from tpupose.data import pipeline
    from tpupose.training import loop

    cfg = _small_cfg()
    more = pipeline.synthetic_batches(cfg, target_h=64, target_w=64,
                                      seed=7, n_batches=2)
    out = loop.train(cfg, more, workdir=workdir, max_steps=committed + 2,
                     use_mesh=False)
    assert int(out["state"]["step"]) == committed + 2
    assert out["steps"] == 2  # resumed, not restarted from zero
