"""Train-loop driver tests: validation path and artifacts (in-process,
small model)."""

import os

import numpy as np

from tpupose.config import AugmentConfig, ModelConfig, PoseConfig, TrainConfig
from tpupose.data import pipeline
from tpupose.training import loop


def small_cfg(n_steps_log=1):
    return PoseConfig(
        model=ModelConfig(boxsize=64, num_stages=1, compute_dtype="float32"),
        augment=AugmentConfig(max_persons=2),
        train=TrainConfig(batch_size=2, log_every=n_steps_log,
                          checkpoint_every=1000),
    )


def test_train_with_validation(tmp_path):
    cfg = small_cfg()
    batches = pipeline.synthetic_batches(cfg, target_h=96, target_w=96,
                                         n_batches=3)

    def val_batches():
        return pipeline.synthetic_batches(cfg, target_h=96, target_w=96,
                                          seed=99, n_batches=2)

    result = loop.train(
        cfg, batches, workdir=str(tmp_path / "run"), max_steps=3,
        val_batches=val_batches, val_every=2,
    )
    assert result["steps"] == 3
    assert np.isfinite(result["last_losses"]["total"])
    val_csv = tmp_path / "run" / "validation.csv"
    assert val_csv.exists()
    lines = val_csv.read_text().strip().splitlines()
    # header + at step 2 + final step 3
    assert len(lines) >= 3
    assert lines[0].startswith("step,")
    assert os.path.exists(tmp_path / "run" / "training.csv")
