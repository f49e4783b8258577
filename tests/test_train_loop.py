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


def test_validation_mixed_batch_sizes(tmp_path):
    """Val batches of a different (and mixed) size than the train
    batch_size must report correctly-scaled per-sample losses: a val
    set fed as one batch of 4 equals the same set fed as 4+2 via
    batches of... 1 (review finding: the divisor was pinned to
    cfg.train.batch_size, halving losses for half-size batches)."""
    cfg = small_cfg()

    full = list(
        pipeline.synthetic_batches(cfg, target_h=96, target_w=96, seed=7,
                                   n_batches=2)
    )  # 2 batches of 2 samples

    def as_is():
        return iter(full)

    def singles():
        out = []
        for b in full:
            for i in range(next(iter(b.values())).shape[0]):
                out.append({k: v[i : i + 1] for k, v in b.items()})
        return iter(out)

    vals = {}
    for name, feed in [("pairs", as_is), ("singles", singles)]:
        result = loop.train(
            cfg,
            pipeline.synthetic_batches(cfg, target_h=96, target_w=96,
                                       n_batches=1),
            workdir=str(tmp_path / name),
            max_steps=1,
            val_batches=feed,
            val_every=1,
            seed=3,
        )
        assert result["steps"] == 1
        lines = (
            (tmp_path / name / "validation.csv").read_text().strip().splitlines()
        )
        header = lines[0].split(",")
        row = lines[-1].split(",")
        vals[name] = dict(zip(header, row))

    # same val samples, same params (same train seed/batches) -> same
    # per-sample loss regardless of how the feed is batched
    np.testing.assert_allclose(
        float(vals["pairs"]["total"]), float(vals["singles"]["total"]),
        rtol=1e-5,
    )
