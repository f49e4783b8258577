"""Device mesh + sharding: the framework's single device-placement story.

The reference is single-GPU with a ZeroMQ data plane (SURVEY.md sections
2.2/2.3 — no DP/TP/PP anywhere). The TPU rebuild scales two ways, both
expressed through one ``Mesh``:

  * **data parallelism** (primary): batch sharded over the ``data`` axis,
    params replicated; XLA inserts the gradient all-reduce (psum) over
    ICI. The model is ~52 M params, activations dominate — DP is the
    whole story for training (SURVEY.md 2.2).
  * **scale parallelism** (inference): the multi-scale pyramid is
    embarrassingly parallel; scales ride the same axis as batch entries.

Multi-host reuses the identical program via ``jax.distributed`` — no
backend-specific code (the NCCL-equivalent is implicit in XLA
collectives).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis sharding for batched arrays."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict[str, Any], axis: str = "data") -> dict[str, Any]:
    """device_put every leaf with its leading axis sharded over the mesh."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate_tree(mesh: Mesh, tree: Any) -> Any:
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


# Pad values per batch key: padded samples must be inert — a zero
# miss-mask kills their loss contribution, absent joints (v=2) keep the
# GT rasteriser away, scale 1 keeps the augmentation affine well-posed.
_PAD_VALUES = {"masks": 0, "joints": 2.0, "scales": 1.0}


def pad_batch(
    batch: dict[str, Any], multiple: int
) -> tuple[dict[str, Any], int]:
    """Pad every leaf's leading axis to a multiple of the mesh size.

    Returns (padded_batch, real_count). Keeps batch-10 from quietly
    running on 5 of 8 chips: the batch is padded to 16 and sharded over
    all 8, while the loss divisor stays the real count (pass it to
    ``make_train_step(loss_denom=...)``).
    """
    n = next(iter(batch.values())).shape[0]
    target = pad_to_multiple(n, multiple)
    if target == n:
        return batch, n
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        widths = [(0, target - n)] + [(0, 0)] * (v.ndim - 1)
        out[k] = np.pad(v, widths, constant_values=_PAD_VALUES.get(k, 0))
    # explicit per-sample weight: a zero miss-mask alone is NOT enough,
    # because the augmentation's label-grid mask sampler reads 1.0 (keep)
    # outside the source image — the train step multiplies this into the
    # label mask after augmentation
    weight = np.zeros((target,), np.float32)
    weight[:n] = batch.get("weight", np.ones((n,), np.float32))
    out["weight"] = weight
    return out, n


def data_mesh_for_batch(batch_size: int, axis: str = "data") -> Mesh:
    """Largest mesh whose size divides the batch (so batches shard evenly).

    With batch 2 on 8 devices this yields a 2-device mesh rather than a
    divisibility error; production configs should keep batch % devices == 0
    to use the full slice.
    """
    n_dev = len(jax.devices())
    size = 1
    for d in range(1, min(batch_size, n_dev) + 1):
        if batch_size % d == 0:
            size = d
    return make_mesh(size, axis)
