"""Data-parallel batched inference: images sharded over the mesh.

The third leg of the inference scaling story (SURVEY.md 2.2):

  * ``parallel.pyramid``  — pyramid scales across chips (latency, 1 img)
  * ``parallel.spatial``  — image tiles across chips (very large inputs)
  * this module           — batch images across chips (throughput/serving)

The jitted product program (``PoseEstimator._batch_fn``: pyramid
forwards + scale-space decode) is already SPMD-clean: placing the image
batch with a ``P('data')`` sharding makes XLA run every per-image stage
fully parallel. The only cross-device traffic is the adaptive tier
choice — the decode's batch-global peak-count max (`decode/api.py`)
becomes one scalar all-reduce — and the gathered people tables.

Padded rows (mesh-divisibility, `sharding.pad_batch` analogue) decode
to zero-valid people and are dropped host-side.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpupose.decode import to_people


def dp_process_batch(
    est: Any,
    images: np.ndarray,
    mesh: Mesh,
    scales: tuple[float, ...] | None = None,
) -> list[list[dict]]:
    """``PoseEstimator.process_batch`` with the batch sharded over
    ``mesh``'s 'data' axis. Images beyond a device-count multiple are
    handled by padding with blank rows (decoded then discarded).
    """
    n, h, w = images.shape[:3]
    n_dev = mesh.devices.size
    n_pad = (n_dev - n % n_dev) % n_dev
    if n_pad:
        blanks = np.zeros((n_pad, h, w, images.shape[3]), images.dtype)
        images = np.concatenate([images, blanks])
    sharded = jax.device_put(
        np.ascontiguousarray(images), NamedSharding(mesh, P("data"))
    )
    fn = est._batch_fn(n + n_pad, h, w, scales)
    tables = jax.device_get(fn(est.params, sharded))
    return [
        to_people(jax.tree.map(lambda x: x[i], tables)) for i in range(n)
    ]
