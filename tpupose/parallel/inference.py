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


class DataParallelEstimator:
    """``PoseEstimator`` facade sharding every device batch over
    ``mesh``'s 'data' axis — a drop-in for anything that duck-types the
    ``process_batch(images, scales=, valid_hw=)`` contract
    (``serve.MicroBatcher``, ``buckets.BucketedRunner``), so HTTP
    serving and bucketed eval scale across chips without code changes.

    Images beyond a device-count multiple are padded with blank rows
    (decoded then discarded); a padded ``valid_hw`` row is (1, 1) so no
    peak survives the mask either way. Single-image ``process`` and
    attribute access (``cfg``, ``params``, ``pretrained``…) delegate to
    the wrapped estimator.
    """

    def __init__(self, est: Any, mesh: Mesh):
        self._est = est
        self._mesh = mesh

    def __getattr__(self, name):  # cfg / params / pretrained / process…
        return getattr(self._est, name)

    def process_batch_async(
        self,
        images: np.ndarray,
        scales: tuple[float, ...] | None = None,
        valid_hw: np.ndarray | None = None,
    ):
        """Sharded dispatch, no host sync — the contract
        ``buckets.BucketedRunner`` pipelines on (resolve with
        ``_finish(n, tables)``, which delegates to the wrapped
        estimator)."""
        n, h, w = images.shape[:3]
        n_dev = self._mesh.devices.size
        n_pad = (n_dev - n % n_dev) % n_dev
        if n_pad:
            blanks = np.zeros((n_pad, h, w, images.shape[3]), images.dtype)
            images = np.concatenate([images, blanks])
            if valid_hw is not None:
                valid_hw = np.concatenate([
                    np.asarray(valid_hw, np.int32),
                    np.ones((n_pad, 2), np.int32),
                ])
        shard = NamedSharding(self._mesh, P("data"))
        sharded = jax.device_put(np.ascontiguousarray(images), shard)
        fn = self._est._batch_fn(
            n + n_pad, h, w, scales, masked=valid_hw is not None
        )
        if valid_hw is None:
            tables = fn(self._est.params, sharded)
        else:
            tables = fn(
                self._est.params, sharded,
                jax.device_put(
                    np.ascontiguousarray(np.asarray(valid_hw, np.int32)),
                    shard,
                ),
            )
        return n + n_pad, tables

    def process_batch(
        self,
        images: np.ndarray,
        scales: tuple[float, ...] | None = None,
        valid_hw: np.ndarray | None = None,
    ) -> list[list[dict]]:
        n = images.shape[0]
        nb, tables = self.process_batch_async(images, scales, valid_hw)
        return self._est._finish(nb, tables)[:n]


def resolve_dp(spec: str, devices=None) -> int:
    """Validate a ``--dp`` spec ('N' or 'auto') against the visible
    devices and return N. Raises ValueError when N exceeds them —
    callers check this BEFORE paying for the model build."""
    import jax

    devs = devices if devices is not None else jax.devices()
    if spec == "auto":
        n = len(devs)
    else:
        try:
            n = int(spec)
        except ValueError:
            raise ValueError(f"--dp must be a device count or 'auto', "
                             f"got {spec!r}") from None
    if n < 1:
        raise ValueError(f"--dp must be >= 1, got {n}")
    if n > len(devs):
        raise ValueError(
            f"--dp {n} exceeds the {len(devs)} visible device(s)"
        )
    return n


def wrap_dp(est: Any, spec: str, devices=None):
    """CLI-facing constructor: ``'N'`` or ``'auto'`` -> the estimator
    wrapped over the first N visible devices (shared by ``serve --dp``
    and ``cli eval --dp``). Returns ``(estimator, n)``; unchanged when
    N == 1. Raises ValueError when N exceeds the visible device count."""
    import jax

    devs = list(devices) if devices is not None else jax.devices()
    n = resolve_dp(spec, devs)
    if n <= 1:
        return est, n
    return DataParallelEstimator(
        est, Mesh(np.asarray(devs[:n]), ("data",))
    ), n


def dp_process_batch(
    est: Any,
    images: np.ndarray,
    mesh: Mesh,
    scales: tuple[float, ...] | None = None,
) -> list[list[dict]]:
    """``PoseEstimator.process_batch`` with the batch sharded over
    ``mesh``'s 'data' axis (functional form of
    :class:`DataParallelEstimator`)."""
    return DataParallelEstimator(est, mesh).process_batch(images, scales)


def multihost_process_batch(
    est: Any,
    local_images: np.ndarray,
    scales: tuple[float, ...] | None = None,
    valid_hw: np.ndarray | None = None,
    mesh: Mesh | None = None,
) -> list[list[dict]]:
    """DP inference over a multi-host mesh (DCN): every process calls
    this with ITS rows of the global batch; the one SPMD program runs
    over all hosts' devices and each process gets people for its own
    rows back.

    The serving/eval-side counterpart of the multi-host TRAIN step
    (`parallel.distributed.init_multihost` + the sharded train step):
    the same program a `jax.distributed`-initialised TPU pod slice
    would run for batched inference, with the global device batch
    assembled via ``jax.make_array_from_process_local_data`` so no
    host ever materialises another host's images. Requirements: every
    process passes the same ``local_images.shape`` (SPMD — one global
    shape), and the mesh (default: all devices, 1-D 'data') lists
    devices process-major (``jax.devices()`` order), which places each
    process's rows on its own devices.
    """
    n_proc = jax.process_count()
    n_local, h, w = local_images.shape[:3]
    if mesh is None:
        mesh = Mesh(np.asarray(jax.devices()), ("data",))
    shard = NamedSharding(mesh, P("data"))
    n_global = n_local * n_proc
    if n_global % mesh.devices.size:
        raise ValueError(
            f"global batch {n_global} not divisible by the mesh's "
            f"{mesh.devices.size} devices; pad per host first"
        )
    imgs = jax.make_array_from_process_local_data(
        shard, np.ascontiguousarray(local_images),
        (n_global, *local_images.shape[1:]),
    )
    masked = valid_hw is not None
    if masked:
        vhw = jax.make_array_from_process_local_data(
            shard, np.ascontiguousarray(np.asarray(valid_hw, np.int32)),
            (n_global, 2),
        )
    fn = est._batch_fn(n_global, h, w, scales, masked=masked)
    tables = fn(est.params, imgs, vhw) if masked else fn(est.params, imgs)

    # pull back only this process's rows: the addressable shards of
    # each leaf, stitched in global-row order (process-major mesh =>
    # contiguous [pid*n_local, (pid+1)*n_local) slice)
    def local_rows(leaf):
        shards = sorted(
            leaf.addressable_shards, key=lambda s: s.index[0].start or 0
        )
        return np.concatenate([np.asarray(s.data) for s in shards])

    local_tables = jax.tree.map(local_rows, tables)
    return est._finish(n_local, local_tables)
