"""Spatially-sharded CNN inference — halo-exchange tiling over the mesh.

SURVEY.md section 5.7: the reference has no sequence axis; its
"long-context" analogue is large input imagery. This module shards the
image HEIGHT across mesh devices and runs the full VGG19 + 6-stage
two-branch forward as one SPMD program: XLA's spatial partitioner
inserts the halo exchanges (CollectivePermute of boundary rows over
ICI) that every 3x3/7x7 conv and 2x2 pool needs at tile edges — the
CNN equivalent of ring-attention's neighbour traffic, derived by the
compiler from one sharding annotation instead of hand-written NCCL.

This is the TPU-native design: annotate ``P(None, 'spatial', None,
None)`` on the activations, keep params replicated, and let SPMD
propagate the sharding through all ~50 convs. Outputs are bitwise
identical to the unsharded program (convs are local; no reductions are
re-ordered) — pinned by tests on the 8-device CPU mesh.

Use cases: images whose activations exceed one chip's HBM (the VGG
conv1 block at 368^2 already holds 128 x H x W floats per image), or
latency-critical single-image inference where batch parallelism is
unavailable.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpupose.config import PoseConfig
from tpupose.decode.api import decode_impl
from tpupose.decode.scalespace import ScaleSpace
from tpupose.ops import image as image_ops


def spatial_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices, axis 'spatial'."""
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), ("spatial",))


def build_spatial_forward(model: Any, mesh: Mesh):
    """fn(params, x_norm (N, H, W, 3)) -> final-stage (paf, heat), with
    activations sharded along H across the 'spatial' mesh axis.

    Params are replicated (52 M params << HBM); the halo exchange for
    every conv/pool is inserted by the XLA SPMD partitioner from the
    input sharding annotation.
    """
    x_sh = NamedSharding(mesh, P(None, "spatial", None, None))
    repl = NamedSharding(mesh, P())

    @partial(
        jax.jit,
        in_shardings=(repl, x_sh),
        out_shardings=(repl, repl),
    )
    def run(params, x):
        paf, heat = model.apply({"params": params}, x)[-1]
        return paf, heat

    return run


class SpatialPoseEstimator:
    """Single-image multi-scale inference with spatially-sharded forwards.

    Mirrors ``PoseEstimator.process`` (reference ``demo_image.py``
    contract) but runs each pyramid scale's CNN forward tiled across the
    mesh — the decode runs on the replicated averaged maps. Intended for
    large inputs / multi-chip latency scaling; on a 1-device mesh it is
    exactly the serial program.
    """

    def __init__(self, estimator, mesh: Mesh | None = None):
        from tpupose.infer import PoseEstimator  # noqa: F401 (type only)

        self.est = estimator
        self.mesh = mesh or spatial_mesh()
        self._fwd = build_spatial_forward(self.est.model, self.mesh)
        self._fns: dict = {}

    def _decode_fn(self, in_h: int, in_w: int):
        key = (in_h, in_w)
        if key not in self._fns:
            icfg = self.est.cfg.inference
            mcfg = self.est.cfg.model
            sizes = image_ops.pyramid_sizes(icfg, mcfg, in_h, in_w)

            @jax.jit
            def decode(heats, pafs):
                geoms = [s[:2] for s in sizes]
                heat_space = ScaleSpace(
                    [h[0] for h in heats], geoms, (in_h, in_w)
                )
                paf_space = ScaleSpace(list(pafs), geoms, (in_h, in_w))
                return decode_impl(heat_space, paf_space, icfg)

            self._fns[key] = (sizes, decode)
        return self._fns[key]

    def process(self, image: np.ndarray) -> dict:
        from tpupose.decode import to_people

        mcfg = self.est.cfg.model
        h, w = image.shape[:2]
        sizes, decode = self._decode_fn(h, w)
        x0 = image_ops.normalize(
            jnp.asarray(np.asarray(image, np.uint8)), mcfg.channel_order
        )
        heats, pafs = [], []
        for rh, rw, _, _ in sizes:
            x = image_ops.resize_bilinear(x0, rh, rw)
            x, _ = image_ops.pad_right_down(x, mcfg.stride, image_ops.PAD_NORM)
            paf, heat = self._fwd(self.est.params, x[None])
            heats.append(heat)
            pafs.append(paf[0])
        tables = jax.device_get(decode(heats, pafs))
        return {"people": to_people(tables)}
