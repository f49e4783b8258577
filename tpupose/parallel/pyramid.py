"""Scale-sharded multi-scale inference (SURVEY.md sections 2.2 / 5.7).

The reference's multi-scale pyramid runs its 4 scales serially through
one GPU (SURVEY.md 3.1 hot loop 1). The scales are embarrassingly
parallel, so on a TPU slice they become the framework's "context
parallelism" analogue: every scale's image is padded to the largest
scale's geometry, the batch of scales is sharded over the ``data`` mesh
axis, one forward runs on all chips simultaneously, and the averaged
maps are produced by the XLA-inserted collective when the (replicated)
mean is taken.

Padding note — MEASURED divergence bound (tests/test_pyramid_drift.py):
the input-level semantics match the reference's gray padRightDownCorner
pad, but deep-layer activations over the gray canvas are nonzero
(bias + ReLU), unlike the per-layer zero padding the standalone
per-scale program sees at its borders. Measured against the serial
pyramid (same params, 2-scale, single-stage f32 net): the averaged-map
divergence is up to ~31% of the map's dynamic range within 16 px of the
image border, ~11% in the 16-32 px band, and <= ~2% beyond 32 px —
decaying at least 2x per 16-px band (pinned with headroom by the test).
Under the decode's sigma-3 smoothed NMS, GT-prominence peaks perturbed
at that profile move <= 1 px in the interior and <= 2 px in the border
band, so only keypoints within ~32 px of the image border are at risk
of drifting versus the serial program. The serial fused program
(`PoseEstimator.process`) remains the parity-exact default; this mode
trades that bounded edge divergence for cross-chip scale parallelism.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpupose import topology
from tpupose.config import PoseConfig
from tpupose.decode.api import decode_impl, decode_impl_batch
from tpupose.ops import image as image_ops


def build_sharded_pyramid_fn(
    model: Any, cfg: PoseConfig, mesh: Mesh, in_h: int, in_w: int
):
    """Returns fn(params, img_u8) -> people tables, with the pyramid's
    scales sharded across the mesh's 'data' axis."""
    mcfg = cfg.model
    icfg = cfg.inference
    sizes = image_ops.pyramid_sizes(icfg, mcfg, in_h, in_w)
    n_scales = len(sizes)
    max_ph = max(s[2] for s in sizes)
    max_pw = max(s[3] for s in sizes)

    batch_sh = NamedSharding(mesh, P("data"))
    repl_sh = NamedSharding(mesh, P())

    @partial(jax.jit, out_shardings=repl_sh)
    def run(params, img_u8):
        x0 = image_ops.normalize(img_u8, mcfg.channel_order)
        # build the scale batch on one canvas (gray outside each scale)
        canvases = []
        for rh, rw, _, _ in sizes:
            x = image_ops.resize_bilinear(x0, rh, rw)
            pad = [(0, max_ph - rh), (0, max_pw - rw), (0, 0)]
            canvases.append(jnp.pad(x, pad, constant_values=image_ops.PAD_NORM))
        batch = jnp.stack(canvases)                          # (S, maxH, maxW, 3)
        batch = jax.lax.with_sharding_constraint(batch, batch_sh)

        pafs, heats = model.apply({"params": params}, batch)[-1]

        heat_avg = jnp.zeros((in_h, in_w, topology.NUM_HEAT_CHANNELS))
        paf_avg = jnp.zeros((in_h, in_w, topology.NUM_PAF_CHANNELS))
        for i, (rh, rw, _, _) in enumerate(sizes):
            heat_avg = heat_avg + image_ops.upsample_to(
                heats[i : i + 1], rh, rw, in_h, in_w, mcfg.stride
            ) / n_scales
            paf_avg = paf_avg + image_ops.upsample_to(
                pafs[i : i + 1], rh, rw, in_h, in_w, mcfg.stride
            ) / n_scales
        return decode_impl(heat_avg, paf_avg, icfg)

    return run


def scale_mesh(n_scales: int) -> Mesh:
    """Largest mesh whose size divides the scale count (so the scale
    batch shards evenly)."""
    from tpupose.parallel.sharding import data_mesh_for_batch

    return data_mesh_for_batch(n_scales)


def data_scale_mesh(n_scale_shards: int, devices=None) -> Mesh:
    """2-D ('data', 'scale') mesh: scales split ``n_scale_shards`` ways,
    the remaining device factor carries the image batch. On an 8-device
    slice with 4 scales this is a (2, 4) mesh: 2-way data parallelism x
    4-way scale parallelism in one program."""
    devices = np.asarray(jax.devices() if devices is None else devices)
    n = devices.size
    if n % n_scale_shards:
        raise ValueError(
            f"{n} devices do not split into 'scale' shards of "
            f"{n_scale_shards}"
        )
    grid = devices.reshape(n // n_scale_shards, n_scale_shards)
    return Mesh(grid, ("data", "scale"))


def default_data_scale_mesh(n_scales: int) -> Mesh:
    """Largest even ('data', 'scale') factorization of the available
    devices: the scale axis is the biggest divisor of the device count
    that also divides the scale count (degrading gracefully — 8 devices
    with 3 scales gives an (8, 1) mesh rather than an error, mirroring
    ``scale_mesh``)."""
    n_dev = len(jax.devices())
    s = 1
    for d in range(1, min(n_scales, n_dev) + 1):
        if n_scales % d == 0 and n_dev % d == 0:
            s = d
    return data_scale_mesh(s)


def build_sharded_pyramid_batch_fn(
    model: Any, cfg: PoseConfig, mesh: Mesh, batch: int, in_h: int, in_w: int
):
    """Batched pyramid over a 2-D ('data', 'scale') mesh.

    Returns fn(params, imgs_u8 (B, H, W, 3)) -> batched people tables.
    Every image fans out to its pyramid canvases inside the program; the
    flattened (B*S) forward batch is sharded over BOTH mesh axes, so the
    data-parallel serving story (`parallel.inference`) and the
    scale-parallel latency story (this module) compose in one jitted
    program — XLA inserts the cross-'scale' reduce for the map average
    and keeps the decode sharded over 'data'. Canvas semantics (gray
    padding to the largest scale, measured edge-drift bound) match
    ``build_sharded_pyramid_fn`` above.
    """
    mcfg = cfg.model
    icfg = cfg.inference
    sizes = image_ops.pyramid_sizes(icfg, mcfg, in_h, in_w)
    n_scales = len(sizes)
    max_ph = max(s[2] for s in sizes)
    max_pw = max(s[3] for s in sizes)

    flat_sh = NamedSharding(mesh, P(("data", "scale")))
    data_sh = NamedSharding(mesh, P("data"))

    @partial(jax.jit, out_shardings=data_sh)
    def run(params, imgs_u8):
        x0 = image_ops.normalize(imgs_u8, mcfg.channel_order)  # (B, H, W, 3)
        canvases = []
        for rh, rw, _, _ in sizes:
            x = image_ops.resize_bilinear(x0, rh, rw)
            pad = [(0, 0), (0, max_ph - rh), (0, max_pw - rw), (0, 0)]
            canvases.append(jnp.pad(x, pad, constant_values=image_ops.PAD_NORM))
        grid = jnp.stack(canvases, axis=1)          # (B, S, maxH, maxW, 3)
        flat = grid.reshape(batch * n_scales, max_ph, max_pw, 3)
        flat = jax.lax.with_sharding_constraint(flat, flat_sh)

        pafs, heats = model.apply({"params": params}, flat)[-1]
        hh, hw = heats.shape[1], heats.shape[2]
        heats = heats.reshape(batch, n_scales, hh, hw, -1)
        pafs = pafs.reshape(batch, n_scales, hh, hw, -1)

        heat_avg = jnp.zeros((batch, in_h, in_w, topology.NUM_HEAT_CHANNELS))
        paf_avg = jnp.zeros((batch, in_h, in_w, topology.NUM_PAF_CHANNELS))
        for i, (rh, rw, _, _) in enumerate(sizes):
            heat_avg = heat_avg + image_ops.upsample_to_batch(
                heats[:, i], rh, rw, in_h, in_w, mcfg.stride
            ) / n_scales
            paf_avg = paf_avg + image_ops.upsample_to_batch(
                pafs[:, i], rh, rw, in_h, in_w, mcfg.stride
            ) / n_scales
        heat_avg = jax.lax.with_sharding_constraint(heat_avg, data_sh)
        paf_avg = jax.lax.with_sharding_constraint(paf_avg, data_sh)
        return decode_impl_batch(heat_avg, paf_avg, icfg)

    return run


def sharded_process_batch(
    estimator,
    images: np.ndarray,
    mesh: Mesh | None = None,
) -> list[dict]:
    """Batched multi-scale ``process`` on a 2-D ('data', 'scale') mesh.

    Images beyond a data-axis multiple are padded with blank rows
    (decoded then discarded), mirroring ``parallel.inference``.
    """
    from tpupose.decode import to_people

    mesh = mesh or default_data_scale_mesh(
        len(estimator.cfg.inference.scale_search)
    )
    n, h, w = images.shape[:3]
    n_data = mesh.shape["data"]
    n_pad = (n_data - n % n_data) % n_data
    if n_pad:
        blanks = np.zeros((n_pad, h, w, images.shape[3]), images.dtype)
        images = np.concatenate([images, blanks])
    # key on shape too: the same devices factor into different
    # ('data', 'scale') grids, and the program bakes its mesh in
    devs = tuple(int(d.id) for d in mesh.devices.flat)
    key = ("sharded2d", n + n_pad, h, w, devs, tuple(mesh.shape.items()))
    if key not in estimator._fns:
        estimator._fns[key] = build_sharded_pyramid_batch_fn(
            estimator.model, estimator.cfg, mesh, n + n_pad, h, w
        )
    sharded = jax.device_put(
        np.ascontiguousarray(np.asarray(images, np.uint8)),
        NamedSharding(mesh, P("data")),
    )
    with mesh:
        tables = jax.device_get(estimator._fns[key](estimator.params, sharded))
    return [
        {"people": to_people(jax.tree.map(lambda x, i=i: x[i], tables))}
        for i in range(n)
    ]


def sharded_process(
    estimator,
    image: np.ndarray,
    mesh: Mesh | None = None,
) -> dict:
    """Multi-scale ``process`` with scales spread over the mesh devices."""
    from tpupose.decode import to_people

    mesh = mesh or scale_mesh(len(estimator.cfg.inference.scale_search))
    h, w = image.shape[:2]
    # key on the mesh's device layout, not object identity: identity keys
    # miss the cache for every fresh default mesh and can alias after GC
    devs = tuple(int(d.id) for d in mesh.devices.flat)
    key = ("sharded", h, w, devs)
    if key not in estimator._fns:
        estimator._fns[key] = build_sharded_pyramid_fn(
            estimator.model, estimator.cfg, mesh, h, w
        )
    with mesh:
        tables = jax.device_get(
            estimator._fns[key](estimator.params, jnp.asarray(image, jnp.uint8))
        )
    return {"people": to_people(tables)}
