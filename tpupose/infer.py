"""Public inference API: image -> people keypoint JSON + skeleton overlay.

The reference's product path (``demo_image.py::process``, SURVEY.md
section 3.1; BASELINE.json configs 1-3): multi-scale resize/pad pyramid
-> CNN forward -> bilinear-upsampled heatmap/PAF averaging -> fused
decode. TPU-native design decisions:

  * Each pyramid scale is one jitted device program; the decode is the
    jitted fixed-capacity pipeline in ``tpupose.decode``; averaging
    stays on device.
  * Images cross the host->device boundary as uint8 (the normalisation
    runs on device) and only the compact people tables come back —
    transfers are the bottleneck when the chip sits behind a network
    (and always cost HBM bandwidth).
  * ``process_batch`` fuses normalise -> forward -> upsample -> decode
    for a whole batch into ONE program, and ``stream`` overlaps
    transfers with compute via async dispatch for sustained throughput.
"""

from __future__ import annotations


from typing import Any, Iterable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from tpupose import topology
from tpupose.config import DEFAULT, PoseConfig
from tpupose.decode import to_people
from tpupose.decode.api import decode_impl, decode_impl_batch
from tpupose.decode.scalespace import ScaleSpace
from tpupose.models import OpenPose, weights as weights_lib
from tpupose.ops import image as image_ops


class PoseEstimator:
    """Loads the model once; ``process`` mirrors the reference API."""

    def __init__(
        self,
        cfg: PoseConfig = DEFAULT,
        params: Any | None = None,
        weights_path: str | None = None,
        seed: int = 0,
    ):
        self.cfg = cfg
        from tpupose import ops as _ops

        self.model = OpenPose(
            num_stages=cfg.model.num_stages,
            dtype=jnp.dtype(cfg.model.compute_dtype),
            # fused block-1 kernel on the inference path only (no VJP;
            # the trainer's OpenPose keeps the differentiable XLA convs
            # — the param tree is identical either way)
            pallas_block1=_ops.use_pallas_block1(),
        )
        if params is None:
            dummy = jnp.zeros((1, cfg.model.boxsize, cfg.model.boxsize, 3), jnp.float32)
            params = self.model.init(jax.random.PRNGKey(seed), dummy)["params"]
            params, self.pretrained = weights_lib.maybe_load_pretrained(
                params, weights_path
            )
        else:
            self.pretrained = True
        self.params = params
        self._fns: dict[tuple, Any] = {}

    # --- jitted programs (cached per input geometry) --------------------------

    def _maps_fn(self, in_h: int, in_w: int, rh: int, rw: int):
        """One pyramid scale: uint8 image -> (heat, paf) at input res."""
        key = ("maps", in_h, in_w, rh, rw)
        if key not in self._fns:
            model = self.model
            mcfg = self.cfg.model
            stride = mcfg.stride

            @jax.jit
            def run(params, img_u8):
                x = image_ops.normalize(img_u8, mcfg.channel_order)
                x = image_ops.resize_bilinear(x, rh, rw)
                x, _ = image_ops.pad_right_down(x, stride, image_ops.PAD_NORM)
                paf, heat = model.apply({"params": params}, x[None])[-1]
                heat = image_ops.upsample_to(heat, rh, rw, in_h, in_w, stride)
                paf = image_ops.upsample_to(paf, rh, rw, in_h, in_w, stride)
                return heat, paf

            self._fns[key] = run
        return self._fns[key]

    def _single_fn(self, in_h: int, in_w: int):
        """Fused multi-scale maps + decode: uint8 image -> people tables.

        One device program per input geometry; one transfer each way.
        """
        key = ("single", in_h, in_w)
        if key not in self._fns:
            model = self.model
            mcfg = self.cfg.model
            icfg = self.cfg.inference
            sizes = image_ops.pyramid_sizes(icfg, mcfg, in_h, in_w)

            use_ss = icfg.paf_readout == "scalespace"

            @jax.jit
            def run(params, img_u8):
                x0 = image_ops.normalize(img_u8, mcfg.channel_order)
                heat_avg = jnp.zeros((in_h, in_w, topology.NUM_HEAT_CHANNELS))
                paf_avg = jnp.zeros((in_h, in_w, topology.NUM_PAF_CHANNELS))
                heat_scales, paf_scales = [], []
                n = float(len(sizes))
                for rh, rw, _, _ in sizes:
                    x = image_ops.resize_bilinear(x0, rh, rw)
                    x, _ = image_ops.pad_right_down(x, mcfg.stride, image_ops.PAD_NORM)
                    paf, heat = model.apply({"params": params}, x[None])[-1]
                    if use_ss:
                        heat_scales.append(heat[0])
                        paf_scales.append(paf[0])
                    else:
                        heat_avg = heat_avg + image_ops.upsample_to(
                            heat, rh, rw, in_h, in_w, mcfg.stride) / n
                        paf_avg = paf_avg + image_ops.upsample_to(
                            paf, rh, rw, in_h, in_w, mcfg.stride) / n
                geoms = [s[:2] for s in sizes]
                heat_in = (
                    ScaleSpace(heat_scales, geoms, (in_h, in_w))
                    if use_ss else heat_avg
                )
                paf_in = (
                    ScaleSpace(paf_scales, geoms, (in_h, in_w))
                    if use_ss else paf_avg
                )
                return decode_impl(heat_in, paf_in, icfg)

            self._fns[key] = run
        return self._fns[key]

    def _batch_fn(self, n: int, in_h: int, in_w: int,
                  scales: tuple[float, ...] | None = None,
                  masked: bool = False):
        """Fused MULTI-scale batch: (N, H, W, 3) uint8 -> batched tables.

        The reference's product path is the full 4-scale pyramid
        (BASELINE.json config 2); this is its batched+fused form — one
        device program runs every scale's forward over the whole batch,
        averages the upsampled maps on device, and decodes, so a stream
        of batches pipelines the complete product pipeline (round-1
        VERDICT missing #1: the batched paths used to silently drop to
        the 1.0 scale).

        With ``masked=True`` the program takes an extra (N, 2) int32
        ``valid_hw`` operand and suppresses peaks outside each image's
        top-left valid rectangle — the shape-bucket serving path."""
        scales = tuple(scales) if scales else self.cfg.inference.scale_search
        key = ("batch", n, in_h, in_w, scales, masked)
        if key not in self._fns:
            model = self.model
            mcfg = self.cfg.model
            icfg = self.cfg.inference
            sizes = image_ops.scale_sizes(
                in_h, in_w, scales, mcfg.boxsize, mcfg.stride
            )

            use_ss = icfg.paf_readout == "scalespace"

            @jax.jit
            def run(params, imgs_u8, valid_hw=None):
                x0 = image_ops.normalize(imgs_u8, mcfg.channel_order)
                heat_avg = jnp.zeros((n, in_h, in_w, topology.NUM_HEAT_CHANNELS))
                paf_avg = jnp.zeros((n, in_h, in_w, topology.NUM_PAF_CHANNELS))
                heat_scales, paf_scales = [], []
                ns = float(len(sizes))
                up = lambda m, rh, rw: image_ops.upsample_to(   # noqa: E731
                    m[None], rh, rw, in_h, in_w, mcfg.stride
                )
                for rh, rw, _, _ in sizes:
                    x = image_ops.resize_bilinear(x0, rh, rw)
                    x, _ = image_ops.pad_right_down(
                        x, mcfg.stride, image_ops.PAD_NORM
                    )
                    paf, heat = model.apply({"params": params}, x)[-1]
                    if use_ss:
                        heat_scales.append(heat)    # (N, ph/8, pw/8, 19)
                        paf_scales.append(paf)      # (N, ph/8, pw/8, 38)
                    else:
                        heat_avg = heat_avg + jax.vmap(
                            lambda m: up(m, rh, rw))(heat) / ns
                        paf_avg = paf_avg + jax.vmap(
                            lambda m: up(m, rh, rw))(paf) / ns
                geoms = [s[:2] for s in sizes]
                heat_in = (
                    ScaleSpace(heat_scales, geoms, (in_h, in_w))
                    if use_ss else heat_avg
                )
                paf_in = (
                    ScaleSpace(paf_scales, geoms, (in_h, in_w))
                    if use_ss else paf_avg
                )
                # one batch-level adaptive tier choice (NOT vmap of the
                # per-image decode: its lax.cond would become a select)
                return decode_impl_batch(heat_in, paf_in, icfg, valid_hw)

            self._fns[key] = run
        return self._fns[key]

    # --- public API ------------------------------------------------------------

    def maps(self, image: np.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Multi-scale averaged (heatmap, paf) at the input resolution.

        ``image`` is (H, W, 3), uint8-valued, in the configured channel
        order (reference default BGR).
        """
        h, w = image.shape[:2]
        sizes = image_ops.pyramid_sizes(self.cfg.inference, self.cfg.model, h, w)
        img_dev = jnp.asarray(np.asarray(image, np.uint8))
        heat_avg = None
        paf_avg = None
        n = float(len(sizes))
        for rh, rw, _, _ in sizes:
            heat, paf = self._maps_fn(h, w, rh, rw)(self.params, img_dev)
            heat_avg = heat / n if heat_avg is None else heat_avg + heat / n
            paf_avg = paf / n if paf_avg is None else paf_avg + paf / n
        return heat_avg, paf_avg

    def process_async(self, image: np.ndarray):
        """Dispatch one image; returns the on-device tables (no sync)."""
        h, w = image.shape[:2]
        img_dev = jnp.asarray(np.asarray(image, np.uint8))
        return self._single_fn(h, w)(self.params, img_dev)

    def process(self, image: np.ndarray, draw: bool = False) -> dict:
        """Reference output contract: people JSON (+ optional overlay)."""
        tables = jax.device_get(self.process_async(image))
        people = to_people(tables)
        out = {"people": people}
        if draw:
            from tpupose.utils.drawing import draw_people

            out["canvas"] = draw_people(np.asarray(image, np.uint8), people)
        return out

    def process_batch(
        self,
        images: np.ndarray,
        scales: tuple[float, ...] | None = None,
        valid_hw: np.ndarray | None = None,
    ) -> list[list[dict]]:
        """Batched product path: (N, H, W, 3) -> people per image.

        Runs the configured multi-scale pyramid (reference default
        4 scales); pass ``scales=(1.0,)`` for the single-scale realtime
        variant (reference demo_camera). ``valid_hw`` ((N, 2) int32,
        optional) marks each image's top-left valid rectangle when the
        batch canvas carries bottom/right padding (shape buckets); peaks
        never surface from the padded margin."""
        n, tables = self.process_batch_async(images, scales, valid_hw)
        return self._finish(n, tables)

    def process_batch_async(
        self,
        images: np.ndarray,
        scales: tuple[float, ...] | None = None,
        valid_hw: np.ndarray | None = None,
    ):
        """Dispatch the batched program; returns (n, on-device tables).

        No host sync: resolve with ``PoseEstimator._finish(n, tables)``.
        Lets callers keep several batches in flight (``stream`` does this
        for uniform batches; ``buckets.BucketedRunner`` for mixed)."""
        n, h, w = images.shape[:3]
        fn = self._batch_fn(n, h, w, scales, masked=valid_hw is not None)
        if valid_hw is None:
            tables = fn(self.params, jnp.asarray(images))
        else:
            tables = fn(
                self.params, jnp.asarray(images),
                jnp.asarray(valid_hw, jnp.int32),
            )
        return n, tables

    def stream(
        self,
        batches: Iterable[np.ndarray],
        depth: int = 2,
        scales: tuple[float, ...] | None = None,
    ) -> Iterator[list[list[dict]]]:
        """Pipelined batched inference: keeps ``depth`` batches in flight
        so host<->device transfers overlap with compute. Runs the full
        configured pyramid unless ``scales`` narrows it."""
        pending: list[Any] = []
        for images in batches:
            n, h, w = images.shape[:3]
            pending.append(
                (n, self._batch_fn(n, h, w, scales)(self.params,
                                                    jnp.asarray(images)))
            )
            if len(pending) > depth:
                yield self._finish(*pending.pop(0))
        while pending:
            yield self._finish(*pending.pop(0))

    @staticmethod
    def _finish(n: int, tables) -> list[list[dict]]:
        tables = jax.device_get(tables)
        return [to_people(jax.tree.map(lambda x: x[i], tables)) for i in range(n)]
