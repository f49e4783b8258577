"""Public inference API: image -> people keypoint JSON + skeleton overlay.

The reference's product path (``demo_image.py::process``, SURVEY.md
section 3.1; BASELINE.json configs 1-3): multi-scale resize/pad pyramid
-> CNN forward -> bilinear-upsampled heatmap/PAF averaging -> fused
decode. Here each pyramid scale is one jitted device program (resize,
pad, CNN, upsample and scale-averaging all stay on device); the decode
runs as the jitted fixed-capacity pipeline in ``tpupose.decode``. Host
work is reduced to JSON extraction and optional drawing.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tpupose import topology
from tpupose.config import DEFAULT, PoseConfig
from tpupose.decode import decode_maps, to_people
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
        self.model = OpenPose(dtype=jnp.dtype(cfg.model.compute_dtype))
        if params is None:
            dummy = jnp.zeros((1, cfg.model.boxsize, cfg.model.boxsize, 3), jnp.float32)
            params = self.model.init(jax.random.PRNGKey(seed), dummy)["params"]
            params, self.pretrained = weights_lib.maybe_load_pretrained(
                params, weights_path
            )
        else:
            self.pretrained = True
        self.params = params
        self._scale_fns: dict[tuple, Any] = {}

    # --- per-scale jitted program -------------------------------------------

    def _scale_fn(self, in_h: int, in_w: int, rh: int, rw: int):
        key = (in_h, in_w, rh, rw)
        if key not in self._scale_fns:
            model = self.model
            stride = self.cfg.model.stride

            @jax.jit
            def run(params, img):
                x = image_ops.normalize(img)
                x = image_ops.resize_bilinear(x, rh, rw)
                x, _ = image_ops.pad_right_down(x, stride, image_ops.PAD_NORM)
                paf, heat = model.apply({"params": params}, x[None])[-1]
                heat = image_ops.upsample_to(heat, rh, rw, in_h, in_w)
                paf = image_ops.upsample_to(paf, rh, rw, in_h, in_w)
                return heat, paf

            self._scale_fns[key] = run
        return self._scale_fns[key]

    def maps(self, image: np.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Multi-scale averaged (heatmap, paf) at the input resolution.

        ``image`` is (H, W, 3), uint8-valued, in the configured channel
        order (reference default BGR).
        """
        h, w = image.shape[:2]
        sizes = image_ops.pyramid_sizes(self.cfg.inference, self.cfg.model, h, w)
        img_dev = jnp.asarray(image, jnp.float32)
        heat_avg = None
        paf_avg = None
        n = float(len(sizes))
        for rh, rw, _, _ in sizes:
            heat, paf = self._scale_fn(h, w, rh, rw)(self.params, img_dev)
            heat_avg = heat / n if heat_avg is None else heat_avg + heat / n
            paf_avg = paf / n if paf_avg is None else paf_avg + paf / n
        return heat_avg, paf_avg

    def process(self, image: np.ndarray, draw: bool = False) -> dict:
        """Reference output contract: people JSON (+ optional overlay)."""
        heat, paf = self.maps(image)
        tables = decode_maps(heat, paf, self.cfg.inference)
        tables = jax.device_get(tables)
        people = to_people(tables)
        out = {"people": people}
        if draw:
            from tpupose.utils.drawing import draw_people

            out["canvas"] = draw_people(np.asarray(image, np.uint8), people)
        return out
