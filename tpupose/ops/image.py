"""On-device image ops: resize / pad / pyramid / upsample (jnp).

TPU-native replacement for the reference's OpenCV host-side image
plumbing (SURVEY.md C4/C5): ``cv2.resize`` (half-pixel-centre bilinear),
``padRightDownCorner`` (pad bottom/right to a stride multiple with gray),
the stride-8 output upsample, and multi-scale averaging. Everything here
is shape-static and jit-friendly; XLA fuses the normalisation and
averaging into neighbouring ops.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from tpupose.config import InferenceConfig, ModelConfig


def resize_bilinear(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Half-pixel-centre bilinear resize, cv2.INTER_LINEAR semantics.

    ``antialias=False``: cv2.INTER_LINEAR always uses the 2-tap kernel,
    even when downscaling (verified to float eps against cv2 both ways);
    jax's antialiased default widens the kernel on downscale and diverges
    from the reference by up to ~0.24 on heatmap-valued data.

    Works on (H, W, C) or (N, H, W, C).
    """
    if img.ndim == 3:
        shape = (out_h, out_w, img.shape[2])
    else:
        shape = (img.shape[0], out_h, out_w, img.shape[3])
    return jax.image.resize(img, shape, method="linear", antialias=False)


def pad_right_down(
    img: jnp.ndarray, stride: int, pad_value: float
) -> tuple[jnp.ndarray, tuple[int, int]]:
    """Pad bottom/right to multiples of ``stride`` (reference
    ``padRightDownCorner``). Returns (padded, (pad_down, pad_right))."""
    h, w = img.shape[-3], img.shape[-2]
    pad_d = (stride - h % stride) % stride
    pad_r = (stride - w % stride) % stride
    cfg = [(0, 0)] * img.ndim
    cfg[-3] = (0, pad_d)
    cfg[-2] = (0, pad_r)
    return jnp.pad(img, cfg, constant_values=pad_value), (pad_d, pad_r)


def scale_sizes(
    h: int, w: int, scales: tuple[float, ...], boxsize: int, stride: int
) -> list[tuple[int, int, int, int]]:
    """Static per-scale geometry: (resize_h, resize_w, padded_h, padded_w).

    The reference resizes so that the *height* equals scale*boxsize
    (``cv2.resize(fx=scale*boxsize/h)``), then pads to stride multiples.
    """
    out = []
    for s in scales:
        f = s * boxsize / h
        rh = max(int(round(h * f)), 1)
        rw = max(int(round(w * f)), 1)
        ph = math.ceil(rh / stride) * stride
        pw = math.ceil(rw / stride) * stride
        out.append((rh, rw, ph, pw))
    return out


@partial(jax.jit, static_argnames=("rh", "rw", "stride", "pad_norm"))
def preprocess_scale(
    img_norm: jnp.ndarray, rh: int, rw: int, stride: int, pad_norm: float
) -> jnp.ndarray:
    """Resize a normalised (H, W, 3) image to (rh, rw) and pad to stride
    multiples; returns (1, ph, pw, 3)."""
    x = resize_bilinear(img_norm, rh, rw)
    x, _ = pad_right_down(x, stride, pad_norm)
    return x[None]


def upsample_to(
    maps: jnp.ndarray, rh: int, rw: int, out_h: int, out_w: int,
    stride: int = 8,
) -> jnp.ndarray:
    """Stride-N network output -> original image size.

    Mirrors the reference chain: upsample x stride (to the padded size),
    crop the pad back to (rh, rw), then resize to the original (out_h,
    out_w). ``maps`` is (1, ph/stride, pw/stride, C).
    """
    return upsample_to_batch(maps, rh, rw, out_h, out_w, stride)[0]


def upsample_to_batch(
    maps: jnp.ndarray, rh: int, rw: int, out_h: int, out_w: int,
    stride: int = 8,
) -> jnp.ndarray:
    """``upsample_to`` over a kept batch axis: (B, ph/stride, pw/stride,
    C) -> (B, out_h, out_w, C)."""
    ph = maps.shape[1]
    pw = maps.shape[2]
    # one fused bilinear to the padded full-res, then crop + final resize
    full = resize_bilinear(maps, ph * stride, pw * stride)
    full = full[:, :rh, :rw, :]
    return resize_bilinear(full, out_h, out_w)


def normalize(img: jnp.ndarray, channel_order: str = "bgr") -> jnp.ndarray:
    """Reference preprocessing contract: img/256 - 0.5 on BGR pixels.

    The reference feeds cv2-decoded (BGR) images; ``channel_order``
    declares the order of the *incoming* array and flips RGB input to
    the BGR the weights expect (ModelConfig.channel_order).
    """
    if channel_order == "rgb":
        img = img[..., ::-1]
    elif channel_order != "bgr":
        raise ValueError(f"unknown channel_order: {channel_order!r}")
    return img.astype(jnp.float32) / 256.0 - 0.5


PAD_NORM = 128.0 / 256.0 - 0.5  # the gray pad value in normalised space (0.0)


def pyramid_sizes(cfg: InferenceConfig, model: ModelConfig, h: int, w: int):
    return scale_sizes(h, w, cfg.scale_search, model.boxsize, model.stride)
