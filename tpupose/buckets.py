"""Shape buckets: bounded jit-cache serving over arbitrary image sizes.

Every distinct input (H, W) otherwise compiles its own fused device
program (PoseEstimator._batch_fn keys on the geometry) — fine for a
camera at one resolution, unbounded for an open HTTP endpoint. A bucket
ladder fixes the set of canvas geometries ever compiled: each request is
aspect-preserving resized (downscale only) into the smallest bucket that
holds it, placed top-left, and the bottom/right margin is padded with
the reference's gray pad value — the same padRightDownCorner convention
the model already sees at every pyramid scale (SURVEY.md C4), just
extended to the canvas. The decode masks the margin out of peak finding
(``decode_impl_batch(valid_hw=...)``), and detected keypoints are mapped
back to original-image coordinates on the host.

Bucketing trades exact native-resolution processing for a bounded
compile cache and cross-request batchability (images in the same bucket
batch together even when their native shapes differ); detections on a
downscaled request are equivalent to running the reference pipeline on
the downscaled image.
"""

from __future__ import annotations

import numpy as np

# Ladder of (H, W) canvases. Heights/widths are multiples of the model
# stride (8) so the canvas itself never needs further padding at scale
# 1.0; the ladder covers portrait/landscape/square up to ~720p-ish while
# keeping the compiled-program count at len(DEFAULT_BUCKETS) per batch
# bucket. Override via ``--buckets`` in serve.
DEFAULT_BUCKETS: tuple[tuple[int, int], ...] = (
    (368, 368),
    (368, 496),
    (496, 368),
    (368, 656),
    (656, 368),
    (496, 656),
    (656, 496),
)


def parse_buckets(spec: str) -> tuple[tuple[int, int], ...]:
    """``"368x368,368x496"`` -> ((368, 368), (368, 496))."""
    out = []
    for item in spec.split(","):
        h, w = item.lower().split("x")
        out.append((int(h), int(w)))
    if not out:
        raise ValueError("empty bucket spec")
    return tuple(out)


def choose_bucket(
    h: int, w: int, buckets: tuple[tuple[int, int], ...]
) -> tuple[int, int, float]:
    """Pick the bucket minimising wasted canvas area; never upscale.

    Returns (bucket_h, bucket_w, scale) with scale = min(1, fit factor):
    the image content will occupy round(h*scale) x round(w*scale) of the
    canvas top-left. Among buckets with equal waste the smaller canvas
    wins (less compute).
    """
    best = None
    for bh, bw in buckets:
        s = min(1.0, bh / h, bw / w)
        vh, vw = max(1, round(h * s)), max(1, round(w * s))
        if s == 1.0:
            # fits natively: minimise wasted canvas, then canvas area
            key = (0, bh * bw - vh * vw, bh * bw)
        else:
            # must downscale: retain the most resolution, then the
            # smallest canvas that achieves it
            key = (1, -s, bh * bw)
        if best is None or key < best[0]:
            best = (key, (bh, bw, s))
    return best[1]


def _resize_host(image: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Half-pixel-centre bilinear (cv2.INTER_LINEAR semantics) on host.

    Uses cv2 when importable (serve already requires it for imdecode);
    the NumPy fallback implements the same 2-tap kernel so library users
    without cv2 get identical geometry.
    """
    try:
        import cv2

        return cv2.resize(
            image, (out_w, out_h), interpolation=cv2.INTER_LINEAR
        )
    except ImportError:
        pass
    h, w = image.shape[:2]
    ys = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    y0 = np.clip(np.floor(ys), 0, h - 1).astype(np.int32)
    x0 = np.clip(np.floor(xs), 0, w - 1).astype(np.int32)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    fx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    img = image.astype(np.float32)
    top = img[y0][:, x0] * (1 - fx) + img[y0][:, x1] * fx
    bot = img[y1][:, x0] * (1 - fx) + img[y1][:, x1] * fx
    out = top * (1 - fy) + bot * fy
    if np.issubdtype(image.dtype, np.integer):
        out = np.round(out).clip(0, 255)
    return out.astype(image.dtype)


GRAY_PAD = 128  # uint8 pad pixel; normalises to ops.image.PAD_NORM (0.0)


def to_bucket(
    image: np.ndarray, bucket_h: int, bucket_w: int, scale: float
) -> tuple[np.ndarray, int, int]:
    """Place ``image`` into a (bucket_h, bucket_w, 3) gray canvas.

    Returns (canvas uint8, valid_h, valid_w). Content goes top-left at
    ``scale`` (1.0 = no resample, just pad)."""
    h, w = image.shape[:2]
    vh, vw = max(1, round(h * scale)), max(1, round(w * scale))
    vh, vw = min(vh, bucket_h), min(vw, bucket_w)
    content = (
        np.asarray(image, np.uint8)
        if (vh, vw) == (h, w)
        else _resize_host(np.asarray(image, np.uint8), vh, vw)
    )
    canvas = np.full((bucket_h, bucket_w, 3), GRAY_PAD, np.uint8)
    canvas[:vh, :vw] = content
    return canvas, vh, vw


def unscale_people(people: list[dict], scale: float) -> list[dict]:
    """Map bucket-canvas keypoint coordinates back to the original image."""
    if scale == 1.0:
        return people
    inv = 1.0 / scale
    out = []
    for p in people:
        kps = {
            name: {**kp, "x": kp["x"] * inv, "y": kp["y"] * inv}
            for name, kp in p["keypoints"].items()
        }
        out.append({**p, "keypoints": kps})
    return out
