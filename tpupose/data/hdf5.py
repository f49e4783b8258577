"""Packed-HDF5 dataset ingest (reference RawDataIterator contract).

The reference packs each training sample as an HDF5 record holding the
JPEG-decoded image, the miss-mask, and a JSON metadata blob (main-person
centre, scale_provided, all-person joints) — SURVEY.md C13/C19. This
module reads and writes that format so datasets prepared for the
reference drop straight into the TPU pipeline, and adds fixed-shape
padding (max_persons, letterboxing) so batches are jit-static.

Record layout (one HDF5 group per sample, this framework's writer):
  image  (H, W, 3) uint8
  mask   (H, W)    uint8 (255 = keep)
  meta   attrs: center (2,), scale_provided (), joints (P, 18, 3)
The reader also accepts the upstream lineage's "datum" layout (image and
meta packed together) when present.
"""

from __future__ import annotations

import json
from typing import Iterator

import numpy as np

from tpupose import topology


class SampleWriter:
    """Writes the packed dataset (tools/coco prep use this)."""

    def __init__(self, path: str):
        import h5py

        self._f = h5py.File(path, "w")
        self._group = self._f.create_group("datum")
        self._n = 0

    def add(
        self,
        image: np.ndarray,
        mask: np.ndarray,
        joints: np.ndarray,
        center: tuple[float, float],
        scale_provided: float,
    ) -> None:
        g = self._group.create_group(f"{self._n:07d}")
        g.create_dataset("image", data=np.asarray(image, np.uint8),
                         compression="gzip", compression_opts=1)
        g.create_dataset("mask", data=np.asarray(mask, np.uint8),
                         compression="gzip", compression_opts=1)
        meta = {
            "center": [float(center[0]), float(center[1])],
            "scale_provided": float(scale_provided),
            "joints": np.asarray(joints, np.float64).tolist(),
        }
        g.attrs["meta"] = json.dumps(meta)
        self._n += 1

    def close(self) -> None:
        self._f.attrs["count"] = self._n
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_samples(path: str, shuffle_seed: int | None = None) -> Iterator[dict]:
    """Yields raw dicts: image, mask, joints, center, scale_provided."""
    import h5py

    with h5py.File(path, "r") as f:
        group = f["datum"]
        keys = sorted(group.keys())
        if shuffle_seed is not None:
            rng = np.random.default_rng(shuffle_seed)
            keys = list(rng.permutation(keys))
        for k in keys:
            g = group[k]
            meta = json.loads(g.attrs["meta"])
            yield {
                "image": np.asarray(g["image"], np.uint8),
                "mask": np.asarray(g["mask"], np.uint8),
                "joints": np.asarray(meta["joints"], np.float32),
                "center": np.asarray(meta["center"], np.float32),
                "scale_provided": np.float32(meta["scale_provided"]),
            }


def pad_sample(
    sample: dict, target_h: int, target_w: int, max_persons: int
) -> dict:
    """Fixed-shape sample for the jit-static on-device augmentation.

    Images larger than the target are downscaled to fit (aspect
    preserved) with joints / centre / scale_provided rescaled by the
    same factor, so no content is lost; smaller images are letterboxed
    top-left with gray. Persons are padded to ``max_persons`` with
    absent rows. The reference warps directly from the variable-size
    original (SURVEY.md C11); this is the static-shape equivalent — the
    augmentation's scale term absorbs the fit factor exactly because
    scale_provided is rescaled with the pixels.
    """
    img = sample["image"]
    msk = np.asarray(sample["mask"], np.float32)
    if msk.max() > 1.0:
        msk = msk / 255.0
    h, w = img.shape[:2]

    f = min(target_h / h, target_w / w, 1.0)
    joints_src = np.asarray(sample["joints"], np.float32).copy()
    center = np.asarray(sample["center"], np.float32).copy()
    scale_provided = float(sample["scale_provided"])
    if f < 1.0:
        import cv2

        nh, nw = max(int(round(h * f)), 1), max(int(round(w * f)), 1)
        img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_AREA)
        msk = cv2.resize(msk, (nw, nh), interpolation=cv2.INTER_LINEAR)
        if joints_src.size:
            joints_src[:, :, :2] *= f
        center *= f
        scale_provided *= f
        h, w = nh, nw

    out_img = np.full((target_h, target_w, 3), 128, np.uint8)
    out_img[:h, :w] = img
    out_msk = np.zeros((target_h, target_w), np.float32)
    out_msk[:h, :w] = msk

    joints = np.full((max_persons, topology.NUM_PARTS, 3), 2.0, np.float32)
    src = joints_src[:max_persons]
    joints[: src.shape[0]] = src
    off = (
        (joints[:, :, 0] < 0) | (joints[:, :, 0] >= w)
        | (joints[:, :, 1] < 0) | (joints[:, :, 1] >= h)
    )
    joints[:, :, 2] = np.where(off, 2.0, joints[:, :, 2])

    return {
        "image": out_img,
        "mask": out_msk,
        "joints": joints,
        "center": center,
        "scale_provided": np.float32(scale_provided),
    }
