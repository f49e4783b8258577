"""COCO RLE mask codec: ctypes bindings to the native library.

pycocotools is not installed in this environment; dataset preparation
needs its ``mask`` codec (SURVEY.md C18: miss-masks from crowd and
unannotated person segmentations). ``native/rle.c`` reimplements the
COCO column-major RLE conventions; this wrapper builds it on first use
(cc -shared) and falls back to a pure-NumPy twin when no compiler is
available — the two are parity-tested against each other.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SRC = os.path.abspath(os.path.join(_NATIVE_DIR, "rle.c"))


def _so_path() -> str:
    """Build target in a user cache dir: the package tree may be
    read-only when installed, and no binary is committed to the repo."""
    cache = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    return os.path.join(cache, "tpupose", "librle.so")


_lib = None
_lib_failed = False


def _load() -> ctypes.CDLL | None:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        so = _so_path()
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(_SRC):
            os.makedirs(os.path.dirname(so), exist_ok=True)
            subprocess.run(
                ["cc", "-O2", "-shared", "-fPIC", "-o", so, _SRC],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(so)
        lib.rle_decode.restype = ctypes.c_int
        lib.rle_encode.restype = ctypes.c_int
        lib.rle_from_string.restype = ctypes.c_int
        lib.rle_to_string.restype = ctypes.c_int
        lib.rle_area.restype = ctypes.c_long
        _lib = lib
    except (OSError, subprocess.CalledProcessError):
        _lib_failed = True
    return _lib


def native_available() -> bool:
    return _load() is not None


# --- counts <-> mask ----------------------------------------------------------


def decode(counts: np.ndarray, h: int, w: int) -> np.ndarray:
    """RLE counts -> (h, w) uint8 mask (COCO column-major semantics)."""
    counts = np.ascontiguousarray(counts, np.uint32)
    lib = _load()
    if lib is not None:
        out = np.empty(h * w, np.uint8)
        rc = lib.rle_decode(
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            len(counts),
            h,
            w,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        if rc != 0:
            raise ValueError("malformed RLE: counts do not cover h*w")
        return out.reshape(w, h).T
    # numpy twin
    if counts.sum() != h * w:
        raise ValueError("malformed RLE: counts do not cover h*w")
    vals = np.arange(len(counts), dtype=np.uint8) % 2
    flat = np.repeat(vals, counts)
    return flat.reshape(w, h).T


def encode(mask: np.ndarray) -> np.ndarray:
    """(h, w) binary mask -> RLE counts."""
    mask = np.ascontiguousarray(np.asarray(mask, np.uint8) > 0).astype(np.uint8)
    h, w = mask.shape
    flat = np.asfortranarray(mask).T.reshape(-1)  # column-major stream
    lib = _load()
    if lib is not None:
        out = np.empty(h * w + 1, np.uint32)
        m = lib.rle_encode(
            np.ascontiguousarray(flat).ctypes.data_as(
                ctypes.POINTER(ctypes.c_uint8)
            ),
            h,
            w,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        )
        return out[:m].copy()
    # numpy twin
    change = np.nonzero(np.diff(flat))[0] + 1
    bounds = np.concatenate([[0], change, [h * w]])
    runs = np.diff(bounds).astype(np.uint32)
    if flat[0] == 1:  # counts start with a zero-run
        runs = np.concatenate([[np.uint32(0)], runs])
    return runs


# --- counts <-> COCO compressed string ---------------------------------------


def from_string(s: bytes | str) -> np.ndarray:
    if isinstance(s, str):
        s = s.encode("ascii")
    lib = _load()
    if lib is not None:
        out = np.empty(max(len(s), 1), np.uint32)
        m = lib.rle_from_string(
            s, len(s), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))
        )
        if m < 0:
            raise ValueError("malformed compressed RLE string")
        return out[:m].copy()
    # numpy twin (sequential LEB128 variant with delta coding)
    counts: list[int] = []
    i = 0
    n = len(s)
    while i < n:
        x = 0
        k = 0
        more = 1
        while more:
            if i >= n:
                raise ValueError("malformed compressed RLE string")
            c = s[i] - 48
            x |= (c & 0x1F) << (5 * k)
            more = c & 0x20
            i += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return np.asarray(counts, np.uint32)


def to_string(counts: np.ndarray) -> bytes:
    counts = np.ascontiguousarray(counts, np.uint32)
    lib = _load()
    if lib is not None:
        buf = ctypes.create_string_buffer(len(counts) * 7 + 1)
        p = lib.rle_to_string(
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            len(counts),
            buf,
        )
        return buf.raw[:p]
    out = bytearray()
    m = len(counts)
    for i in range(m):
        x = int(counts[i])
        if i > 2:
            x -= int(counts[i - 2])
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = (x != -1) if (c & 0x10) else (x != 0)
            if more:
                c |= 0x20
            out.append(c + 48)
    return bytes(out)


# --- convenience ---------------------------------------------------------------


def decode_coco(rle_obj: dict) -> np.ndarray:
    """Decode a COCO segmentation dict {'size': [h, w], 'counts': ...}."""
    h, w = rle_obj["size"]
    counts = rle_obj["counts"]
    if isinstance(counts, (bytes, str)):
        counts = from_string(counts)
    return decode(np.asarray(counts, np.uint32), h, w)


def merge(masks: list[np.ndarray]) -> np.ndarray:
    """Union of binary masks."""
    out = np.zeros_like(masks[0], np.uint8)
    for m in masks:
        out |= np.asarray(m, np.uint8) > 0
    return out


def area(counts: np.ndarray) -> int:
    counts = np.ascontiguousarray(counts, np.uint32)
    lib = _load()
    if lib is not None:
        return int(
            lib.rle_area(
                counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(counts)
            )
        )
    return int(counts[1::2].sum())
