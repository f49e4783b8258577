"""Deployment artifact export/load: serialized inference programs.

The reference lineage deploys by shipping the Keras ``.h5`` plus the
whole Python pipeline (model code, decode code, exact library
versions); any drift re-traces a different program. This module is the
framework's SavedModel/TorchScript analogue, built on ``jax.export``:

  * ``save_bundle`` serializes every fused batched inference program
    live serving can reach — one per (bucket canvas x power-of-two
    device batch), exactly the jit-cache keys ``serve.MicroBatcher``
    uses — into a single ``.tppx`` zip, together with ONE copy of the
    weights and a manifest (shapes, scales, decode capacities, sha256
    per member).
  * ``load_bundle`` reconstructs a ``DeployedEstimator`` that
    duck-types ``PoseEstimator.process_batch``, so it drops into the
    HTTP server (``serve --program model.tppx``), the micro-batcher,
    warmup, and ``buckets.BucketedRunner`` unchanged.

Why programs-as-artifact (vs re-tracing Python on every host):

  * The decode pipeline is configuration — capacity tiers, thresholds,
    scale ladder — compiled INTO the program. A bundle pins the exact
    deployed computation; a config drift on the serving host cannot
    silently change numerics (the StableHLO is the contract, and
    ``jax.export``'s calling-convention versioning refuses artifacts
    newer than the runtime understands).
  * The serving host needs no flax model definition, no topology
    table, no decode source — ``Exported.call`` re-stages the saved
    StableHLO directly. Model code and serving fleet can version
    independently.
  * Weights ride the bundle once (the programs take them as call
    arguments, not baked constants): a flagship bundle is
    ~200 MB + ~1 MB per program instead of ~200 MB per program.

The output tables convert to people JSON with the same
``decode.to_people`` used everywhere else, so a bundle's HTTP replies
are bit-identical to the live estimator's (pinned by
``tests/test_deploy.py``).
"""

from __future__ import annotations

import hashlib
import io
import json
import zipfile
from typing import Any, Iterable

import numpy as np

FORMAT = "tppx-v1"
_MANIFEST = "manifest.json"
_WEIGHTS = "weights.npz"


def _pow2_sizes(max_batch: int) -> list[int]:
    """1, 2, 4, ... up to ceil_pow2(max_batch) — the micro-batcher's
    device-batch buckets (serve.MicroBatcher pads to the next power of
    two, so these are exactly the reachable batch dimensions)."""
    top = 1 << (max(1, int(max_batch)) - 1).bit_length()
    return [1 << i for i in range(top.bit_length())]


def _flatten_params(params) -> dict[str, np.ndarray]:
    """Dict-tree -> {'a/b/c': array}. Refuses trees the '/'-joined key
    scheme cannot round-trip (non-dict nodes, '/' inside a key): a
    silently mis-nested tree would fail much later inside
    ``Exported.call`` with an opaque structure error."""
    import jax

    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        parts = []
        for p in path:
            if not hasattr(p, "key"):
                raise ValueError(
                    "save_bundle supports plain nested-dict param trees "
                    f"only; found a non-dict node at {path!r}"
                )
            key = str(p.key)
            if "/" in key:
                raise ValueError(
                    f"param key {key!r} contains '/', which collides with "
                    "the bundle's flattened-key separator"
                )
            parts.append(key)
        flat["/".join(parts)] = np.asarray(jax.device_get(leaf))
    return flat


def _unflatten_params(flat: dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for key, arr in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
    return tree


def export_program(estimator, n: int, h: int, w: int,
                   scales: tuple[float, ...] | None = None) -> bytes:
    """Serialize ONE fused batched program (masked: takes ``valid_hw``).

    The program signature is ``(params, images u8 (n,h,w,3),
    valid_hw i32 (n,2)) -> decode tables`` — weights as arguments so a
    bundle stores them once (see module docstring).
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    fn = estimator._batch_fn(n, h, w, scales, masked=True)
    pspec = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), estimator.params
    )
    exp = jexport.export(jax.jit(fn))(
        pspec,
        jax.ShapeDtypeStruct((n, h, w, 3), jnp.uint8),
        jax.ShapeDtypeStruct((n, 2), jnp.int32),
    )
    return exp.serialize()


def save_bundle(path: str, estimator,
                buckets: Iterable[tuple[int, int]],
                max_batch: int = 8,
                scales: tuple[float, ...] | None = None,
                log=None) -> dict:
    """Export every (bucket x pow2-batch <= max_batch) program + weights
    into a ``.tppx`` zip at ``path``. Returns the manifest dict."""
    import jax

    buckets = [tuple(map(int, b)) for b in buckets]
    if not buckets:
        raise ValueError("save_bundle needs a non-empty bucket ladder")
    sizes = _pow2_sizes(max_batch)
    scales_t = tuple(scales) if scales else tuple(
        estimator.cfg.inference.scale_search
    )

    flat = _flatten_params(estimator.params)
    wbuf = io.BytesIO()
    # compressed: np.savez stores raw .npy members, so a flagship
    # bundle would otherwise carry ~200 MB of uncompressed float32
    np.savez_compressed(wbuf, **flat)
    wbytes = wbuf.getvalue()

    members: list[tuple[str, bytes]] = [(_WEIGHTS, wbytes)]
    programs = []
    for bh, bw in buckets:
        for nb in sizes:
            blob = export_program(estimator, nb, bh, bw, scales_t)
            name = f"programs/{bh}x{bw}_b{nb}.jexp"
            members.append((name, blob))
            programs.append({
                "h": bh, "w": bw, "n": nb, "file": name,
                "bytes": len(blob),
                "sha256": hashlib.sha256(blob).hexdigest(),
            })
            if log is not None:
                log(f"exported {bh}x{bw} batch={nb}: {len(blob)} bytes")

    manifest = {
        "format": FORMAT,
        "jax_version": jax.__version__,
        "scales": list(scales_t),
        "buckets": [list(b) for b in buckets],
        "max_batch": int(max_batch),
        "pretrained": bool(getattr(estimator, "pretrained", False)),
        "num_stages": int(estimator.cfg.model.num_stages),
        "compute_dtype": str(estimator.cfg.model.compute_dtype),
        "weights_sha256": hashlib.sha256(wbytes).hexdigest(),
        "programs": programs,
    }
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        # STORED: the weights npz is already deflated above and the
        # StableHLO program blobs compress negligibly
        zf.writestr(_MANIFEST, json.dumps(manifest, indent=1))
        for name, blob in members:
            zf.writestr(name, blob)
    return manifest


class DeployedEstimator:
    """Serving estimator backed by exported programs, not Python model
    code. Duck-types the slice of ``PoseEstimator`` the serving stack
    uses (``process_batch``/``process``/``pretrained``), so it drops
    into ``serve()``, ``MicroBatcher``, ``warmup_estimator`` and
    ``BucketedRunner`` unchanged."""

    def __init__(self, manifest: dict, params, programs: dict):
        self.manifest = manifest
        self.params = params
        self.pretrained = bool(manifest.get("pretrained", False))
        self.buckets = tuple(tuple(b) for b in manifest["buckets"])
        # the serving ceiling is the largest exported batch dimension,
        # not the raw --max-batch argument (export rounds up to the
        # next power of two, so a bundle built with --max-batch 5
        # really serves batches of 8)
        self.max_batch = max(
            (int(p["n"]) for p in manifest["programs"]),
            default=int(manifest["max_batch"]),
        )
        self.scales = tuple(manifest["scales"])
        self._programs = programs      # (n, h, w) -> Exported
        self._calls: dict[tuple, Any] = {}

    def _call(self, key: tuple):
        import jax

        if key not in self._calls:
            exp = self._programs.get(key)
            if exp is None:
                have = sorted(self._programs)
                raise ValueError(
                    f"bundle has no program for (n, h, w)={key}; "
                    f"available: {have}"
                )
            self._calls[key] = jax.jit(exp.call)
        return self._calls[key]

    def process_batch_async(self, images: np.ndarray,
                            scales: tuple[float, ...] | None = None,
                            valid_hw: np.ndarray | None = None):
        """Dispatch through the exported program; returns (n, tables).

        Same contract as ``PoseEstimator.process_batch_async`` except
        the canvas must exist in the bundle and ``scales`` cannot
        deviate from the exported ladder (it is compiled in). Batch
        sizes between exported programs are padded up to the next
        exported power-of-two internally (padded rows dropped by
        ``_finish``), so callers that pad to arbitrary batch sizes —
        ``buckets.BucketedRunner`` pads to its ``batch_size`` — still
        land on an exported program."""
        import jax.numpy as jnp

        if scales is not None and tuple(scales) != self.scales:
            raise ValueError(
                f"bundle was exported with scales={self.scales}; "
                f"cannot run scales={tuple(scales)} (the pyramid is "
                "compiled into the artifact)"
            )
        images = np.asarray(images, np.uint8)
        n, h, w = images.shape[:3]
        if valid_hw is None:
            valid_hw = np.tile(np.asarray([[h, w]], np.int32), (n, 1))
        valid_hw = np.asarray(valid_hw, np.int32)
        nb = 1 << (max(1, n) - 1).bit_length()
        if nb > n:
            images = np.concatenate(
                [images, np.repeat(images[-1:], nb - n, axis=0)]
            )
            valid_hw = np.concatenate(
                [valid_hw, np.repeat(valid_hw[-1:], nb - n, axis=0)]
            )
        tables = self._call((nb, h, w))(
            self.params, jnp.asarray(images), jnp.asarray(valid_hw)
        )
        return n, tables

    @staticmethod
    def _finish(n: int, tables) -> list[list[dict]]:
        import jax

        # tables -> people via decode.to_people directly: the bundle
        # path must never pull in the flax model module (that is the
        # point of the artifact; pinned by
        # tests/test_deploy.py::test_bundle_fresh_process_no_model_code)
        from tpupose.decode.api import to_people

        tables = jax.device_get(tables)
        return [
            to_people(jax.tree.map(lambda x: x[i], tables))
            for i in range(n)
        ]

    def process_batch(self, images: np.ndarray,
                      scales: tuple[float, ...] | None = None,
                      valid_hw: np.ndarray | None = None) -> list[list[dict]]:
        """Batched inference through the exported program for this
        (batch, canvas) — same contract as ``PoseEstimator.process_batch``
        with the bundle caveats of ``process_batch_async``."""
        return self._finish(*self.process_batch_async(
            images, scales=scales, valid_hw=valid_hw
        ))

    def process(self, image: np.ndarray, draw: bool = False) -> dict:
        """Single-image convenience: routes through the bundle's bucket
        ladder (batch-1 program), mapping keypoints back to the input
        frame — mirrors what the HTTP server does per request."""
        from tpupose import buckets as _bk

        image = np.asarray(image, np.uint8)
        bh, bw, s = _bk.choose_bucket(
            image.shape[0], image.shape[1], self.buckets
        )
        canvas, vh, vw = _bk.to_bucket(image, bh, bw, s)
        people = self.process_batch(
            canvas[None], valid_hw=np.asarray([[vh, vw]], np.int32)
        )[0]
        if s != 1.0:
            people = _bk.unscale_people(people, s)
        out = {"people": people}
        if draw:
            from tpupose.utils.drawing import draw_people

            out["canvas"] = draw_people(image, people)
        return out


def load_bundle(path: str) -> DeployedEstimator:
    """Read a ``.tppx`` bundle back into a servable estimator.

    Verifies every member's sha256 against the manifest (a truncated
    or bit-flipped artifact fails loudly, not with wrong poses) and
    deserializes each program via ``jax.export`` (which itself refuses
    calling-convention versions this runtime does not support)."""
    from jax import export as jexport

    with zipfile.ZipFile(path) as zf:
        manifest = json.loads(zf.read(_MANIFEST))
        if manifest.get("format") != FORMAT:
            raise ValueError(
                f"{path}: unsupported bundle format "
                f"{manifest.get('format')!r} (expected {FORMAT})"
            )
        wbytes = zf.read(_WEIGHTS)
        got = hashlib.sha256(wbytes).hexdigest()
        if got != manifest["weights_sha256"]:
            raise ValueError(f"{path}: weights corrupted (sha256 mismatch)")
        with np.load(io.BytesIO(wbytes)) as npz:
            params = _unflatten_params({k: npz[k] for k in npz.files})
        programs = {}
        for p in manifest["programs"]:
            blob = zf.read(p["file"])
            if hashlib.sha256(blob).hexdigest() != p["sha256"]:
                raise ValueError(
                    f"{path}: program {p['file']} corrupted (sha256 mismatch)"
                )
            programs[(p["n"], p["h"], p["w"])] = jexport.deserialize(blob)
    return DeployedEstimator(manifest, params, programs)
