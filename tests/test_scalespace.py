"""Scale-space PAF readout contract (decode/scalespace.py).

The readout must equal the materialised pipeline it replaces: for every
scale, ``sample_chain(map, iy, ix)`` == ``upsample_to(map)[iy, ix]``
(same chained bilinear: x8 upsample -> crop to (rh, rw) -> resize to
image size), and the end-to-end decode over a ScaleSpace must produce
the same people as decoding the materialised averaged full-res map.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from tpupose.config import InferenceConfig
from tpupose.decode.api import decode_impl, decode_impl_batch
from tpupose.decode.scalespace import ScaleSpace, sample_avg, sample_chain
from tpupose.ops import image as image_ops

SIZES = image_ops.scale_sizes(368, 368, (0.5, 1.0, 1.5, 2.0), 368, 8)


def _low_maps(rng, c=38):
    """Smooth random per-scale 'network outputs' on the padded grids."""
    out = []
    for rh, rw, ph, pw in SIZES:
        m = rng.normal(size=(ph // 8, pw // 8, c)).astype(np.float32)
        # smooth a little so threshold decisions are not razor-edge
        m = (m + np.roll(m, 1, 0) + np.roll(m, 1, 1)) / 3.0
        out.append(m * 0.3)
    return out


def test_sample_chain_matches_materialised_upsample():
    rng = np.random.default_rng(0)
    maps = _low_maps(rng, c=2)
    pts = rng.integers(0, 368, size=(2, 257))
    iy = jnp.asarray(pts[0], jnp.int32)
    ix = jnp.asarray(pts[1], jnp.int32)
    for (rh, rw, _, _), m in zip(SIZES, maps):
        full = image_ops.upsample_to(jnp.asarray(m)[None], rh, rw, 368, 368, 8)
        want = np.asarray(full)[pts[0], pts[1]]
        got = np.asarray(
            sample_chain(jnp.asarray(m), iy, ix, rh, rw, 368, 368)
        )
        np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)


def test_sample_avg_matches_materialised_average():
    rng = np.random.default_rng(1)
    maps = _low_maps(rng, c=2)
    pts = rng.integers(0, 368, size=(2, 129))
    iy = jnp.asarray(pts[0], jnp.int32)
    ix = jnp.asarray(pts[1], jnp.int32)
    avg = None
    for (rh, rw, _, _), m in zip(SIZES, maps):
        full = image_ops.upsample_to(jnp.asarray(m)[None], rh, rw, 368, 368, 8)
        avg = full / 4 if avg is None else avg + full / 4
    want = np.asarray(avg)[pts[0], pts[1]]
    space = ScaleSpace(
        [jnp.asarray(m) for m in maps], [s[:2] for s in SIZES], (368, 368)
    )
    got = np.asarray(sample_avg(space, iy, ix))
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)


def _scene(seed):
    """Low-res per-scale heat+paf outputs with plausible people structure."""
    from tpupose.reference_impl import gt_np

    rng = np.random.default_rng(seed)

    def person(cx, cy, s=120.0):
        from tpupose import topology

        rel = {
            "nose": (0.0, -0.95), "neck": (0.0, -0.65),
            "Rsho": (-0.30, -0.65), "Relb": (-0.42, -0.30), "Rwri": (-0.45, 0.05),
            "Lsho": (0.30, -0.65), "Lelb": (0.42, -0.30), "Lwri": (0.45, 0.05),
            "Rhip": (-0.18, 0.10), "Rkne": (-0.20, 0.55), "Rank": (-0.20, 0.95),
            "Lhip": (0.18, 0.10), "Lkne": (0.20, 0.55), "Lank": (0.20, 0.95),
            "Reye": (-0.08, -1.02), "Leye": (0.08, -1.02),
            "Rear": (-0.17, -0.98), "Lear": (0.17, -0.98),
        }
        out = np.zeros((18, 3))
        for name, (dx, dy) in rel.items():
            out[topology.PART_INDEX[name]] = (cx + dx * s, cy + dy * s * 0.5, 0.0)
        return out

    joints = np.stack(
        [person(110.0 + rng.normal() * 6, 200.0), person(255.0, 185.0)]
    )
    labels = gt_np.create_heatmaps_np(joints)  # (46, 46, 57)
    import cv2

    heats, pafs = [], []
    for rh, rw, ph, pw in SIZES:
        hl, wl = ph // 8, pw // 8
        heats.append(
            cv2.resize(labels[:, :, 38:], (wl, hl), interpolation=cv2.INTER_LINEAR)
        )
        pafs.append(
            cv2.resize(labels[:, :, :38], (wl, hl), interpolation=cv2.INTER_LINEAR)
        )
    return heats, pafs


def _materialise(maps):
    avg = None
    for (rh, rw, _, _), m in zip(SIZES, maps):
        full = image_ops.upsample_to(jnp.asarray(m)[None], rh, rw, 368, 368, 8)
        avg = full / 4 if avg is None else avg + full / 4
    return avg


def test_decode_scalespace_matches_fullres():
    heats, pafs = _scene(3)
    heat_avg = _materialise(heats)
    paf_avg = _materialise(pafs)
    space = ScaleSpace(
        [jnp.asarray(m) for m in pafs], [s[:2] for s in SIZES], (368, 368)
    )
    cfg = InferenceConfig()
    a = jax.device_get(decode_impl(heat_avg, paf_avg, cfg))
    b = jax.device_get(decode_impl(heat_avg, space, cfg))
    for k in a:
        if np.asarray(a[k]).dtype.kind == "f":
            np.testing.assert_allclose(
                np.asarray(a[k]), np.asarray(b[k]), atol=1e-4, err_msg=k
            )
        else:
            np.testing.assert_array_equal(
                np.asarray(a[k]), np.asarray(b[k]), err_msg=k
            )


def test_decode_scalespace_batched_matches_fullres():
    scenes = [_scene(11), _scene(12)]
    heat_avg = jnp.concatenate([_materialise(h) [None] for h, _ in scenes])
    paf_avg = jnp.concatenate([_materialise(p)[None] for _, p in scenes])
    space = ScaleSpace(
        [
            jnp.stack([jnp.asarray(scenes[0][1][i]), jnp.asarray(scenes[1][1][i])])
            for i in range(len(SIZES))
        ],
        [s[:2] for s in SIZES],
        (368, 368),
    )
    cfg = InferenceConfig()
    a = jax.device_get(decode_impl_batch(heat_avg, paf_avg, cfg))
    b = jax.device_get(decode_impl_batch(heat_avg, space, cfg))
    for k in a:
        if np.asarray(a[k]).dtype.kind == "f":
            np.testing.assert_allclose(
                np.asarray(a[k]), np.asarray(b[k]), atol=1e-4, err_msg=k
            )
        else:
            np.testing.assert_array_equal(
                np.asarray(a[k]), np.asarray(b[k]), err_msg=k
            )


def test_pyramid_heat_maps_matches_materialised():
    """Weight-matrix avg/blur == materialised upsample+avg and blur(avg)."""
    from tpupose.decode.peaks import gaussian_blur
    from tpupose.decode.scalespace import pyramid_heat_maps

    rng = np.random.default_rng(2)
    maps = _low_maps(rng, c=3)
    space = ScaleSpace(
        [jnp.asarray(m) for m in maps], [s[:2] for s in SIZES], (368, 368)
    )
    avg, blur = pyramid_heat_maps(space, sigma=3.0)
    want_avg = _materialise(maps)
    want_blur = gaussian_blur(want_avg, 3.0)
    np.testing.assert_allclose(np.asarray(avg), np.asarray(want_avg), atol=3e-5)
    np.testing.assert_allclose(np.asarray(blur), np.asarray(want_blur), atol=3e-5)


def test_find_peaks_scalespace_matches_materialised():
    from tpupose.decode import peaks as PK

    heats, _ = _scene(7)
    heat_avg = _materialise(heats)
    space = ScaleSpace(
        [jnp.asarray(m) for m in heats], [s[:2] for s in SIZES], (368, 368)
    )
    a = jax.device_get(PK.find_peaks(heat_avg, 96, 3.0, 0.1))
    b = jax.device_get(PK.find_peaks_scalespace(space, 96, 3.0, 0.1))
    for k in a:
        if k == "scores":   # f32 matmul vs resize rounding: ~1 ulp
            np.testing.assert_allclose(
                np.asarray(a[k]), np.asarray(b[k]), atol=1e-5, err_msg=k
            )
        else:               # NMS structure must match exactly
            np.testing.assert_array_equal(
                np.asarray(a[k]), np.asarray(b[k]), err_msg=k
            )


def test_decode_heat_and_paf_scalespace_matches_fullres():
    heats, pafs = _scene(21)
    heat_avg = _materialise(heats)
    paf_avg = _materialise(pafs)
    geoms = [s[:2] for s in SIZES]
    heat_space = ScaleSpace([jnp.asarray(m) for m in heats], geoms, (368, 368))
    paf_space = ScaleSpace([jnp.asarray(m) for m in pafs], geoms, (368, 368))
    cfg = InferenceConfig()
    a = jax.device_get(decode_impl(heat_avg, paf_avg, cfg))
    b = jax.device_get(decode_impl(heat_space, paf_space, cfg))
    for k in a:
        if np.asarray(a[k]).dtype.kind == "f":
            np.testing.assert_allclose(
                np.asarray(a[k]), np.asarray(b[k]), atol=1e-4, err_msg=k
            )
        else:
            np.testing.assert_array_equal(
                np.asarray(a[k]), np.asarray(b[k]), err_msg=k
            )


def test_decode_scalespace_fuzz_random_fields():
    """Random smooth fields, 6 seeds: scalespace decode == fullres decode
    (people structure exact, floats to 1e-4)."""
    cfg = InferenceConfig()
    geoms = [s[:2] for s in SIZES]
    for seed in range(6):
        rng = np.random.default_rng(100 + seed)
        heats = _low_maps(rng, c=19)
        pafs = _low_maps(rng, c=38)
        heat_avg = _materialise(heats)
        paf_avg = _materialise(pafs)
        hs = ScaleSpace([jnp.asarray(m) for m in heats], geoms, (368, 368))
        ps = ScaleSpace([jnp.asarray(m) for m in pafs], geoms, (368, 368))
        a = jax.device_get(decode_impl(heat_avg, paf_avg, cfg))
        b = jax.device_get(decode_impl(hs, ps, cfg))
        for k in a:
            if np.asarray(a[k]).dtype.kind == "f":
                np.testing.assert_allclose(
                    np.asarray(a[k]), np.asarray(b[k]), atol=1e-4,
                    err_msg=f"seed {seed}: {k}",
                )
            else:
                np.testing.assert_array_equal(
                    np.asarray(a[k]), np.asarray(b[k]),
                    err_msg=f"seed {seed}: {k}",
                )


def test_scalespace_nonsquare_geometry():
    """Non-square input (H != W): per-axis chain matrices and point taps
    must track each axis's own geometry."""
    h, w = 240, 368
    sizes = image_ops.scale_sizes(h, w, (0.5, 1.0, 1.5), 368, 8)
    rng = np.random.default_rng(9)
    maps = []
    for rh, rw, ph, pw in sizes:
        maps.append(rng.normal(size=(ph // 8, pw // 8, 2)).astype(np.float32))
    pts = np.stack([rng.integers(0, h, 97), rng.integers(0, w, 97)])
    iy = jnp.asarray(pts[0], jnp.int32)
    ix = jnp.asarray(pts[1], jnp.int32)
    space = ScaleSpace(
        [jnp.asarray(m) for m in maps], [s[:2] for s in sizes], (h, w)
    )
    avg = None
    for (rh, rw, _, _), m in zip(sizes, maps):
        full = image_ops.upsample_to(jnp.asarray(m)[None], rh, rw, h, w, 8)
        avg = full / 3 if avg is None else avg + full / 3
    want = np.asarray(avg)[pts[0], pts[1]]
    got = np.asarray(sample_avg(space, iy, ix))
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)

    from tpupose.decode.scalespace import pyramid_heat_maps

    a, b = pyramid_heat_maps(space, sigma=3.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(avg), atol=3e-5)


def test_estimator_product_path_runs_scalespace():
    """PoseEstimator._batch_fn with the default (scalespace) readout and
    the fullres readout agree on a synthetic image (random-init weights:
    just structural agreement + no crash)."""
    from tpupose.config import DEFAULT, PoseConfig
    from tpupose.infer import PoseEstimator

    img = (np.random.default_rng(5).random((368, 368, 3)) * 255).astype(np.uint8)
    est = PoseEstimator()
    cfg_full = dataclasses.replace(
        DEFAULT, inference=dataclasses.replace(DEFAULT.inference, paf_readout="fullres")
    )
    est_full = PoseEstimator(cfg=cfg_full, params=est.params)
    a = est.process_batch(img[None], scales=(0.5, 1.0))
    b = est_full.process_batch(img[None], scales=(0.5, 1.0))
    assert len(a) == len(b) == 1
    assert len(a[0]) == len(b[0])
