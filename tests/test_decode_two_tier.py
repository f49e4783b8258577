"""Adaptive two-tier decode: the reduced-capacity fast path must be
bitwise-identical to the full path whenever it is selected, and the
batched program (one tier choice per batch) must match per-image decode.
"""

import dataclasses

import numpy as np

import jax

from tpupose.config import InferenceConfig
from tpupose.decode import decode_maps, to_people
from tpupose.decode.api import decode_maps_batch
from tpupose.decode.peaks import gaussian_blur


def smooth_field(seed, h, w, c, sigma, gain):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(h, w, c)).astype(np.float32)
    out = np.concatenate(
        [np.asarray(gaussian_blur(base[:, :, i:i + 1], sigma)) for i in range(c)],
        axis=-1,
    )
    return (out * gain).astype(np.float32)


def canon(people):
    return [
        (sorted((n, v["x"], v["y"]) for n, v in p["keypoints"].items()),
         p["num_parts"], round(p["score"], 4))
        for p in people
    ]


def test_small_tier_identical_to_disabled():
    """Sparse field (<= 32 peaks/part): small tier == full-capacity path."""
    heat = smooth_field(3, 96, 96, 19, sigma=8.0, gain=4.0)
    paf = smooth_field(4, 96, 96, 38, sigma=8.0, gain=3.0)
    on = InferenceConfig(pair_tiers=(32,))
    off = dataclasses.replace(on, pair_tiers=())
    a = jax.device_get(decode_maps(heat, paf, on))
    b = jax.device_get(decode_maps(heat, paf, off))
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), err_msg=k)


def test_micro_tier_identical_across_tier_sets():
    """Very sparse field: (8, 32) tiers == (32,) == disabled, bitwise."""
    heat = smooth_field(7, 96, 96, 19, sigma=12.0, gain=3.0)
    paf = smooth_field(8, 96, 96, 38, sigma=8.0, gain=3.0)
    results = []
    for tiers in ((8, 32), (32,), ()):
        cfg = InferenceConfig(pair_tiers=tiers)
        results.append(jax.device_get(decode_maps(heat, paf, cfg)))
    for other in results[1:]:
        for k in results[0]:
            np.testing.assert_array_equal(
                np.asarray(results[0][k]), np.asarray(other[k]), err_msg=k
            )


def test_grouped_decode_bitwise_identical():
    """decode_groups > 1 (density-sorted sub-batch tiers) must be
    bitwise-identical to the single-group program on a mixed batch,
    including uneven group sizes (batch 5, groups 2/4)."""
    heats, pafs = [], []
    for seed, sigma, gain in (
        (1, 8.0, 4.0), (2, 3.0, 6.0), (11, 12.0, 3.0),
        (12, 3.0, 6.0), (13, 8.0, 4.0),
    ):
        heats.append(smooth_field(seed, 96, 96, 19, sigma, gain))
        pafs.append(smooth_field(seed + 50, 96, 96, 38, sigma, 3.0))
    heats = np.stack(heats)
    pafs = np.stack(pafs)
    run = decode_maps_batch  # module-level jit: one compile per program per process
    base = jax.device_get(run(heats, pafs, InferenceConfig()))
    for groups in (2, 4):
        cfg = InferenceConfig(decode_groups=groups)
        got = jax.device_get(run(heats, pafs, cfg))
        for k in base:
            np.testing.assert_array_equal(
                np.asarray(got[k]), np.asarray(base[k]),
                err_msg=f"groups={groups} key={k}",
            )


def test_grouped_decode_scalespace_e2e():
    """The grouped path slices ScaleSpace pafs through the pytree; the
    full product path (PoseEstimator.process_batch) must be unchanged."""
    import dataclasses as dc

    from tpupose.config import with_scales
    from tpupose.infer import PoseEstimator

    base_cfg = with_scales((1.0,))
    grp_cfg = dc.replace(
        base_cfg,
        inference=dc.replace(base_cfg.inference, decode_groups=2),
    )
    rng = np.random.default_rng(5)
    images = (rng.random((4, 64, 64, 3)) * 255).astype(np.uint8)
    params = PoseEstimator(cfg=base_cfg).params
    est_a = PoseEstimator(cfg=base_cfg, params=params)
    est_b = PoseEstimator(cfg=grp_cfg, params=params)
    want = est_a.process_batch(images)
    got = est_b.process_batch(images)
    assert [canon(p) for p in got] == [canon(p) for p in want]


def test_batched_decode_matches_per_image():
    """Mixed-density batch: the batch-global tier choice must not change
    results vs per-image decode (dense image forces the big tier)."""
    cfg = InferenceConfig()
    heats, pafs = [], []
    for seed, sigma, gain in ((1, 8.0, 4.0), (2, 3.0, 6.0)):  # sparse + dense
        heats.append(smooth_field(seed, 96, 96, 19, sigma, gain))
        pafs.append(smooth_field(seed + 50, 96, 96, 38, sigma, 3.0))
    heats = np.stack(heats)
    pafs = np.stack(pafs)
    batched = jax.device_get(
        decode_maps_batch(heats, pafs, cfg)
    )
    for i in range(2):
        single = jax.device_get(decode_maps(heats[i], pafs[i], cfg))
        got = to_people({k: np.asarray(v)[i] for k, v in batched.items()})
        want = to_people(single)
        assert canon(got) == canon(want), f"image {i}"
