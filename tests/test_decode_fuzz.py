"""Decode fuzz: random smoothed heatmap/PAF fields across seeds must
produce identical people JSON from the jnp decode and the NumPy twin.

Stress cases the synthetic-scene tests don't cover: dense spurious
peaks, PAF noise creating marginal connections, merge-heavy assemblies.
"""

import numpy as np
import pytest

from tpupose.config import InferenceConfig
from tpupose.decode import decode_maps, to_people
from tpupose.decode.peaks import gaussian_blur
from tpupose.reference_impl import decode_np


def smooth_field(rng, h, w, c, sigma, gain):
    base = rng.normal(size=(h, w, c)).astype(np.float32)
    out = np.concatenate(
        [
            np.asarray(gaussian_blur(base[:, :, i : i + 1], sigma))
            for i in range(c)
        ],
        axis=-1,
    )
    return (out * gain).astype(np.float32)


def canon(people):
    out = []
    for p in people:
        kps = tuple(
            sorted(
                (n, round(v["x"], 3), round(v["y"], 3), round(v["score"], 4))
                for n, v in p["keypoints"].items()
            )
        )
        out.append((kps, p["num_parts"], round(p["score"], 3)))
    return sorted(out)


@pytest.mark.parametrize("seed", list(range(1, 17)))
def test_decode_fuzz_parity(seed):
    rng = np.random.default_rng(seed)
    h = w = 128
    # mixed densities across seeds (round-2 VERDICT item 4): low-sigma
    # high-gain fields are peak-dense and merge-heavy, high-sigma fields
    # sparse and marginal
    heat_sigma = [3.0, 5.0, 8.0][seed % 3]
    heat_gain = [3.0, 4.0, 6.0][seed % 3]
    paf_sigma = [5.0, 8.0, 12.0][(seed // 3) % 3]
    heat = smooth_field(rng, h, w, 19, sigma=heat_sigma, gain=heat_gain)
    paf = smooth_field(rng, h, w, 38, sigma=paf_sigma, gain=3.0)

    cfg = InferenceConfig(max_peaks=96, max_people=96)
    subset, cand = decode_np.decode_np(heat, paf, cfg)
    ref = decode_np.people_json(subset, cand)
    got = to_people(decode_maps(heat, paf, cfg))

    assert canon(got) == canon(ref), f"seed {seed}: {len(got)} vs {len(ref)} people"
