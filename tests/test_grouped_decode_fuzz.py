"""Grouped-decode guarantees under fuzz and under the DP-sharded path.

``InferenceConfig.decode_groups`` density-sorts the batch on-device and
gives each contiguous group its own adaptive tier cond-chain
(decode/api.py::_grouped_post_peaks). Two properties must hold beyond
the constructed cases in test_decode_two_tier.py:

* fuzz: on random smoothed fields at mixed densities, every group count
  is bitwise-identical to the single-group program AND matches the
  per-image NumPy twin (the permute/unpermute must be exact, the sliced
  ScaleSpace pytrees consistent, tier selection value-preserving);
* DP: with the batch sharded over the mesh the argsort/take pair becomes
  a cross-device permutation — results must still match the unsharded
  estimator, including mesh-divisibility padding rows.
"""

import dataclasses as dc
import os

import numpy as np
import pytest

import jax

from tpupose.config import InferenceConfig, with_scales
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
    return sorted(
        (
            tuple(sorted(
                (n, round(v["x"], 3), round(v["y"], 3), round(v["score"], 4))
                for n, v in p["keypoints"].items()
            )),
            p["num_parts"],
            round(p["score"], 3),
        )
        for p in people
    )


def mixed_batch(seed0, n=8, h=96, w=96):
    """n fuzz fields cycling sparse/mid/dense densities."""
    heats, pafs = [], []
    for i in range(n):
        sigma, gain = [(12.0, 3.0), (8.0, 4.0), (3.0, 6.0)][i % 3]
        heats.append(smooth_field(seed0 + i, h, w, 19, sigma, gain))
        pafs.append(smooth_field(seed0 + 100 + i, h, w, 38, sigma, 3.0))
    return np.stack(heats), np.stack(pafs)


@pytest.mark.parametrize("seed0", [20, 40, 60])
@pytest.mark.parametrize("groups", [2, 3, 8])
def test_grouped_fuzz_bitwise_and_twin(seed0, groups):
    heats, pafs = mixed_batch(seed0)
    run = decode_maps_batch  # module-level jit: one compile per program per process
    base = jax.device_get(run(heats, pafs, InferenceConfig()))
    # both the always-grouped program and the adaptive one (runtime cond
    # between ungrouped/grouped on tier uniformity) must be bitwise
    # identical to the single-group program
    for adaptive in (False, True):
        cfg = InferenceConfig(
            decode_groups=groups, decode_group_adaptive=adaptive
        )
        got = jax.device_get(run(heats, pafs, cfg))
        for k in base:
            np.testing.assert_array_equal(
                np.asarray(got[k]), np.asarray(base[k]),
                err_msg=f"seed0={seed0} groups={groups} "
                        f"adaptive={adaptive} key={k}",
            )
    # and the grouped batch must agree with per-image decode (the fuzz
    # oracle path already pins per-image == NumPy twin in
    # test_decode_fuzz.py; here we pin grouped-batch == per-image)
    for i in range(heats.shape[0]):
        single = to_people(
            jax.device_get(decode_maps(heats[i], pafs[i], InferenceConfig()))
        )
        batched = to_people(
            {k: np.asarray(v)[i] for k, v in got.items()}
        )
        assert canon(batched) == canon(single), f"image {i}"


def test_grouped_adaptive_uniform_batch():
    """A density-uniform batch drives the adaptive cond onto the
    ungrouped branch; results must still equal both the single-group
    program and the forced-grouped program."""
    heats, pafs = [], []
    for i in range(4):
        heats.append(smooth_field(70 + i, 96, 96, 19, 8.0, 4.0))
        pafs.append(smooth_field(170 + i, 96, 96, 38, 8.0, 3.0))
    heats, pafs = np.stack(heats), np.stack(pafs)
    run = decode_maps_batch  # module-level jit: one compile per program per process
    base = jax.device_get(run(heats, pafs, InferenceConfig()))
    for adaptive in (True, False):
        cfg = InferenceConfig(decode_groups=4, decode_group_adaptive=adaptive)
        got = jax.device_get(run(heats, pafs, cfg))
        for k in base:
            np.testing.assert_array_equal(
                np.asarray(got[k]), np.asarray(base[k]),
                err_msg=f"adaptive={adaptive} key={k}",
            )


def _dp_sharding_check():
    """decode_groups > 1 with the batch sharded over the mesh: the
    density argsort/unpermute crosses shard boundaries; results must
    equal the unsharded grouped estimator. Batch 6 on 4 devices also
    exercises the padding rows (blank images sort to the sparse end)."""
    from tpupose.infer import PoseEstimator
    from tpupose.parallel.inference import dp_process_batch
    from tpupose.parallel.sharding import make_mesh

    base_cfg = with_scales((1.0,))
    grp_cfg = dc.replace(
        base_cfg, inference=dc.replace(base_cfg.inference, decode_groups=4)
    )
    rng = np.random.default_rng(9)
    images = (rng.random((6, 64, 64, 3)) * 255).astype(np.uint8)
    params = PoseEstimator(cfg=base_cfg).params
    est_plain = PoseEstimator(cfg=base_cfg, params=params)
    est_grp = PoseEstimator(cfg=grp_cfg, params=params)
    want = est_plain.process_batch(images)
    got_local = est_grp.process_batch(images)
    got_dp = dp_process_batch(est_grp, images, make_mesh(4))
    assert [canon(p) for p in got_local] == [canon(p) for p in want]
    assert [canon(p) for p in got_dp] == [canon(p) for p in want]
    print("DP_SHARDING_OK")


def test_grouped_decode_under_dp_sharding():
    """Runs ``_dp_sharding_check`` in a FRESH subprocess: after ~90
    suite tests' accumulated compiles, this program's compile aborts /
    segfaults inside XLA's CPU backend_compile_and_load (reproduced 3x
    on an idle machine, with and without persistent-cache writes); the
    identical check passes every time in a fresh process, so the
    quarantine preserves full coverage while stepping around the
    upstream crash. The TPU path is unaffected."""
    import subprocess
    import sys

    code = (
        "from tests.test_grouped_decode_fuzz import _dp_sharding_check; "
        "_dp_sharding_check()"
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        env=env, cwd=repo, timeout=3000,
    )
    assert r.returncode == 0, f"worker failed:\n{r.stdout}\n{r.stderr[-3000:]}"
    assert "DP_SHARDING_OK" in r.stdout
