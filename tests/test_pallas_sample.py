"""Parity tests for the fused crowd-tier point readout
(ops/pallas_sample.py) — kernel vs ``scalespace.sample_avg`` (the
chunked path's oracle), run in Pallas interpret mode on CPU.

Reference contract: SURVEY.md C7 (PAF line-integral sampling); the
round-3 dense-decode table prices the HBM path this kernel replaces.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tpupose.decode.scalespace import ScaleSpace, sample_avg  # noqa: E402
from tpupose.ops import pallas_sample  # noqa: E402
from tpupose.ops.pallas_sample import fused_sample_avg  # noqa: E402

# the product 4-scale geometry at boxsize 368 on a 368x368 image:
# (Hl, Wl, rh, rw) per scale (padded net grid + pre-pad resize size)
SPECS_4 = [(23, 23, 181, 181), (46, 46, 368, 368),
           (69, 69, 552, 552), (92, 92, 736, 736)]


def _space(rng, specs=SPECS_4, out_hw=(368, 368), nch=2, batch_dims=()):
    maps = [
        jnp.asarray(
            rng.normal(0, 0.3, (*batch_dims, hl, wl, nch)).astype(np.float32))
        for hl, wl, _, _ in specs
    ]
    return ScaleSpace(maps, [(rh, rw) for _, _, rh, rw in specs], out_hw)


def test_matches_sample_avg():
    rng = np.random.default_rng(0)
    sp = _space(rng)
    p = 5000
    iy = jnp.asarray(rng.integers(0, 368, (p,)), jnp.int32)
    ix = jnp.asarray(rng.integers(0, 368, (p,)), jnp.int32)
    # pin the exact image corners (clip/edge-tap semantics)
    iy = iy.at[:4].set(jnp.array([0, 367, 0, 367]))
    ix = ix.at[:4].set(jnp.array([0, 0, 367, 367]))
    ref = sample_avg(sp, iy, ix)
    got = fused_sample_avg(sp, iy, ix, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_block_padding_boundary():
    """Point counts straddling the _PBLK chunking (pad lanes discarded)."""
    rng = np.random.default_rng(1)
    sp = _space(rng, specs=SPECS_4[:2])
    for p in (1, pallas_sample._PBLK, pallas_sample._PBLK + 1):
        iy = jnp.asarray(rng.integers(0, 368, (p,)), jnp.int32)
        ix = jnp.asarray(rng.integers(0, 368, (p,)), jnp.int32)
        ref = sample_avg(sp, iy, ix)
        got = fused_sample_avg(sp, iy, ix, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5)


def test_shaped_points_and_vmap():
    """(K, K, M)-shaped points under the decode's limb+batch vmaps."""
    rng = np.random.default_rng(2)
    n, limbs, k, m = 2, 3, 12, 10
    sp = _space(rng, specs=SPECS_4[:2], batch_dims=(n, limbs))
    iy = jnp.asarray(rng.integers(0, 368, (n, limbs, k, k, m)), jnp.int32)
    ix = jnp.asarray(rng.integers(0, 368, (n, limbs, k, k, m)), jnp.int32)

    def one(maps, y, x):
        s = ScaleSpace(maps, sp.geoms, sp.out_hw)
        return sample_avg(s, y, x), fused_sample_avg(s, y, x, interpret=True)

    ref, got = jax.vmap(jax.vmap(one))(list(sp.maps), iy, ix)
    assert got.shape == (n, limbs, k, k, m, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_decode_crowd_tier_people_parity(monkeypatch):
    """End-to-end: the K=96 crowd tier with the fused kernel decodes the
    same people as the chunked readout on a synthetic crowd."""
    from tpupose import ops as _ops
    from tpupose.decode import paf as paf_mod

    rng = np.random.default_rng(3)
    sp = _space(rng, specs=SPECS_4[:2])
    k = 96
    mid_num = 10
    ax = jnp.asarray(rng.uniform(0, 367, (k,)).astype(np.float32))
    ay = jnp.asarray(rng.uniform(0, 367, (k,)).astype(np.float32))
    bx = jnp.asarray(rng.uniform(0, 367, (k,)).astype(np.float32))
    by = jnp.asarray(rng.uniform(0, 367, (k,)).astype(np.float32))
    sc = jnp.asarray(rng.uniform(0.2, 1.0, (k,)).astype(np.float32))
    valid = jnp.asarray(rng.random(k) < 0.9)

    def run():
        prior, ok, _ = paf_mod._limb_pair_scores(
            sp, ax, ay, sc, valid, bx, by, sc, valid,
            mid_num, 0.05, 0.8, 368.0)
        return np.asarray(prior), np.asarray(ok)

    monkeypatch.setattr(_ops, "use_pallas_sample", lambda: False)
    prior_ref, ok_ref = run()
    monkeypatch.setattr(_ops, "use_pallas_sample", lambda: True)
    monkeypatch.setattr(pallas_sample, "_INTERPRET", True)
    prior_ker, ok_ker = run()

    assert (k * k * mid_num) > 16384  # really exercised the crowd tier
    np.testing.assert_allclose(prior_ker, prior_ref, atol=1e-5)
    # ok can flip only where the prior sits exactly on a threshold
    disagree = ok_ker != ok_ref
    assert int(disagree.sum()) == 0
