"""The one-hot MXU PAF sampler must be bit-identical to the gather.

The TPU product path scores line integrals via one-hot matmuls
(tpupose/decode/paf.py::_sample_points_onehot) instead of the serialized
point gather XLA emits for ``paf[iy, ix]`` (4.5x faster on the chip,
round 2). Exactness is the contract: HIGHEST-precision f32, a single
1.0*value product per output — so every downstream greedy decision is
unchanged. This suite pins that bit-parity on randomized peak tables.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tpupose.decode import paf as P


@pytest.mark.parametrize("k", [8, 32, 96])
def test_pair_scores_onehot_bitexact(k, monkeypatch):
    rng = np.random.default_rng(k)
    h = w = 46
    paf = jnp.asarray(rng.normal(size=(h, w, 38)).astype(np.float32))
    peaks = {
        "xs": jnp.asarray(rng.integers(0, w, size=(19, k)).astype(np.int32)),
        "ys": jnp.asarray(rng.integers(0, h, size=(19, k)).astype(np.int32)),
        "scores": jnp.asarray(rng.random(size=(19, k)).astype(np.float32)),
        "valid": jnp.asarray(rng.random(size=(19, k)) > 0.3),
    }
    monkeypatch.setenv("TPUPOSE_PAF_SAMPLER", "onehot")
    got = P.pair_scores(paf, peaks)
    monkeypatch.setenv("TPUPOSE_PAF_SAMPLER", "gather")
    want = P.pair_scores(paf, peaks)
    for g, e, name in zip(got, want, ("prior", "ok", "n_a", "n_b")):
        np.testing.assert_array_equal(
            np.asarray(g), np.asarray(e), err_msg=f"{name} diverged at K={k}"
        )


def test_sample_points_onehot_matches_gather_oob_clip():
    # Points already arrive clipped in pair_scores; the sampler itself
    # must still be exact at the border rows/cols.
    rng = np.random.default_rng(0)
    paf = jnp.asarray(rng.normal(size=(9, 7, 2)).astype(np.float32))
    iy = jnp.asarray(rng.integers(0, 9, size=(5, 4, 3)).astype(np.int32))
    ix = jnp.asarray(rng.integers(0, 7, size=(5, 4, 3)).astype(np.int32))
    got = np.asarray(P._sample_points_onehot(paf, iy, ix))
    want = np.asarray(paf)[np.asarray(iy), np.asarray(ix)]
    np.testing.assert_array_equal(got, want)
