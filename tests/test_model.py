"""Model structure tests: output shapes, stage count, param grouping,
and the Keras h5 round-trip (SURVEY.md section 4b parity strategy —
weight-agnostic: we synthesise an h5 with the upstream layer names and
check the converter maps it onto the flax tree).

Shape/count checks run under jax.eval_shape (no compute) so the full
52M-param model never executes on the test CPU; value-level checks use a
stage-reduced model.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpupose import topology
from tpupose.models import OpenPose, forward_final, param_group
from tpupose.models import weights as W


@pytest.fixture(scope="module")
def abstract_params():
    model = OpenPose(dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
    return model, shapes["params"]


@pytest.fixture(scope="module")
def tiny_model():
    """2-stage model, real params — fast enough for value tests on CPU."""
    model = OpenPose(num_stages=2, dtype=jnp.float32)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    return model, params


def test_output_shapes(abstract_params):
    model, _ = abstract_params
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    outs = jax.eval_shape(
        lambda p, x: model.apply({"params": p}, x), abstract_params[1], x
    )
    assert len(outs) == 6  # 6 stages -> 12 heads
    for paf, heat in outs:
        assert paf.shape == (2, 8, 8, topology.NUM_PAF_CHANNELS)
        assert heat.shape == (2, 8, 8, topology.NUM_HEAT_CHANNELS)
        assert paf.dtype == jnp.float32


def test_forward_final_matches_last_stage(tiny_model):
    model, params = tiny_model
    x = jnp.ones((1, 32, 32, 3), jnp.float32) * 0.1
    outs = model.apply({"params": params}, x)
    assert len(outs) == 2
    paf, heat = forward_final(model, params, x)
    np.testing.assert_array_equal(np.asarray(paf), np.asarray(outs[-1][0]))
    np.testing.assert_array_equal(np.asarray(heat), np.asarray(outs[-1][1]))
    assert np.isfinite(np.asarray(heat)).all()


def test_param_count_and_groups(abstract_params):
    _, params = abstract_params
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    # reference model is ~52 M params (SURVEY.md C2)
    assert 45e6 < n < 60e6, n

    groups = set()
    for path, _ in jax.tree_util.tree_flatten_with_path(params)[0]:
        keys = [getattr(k, "key", str(k)) for k in path]
        groups.add(param_group(keys))
    assert groups == {"vgg", "cpm", "stage1", "stageT"}


def test_stage_dimensions(abstract_params):
    """Stage-T input is concat(38, 19, 128) = 185 channels (SURVEY.md C2)."""
    _, params = abstract_params
    assert params["stage2_L1"]["conv1"]["kernel"].shape == (7, 7, 185, 128)
    assert params["stage1_L1"]["conv1"]["kernel"].shape == (3, 3, 128, 128)
    assert params["stage1_L1"]["conv4"]["kernel"].shape == (1, 1, 128, 512)
    assert params["stage6_L2"]["out"]["kernel"].shape == (1, 1, 128, 19)


def test_keras_h5_roundtrip(tmp_path, tiny_model):
    """Synthesise an h5 with upstream layer names; converter must overlay
    every conv in the flax tree with the right values."""
    h5py = pytest.importorskip("h5py")
    model, params = tiny_model

    rng = np.random.default_rng(1)
    path = str(tmp_path / "ref_weights.h5")
    expected = {}
    with h5py.File(path, "w") as f:
        for pth, value in jax.tree_util.tree_flatten_with_path(params)[0]:
            keys = [getattr(k, "key", str(k)) for k in pth]
            scope, leaf, wname = keys[-3], keys[-2], keys[-1]
            kname = W._flax_name_to_keras(scope, leaf)
            assert kname is not None, keys
            arr = rng.normal(size=value.shape).astype(np.float32)
            f.create_dataset(f"{kname}/{kname}/{wname}:0", data=arr)
            expected[tuple(keys)] = arr

    new_params, missing = W.load_keras_h5(path, params)
    assert missing == []
    for pth, value in jax.tree_util.tree_flatten_with_path(new_params)[0]:
        keys = tuple(getattr(k, "key", str(k)) for k in pth)
        np.testing.assert_array_equal(np.asarray(value), expected[keys])


def test_maybe_load_pretrained_absent(tiny_model):
    _, params = tiny_model
    same, loaded = W.maybe_load_pretrained(params, "/nonexistent/w.h5")
    assert not loaded and same is params


class TestFoldedConv1:
    """fold_conv1 computes IDENTICAL math on an MXU-shaped layout
    (FoldedConv3x3: space-to-depth raises conv1_1's contraction depth
    27 -> 108; measured on-chip in experiments/fold_conv1_r4.py)."""

    def _pair(self, num_stages=1):
        m0 = OpenPose(num_stages=num_stages, dtype=jnp.float32)
        m1 = OpenPose(num_stages=num_stages, dtype=jnp.float32,
                      fold_conv1=True)
        return m0, m1

    def test_param_tree_identical(self):
        m0, m1 = self._pair()
        x = jnp.zeros((1, 32, 32, 3), jnp.float32)
        s0 = jax.eval_shape(m0.init, jax.random.PRNGKey(0), x)["params"]
        s1 = jax.eval_shape(m1.init, jax.random.PRNGKey(0), x)["params"]
        assert jax.tree_util.tree_structure(s0) == jax.tree_util.tree_structure(s1)
        assert all(
            a.shape == b.shape and a.dtype == b.dtype
            for a, b in zip(jax.tree_util.tree_leaves(s0),
                            jax.tree_util.tree_leaves(s1))
        )

    def test_forward_equivalent_same_params(self):
        m0, m1 = self._pair()
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(0, 0.3, (2, 48, 64, 3)).astype(np.float32))
        params = m0.init(jax.random.PRNGKey(0), x)["params"]
        for (p0, h0), (p1, h1) in zip(m0.apply({"params": params}, x),
                                      m1.apply({"params": params}, x)):
            np.testing.assert_allclose(p0, p1, atol=1e-6)
            np.testing.assert_allclose(h0, h1, atol=1e-6)

    def test_gradient_equivalent_same_params(self):
        m0, m1 = self._pair()
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.normal(0, 0.3, (2, 32, 32, 3)).astype(np.float32))
        params = m0.init(jax.random.PRNGKey(0), x)["params"]

        def loss(m, p):
            paf, heat = m.apply({"params": p}, x)[-1]
            return (paf ** 2).mean() + (heat ** 2).mean()

        g0 = jax.grad(lambda p: loss(m0, p))(params)
        g1 = jax.grad(lambda p: loss(m1, p))(params)
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            scale = float(jnp.abs(a).max()) + 1e-30
            np.testing.assert_allclose(a / scale, b / scale, atol=2e-6)

    def test_odd_geometry_falls_back_bit_exact(self):
        m0, m1 = self._pair()
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(0, 0.3, (1, 31, 33, 3)).astype(np.float32))
        params = m0.init(jax.random.PRNGKey(0), x)["params"]
        p0, h0 = m0.apply({"params": params}, x)[-1]
        p1, h1 = m1.apply({"params": params}, x)[-1]
        np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
        np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))
