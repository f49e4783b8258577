"""Fused Pallas block-1 kernel (ops/pallas_block1.py): parity with the
XLA conv path it replaces, and the model-integration contract (same
param tree, same outputs, geometry fallback).

Reference contract: SURVEY C2 (vgg_block conv1_1/conv1_2/pool1) — the
kernel must be numerically interchangeable with the nn.Conv path; the
chip speedup is measured in experiments/block1_pallas_r5.py.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpupose.ops.pallas_block1 import block1_reference, fused_block1


def _rand(shape, scale, seed):
    return (np.random.default_rng(seed).normal(0, scale, shape)
            .astype(np.float32))


def _weights(seed=0):
    return (_rand((3, 3, 3, 64), 0.2, seed),
            _rand((64,), 0.1, seed + 1),
            _rand((3, 3, 64, 64), 0.05, seed + 2),
            _rand((64,), 0.1, seed + 3))


@pytest.mark.parametrize("shape", [(1, 16, 16), (2, 24, 40), (1, 32, 368)])
def test_kernel_matches_xla_block1(shape):
    """Kernel output is as close to the f32 truth as the bf16 XLA path
    (both are 1-2 bf16 ulps off; exact equality is not defined between
    two different bf16 summation orders)."""
    n, h, w = shape
    x = _rand((n, h, w, 3), 0.3, 9)
    k1, b1, k2, b2 = _weights()
    truth = np.asarray(
        block1_reference(x, k1, b1, k2, b2, dtype=jnp.float32), np.float32)
    ref = np.asarray(block1_reference(x, k1, b1, k2, b2), np.float32)
    got = np.asarray(
        fused_block1(x, k1, b1, k2, b2, interpret=True), np.float32)
    assert got.shape == ref.shape == (n, h // 2, w // 2, 64)
    d_ref = np.abs(ref - truth).max()
    d_got = np.abs(got - truth).max()
    assert d_got <= d_ref * 2 + 1e-3, (d_got, d_ref)


def test_model_integration_same_tree_and_outputs():
    """OpenPose(pallas_block1=True) has the identical parameter tree and
    (within bf16 noise) the same heat/paf outputs as the XLA model, so
    trained checkpoints serve through the kernel unchanged."""
    from tpupose.models import OpenPose

    plain = OpenPose(num_stages=1, dtype=jnp.bfloat16)
    fused = OpenPose(num_stages=1, dtype=jnp.bfloat16, pallas_block1=True)
    x = jnp.asarray(_rand((1, 64, 64, 3), 0.3, 3))
    params = plain.init(jax.random.PRNGKey(0), x)["params"]
    pf = fused.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree_util.tree_structure(params) == (
        jax.tree_util.tree_structure(pf))
    assert all(
        a.shape == b.shape
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(pf))
    )

    out_p = plain.apply({"params": params}, x)
    out_f = fused.apply({"params": params}, x)
    for (paf_p, heat_p), (paf_f, heat_f) in zip(out_p, out_f):
        # one bf16 rounding difference at block-1 propagates through
        # the stack; bound it loosely but meaningfully
        np.testing.assert_allclose(
            np.asarray(paf_f, np.float32), np.asarray(paf_p, np.float32),
            atol=0.05, rtol=0.1)
        np.testing.assert_allclose(
            np.asarray(heat_f, np.float32), np.asarray(heat_p, np.float32),
            atol=0.05, rtol=0.1)


def test_geometry_and_dtype_fallback():
    """Odd geometry or f32 compute falls back to the exact XLA path —
    bitwise equal to the plain model."""
    from tpupose.models import OpenPose

    x_odd = jnp.asarray(_rand((1, 62, 65, 3), 0.3, 4))   # h % 8 != 0
    plain = OpenPose(num_stages=1, dtype=jnp.bfloat16)
    fused = OpenPose(num_stages=1, dtype=jnp.bfloat16, pallas_block1=True)
    params = plain.init(jax.random.PRNGKey(0), x_odd)["params"]
    for (a, b), (c, d) in zip(plain.apply({"params": params}, x_odd),
                              fused.apply({"params": params}, x_odd)):
        assert np.array_equal(np.asarray(a), np.asarray(c))
        assert np.array_equal(np.asarray(b), np.asarray(d))

    x = jnp.asarray(_rand((1, 64, 64, 3), 0.3, 5))
    plain32 = OpenPose(num_stages=1, dtype=jnp.float32)
    fused32 = OpenPose(num_stages=1, dtype=jnp.float32, pallas_block1=True)
    params = plain32.init(jax.random.PRNGKey(0), x)["params"]
    for (a, b), (c, d) in zip(plain32.apply({"params": params}, x),
                              fused32.apply({"params": params}, x)):
        assert np.array_equal(np.asarray(a), np.asarray(c))
        assert np.array_equal(np.asarray(b), np.asarray(d))
