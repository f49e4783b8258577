"""NumPy forward-model twin parity (VERDICT r2 missing #1).

The model layer gets the same oracle coverage as decode/GT: a pure-NumPy
im2col forward (reference_impl/model_np.py) pins conv SAME-pad
placement, 2x2 pool geometry, concat order and the f32-head boundary
against ``model.apply``. A second test threads a synthetic Keras-named
``.h5`` through the converter (models/weights.py) and an Orbax
round-trip into BOTH implementations.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpupose.models import OpenPose
from tpupose.models import weights as weights_lib
from tpupose.reference_impl import model_np


def _init(num_stages=2, dtype=jnp.float32, size=32):
    model = OpenPose(num_stages=num_stages, dtype=dtype)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3))
    )["params"]
    return model, params


def _np_tree(params):
    return jax.tree.map(np.asarray, params)


def test_forward_matches_numpy_twin_f32():
    model, params = _init()
    img = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(1), (32, 32, 3), minval=-0.5,
                           maxval=0.5),
        np.float32,
    )
    got = model.apply({"params": params}, jnp.asarray(img)[None])
    want = model_np.forward_np(_np_tree(params), img)
    assert len(got) == len(want) == 2
    for (gp, gh), (wp, wh) in zip(got, want):
        assert gp.dtype == jnp.float32  # f32 head boundary
        np.testing.assert_allclose(np.asarray(gp)[0], wp, atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(np.asarray(gh)[0], wh, atol=2e-5, rtol=2e-5)


def test_forward_bf16_body_close_to_f32_twin():
    """The production bf16-body model is the same function to bf16
    rounding: pins that the dtype boundary only perturbs, never
    restructures (e.g. no silent layout/padding divergence)."""
    model, params = _init(dtype=jnp.bfloat16)
    img = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(2), (32, 32, 3), minval=-0.5,
                           maxval=0.5),
        np.float32,
    )
    got = model.apply({"params": params}, jnp.asarray(img)[None])
    want = model_np.forward_np(_np_tree(params), img)
    for (gp, gh), (wp, wh) in zip(got, want):
        assert gp.dtype == jnp.float32
        scale = max(1.0, float(np.abs(wp).max()))
        assert np.abs(np.asarray(gp)[0] - wp).max() / scale < 0.05
        scale = max(1.0, float(np.abs(wh).max()))
        assert np.abs(np.asarray(gh)[0] - wh).max() / scale < 0.05


def test_twin_stage_count_autodetect():
    _, params = _init(num_stages=3)
    img = np.zeros((16, 16, 3), np.float32)
    outs = model_np.forward_np(_np_tree(params), img)
    assert len(outs) == 3


def test_keras_h5_roundtrip_through_both_implementations(tmp_path):
    """Synthetic Keras-named .h5 -> converter -> Orbax round-trip ->
    flax forward == NumPy-twin forward on the SAME loaded weights."""
    h5py = pytest.importorskip("h5py")

    model, params = _init()
    rng = np.random.default_rng(7)

    # write an .h5 in the Keras model_weights layout with the upstream
    # layer names, shaped to the 2-stage architecture
    path = tmp_path / "synthetic_keras.h5"
    with h5py.File(path, "w") as f:
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        for path_keys, value in flat:
            keys = [getattr(k, "key", str(k)) for k in path_keys]
            scope, leaf, wname = keys[-3], keys[-2], keys[-1]
            keras = weights_lib._flax_name_to_keras(scope, leaf)
            assert keras is not None, keys
            # fan-in-scaled weights keep activations O(1) through the
            # stages so f32 summation-order noise stays within tolerance
            fan_in = int(np.prod(value.shape[:-1])) if value.ndim > 1 else 1
            data = rng.normal(0, 1.0 / np.sqrt(fan_in), value.shape).astype(
                np.float32
            )
            suffix = "kernel:0" if wname == "kernel" else "bias:0"
            name = f"model_weights/{keras}/{keras}/{suffix}"
            if name not in f:
                f.create_dataset(name, data=data)

    loaded, missing = weights_lib.load_keras_h5(str(path), params)
    assert missing == []
    # weights actually changed (overlay happened)
    assert not np.allclose(
        np.asarray(loaded["vgg"]["conv1_1"]["kernel"]),
        np.asarray(params["vgg"]["conv1_1"]["kernel"]),
    )

    # Orbax round-trip (the convert-weights -> checkpoint path)
    from tpupose.training import checkpoint as ckpt

    tree = {"params": loaded, "opt_state": (), "step": jnp.int32(0)}
    ckpt.save(str(tmp_path / "ckpt"), tree, max_to_keep=1)
    restored = ckpt.restore(str(tmp_path / "ckpt"), tree)
    assert restored is not None

    img = rng.uniform(-0.5, 0.5, (32, 32, 3)).astype(np.float32)
    got = model.apply({"params": restored["params"]}, jnp.asarray(img)[None])
    want = model_np.forward_np(_np_tree(restored["params"]), img)
    for (gp, gh), (wp, wh) in zip(got, want):
        np.testing.assert_allclose(np.asarray(gp)[0], wp, atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(np.asarray(gh)[0], wh, atol=2e-5, rtol=2e-5)
