"""Pin the Keras->flax layer-name map against the upstream naming
(round-1 VERDICT missing #6).

The layer table below is written out BY HAND from the upstream
lineage's model.py naming scheme (SURVEY.md C2/C3) — it must never be
generated from tpupose's own mapping code, or the test would be
circular. The test builds a full Keras-layout ``.h5`` with a unique
constant per layer, overlays it, and checks every flax conv received
its intended source (all four mapping branches: vgg, cpm, stage-1
conv5_*_CPM_{L1,L2}, refinement Mconv*_stage{t}_{L1,L2}).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

# --- the upstream Keras layer table, hand-written (name -> kernel shape) ------
VGG = {
    "conv1_1": (3, 3, 3, 64), "conv1_2": (3, 3, 64, 64),
    "conv2_1": (3, 3, 64, 128), "conv2_2": (3, 3, 128, 128),
    "conv3_1": (3, 3, 128, 256), "conv3_2": (3, 3, 256, 256),
    "conv3_3": (3, 3, 256, 256), "conv3_4": (3, 3, 256, 256),
    "conv4_1": (3, 3, 256, 512), "conv4_2": (3, 3, 512, 512),
}
CPM = {"conv4_3_CPM": (3, 3, 512, 256), "conv4_4_CPM": (3, 3, 256, 128)}


def upstream_layers() -> dict[str, tuple]:
    layers = dict(VGG)
    layers.update(CPM)
    for branch, out_c in (("L1", 38), ("L2", 19)):
        for i in (1, 2, 3):
            layers[f"conv5_{i}_CPM_{branch}"] = (3, 3, 128, 128)
        layers[f"conv5_4_CPM_{branch}"] = (1, 1, 128, 512)
        layers[f"conv5_5_CPM_{branch}"] = (1, 1, 512, out_c)
    for t in range(2, 7):
        for branch, out_c in (("L1", 38), ("L2", 19)):
            layers[f"Mconv1_stage{t}_{branch}"] = (7, 7, 185, 128)
            for i in (2, 3, 4, 5):
                layers[f"Mconv{i}_stage{t}_{branch}"] = (7, 7, 128, 128)
            layers[f"Mconv6_stage{t}_{branch}"] = (1, 1, 128, 128)
            layers[f"Mconv7_stage{t}_{branch}"] = (1, 1, 128, out_c)
    return layers


def layer_const(name: str) -> float:
    """Unique, process-stable fingerprint value per layer."""
    import zlib

    return (zlib.crc32(name.encode()) % 100003) / 1000.0


@pytest.fixture(scope="module")
def keras_h5(tmp_path_factory):
    import h5py

    path = str(tmp_path_factory.mktemp("keras") / "reference_weights.h5")
    with h5py.File(path, "w") as f:
        mw = f.create_group("model_weights")
        for name, kshape in upstream_layers().items():
            g = mw.create_group(name).create_group(name)
            g.create_dataset(
                "kernel:0", data=np.full(kshape, layer_const(name), np.float32)
            )
            g.create_dataset(
                "bias:0",
                data=np.full((kshape[-1],), layer_const(name) + 0.5, np.float32),
            )
    return path


def test_every_flax_param_finds_its_upstream_layer(keras_h5):
    from tpupose.models import OpenPose, weights as weights_lib

    model = OpenPose(num_stages=6, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    loaded, missing = weights_lib.load_keras_h5(keras_h5, params)
    assert missing == []

    # positional pins, one per mapping branch
    pins = {
        ("vgg", "conv1_1"): "conv1_1",
        ("vgg", "conv4_2"): "conv4_2",
        ("cpm", "conv4_3_CPM"): "conv4_3_CPM",
        ("cpm", "conv4_4_CPM"): "conv4_4_CPM",
        ("stage1_L1", "conv2"): "conv5_2_CPM_L1",
        ("stage1_L2", "conv4"): "conv5_4_CPM_L2",
        ("stage1_L1", "out"): "conv5_5_CPM_L1",
        ("stage3_L2", "conv1"): "Mconv1_stage3_L2",
        ("stage6_L1", "conv5"): "Mconv5_stage6_L1",
        ("stage2_L2", "conv6"): "Mconv6_stage2_L2",
        ("stage6_L2", "out"): "Mconv7_stage6_L2",
    }
    for (scope, leaf), expected_layer in pins.items():
        k = np.asarray(loaded[scope][leaf]["kernel"])
        b = np.asarray(loaded[scope][leaf]["bias"])
        want = layer_const(expected_layer)
        assert np.allclose(k, want), f"{scope}/{leaf} kernel != {expected_layer}"
        assert np.allclose(b, want + 0.5), f"{scope}/{leaf} bias != {expected_layer}"

    # every upstream layer is used exactly once (no crossed/dropped names)
    got = sorted(
        round(float(np.asarray(loaded[s][l]["kernel"]).ravel()[0]), 3)
        for s in loaded for l in loaded[s]
    )
    want = sorted(round(layer_const(n), 3) for n in upstream_layers())
    assert got == want


def test_torch_state_dict_matches_keras(keras_h5, tmp_path):
    """The torch-port loader must land every layer exactly where the
    Keras loader does: a state dict built with the torch ports' module
    naming (``model0.conv1_1.weight`` etc., kernels in torch's
    (out, in, kh, kw) order) overlays to the identical param tree."""
    import torch

    from tpupose.models import OpenPose, weights as weights_lib

    sd = {}
    for name, kshape in upstream_layers().items():
        # torch ports group layers into submodules; the prefix is
        # irrelevant to the loader (second-to-last component wins)
        prefix = "model0" if name in VGG or name in CPM else "model1_1"
        k = np.full(kshape, layer_const(name), np.float32)
        sd[f"{prefix}.{name}.weight"] = torch.from_numpy(
            k.transpose(3, 2, 0, 1).copy()
        )
        sd[f"{prefix}.{name}.bias"] = torch.from_numpy(
            np.full((kshape[-1],), layer_const(name) + 0.5, np.float32)
        )
    sd["model0.bn_stats.running_mean"] = torch.zeros(4)  # must be skipped
    path = str(tmp_path / "body_pose_model.pth")
    torch.save(sd, path)

    model = OpenPose(num_stages=6, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    via_torch, missing_t = weights_lib.load_reference_weights(path, params)
    assert missing_t == []
    via_keras, missing_k = weights_lib.load_keras_h5(keras_h5, params)
    assert missing_k == []
    flat_t = jax.tree_util.tree_leaves(via_torch)
    flat_k = jax.tree_util.tree_leaves(via_keras)
    for a, b in zip(flat_t, flat_k):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # nested {'state_dict': ...} wrappers unwrap
    path2 = str(tmp_path / "wrapped.pt")
    torch.save({"state_dict": sd}, path2)
    via_wrapped, missing_w = weights_lib.load_reference_weights(path2, params)
    assert missing_w == []
    np.testing.assert_array_equal(
        np.asarray(via_wrapped["vgg"]["conv1_1"]["kernel"]),
        np.asarray(via_torch["vgg"]["conv1_1"]["kernel"]),
    )


def test_export_weights_h5_roundtrip(tmp_path):
    """save_keras_h5 is the exact inverse of load_keras_h5, and writes
    the layer_names/weight_names attrs Keras' by-name loader walks."""
    import h5py

    from tpupose.models import OpenPose, weights as weights_lib

    model = OpenPose(num_stages=2, dtype=jnp.float32)
    params = jax.device_get(
        model.init(jax.random.PRNGKey(7), jnp.zeros((1, 64, 64, 3)))["params"]
    )
    path = str(tmp_path / "exported.h5")
    names = weights_lib.save_keras_h5(path, params)
    # 10 vgg + 2 cpm + 2x5 stage1 + 2x7 stage2 conv layers
    assert len(names) == 36

    with h5py.File(path, "r") as f:
        assert sorted(n.decode() for n in f.attrs["layer_names"]) == names
        grp = f["conv1_1"]
        assert [w.decode() for w in grp.attrs["weight_names"]] == [
            "conv1_1/kernel:0", "conv1_1/bias:0",
        ]
        assert f["conv1_1/conv1_1/kernel:0"].shape == (3, 3, 3, 64)

    zeros = jax.tree.map(np.zeros_like, params)
    restored, missing = weights_lib.load_keras_h5(path, zeros)
    assert missing == []
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(restored)[0],
    ):
        assert ka == kb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_full_size_random_weight_roundtrip(tmp_path):
    """The converters at REAL scale (round-3 VERDICT next #9): a
    flagship-sized Keras .h5 — every one of the ~52M params random —
    through convert -> Orbax -> export -> reload, bit-identical at each
    hop; the same arrays through the torch .pth path land identically."""
    import h5py
    import torch

    from tpupose.models import OpenPose, weights as weights_lib
    from tpupose.training import checkpoint as ckpt_lib

    rng = np.random.default_rng(42)
    layers = upstream_layers()
    arrays = {
        name: (rng.standard_normal(kshape).astype(np.float32),
               rng.standard_normal(kshape[-1]).astype(np.float32))
        for name, kshape in layers.items()
    }
    n_params = sum(k.size + b.size for k, b in arrays.values())
    assert n_params > 50_000_000   # the real flagship, not a toy

    src = str(tmp_path / "full.h5")
    with h5py.File(src, "w") as f:
        mw = f.create_group("model_weights")
        for name, (k, b) in arrays.items():
            g = mw.create_group(name).create_group(name)
            g.create_dataset("kernel:0", data=k)
            g.create_dataset("bias:0", data=b)

    model = OpenPose(num_stages=6, dtype=jnp.float32)
    params = jax.device_get(
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    )
    loaded, missing = weights_lib.load_keras_h5(src, params)
    assert missing == []
    loaded = jax.device_get(loaded)

    # -> Orbax -> restore
    ckpt = str(tmp_path / "ckpt")
    ckpt_lib.save(ckpt, {"params": loaded, "step": np.zeros((), np.int32)})
    restored = ckpt_lib.restore_params(ckpt)
    for a, b in zip(jax.tree_util.tree_leaves(loaded),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # -> export .h5 -> reload: bit-identical to the ORIGINAL arrays
    out = str(tmp_path / "reexported.h5")
    weights_lib.save_keras_h5(out, restored)
    with h5py.File(out, "r") as f:
        for name, (k, b) in arrays.items():
            np.testing.assert_array_equal(np.asarray(f[name][name]["kernel:0"]), k)
            np.testing.assert_array_equal(np.asarray(f[name][name]["bias:0"]), b)

    # torch .pth with the same arrays lands identically
    sd = {}
    for name, (k, b) in arrays.items():
        prefix = "model0" if name in VGG or name in CPM else "model1_1"
        sd[f"{prefix}.{name}.weight"] = torch.from_numpy(
            k.transpose(3, 2, 0, 1).copy()
        )
        sd[f"{prefix}.{name}.bias"] = torch.from_numpy(b)
    pth = str(tmp_path / "full.pth")
    torch.save(sd, pth)
    via_torch, missing_t = weights_lib.load_reference_weights(pth, params)
    assert missing_t == []
    for a, b in zip(jax.tree_util.tree_leaves(loaded),
                    jax.tree_util.tree_leaves(jax.device_get(via_torch))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_weights_cli(keras_h5, tmp_path):
    """convert-weights -> export-weights round-trips the reference file:
    the re-exported .h5 carries the same per-layer fingerprints."""
    import h5py

    from tpupose import cli

    ckpt = str(tmp_path / "ckpt")
    assert cli.main(["convert-weights", "--weights", keras_h5,
                     "--output", ckpt]) == 0
    out = str(tmp_path / "reexported.h5")
    assert cli.main(["export-weights", "--checkpoint", ckpt,
                     "--output", out]) == 0
    with h5py.File(out, "r") as f:
        for name in ("conv1_1", "conv4_4_CPM", "conv5_5_CPM_L2",
                     "Mconv7_stage6_L1"):
            kern = np.asarray(f[name][name]["kernel:0"])
            assert np.allclose(kern, layer_const(name)), name


def test_convert_weights_cli_to_orbax_and_back(keras_h5, tmp_path):
    """End-to-end: cli convert-weights -> Orbax checkpoint -> restored
    params drive a PoseEstimator forward."""
    from tpupose import cli
    from tpupose.infer import PoseEstimator
    from tpupose.training import checkpoint as ckpt_lib

    out = str(tmp_path / "ckpt")
    rc = cli.main(["convert-weights", "--weights", keras_h5, "--output", out])
    assert rc == 0

    from tpupose.config import DEFAULT
    from tpupose.models import OpenPose

    model = OpenPose(num_stages=6, dtype=jnp.float32)
    template = jax.device_get(
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 368, 368, 3)))["params"]
    )
    restored = ckpt_lib.restore(out, {"params": template, "opt_state": {},
                                      "step": np.zeros((), np.int32)})
    assert restored is not None
    p = restored["params"]
    assert np.allclose(
        np.asarray(p["vgg"]["conv1_1"]["kernel"]), layer_const("conv1_1")
    )
    est = PoseEstimator(params=p)
    result = est.process(np.zeros((64, 64, 3), np.uint8))
    assert "people" in result
