"""Weight plumbing: Keras ``.h5`` / Caffe ``.caffemodel`` / torch
``.pth`` -> flax pytree, and pretrained init.

TPU-native counterpart of the reference's Caffe->Keras conversion scripts
and ``from_vgg`` name map (SURVEY.md C3). The sandbox has no network, so
everything here is load-if-present: parity harnesses stay weight-agnostic
(SURVEY.md section 7 "hard parts").

Keras layer-name contract (upstream lineage):
  vgg:     conv1_1 .. conv4_2
  cpm:     conv4_3_CPM, conv4_4_CPM
  stage 1: conv5_{1..5}_CPM_L{1,2}
  stage t: Mconv{1..7}_stage{t}_L{1,2}   (t = 2..6)

Keras HDF5 kernels are (kh, kw, in, out) — identical to flax linen Conv,
so the conversion is a pure relabelling.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np


def _flax_name_to_keras(scope: str, leaf: str) -> str | None:
    """Map 'stage3_L1'/'conv2' style scopes to Keras layer names."""
    if scope == "vgg" or scope == "cpm":
        return leaf  # conv1_1 .. conv4_2, conv4_3_CPM, conv4_4_CPM
    if scope.startswith("stage1_"):
        branch = scope.split("_")[1]  # L1 | L2
        idx = 5 if leaf == "out" else int(leaf.removeprefix("conv"))
        return f"conv5_{idx}_CPM_{branch}"
    if scope.startswith("stage"):
        stage, branch = scope.removeprefix("stage").split("_")
        idx = 7 if leaf == "out" else int(leaf.removeprefix("conv"))
        return f"Mconv{idx}_stage{stage}_{branch}"
    return None


def _h5_layer_weights(h5file) -> dict[str, dict[str, np.ndarray]]:
    """{layer_name: {kernel, bias}} from a Keras weights file."""
    import h5py  # local import: host-side only

    out: dict[str, dict[str, np.ndarray]] = {}

    def visit(name, obj):
        if isinstance(obj, h5py.Dataset):
            parts = name.split("/")
            leaf = parts[-1]
            layer = parts[-2] if len(parts) >= 2 else parts[0]
            if leaf.startswith("kernel"):
                out.setdefault(layer, {})["kernel"] = np.asarray(obj)
            elif leaf.startswith("bias"):
                out.setdefault(layer, {})["bias"] = np.asarray(obj)

    h5file.visititems(visit)
    return out


def load_keras_h5(path: str, params: Any) -> tuple[Any, list[str]]:
    """Overlay Keras ``.h5`` weights onto a flax param tree.

    Returns (new_params, missing) where ``missing`` lists flax convs for
    which no Keras layer was found. Raises on shape mismatch — that means
    a genuinely different architecture, not a naming drift.
    """
    import h5py

    with h5py.File(path, "r") as f:
        layers = _h5_layer_weights(f)
    return _overlay_layers(layers, params)


def load_caffemodel(path: str, params: Any) -> tuple[Any, list[str]]:
    """Overlay an original Caffe ``.caffemodel`` (the CMU release format)
    onto a flax param tree — the lineage kept the Caffe layer names in
    the Keras port, so both formats share the name map (SURVEY.md C3)."""
    from tpupose.models.caffe import caffemodel_layers

    return _overlay_layers(caffemodel_layers(path), params)


def torch_layers(path: str) -> dict[str, dict[str, np.ndarray]]:
    """{caffe_layer_name: {kernel, bias}} from a PyTorch checkpoint.

    The widely-used torch ports of this model family build their modules
    from OrderedDicts keyed by the ORIGINAL Caffe layer names, so state
    dicts carry keys like ``model0.conv1_1.weight`` /
    ``model2_1.Mconv1_stage2_L1.bias`` — the layer name is the
    second-to-last dotted component and the existing Keras/Caffe name map
    applies unchanged. Torch conv kernels are (out, in, kh, kw); flax
    wants (kh, kw, in, out). Nested ``state_dict``/``model`` wrappers
    are unwrapped; non-conv entries (BN stats etc.) are skipped."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    for key in ("state_dict", "model"):
        if isinstance(sd, dict) and isinstance(sd.get(key), dict):
            sd = sd[key]
    layers: dict[str, dict[str, np.ndarray]] = {}
    for k, v in sd.items():
        parts = k.split(".")
        if len(parts) < 2 or parts[-1] not in ("weight", "bias"):
            continue
        layer, wname = parts[-2], parts[-1]
        arr = np.asarray(v.detach().cpu().numpy())
        if wname == "weight":
            if arr.ndim != 4:
                continue
            layers.setdefault(layer, {})["kernel"] = arr.transpose(2, 3, 1, 0)
        else:
            if arr.ndim != 1:
                continue
            layers.setdefault(layer, {})["bias"] = arr
    return layers


def load_torch(path: str, params: Any) -> tuple[Any, list[str]]:
    """Overlay a PyTorch-port checkpoint (``.pth``/``.pt``) onto a flax
    param tree (see ``torch_layers`` for the naming contract)."""
    return _overlay_layers(torch_layers(path), params)


def save_keras_h5(path: str, params: Any) -> list[str]:
    """Export a flax param tree to a reference-format Keras weights file.

    The reverse of :func:`load_keras_h5` — after training/fine-tuning in
    this framework, the checkpoint can round-trip back into the
    reference ecosystem (Keras ``model.load_weights(path, by_name=True)``
    or any of the torch/caffe ports that consume the converted ``.h5``).
    Layout matches Keras topological weight files: one group per layer
    name holding ``<layer>/kernel:0`` / ``<layer>/bias:0`` datasets, with
    the ``layer_names`` / ``weight_names`` attrs Keras' by-name loader
    walks. Returns the list of exported Keras layer names.
    """
    import h5py
    import jax

    layers: dict[str, dict[str, np.ndarray]] = {}
    for path_keys, value in jax.tree_util.tree_flatten_with_path(params)[0]:
        keys = [getattr(k, "key", str(k)) for k in path_keys]
        if len(keys) < 3 or keys[-1] not in ("kernel", "bias"):
            continue
        keras_name = _flax_name_to_keras(keys[-3], keys[-2])
        if keras_name is None:
            continue
        layers.setdefault(keras_name, {})[keys[-1]] = np.asarray(
            value, dtype=np.float32
        )

    names = sorted(layers)
    with h5py.File(path, "w") as f:
        f.attrs["layer_names"] = np.asarray(
            [n.encode() for n in names], dtype="S64"
        )
        f.attrs["backend"] = b"tensorflow"
        for name in names:
            grp = f.create_group(name)
            weight_names = []
            for wname in ("kernel", "bias"):
                if wname in layers[name]:
                    ds = f"{name}/{wname}:0"
                    grp.create_dataset(ds, data=layers[name][wname])
                    weight_names.append(ds.encode())
            grp.attrs["weight_names"] = np.asarray(weight_names, dtype="S96")
    return names


def load_reference_weights(path: str, params: Any) -> tuple[Any, list[str]]:
    """Format-dispatching loader: ``.caffemodel``, torch ``.pth``/``.pt``,
    or Keras ``.h5``."""
    if path.endswith(".caffemodel"):
        return load_caffemodel(path, params)
    if path.endswith((".pth", ".pt")):
        return load_torch(path, params)
    return load_keras_h5(path, params)


def _overlay_layers(
    layers: dict[str, dict[str, np.ndarray]], params: Any
) -> tuple[Any, list[str]]:
    import jax

    missing: list[str] = []
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    updates: dict[tuple, np.ndarray] = {}
    for path_keys, value in flat:
        keys = [getattr(k, "key", str(k)) for k in path_keys]
        # keys like ['vgg', 'conv1_1', 'kernel']
        if len(keys) < 3:
            continue
        scope, leaf, wname = keys[-3], keys[-2], keys[-1]
        keras_name = _flax_name_to_keras(scope, leaf)
        if keras_name is None or keras_name not in layers:
            missing.append("/".join(keys))
            continue
        src = layers[keras_name].get("kernel" if wname == "kernel" else "bias")
        if src is None:
            missing.append("/".join(keys))
            continue
        if src.shape != value.shape:
            raise ValueError(
                f"shape mismatch for {keras_name}: h5 {src.shape} vs flax {value.shape}"
            )
        updates[tuple(keys)] = src.astype(np.float32)

    def rebuild(path_keys, value):
        keys = tuple(getattr(k, "key", str(k)) for k in path_keys)
        return updates.get(keys, value)

    new_params = jax.tree_util.tree_map_with_path(rebuild, params)
    return new_params, missing


def maybe_load_pretrained(params: Any, path: str | None) -> tuple[Any, bool]:
    """Load reference weights (.h5, .caffemodel, or torch .pth/.pt)
    if a file exists;
    otherwise return params as-is."""
    if path and os.path.exists(path):
        new_params, missing = load_reference_weights(path, params)
        if missing:
            raise ValueError(f"pretrained file {path} missing layers: {missing[:5]}...")
        return new_params, True
    return params, False


# --- VGG19 ImageNet initialisation (fine-tune from scratch path) -------------

_VGG19_TORCH_ORDER = (
    "conv1_1", "conv1_2", "conv2_1", "conv2_2",
    "conv3_1", "conv3_2", "conv3_3", "conv3_4",
    "conv4_1", "conv4_2",
)


def load_vgg19_imagenet_npz(path: str, params: Any) -> tuple[Any, bool]:
    """Overlay VGG19 ImageNet conv weights from an ``.npz`` onto the
    ``vgg`` scope — the reference's ``from_vgg`` name-map equivalent.

    The npz is expected to hold ``{name}_kernel``/(kh,kw,in,out) and
    ``{name}_bias`` arrays for each name in the VGG block. Load-if-present.
    """
    if not path or not os.path.exists(path):
        return params, False
    import jax

    data = np.load(path)
    matched = 0

    def rebuild(path_keys, value):
        nonlocal matched
        keys = [getattr(k, "key", str(k)) for k in path_keys]
        if len(keys) >= 3 and keys[-3] == "vgg" and keys[-2] in _VGG19_TORCH_ORDER:
            key = f"{keys[-2]}_{keys[-1]}"
            if key in data and data[key].shape == value.shape:
                matched += 1
                return np.asarray(data[key], dtype=np.float32)
        return value

    out = jax.tree_util.tree_map_with_path(rebuild, params)
    if matched == 0:
        # a wrongly-keyed / transposed npz would otherwise silently no-op
        # and training would proceed from random init (ADVICE r3)
        import warnings

        warnings.warn(
            f"VGG19 npz {path}: 0 of {len(data.files)} arrays matched any "
            "vgg conv name+shape — overlay had no effect (expected keys "
            "like 'conv1_1_kernel' with (kh,kw,in,out) layout)",
            stacklevel=2,
        )
        return params, False
    print(f"VGG19 npz overlay: {matched} arrays applied from {path}")
    return out, True
