"""Caffe .caffemodel ingest (SURVEY.md C3 "Caffe source format").

Builds a synthetic caffemodel with a hand-rolled protobuf ENCODER
(independent of the parser under test), using the hand-written upstream
layer table from test_weight_map_pinning, in both the modern
(layer=100) and legacy (layers=2) message layouts.
"""

import struct

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_weight_map_pinning import layer_const, upstream_layers


# --- tiny protobuf encoder (test-side twin of the wire format) ----------------
def _varint(x: int) -> bytes:
    out = bytearray()
    while True:
        b = x & 0x7F
        x >>= 7
        if x:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _key(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_delim(field: int, payload: bytes) -> bytes:
    return _key(field, 2) + _varint(len(payload)) + payload


def _blob(data: np.ndarray, legacy_shape: bool) -> bytes:
    msg = bytearray()
    if legacy_shape:
        shape4 = list(data.shape) + [1] * (4 - data.ndim)
        for f, d in zip((1, 2, 3, 4), shape4):
            msg += _key(f, 0) + _varint(d)
    else:
        shape_msg = b"".join(_key(1, 0) + _varint(d) for d in data.shape)
        msg += _len_delim(7, shape_msg)
    msg += _len_delim(5, np.asarray(data, "<f4").tobytes())  # packed data
    return bytes(msg)


def _layer(name: str, blobs: list[np.ndarray], legacy: bool) -> bytes:
    if legacy:  # V1LayerParameter: name=4, blobs=6
        msg = _len_delim(4, name.encode())
        for b in blobs:
            msg += _len_delim(6, _blob(b, legacy_shape=True))
        return _len_delim(2, msg)
    msg = _len_delim(1, name.encode())  # LayerParameter: name=1, blobs=7
    for b in blobs:
        msg += _len_delim(7, _blob(b, legacy_shape=False))
    return _len_delim(100, msg)


def write_caffemodel(path: str, legacy: bool) -> None:
    out = bytearray()
    rng_free = 0
    for name, kshape in upstream_layers().items():
        kh, kw, cin, cout = kshape
        kernel = np.full((cout, cin, kh, kw), layer_const(name), np.float32)
        bias = np.full((cout,), layer_const(name) + 0.5, np.float32)
        if legacy:
            bias = bias.reshape(1, 1, 1, cout)  # old caffe 4-D bias blobs
        out += _layer(name, [kernel, bias], legacy)
        rng_free += 1
    with open(path, "wb") as f:
        f.write(bytes(out))


@pytest.mark.parametrize("legacy", [False, True])
def test_caffemodel_parse_and_overlay(tmp_path, legacy):
    from tpupose.models import OpenPose, weights as weights_lib
    from tpupose.models.caffe import parse_caffemodel

    path = str(tmp_path / f"model_{legacy}.caffemodel")
    write_caffemodel(path, legacy)

    parsed = parse_caffemodel(path)
    assert set(parsed) == set(upstream_layers())
    k = parsed["conv1_1"][0]
    assert k.shape == (64, 3, 3, 3)  # caffe (out, in, kh, kw)
    assert np.allclose(k, layer_const("conv1_1"))

    model = OpenPose(num_stages=6, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    loaded, missing = weights_lib.load_caffemodel(path, params)
    assert missing == []
    np.testing.assert_allclose(
        np.asarray(loaded["vgg"]["conv3_2"]["kernel"]), layer_const("conv3_2")
    )
    np.testing.assert_allclose(
        np.asarray(loaded["stage4_L1"]["conv3"]["bias"]),
        layer_const("Mconv3_stage4_L1") + 0.5,
    )
    # kernel layout transposed correctly: flax (kh, kw, in, out)
    assert loaded["vgg"]["conv1_1"]["kernel"].shape == (3, 3, 3, 64)


def test_caffemodel_kernel_transpose_values(tmp_path):
    """Non-constant kernel: the (out,in,kh,kw)->(kh,kw,in,out) transpose
    must be positionally exact."""
    from tpupose.models.caffe import blob_to_kernel, parse_caffemodel

    rng = np.random.default_rng(0)
    kernel = rng.normal(size=(5, 4, 3, 2)).astype(np.float32)  # out,in,kh,kw
    path = str(tmp_path / "one.caffemodel")
    with open(path, "wb") as f:
        f.write(_layer("probe", [kernel], legacy=False))
    got = blob_to_kernel(parse_caffemodel(path)["probe"][0])
    np.testing.assert_array_equal(got, np.transpose(kernel, (2, 3, 1, 0)))
