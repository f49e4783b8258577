"""VGG19-frontend 6-stage two-branch CPM/PAF network (flax linen).

TPU-native rebuild of the reference's ``model.py`` graph builders
(SURVEY.md C2: ``vgg_block`` / ``stage1_block`` / ``stageT_block``,
``get_training_model`` / ``get_testing_model``). Same computation graph
contract — VGG19 conv1_1..conv4_2 + two CPM convs produce a shared
stride-8 feature F; stage 1 and five refinement stages each emit a
38-channel PAF branch (L1) and a 19-channel heatmap branch (L2), stages
t>=2 consuming concat(L1_{t-1}, L2_{t-1}, F) — but implemented as a
functional flax module designed for XLA:

  * NHWC layout, static shapes, one fused jitted apply.
  * bfloat16 compute / float32 params by default (MXU-friendly).
  * parameter tree scoped into {vgg, cpm, stage1_*, stage{2..6}_*} so the
    MultiSGD-style per-group learning-rate multipliers (SURVEY.md C16)
    fall out of the tree structure.

Input images are expected normalised to ``img/256 - 0.5`` in the
configured channel order (reference contract, SURVEY.md C5).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpupose import topology

Dtype = Any


@lru_cache(maxsize=1)
def _fold_map() -> np.ndarray:
    """One-hot tap map for computing a stride-1 3x3 conv at half resolution.

    ``M[di, dj, alpha, beta, a, b, dh, dw] = 1`` places original kernel tap
    ``(dh, dw)`` at folded-kernel position ``(di, dj)``, folded input phase
    ``(alpha, beta)``, output phase ``(a, b)``: the output pixel at absolute
    row ``2i + a`` reads absolute row ``2(i - 1 + di) + alpha``, so
    ``dh = 2*di - 1 + alpha - a`` (and likewise for the width axis). Taps
    that fall outside the 3x3 kernel stay zero — exactly the positions
    where folded SAME padding would otherwise read absolute rows the
    original SAME padding never touches, so edge behavior is preserved.
    """
    M = np.zeros((3, 3, 2, 2, 2, 2, 3, 3), np.float32)
    for di in range(3):
        for dj in range(3):
            for al in range(2):
                for be in range(2):
                    for a in range(2):
                        for b in range(2):
                            dh = 2 * di - 1 + al - a
                            dw = 2 * dj - 1 + be - b
                            if 0 <= dh < 3 and 0 <= dw < 3:
                                M[di, dj, al, be, a, b, dh, dw] = 1.0
    return M


class FoldedConv3x3(nn.Module):
    """A stride-1 SAME 3x3 conv computed at half resolution (space-to-depth).

    Built for conv1_1: a 3-input-channel conv contracts only 27 values per
    output pixel — at most 27/128 of the MXU's systolic contraction depth,
    measured at ~1.3% MFU (BASELINE.md round-3 ceiling analysis). Folding
    2x2 pixels into channels quadruples the contraction depth (27 -> 108)
    and computes the four output phases as extra output channels at a
    quarter of the spatial positions; depth-to-space restores the full-res
    activation. The result is the SAME 27-tap dot product per output pixel,
    just evaluated on an MXU-shaped layout (nominal FLOPs rise 4x because
    the scattered kernel is 75% structural zeros).

    MEASURED NEGATIVE (round 4, experiments/fold_conv1_r4.py on-chip):
    0.94x on the 4-scale batch-8 forward set (112.6 -> 120.2 ms), 0.93x
    on the single-scale batch-16 forward, 0.93x on the full train step —
    XLA's own lowering of the 3-channel conv already beats the 4x-FLOPs
    fold at these shapes. Kept opt-in (default off) with equivalence
    pinned in tests/test_model.py::TestFoldedConv1 so the measurement is
    reproducible; do not enable without new evidence.

    Parameters keep nn.Conv's exact tree ({kernel: (3,3,C,F), bias: (F,)})
    under this module's name, so checkpoints, reference weight ingest and
    export, LR grouping, and gradients (the fold is a fixed linear
    re-indexing inside apply) are all unchanged. Odd input geometry falls
    back to the plain conv with the same parameters.
    """

    features: int = 64
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, cin, self.features),
            jnp.float32)
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
        batch, h, w, _ = x.shape
        dn = ("NHWC", "HWIO", "NHWC")
        if h % 2 or w % 2:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype), (1, 1), "SAME",
                dimension_numbers=dn)
            return y + bias.astype(self.dtype)
        xf = (x.reshape(batch, h // 2, 2, w // 2, 2, cin)
              .transpose(0, 1, 3, 2, 4, 5)
              .reshape(batch, h // 2, w // 2, 4 * cin))
        kf = jnp.einsum("ijuvabhw,hwco->ijuvcabo", _fold_map(), kernel)
        kf = kf.reshape(3, 3, 4 * cin, 4 * self.features)
        y = jax.lax.conv_general_dilated(
            xf.astype(self.dtype), kf.astype(self.dtype), (1, 1), "SAME",
            dimension_numbers=dn)
        y = y + jnp.tile(bias, 4).astype(self.dtype)
        return (y.reshape(batch, h // 2, w // 2, 2, 2, self.features)
                .transpose(0, 1, 3, 2, 4, 5)
                .reshape(batch, h, w, self.features))


class _Conv3x3Params(nn.Module):
    """Parameter holder matching ``nn.Conv(features, (3, 3))``'s tree
    ({kernel: (3, 3, cin, features), bias: (features,)}, same
    initializers) without running the conv — the fused Pallas block-1
    kernel consumes the raw tensors, and checkpoints / reference weight
    ingest / export see an identical structure either way."""

    features: int

    @nn.compact
    def __call__(self, cin: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, cin, self.features), jnp.float32)
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,),
            jnp.float32)
        return kernel, bias


class VGGBackbone(nn.Module):
    """VGG19 conv1_1..conv4_2 + conv4_3_CPM/conv4_4_CPM -> stride-8 features."""

    dtype: Dtype = jnp.bfloat16
    fold_conv1: bool = False
    pallas_block1: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        def conv(x, feat, name):
            x = nn.Conv(feat, (3, 3), padding="SAME", dtype=self.dtype, name=name)(x)
            return nn.relu(x)

        def pool(x):
            return nn.max_pool(x, (2, 2), strides=(2, 2))

        # Block 1-2. The fused Pallas kernel computes
        # conv1_1+relu+conv1_2+relu+pool1 in one HBM pass (inference
        # path; see ops/pallas_block1.py) — bf16-only, geometry-gated,
        # falling back to the XLA convs otherwise.
        fuse = (self.pallas_block1 and self.dtype == jnp.bfloat16
                and x.shape[1] % 8 == 0 and x.shape[2] % 2 == 0)
        if fuse:
            from tpupose.ops.pallas_block1 import fused_block1

            k1, b1 = _Conv3x3Params(64, name="conv1_1")(x.shape[-1])
            k2, b2 = _Conv3x3Params(64, name="conv1_2")(64)
            x = fused_block1(
                x, k1, b1, k2, b2,
                interpret=jax.default_backend() != "tpu")
        else:
            if self.fold_conv1:
                x = nn.relu(FoldedConv3x3(64, dtype=self.dtype, name="conv1_1")(x))
            else:
                x = conv(x, 64, "conv1_1")
            x = conv(x, 64, "conv1_2")
            x = pool(x)
        x = conv(x, 128, "conv2_1")
        x = conv(x, 128, "conv2_2")
        x = pool(x)
        # Block 3
        x = conv(x, 256, "conv3_1")
        x = conv(x, 256, "conv3_2")
        x = conv(x, 256, "conv3_3")
        x = conv(x, 256, "conv3_4")
        x = pool(x)
        # Block 4 (truncated)
        x = conv(x, 512, "conv4_1")
        x = conv(x, 512, "conv4_2")
        return x


class CPMFeature(nn.Module):
    """The two CPM-specific reduction convs appended to VGG (C2)."""

    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(256, (3, 3), padding="SAME", dtype=self.dtype, name="conv4_3_CPM")(x)
        x = nn.relu(x)
        x = nn.Conv(128, (3, 3), padding="SAME", dtype=self.dtype, name="conv4_4_CPM")(x)
        return nn.relu(x)


class Stage1Branch(nn.Module):
    """Stage-1 branch: 3x [3x3,128] -> [1x1,512] -> [1x1,out]."""

    out_channels: int
    dtype: Dtype = jnp.bfloat16
    head_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(3):
            x = nn.Conv(128, (3, 3), padding="SAME", dtype=self.dtype, name=f"conv{i + 1}")(x)
            x = nn.relu(x)
        x = nn.Conv(512, (1, 1), dtype=self.dtype, name="conv4")(x)
        x = nn.relu(x)
        # final prediction conv defaults to float32 for stable
        # losses/decodes; head_dtype=bfloat16 keeps the whole stage on
        # the MXU fast path (losses still accumulate in f32 — bf16
        # preds promote against the f32 GT)
        x = nn.Conv(self.out_channels, (1, 1), dtype=self.head_dtype, name="out")(x)
        return x


class StageTBranch(nn.Module):
    """Refinement branch: 5x [7x7,128] -> [1x1,128] -> [1x1,out]."""

    out_channels: int
    dtype: Dtype = jnp.bfloat16
    head_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(5):
            x = nn.Conv(128, (7, 7), padding="SAME", dtype=self.dtype, name=f"conv{i + 1}")(x)
            x = nn.relu(x)
        x = nn.Conv(128, (1, 1), dtype=self.dtype, name="conv6")(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (1, 1), dtype=self.head_dtype, name="out")(x)
        return x


class OpenPose(nn.Module):
    """The full multi-stage network.

    ``__call__`` returns a list of ``num_stages`` (paf, heatmap) tuples —
    the training contract (12 outputs for 6 stages, matching the
    reference's ``get_training_model``). Inference uses only the last
    tuple (``get_testing_model`` contract).
    """

    num_stages: int = 6
    paf_channels: int = topology.NUM_PAF_CHANNELS
    heat_channels: int = topology.NUM_HEAT_CHANNELS
    dtype: Dtype = jnp.bfloat16
    head_dtype: Dtype = jnp.float32
    # compute conv1_1 at half resolution via space-to-depth (identical
    # math and params — see FoldedConv3x3)
    fold_conv1: bool = False
    # fused Pallas block-1 (conv1_1+relu+conv1_2+relu+pool1, one HBM
    # pass — ops/pallas_block1.py); inference-only (no VJP)
    pallas_block1: bool = False
    # rematerialise each stage branch in the backward pass: trades ~1/3
    # of the forward FLOPs for not keeping the 5x (46,46,128) 7x7-conv
    # activations of every stage alive until the backward — the memory
    # lever for large batches / high-res spatial tiling
    remat: bool = False

    @nn.compact
    def __call__(self, image: jnp.ndarray) -> list[tuple[jnp.ndarray, jnp.ndarray]]:
        s1 = nn.remat(Stage1Branch) if self.remat else Stage1Branch
        st = nn.remat(StageTBranch) if self.remat else StageTBranch
        feat = VGGBackbone(dtype=self.dtype, fold_conv1=self.fold_conv1,
                           pallas_block1=self.pallas_block1,
                           name="vgg")(image)
        feat = CPMFeature(dtype=self.dtype, name="cpm")(feat)

        outputs: list[tuple[jnp.ndarray, jnp.ndarray]] = []
        paf = s1(self.paf_channels, dtype=self.dtype,
                 head_dtype=self.head_dtype, name="stage1_L1")(feat)
        heat = s1(self.heat_channels, dtype=self.dtype,
                  head_dtype=self.head_dtype, name="stage1_L2")(feat)
        outputs.append((paf, heat))

        for t in range(2, self.num_stages + 1):
            x = jnp.concatenate(
                [paf.astype(self.dtype), heat.astype(self.dtype), feat], axis=-1
            )
            paf = st(self.paf_channels, dtype=self.dtype,
                     head_dtype=self.head_dtype, name=f"stage{t}_L1")(x)
            heat = st(self.heat_channels, dtype=self.dtype,
                      head_dtype=self.head_dtype, name=f"stage{t}_L2")(x)
            outputs.append((paf, heat))
        return outputs


def forward_final(model: OpenPose, params, image: jnp.ndarray):
    """(paf, heatmap) of the final stage — the testing-model contract."""
    outs = model.apply({"params": params}, image)
    return outs[-1]


def normalize_image(img: jnp.ndarray) -> jnp.ndarray:
    """Reference preprocessing: img/256 - 0.5 (img uint8-valued float)."""
    return img / 256.0 - 0.5


def param_group(path: Sequence[str]) -> str:
    """Map a param-tree path to an LR group: vgg | cpm | stage1 | stageT.

    Used by the optimizer to reproduce the reference's MultiSGD per-layer
    multipliers (SURVEY.md C16) from tree structure alone.
    """
    top = path[0]
    if top == "vgg":
        return "vgg"
    if top == "cpm":
        return "cpm"
    if top.startswith("stage1"):
        return "stage1"
    return "stageT"
