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

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from tpupose import topology

Dtype = Any


class VGGBackbone(nn.Module):
    """VGG19 conv1_1..conv4_2 + conv4_3_CPM/conv4_4_CPM -> stride-8 features."""

    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        def conv(x, feat, name):
            x = nn.Conv(feat, (3, 3), padding="SAME", dtype=self.dtype, name=name)(x)
            return nn.relu(x)

        def pool(x):
            return nn.max_pool(x, (2, 2), strides=(2, 2))

        # Block 1-2
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
    # rematerialise each stage branch in the backward pass: trades ~1/3
    # of the forward FLOPs for not keeping the 5x (46,46,128) 7x7-conv
    # activations of every stage alive until the backward — the memory
    # lever for large batches / high-res spatial tiling
    remat: bool = False

    @nn.compact
    def __call__(self, image: jnp.ndarray) -> list[tuple[jnp.ndarray, jnp.ndarray]]:
        s1 = nn.remat(Stage1Branch) if self.remat else Stage1Branch
        st = nn.remat(StageTBranch) if self.remat else StageTBranch
        feat = VGGBackbone(dtype=self.dtype, name="vgg")(image)
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
