"""Jitted training step: on-device GT generation + stage-wise masked L2.

TPU-native rebuild of the reference's ``training/train_pose.py``
(SURVEY.md C17; BASELINE.json configs 4-5). One XLA program per step
covers what the reference split across two processes and a socket:
augmentation (rot/scale/flip/crop), putGaussianMaps/putVecMaps GT
rasterisation, the 6-stage forward, the 12 masked L2 heads, and the
MultiSGD-equivalent update. Domain-adaptation fine-tuning is the same
step with the VGG base frozen (``TrainConfig.frozen_vgg()``).

Raw-batch contract (host -> device, all fixed shapes):
  images  (N, H, W, 3) float32, uint8-valued, configured channel order
  masks   (N, H, W)    float32 miss-mask (1 = keep)
  joints  (N, P, 18, 3) float32, v=2 rows are padding
  centers (N, 2), scales (N,)  main-person crop geometry
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax

from tpupose.config import PoseConfig
from tpupose.gt import augment as gt_augment
from tpupose.gt import rasterize as gt_rasterize
from tpupose.models import OpenPose
from tpupose.ops import image as image_ops
from tpupose.training import loss as loss_lib
from tpupose.training import optimizer as opt_lib


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray

    def tree(self):
        return {"params": self.params, "opt_state": self.opt_state, "step": self.step}


def create_state(cfg: PoseConfig, params: Any) -> tuple[TrainState, optax.GradientTransformation]:
    tx = opt_lib.make_optimizer(cfg.train, params)
    return TrainState(params, tx.init(params), jnp.int32(0)), tx


def make_train_step(
    cfg: PoseConfig,
    model: OpenPose,
    tx: optax.GradientTransformation,
    loss_denom: int | None = None,
):
    """Returns jitted step(state_tree, key, batch) -> (state_tree, metrics).

    ``loss_denom`` fixes the eucl-loss batch divisor to the *real* sample
    count when batches are padded to the mesh size (padded rows ship a
    zero miss-mask, so they contribute nothing to the numerator).
    """

    model_cfg = cfg.model
    aug_cfg = cfg.augment

    def loss_fn(params, images_norm, paf_gt, heat_gt, label_mask):
        outputs = model.apply({"params": params}, images_norm)
        losses = loss_lib.stagewise_losses(
            outputs, paf_gt, heat_gt, label_mask, loss_denom
        )
        return losses["total"], losses

    def _norm_masks(masks):
        # host pipeline ships uint8 (0..255) to quarter the transfer size
        if masks.dtype == jnp.uint8:
            return masks.astype(jnp.float32) / 255.0
        return masks

    @partial(jax.jit, donate_argnums=(0,))
    def step(state_tree, key, batch):
        params = state_tree["params"]
        images_a, label_mask, joints_a = gt_augment.augment_batch(
            key,
            batch["images"].astype(jnp.float32),
            _norm_masks(batch["masks"]),
            batch["joints"],
            batch["centers"],
            batch["scales"],
            model_cfg,
            aug_cfg,
        )
        if "weight" in batch:  # mesh-padded batches: zero out padded rows
            label_mask = label_mask * batch["weight"][:, None, None]
        from tpupose.ops import use_pallas_gt

        if use_pallas_gt():
            from tpupose.ops.pallas_gt import create_labels_pallas as _labels
        else:
            _labels = gt_rasterize.create_labels
        paf_gt, heat_gt = _labels(
            joints_a,
            label_mask,
            label_size=model_cfg.label_size,
            stride=model_cfg.stride,
            sigma=aug_cfg.sigma,
            paf_thre=aug_cfg.paf_thre,
        )
        images_norm = image_ops.normalize(images_a, model_cfg.channel_order)

        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, images_norm, paf_gt, heat_gt, label_mask
        )
        updates, opt_state = tx.update(grads, state_tree["opt_state"], params)
        params = optax.apply_updates(params, updates)
        return (
            {"params": params, "opt_state": opt_state, "step": state_tree["step"] + 1},
            losses,
        )

    return step


def make_eval_step(cfg: PoseConfig, model: OpenPose, loss_denom: int | None = None):
    """Forward-only loss on a raw batch with deterministic (identity)
    augmentation — the reference's validation-generator path."""

    model_cfg = cfg.model
    aug_cfg = cfg.augment

    def _norm_masks(masks):
        if masks.dtype == jnp.uint8:
            return masks.astype(jnp.float32) / 255.0
        return masks

    @jax.jit
    def step(params, batch):
        images_a, label_mask, joints_a = gt_augment.augment_batch(
            jax.random.PRNGKey(0),
            batch["images"].astype(jnp.float32),
            _norm_masks(batch["masks"]),
            batch["joints"],
            batch["centers"],
            batch["scales"],
            model_cfg,
            aug_cfg,
            training=False,
        )
        if "weight" in batch:
            label_mask = label_mask * batch["weight"][:, None, None]
        paf_gt, heat_gt = gt_rasterize.create_labels(
            joints_a,
            label_mask,
            label_size=model_cfg.label_size,
            stride=model_cfg.stride,
            sigma=aug_cfg.sigma,
            paf_thre=aug_cfg.paf_thre,
        )
        outputs = model.apply(
            {"params": params},
            image_ops.normalize(images_a, model_cfg.channel_order),
        )
        return loss_lib.stagewise_losses(
            outputs, paf_gt, heat_gt, label_mask, loss_denom
        )

    return step


def make_preprocessed_step(cfg: PoseConfig, model: OpenPose, tx: optax.GradientTransformation):
    """Step for pre-rasterised batches (images_norm, paf_gt, heat_gt,
    label_mask) — the reference's generator-fed mode."""

    def loss_fn(params, batch):
        outputs = model.apply({"params": params}, batch["images_norm"])
        losses = loss_lib.stagewise_losses(
            outputs, batch["paf_gt"], batch["heat_gt"], batch["label_mask"]
        )
        return losses["total"], losses

    @partial(jax.jit, donate_argnums=(0,))
    def step(state_tree, batch):
        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state_tree["params"], batch
        )
        updates, opt_state = tx.update(
            grads, state_tree["opt_state"], state_tree["params"]
        )
        params = optax.apply_updates(state_tree["params"], updates)
        return (
            {"params": params, "opt_state": opt_state, "step": state_tree["step"] + 1},
            losses,
        )

    return step
