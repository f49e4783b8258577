"""MultiSGD-equivalent optimizer (optax).

The reference's ``training/optimizers.py`` defines MultiSGD: SGD with
momentum 0.9 plus per-layer learning-rate multipliers — vgg x1 (or x0,
frozen, for domain adaptation), CPM convs x1(w)/x2(b), stage-1 branches
x1(w)/x2(b), refinement stages x4(w)/x8(b) (SURVEY.md C16). Keras layers
additionally carry an L2 kernel regularizer (weight_decay, kernels only).

Here the same contract is expressed structurally: parameters are
labelled {group}_{w|b} from their tree paths and routed through
``optax.multi_transform`` to SGD instances whose learning rates carry
the multipliers. A multiplier of exactly 0 uses ``set_to_zero`` so the
VGG base is bit-frozen (no momentum drift), which is the domain-
adaptation fine-tune mode (BASELINE.json config 5).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import optax

from tpupose.config import TrainConfig
from tpupose.models.openpose import param_group


def step_decay_schedule(cfg: TrainConfig) -> Callable[[int], float]:
    """lr = base_lr * gamma^floor(step / lr_step) (reference LR schedule)."""

    def schedule(step):
        import jax.numpy as jnp

        return cfg.base_lr * jnp.power(cfg.lr_gamma, jnp.floor(step / cfg.lr_step))

    return schedule


def param_labels(params: Any) -> Any:
    """Label tree: {vgg|cpm|stage1|stageT}_{w|b} per leaf."""

    def label(path, leaf):
        keys = [getattr(k, "key", str(k)) for k in path]
        group = param_group(keys)
        kind = "w" if keys[-1] == "kernel" else "b"
        return f"{group}_{kind}"

    return jax.tree_util.tree_map_with_path(label, params)


def multipliers(cfg: TrainConfig) -> dict[str, float]:
    return {
        "vgg_w": cfg.vgg_lr_mult,
        "vgg_b": cfg.vgg_lr_mult * (2.0 if cfg.vgg_lr_mult > 0 else 0.0),
        "cpm_w": cfg.cpm_w_mult,
        "cpm_b": cfg.cpm_b_mult,
        "stage1_w": cfg.stage1_w_mult,
        "stage1_b": cfg.stage1_b_mult,
        "stageT_w": cfg.stageT_w_mult,
        "stageT_b": cfg.stageT_b_mult,
    }


def make_optimizer(cfg: TrainConfig, params: Any) -> optax.GradientTransformation:
    schedule = step_decay_schedule(cfg)
    mults = multipliers(cfg)

    def sgd_for(label: str) -> optax.GradientTransformation:
        mult = mults[label]
        if mult == 0.0:
            return optax.set_to_zero()
        chain = []
        if label.endswith("_w") and cfg.weight_decay > 0:
            # Keras l2(wd) adds wd*sum(w^2) to the loss -> grad term 2*wd*w
            chain.append(optax.add_decayed_weights(2.0 * cfg.weight_decay))
        chain.append(
            optax.sgd(
                learning_rate=lambda step: schedule(step) * mult,
                momentum=cfg.momentum,
            )
        )
        return optax.chain(*chain)

    transforms = {label: sgd_for(label) for label in mults}
    tx = optax.multi_transform(transforms, param_labels(params))
    if cfg.clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(cfg.clip_norm), tx)
    if cfg.accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accum_steps)
    return tx
