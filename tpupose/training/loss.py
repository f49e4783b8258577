"""Stage-wise masked L2 training losses.

Reference contract (SURVEY.md C17; BASELINE.json config 5): every one of
the 12 heads (6 stages x {PAF, heatmap}) contributes
``eucl_loss = sum((pred - gt)^2) / batch / 2``, where both prediction
and ground truth are multiplied by the per-pixel miss-mask (the
reference masks predictions with a Multiply layer and bakes the mask
into the GT labels).
"""

from __future__ import annotations

import jax.numpy as jnp


def eucl_loss(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    mask: jnp.ndarray,
    denom: int | None = None,
) -> jnp.ndarray:
    """sum((m*pred - m*gt)^2) / N / 2 for one head.

    pred/gt: (N, L, L, C); mask: (N, L, L) in [0, 1]. ``denom`` overrides
    the batch-size divisor — used when the batch is padded to the mesh
    size (padded rows carry a zero mask, so only the divisor must track
    the real sample count).
    """
    n = denom if denom is not None else pred.shape[0]
    d = (pred - gt) * mask[..., None]
    return jnp.sum(jnp.square(d)) / n / 2.0


def stagewise_losses(
    outputs: list[tuple[jnp.ndarray, jnp.ndarray]],
    paf_gt: jnp.ndarray,
    heat_gt: jnp.ndarray,
    mask: jnp.ndarray,
    denom: int | None = None,
) -> dict[str, jnp.ndarray]:
    """Per-head loss dict + total, matching the reference's 12-output sum.

    ``paf_gt``/``heat_gt`` are already mask-multiplied (GT path
    semantics); the mask is applied to predictions here.
    """
    losses: dict[str, jnp.ndarray] = {}
    total = 0.0
    for t, (paf, heat) in enumerate(outputs, start=1):
        lp = eucl_loss(paf * mask[..., None], paf_gt, jnp.ones_like(mask), denom)
        lh = eucl_loss(heat * mask[..., None], heat_gt, jnp.ones_like(mask), denom)
        losses[f"stage{t}_L1"] = lp
        losses[f"stage{t}_L2"] = lh
        total = total + lp + lh
    losses["total"] = total
    return losses
