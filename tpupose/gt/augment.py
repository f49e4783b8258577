"""Batched on-device augmentation (rot / scale / flip / crop).

TPU-native rebuild of the reference's ``py_rmpe_transformer.py``
(SURVEY.md C11). The reference composes one 2x3 affine per sample and
calls ``cv2.warpAffine`` on the host; here the affine is composed in
jnp from `jax.random` draws and applied as a batched bilinear gather on
device, so augmentation rides the training step instead of a CPU
process behind a socket.

Semantics preserved (AugmentConfig mirrors TransformationParams):
  * scale = (target_dist / scale_provided) * U(scale_min, scale_max)
  * rotation U(-max_rotate_degree, +max_rotate_degree)
  * crop to boxsize^2 about the person centre + U(-center_perturb_max,
    +center_perturb_max)^2 perturbation
  * horizontal flip with p = flip_prob, including the L/R part-label
    swap on the joints
  * constant gray border (pad_value) outside the source image
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tpupose import topology
from tpupose.config import AugmentConfig, ModelConfig


def sample_params(key: jax.Array, aug: AugmentConfig) -> dict[str, jnp.ndarray]:
    """Random augmentation draws for one sample (reference
    AugmentSelection.random)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "scale_mult": jax.random.uniform(
            k1, (), minval=aug.scale_min, maxval=aug.scale_max
        ),
        "degrees": jax.random.uniform(
            k2, (), minval=-aug.max_rotate_degree, maxval=aug.max_rotate_degree
        ),
        "perturb": jax.random.uniform(
            k3, (2,), minval=-aug.center_perturb_max, maxval=aug.center_perturb_max
        ),
        "flip": jax.random.bernoulli(k4, aug.flip_prob),
    }


def identity_params() -> dict[str, jnp.ndarray]:
    """Deterministic no-op draws (reference AugmentSelection.unrandom)."""
    return {
        "scale_mult": jnp.float32(1.0),
        "degrees": jnp.float32(0.0),
        "perturb": jnp.zeros((2,), jnp.float32),
        "flip": jnp.asarray(False),
    }


def affine_matrix(
    center: jnp.ndarray,          # (2,) person centre in source pixels
    scale_provided: jnp.ndarray,  # () person height / boxsize
    params: dict[str, jnp.ndarray],
    aug: AugmentConfig,
    out_size: int,
) -> jnp.ndarray:
    """2x3 source->output affine (same composition as the twin)."""
    scale = aug.target_dist / jnp.maximum(scale_provided, 1e-6) * params["scale_mult"]
    t = jnp.deg2rad(params["degrees"])
    c, s = jnp.cos(t), jnp.sin(t)
    f = jnp.where(params["flip"], -1.0, 1.0)

    cx = center[0] + params["perturb"][0]
    cy = center[1] + params["perturb"][1]
    half = out_size / 2.0

    # full = T(out/2) @ Flip @ Rot @ Scale @ T(-center); the flip mirrors
    # about x = (out-1)/2 (cv2.flip semantics: x' = out-1-x), hence the
    # extra -1 in tx when flipped.
    a00 = f * c * scale
    a01 = f * (-s) * scale
    a10 = s * scale
    a11 = c * scale
    tx = -(a00 * cx + a01 * cy) + half - jnp.where(params["flip"], 1.0, 0.0)
    ty = -(a10 * cx + a11 * cy) + half
    return jnp.asarray([[a00, a01, tx], [a10, a11, ty]])


def _invert_affine(m: jnp.ndarray) -> jnp.ndarray:
    det = m[0, 0] * m[1, 1] - m[0, 1] * m[1, 0]
    inv00 = m[1, 1] / det
    inv01 = -m[0, 1] / det
    inv10 = -m[1, 0] / det
    inv11 = m[0, 0] / det
    tx = -(inv00 * m[0, 2] + inv01 * m[1, 2])
    ty = -(inv10 * m[0, 2] + inv11 * m[1, 2])
    return jnp.asarray([[inv00, inv01, tx], [inv10, inv11, ty]])


def warp_image(
    img: jnp.ndarray, affine: jnp.ndarray, out_size: int, border_value: float
) -> jnp.ndarray:
    """Bilinear inverse-mapped warp with constant border, (H, W, C) input.

    Equivalent to cv2.warpAffine(INTER_LINEAR, BORDER_CONSTANT) — the hot
    per-pixel gather the reference does on CPU, here one XLA program.
    """
    inv = _invert_affine(affine)
    idx = jnp.arange(out_size, dtype=jnp.float32)
    xs = jnp.broadcast_to(idx[None, :], (out_size, out_size))
    ys = jnp.broadcast_to(idx[:, None], (out_size, out_size))
    src_x = inv[0, 0] * xs + inv[0, 1] * ys + inv[0, 2]
    src_y = inv[1, 0] * xs + inv[1, 1] * ys + inv[1, 2]

    h, w = img.shape[0], img.shape[1]
    x0 = jnp.floor(src_x)
    y0 = jnp.floor(src_y)
    fx = (src_x - x0)[..., None]
    fy = (src_y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yy, xx):
        inside = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
        yc = jnp.clip(yy, 0, h - 1)
        xc = jnp.clip(xx, 0, w - 1)
        vals = img[yc, xc].astype(jnp.float32)
        return jnp.where(inside[..., None], vals, border_value)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def warp_image_twopass(
    img: jnp.ndarray,
    affine: jnp.ndarray,
    out_size: int,
    border_value: float,
    chunk: int = 16,
) -> jnp.ndarray:
    """Gather-free bilinear warp: two 1-D dense-hat resampling passes.

    TPU gathers lower to serial dynamic-slices, which made the 4-tap
    ``warp_image`` the dominant cost of the train step (~51 ms of a
    batch-10 step vs ~7 ms for this formulation, measured round 2).
    Each pass contracts the image against the hat function
    ``max(0, 1-|pos-w|)`` over chunked source columns/rows — pure
    VPU-friendly elementwise math + reductions, no gathers.

    Pass 1 resamples each *source row* ``v`` horizontally at
    ``q(x, v) = qa*x + qb*v + qc`` (the source column where output column
    ``x``'s inverse-mapped ray crosses row ``v``); pass 2 resamples the
    intermediate vertically at ``r(y, x)``. The composition samples the
    bilinear surface along the correct slanted line; it differs from
    cv2's 4-corner bilinear only sub-pixel (identical on locally-linear
    images, same interpolation quality class on natural ones) — see
    ``warp_image`` for the exact 4-corner path used by parity tests.
    Constant-border semantics match cv2.BORDER_CONSTANT exactly.
    """
    inv = _invert_affine(affine)
    i00, i01, i02 = inv[0, 0], inv[0, 1], inv[0, 2]
    i10, i11, i12 = inv[1, 0], inv[1, 1], inv[1, 2]
    sh, sw, c = img.shape
    # i11 = cos(rot)/scale never vanishes for |rot| <= 40deg (AugmentConfig)
    qa = (i00 * i11 - i01 * i10) / i11
    qb = i01 / i11
    qc = i02 - i01 * i12 / i11
    v = jnp.arange(sh, dtype=jnp.float32)
    x = jnp.arange(out_size, dtype=jnp.float32)
    q = qa * x[None, :] + qb * v[:, None] + qc            # (sh, O)
    imgf = img.astype(jnp.float32)
    # pad to chunk multiples so dynamic_slice never clamps; the hat mask
    # (wj < sw / vj < sh) gives padded source cells zero weight
    pad_w = (-sw) % chunk
    if pad_w:
        imgf = jnp.pad(imgf, ((0, 0), (0, pad_w), (0, 0)))

    def pass1(carry, w0):
        acc, wsum = carry
        wj = w0.astype(jnp.float32) + jnp.arange(chunk, dtype=jnp.float32)
        hat = jnp.maximum(0.0, 1.0 - jnp.abs(q[:, :, None] - wj))
        hat = hat * (wj < sw)
        seg = jax.lax.dynamic_slice(imgf, (0, w0, 0), (sh, chunk, c))
        # einsum beats the broadcast-multiply-reduce form on TPU here
        # (measured in-step 114 vs 128 ms/step, bare 6 vs 21 ms/batch-10)
        acc = acc + jnp.einsum("vxk,vkc->vxc", hat, seg)
        wsum = wsum + hat.sum(-1)
        return (acc, wsum), None

    n_wc = -(-sw // chunk)
    (i1, wsum), _ = jax.lax.scan(
        pass1,
        (jnp.zeros((sh, out_size, c), jnp.float32),
         jnp.zeros((sh, out_size), jnp.float32)),
        jnp.arange(n_wc) * chunk,
    )
    i1 = i1 + border_value * (1.0 - wsum)[..., None]      # (sh, O, c)
    pad_h = (-sh) % chunk
    if pad_h:
        i1 = jnp.pad(i1, ((0, pad_h), (0, 0), (0, 0)))

    y = jnp.arange(out_size, dtype=jnp.float32)
    r = i10 * x[None, :] + i11 * y[:, None] + i12          # (O, O)

    def pass2(carry, v0):
        acc, wsum = carry
        vj = v0.astype(jnp.float32) + jnp.arange(chunk, dtype=jnp.float32)
        hat = jnp.maximum(0.0, 1.0 - jnp.abs(r[:, :, None] - vj))
        hat = hat * (vj < sh)
        seg = jax.lax.dynamic_slice(i1, (v0, 0, 0), (chunk, out_size, c))
        acc = acc + jnp.einsum("yxk,kxc->yxc", hat, seg)
        wsum = wsum + hat.sum(-1)
        return (acc, wsum), None

    n_vc = -(-sh // chunk)
    (out, wsum), _ = jax.lax.scan(
        pass2,
        (jnp.zeros((out_size, out_size, c), jnp.float32),
         jnp.zeros((out_size, out_size), jnp.float32)),
        jnp.arange(n_vc) * chunk,
    )
    return out + border_value * (1.0 - wsum)[..., None]


def sample_mask_at_label_grid(
    msk: jnp.ndarray, affine: jnp.ndarray, label_size: int, stride: int
) -> jnp.ndarray:
    """Warp the miss-mask directly onto the stride-N label grid.

    Bilinearly samples the source mask at the inverse-mapped label-grid
    centres — 64x fewer gathers than warping at full resolution and then
    pooling, and closer to the reference's cv2.resize-to-46x46 semantics.
    Outside-source points read 1.0 (keep loss, reference border).

    Implemented by composing the affine with the label->image grid map
    (q -> stride*q + stride/2 - 0.5) and reusing warp_image.
    """
    off = stride / 2.0 - 0.5
    m2 = jnp.stack(
        [
            jnp.asarray(
                [affine[i, 0] / stride, affine[i, 1] / stride,
                 (affine[i, 2] - off) / stride]
            )
            for i in (0, 1)
        ]
    )
    return warp_image(msk[..., None], m2, label_size, 1.0)[..., 0]


def transform_joints(
    joints: jnp.ndarray, affine: jnp.ndarray, flip: jnp.ndarray, out_size: int
) -> jnp.ndarray:
    """Affine on (P, 18, 3) joints; L/R label swap on flip; out-of-frame
    joints marked absent (v = 2)."""
    x = joints[..., 0]
    y = joints[..., 1]
    nx = affine[0, 0] * x + affine[0, 1] * y + affine[0, 2]
    ny = affine[1, 0] * x + affine[1, 1] * y + affine[1, 2]
    out = jnp.stack([nx, ny, joints[..., 2]], axis=-1)

    perm = jnp.asarray(topology.FLIP_PERMUTATION)
    out = jnp.where(flip, out[:, perm, :], out)

    off = (
        (out[..., 0] < 0)
        | (out[..., 0] >= out_size)
        | (out[..., 1] < 0)
        | (out[..., 1] >= out_size)
    )
    v = jnp.where(off, 2.0, out[..., 2])
    return out.at[..., 2].set(v)


@partial(jax.jit, static_argnames=("model", "aug", "training"))
def augment_batch(
    key: jax.Array,
    images: jnp.ndarray,          # (N, H, W, 3) float (uint8-valued)
    masks: jnp.ndarray,           # (N, H, W) miss-mask in [0, 1]
    joints: jnp.ndarray,          # (N, P, 18, 3)
    centers: jnp.ndarray,         # (N, 2) main-person centres
    scales: jnp.ndarray,          # (N,) scale_provided = person_h / boxsize
    model: ModelConfig,
    aug: AugmentConfig,
    training: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One fused augmentation program for the whole batch.

    Returns (aug_images (N, box, box, 3), label_masks (N, L, L),
    aug_joints (N, P, 18, 3)). The mask is bilinearly sampled directly at
    the inverse-mapped label-grid centres (sample_mask_at_label_grid) —
    the reference warps it with the image and resizes to the label grid.
    """
    n = images.shape[0]
    box = model.boxsize
    # fold_in (not split): sample i's draws depend only on (key, i), so a
    # batch padded for mesh divisibility augments its real samples
    # identically to the unpadded batch (tests/test_parallel.py relies
    # on this for the sharded == unsharded proof).
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(n))
    warp = (
        warp_image if aug.warp_method == "exact" else warp_image_twopass
    )

    def one(k, img, msk, jts, ctr, scl):
        p = (
            sample_params(k, aug)
            if training
            else {**identity_params()}
        )
        m = affine_matrix(ctr, scl, p, aug, box)
        img_w = warp(img, m, box, float(model.pad_value))
        lbl = sample_mask_at_label_grid(msk, m, model.label_size, model.stride)
        jts_w = transform_joints(jts, m, p["flip"], box)
        return img_w, lbl, jts_w

    return jax.vmap(one)(keys, images, masks, joints, centers, scales)
