"""TPU experiment: augmentation-warp formulations, batch 10, 368x368x3.

VERDICT round-1 weak #1: the per-pixel bilinear gather in
gt/augment.py::warp_image costs ~120 ms of the 163 ms train step.
Candidates measured here on the real chip:

  A  current      vmapped advanced-index 2D gather (4 taps)
  B  take-vmap    same math, gather via jnp.take on (H*W, C) per image
  C  take-global  single jnp.take over the (N*H*W, C) flattened batch
  D  twopass      gather-free two-pass dense-hat contraction (scan over
                  source-column / source-row chunks) — slanted-line
                  bilinear resampling, no gathers at all

Timing: dispatch `iters` back-to-back and sync once at the end (the axon
tunnel makes per-iter sync meaningless; block_until_ready is unreliable
on this platform — see memory/axon-tpu-platform-gotchas).
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpupose.config import DEFAULT
from tpupose.gt import augment

N, S, O = 10, 368, 368
BORDER = 128.0


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    imgs = rng.uniform(0, 255, (N, S, S, 3)).astype(np.float32)
    keys = jax.random.split(jax.random.PRNGKey(seed), N)
    centers = jnp.asarray(rng.uniform(100, 260, (N, 2)).astype(np.float32))
    scales = jnp.asarray(rng.uniform(0.4, 1.5, (N,)).astype(np.float32))
    params = jax.vmap(lambda k: augment.sample_params(k, DEFAULT.augment))(keys)
    affines = jax.vmap(
        lambda c, s, p: augment.affine_matrix(c, s, p, DEFAULT.augment, O)
    )(centers, scales, params)
    return jnp.asarray(imgs), jax.device_get(affines)


# --- A: current ---------------------------------------------------------------
@jax.jit
def warp_a(imgs, affines):
    return jax.vmap(lambda i, m: augment.warp_image(i, m, O, BORDER))(imgs, affines)


# --- B: jnp.take per image ----------------------------------------------------
def _coords(affine):
    inv = augment._invert_affine(affine)
    idx = jnp.arange(O, dtype=jnp.float32)
    xs = jnp.broadcast_to(idx[None, :], (O, O))
    ys = jnp.broadcast_to(idx[:, None], (O, O))
    src_x = inv[0, 0] * xs + inv[0, 1] * ys + inv[0, 2]
    src_y = inv[1, 0] * xs + inv[1, 1] * ys + inv[1, 2]
    return src_x, src_y


def _warp_take_one(img, affine):
    src_x, src_y = _coords(affine)
    h, w, c = img.shape
    flat = img.reshape(h * w, c)
    x0 = jnp.floor(src_x)
    y0 = jnp.floor(src_y)
    fx = (src_x - x0)[..., None]
    fy = (src_y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yy, xx):
        inside = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
        lin = jnp.clip(yy, 0, h - 1) * w + jnp.clip(xx, 0, w - 1)
        vals = jnp.take(flat, lin.reshape(-1), axis=0).reshape(O, O, c)
        return jnp.where(inside[..., None], vals, BORDER)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


@jax.jit
def warp_b(imgs, affines):
    return jax.vmap(_warp_take_one)(imgs, affines)


# --- C: one global take -------------------------------------------------------
@jax.jit
def warp_c(imgs, affines):
    n, h, w, c = imgs.shape
    flat = imgs.reshape(n * h * w, c)
    src_x, src_y = jax.vmap(_coords)(affines)          # (N, O, O)
    x0 = jnp.floor(src_x)
    y0 = jnp.floor(src_y)
    fx = (src_x - x0)[..., None]
    fy = (src_y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    base = (jnp.arange(n) * h * w)[:, None, None]

    def gather(yy, xx):
        inside = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
        lin = base + jnp.clip(yy, 0, h - 1) * w + jnp.clip(xx, 0, w - 1)
        vals = jnp.take(flat, lin.reshape(-1), axis=0).reshape(n, O, O, c)
        return jnp.where(inside[..., None], vals, BORDER)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


# --- D: two-pass dense-hat ------------------------------------------------------
def _warp_twopass_one(img, affine, chunk=16):
    inv = augment._invert_affine(affine)
    i00, i01, i02 = inv[0, 0], inv[0, 1], inv[0, 2]
    i10, i11, i12 = inv[1, 0], inv[1, 1], inv[1, 2]
    sh, sw, c = img.shape
    qa = (i00 * i11 - i01 * i10) / i11
    qb = i01 / i11
    qc = i02 - i01 * i12 / i11
    v = jnp.arange(sh, dtype=jnp.float32)
    x = jnp.arange(O, dtype=jnp.float32)
    q = qa * x[None, :] + qb * v[:, None] + qc            # (sh, O)
    imgf = img.astype(jnp.float32)

    def p1_step(carry, w0):
        acc, wsum = carry
        wj = w0.astype(jnp.float32) + jnp.arange(chunk, dtype=jnp.float32)
        hat = jnp.maximum(0.0, 1.0 - jnp.abs(q[:, :, None] - wj))   # (sh, O, k)
        seg = jax.lax.dynamic_slice(imgf, (0, w0, 0), (sh, chunk, c))
        acc = acc + jnp.einsum("vxk,vkc->vxc", hat, seg)
        wsum = wsum + hat.sum(-1)
        return (acc, wsum), None

    acc0 = jnp.zeros((sh, O, c), jnp.float32)
    ws0 = jnp.zeros((sh, O), jnp.float32)
    (i1, wsum), _ = jax.lax.scan(
        p1_step, (acc0, ws0), jnp.arange(0, sw, chunk)
    )
    i1 = i1 + BORDER * (1.0 - wsum)[..., None]            # (sh, O, c)

    y = jnp.arange(O, dtype=jnp.float32)
    r = i10 * x[None, :] + i11 * y[:, None] + i12          # (O, O)

    def p2_step(carry, v0):
        acc, wsum = carry
        vj = v0.astype(jnp.float32) + jnp.arange(chunk, dtype=jnp.float32)
        hat = jnp.maximum(0.0, 1.0 - jnp.abs(r[:, :, None] - vj))   # (O, O, k)
        seg = jax.lax.dynamic_slice(i1, (v0, 0, 0), (chunk, O, c))
        acc = acc + jnp.einsum("yxk,kxc->yxc", hat, seg)
        wsum = wsum + hat.sum(-1)
        return (acc, wsum), None

    acc0 = jnp.zeros((O, O, c), jnp.float32)
    ws0 = jnp.zeros((O, O), jnp.float32)
    (out, wsum), _ = jax.lax.scan(
        p2_step, (acc0, ws0), jnp.arange(0, sh, chunk)
    )
    return out + BORDER * (1.0 - wsum)[..., None]


@partial(jax.jit, static_argnames=("chunk",))
def warp_d(imgs, affines, chunk=16):
    return jax.vmap(lambda i, m: _warp_twopass_one(i, m, chunk))(imgs, affines)


def bench(name, fn, imgs, affines, iters=20):
    out = fn(imgs, affines)
    _ = float(jnp.sum(out))          # compile + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(imgs, affines)
    _ = float(jnp.sum(out))          # one sync at the end
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:12s} {dt*1e3:8.2f} ms/batch-{N}", flush=True)
    return out, dt


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    imgs, affines = make_inputs()
    ref, _ = bench("A current", warp_a, imgs, affines)
    for name, fn in [
        ("B take-vmap", warp_b),
        ("C take-glob", warp_c),
        ("D twopass16", warp_d),
        ("D twopass32", partial(warp_d, chunk=32)),
        ("D twopass8", partial(warp_d, chunk=8)),
    ]:
        out, dt = bench(name, fn, imgs, affines)
        d = float(jnp.max(jnp.abs(out - ref)))
        print(f"{name:12s} max|diff vs A| = {d:.4f}", flush=True)


if __name__ == "__main__":
    main()
