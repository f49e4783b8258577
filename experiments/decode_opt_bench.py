"""Decode optimization candidates, measured on the chip.

score_limbs: flat-take gather vs advanced indexing; pair capacity K'.
peaks: where the time goes (blur+NMS vs top_k), approx_max_k variant.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpupose.benchmark import synthetic_scene
from tpupose.decode import paf as PF, peaks as PK


def timeit(label, fn, *args, iters=10):
    def reduced(*a):
        return jnp.sum(jax.tree.leaves(fn(*a))[0].astype(jnp.float32))

    _ = float(jax.device_get(reduced(*args)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = reduced(*args)
    _ = float(jax.device_get(out))
    print(f"{label:36s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms/batch-8",
          flush=True)


# --- score_limbs with flat-take gather ----------------------------------------
def _pair_scores_take(paf_xy, ax, ay, asc, av, bx, by, bsc, bv,
                      mid_num, thre2, min_ratio, height):
    axf, ayf = ax.astype(jnp.float32), ay.astype(jnp.float32)
    bxf, byf = bx.astype(jnp.float32), by.astype(jnp.float32)
    dx = bxf[None, :] - axf[:, None]
    dy = byf[None, :] - ayf[:, None]
    norm = jnp.sqrt(dx * dx + dy * dy)
    norm_safe = jnp.maximum(norm, 1e-8)
    ux, uy = dx / norm_safe, dy / norm_safe
    t = jnp.linspace(0.0, 1.0, mid_num)
    mx = axf[:, None, None] + dx[:, :, None] * t
    my = ayf[:, None, None] + dy[:, :, None] * t
    h, w = paf_xy.shape[0], paf_xy.shape[1]
    ix = jnp.clip(jnp.round(mx).astype(jnp.int32), 0, w - 1)
    iy = jnp.clip(jnp.round(my).astype(jnp.int32), 0, h - 1)
    flat = paf_xy.reshape(h * w, 2)
    lin = (iy * w + ix).reshape(-1)
    sampled = jnp.take(flat, lin, axis=0).reshape(*ix.shape, 2)
    score_mid = sampled[..., 0] * ux[:, :, None] + sampled[..., 1] * uy[:, :, None]
    mean = score_mid.mean(axis=-1)
    prior = mean + jnp.minimum(0.5 * height / norm_safe - 1.0, 0.0)
    crit1 = (score_mid > thre2).sum(axis=-1) > min_ratio * mid_num
    ok = crit1 & (prior > 0) & av[:, None] & bv[None, :] & (norm > 1e-8)
    return prior, ok


def make_score_take(k_pairs):
    from tpupose import topology

    part_pairs, paf_chans = topology.decode_limb_tables()
    part_pairs = jnp.asarray(part_pairs)
    paf_chans = jnp.asarray(paf_chans)

    def score(paf, peaks):
        h = paf.shape[0]
        sl = lambda t: t[:, :k_pairs]
        xs_a = sl(peaks["xs"][part_pairs[:, 0]])
        ys_a = sl(peaks["ys"][part_pairs[:, 0]])
        sc_a = sl(peaks["scores"][part_pairs[:, 0]])
        va_a = sl(peaks["valid"][part_pairs[:, 0]])
        xs_b = sl(peaks["xs"][part_pairs[:, 1]])
        ys_b = sl(peaks["ys"][part_pairs[:, 1]])
        sc_b = sl(peaks["scores"][part_pairs[:, 1]])
        va_b = sl(peaks["valid"][part_pairs[:, 1]])
        paf_limb = jnp.stack(
            [paf[:, :, paf_chans[:, 0]], paf[:, :, paf_chans[:, 1]]], axis=-1)
        paf_limb = jnp.moveaxis(paf_limb, 2, 0)

        def one(paf_xy, ax, ay, asc, av, bx, by, bsc, bv):
            prior, ok = _pair_scores_take(
                paf_xy, ax, ay, asc, av, bx, by, bsc, bv, 10, 0.05, 0.8, float(h))
            n_a = av.sum().astype(jnp.int32)
            n_b = bv.sum().astype(jnp.int32)
            return PF._greedy_accept(prior, ok, n_a, n_b, k_pairs, 512)

        return jax.vmap(one)(paf_limb, xs_a, ys_a, sc_a, va_a, xs_b, ys_b, sc_b, va_b)

    return score


def main():
    print("backend:", jax.default_backend(), flush=True)
    _, heat, paf = synthetic_scene()
    heats = jnp.asarray(np.stack([heat] * 8))
    pafs = jnp.asarray(np.stack([paf] * 8))
    jpeaks = jax.jit(jax.vmap(
        lambda h: PK.find_peaks(h, max_peaks=96, sigma=3.0, thre1=0.1)))
    peaks = jax.device_get(jpeaks(heats))
    peaks = {k: jnp.asarray(v) for k, v in peaks.items()}

    base = jax.jit(jax.vmap(lambda p, pk: PF.score_limbs(
        p, pk, mid_num=10, thre2=0.05, min_ratio=0.8)))
    timeit("score current K=96", base, pafs, peaks)
    for kp in (96, 48, 32):
        fn = jax.jit(jax.vmap(make_score_take(kp)))
        timeit(f"score flat-take K={kp}", fn, pafs, peaks)

    # content parity of flat-take K=96 vs current
    a = jax.device_get(base(pafs, peaks))
    b = jax.device_get(jax.jit(jax.vmap(make_score_take(96)))(pafs, peaks))
    same = all(np.array_equal(np.asarray(a[i]), np.asarray(b[i])) for i in range(4))
    print("flat-take K=96 identical:", same, flush=True)

    # --- peaks decomposition ---------------------------------------------------
    blur_nms = jax.jit(jax.vmap(lambda h: PK.gaussian_blur(h[:, :, :18], 3.0)))
    timeit("peaks blur only", blur_nms, heats)

    def scores_only(h):
        parts = h[:, :, :18]
        smooth = PK.gaussian_blur(parts, 3.0)
        z = jnp.zeros_like(smooth)
        up = jnp.concatenate([z[:1], smooth[:-1]], axis=0)
        down = jnp.concatenate([smooth[1:], z[:1]], axis=0)
        left = jnp.concatenate([z[:, :1], smooth[:, :-1]], axis=1)
        right = jnp.concatenate([smooth[:, 1:], z[:, :1]], axis=1)
        is_peak = ((smooth >= up) & (smooth >= down) & (smooth >= left)
                   & (smooth >= right) & (smooth > 0.1))
        return jnp.where(is_peak, parts, -jnp.inf)

    sc = jax.jit(jax.vmap(scores_only))
    timeit("peaks blur+NMS (no topk)", sc, heats)

    def with_topk(h):
        s = scores_only(h)
        flat = s.reshape(-1, 18).T
        return jax.lax.top_k(flat, 96)

    timeit("peaks blur+NMS+topk", jax.jit(jax.vmap(with_topk)), heats)

    def with_approx(h):
        s = scores_only(h)
        flat = s.reshape(-1, 18).T
        return jax.lax.approx_max_k(flat, 96, recall_target=0.95,
                                    aggregate_to_topk=True)

    timeit("peaks blur+NMS+approx_max_k", jax.jit(jax.vmap(with_approx)), heats)


if __name__ == "__main__":
    main()
