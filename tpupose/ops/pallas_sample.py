"""Fused scale-space point readout for the dense-crowd decode tiers.

The PAF line integral reads K*K*mid_num points per limb off the
scale-averaged pyramid (SURVEY.md C7). The sparse tiers (K <= 64) fuse
all midpoints into one weighted-one-hot matmul per scale
(``decode/scalespace.py::sample_avg``); the K=96 crowd tier cannot — its
row matrix would not fit — so round 3 left it chunking per midpoint
through HBM: every chunk materialises a (K^2, Hl) weight matrix, a
(K^2, Wl, C) row intermediate and a (K^2, Wl, 4) tap-hit tensor in HBM,
~100 GB of traffic per batch-8 decode, measured 289 ms (the 3.1x crowd
cliff in the round-3 dense-decode table).

This kernel evaluates the SAME chained bilinear (identical taps,
weights, clipping and f32 accumulation order as ``sample_chain``) with
every intermediate VMEM-resident:

  * points ride the LANES (blocks of ``_PBLK`` per grid step); the
    per-scale low-res maps (a few tens of KB) sit whole in VMEM,
    pre-transposed to (C*Wlp, Hlp) so the row selection is one
    MXU matmul  rowsT = mapT @ RS  with RS the (Hlp, P) weighted
    one-hot built on the VPU from the 4 y-taps;
  * the x-side weighted reduce multiplies the c-channel slice of
    ``rowsT`` by the (Wlp, P) x-tap weight matrix and contracts the
    sublane axis with a ones-row matmul — nothing ever leaves VMEM
    until the (C, P) result block is written.

Values match ``sample_avg`` to f32 rounding (tests pin 1e-5), so the
crowd tier keeps the same numeric contract as the sparse tiers.

Used by ``decode/paf.py`` when the point count exceeds the fuse-all
budget (the K>=96 tiers); ``TPUPOSE_PALLAS_SAMPLE=0`` restores the
chunked HBM path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PBLK = 3840          # points per grid step (30 * 128 lanes)
_HIGH = jax.lax.Precision.HIGHEST
_INTERPRET = False    # tests flip this to run the kernel on CPU


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _taps(q, size_mid: int, size_low: int, out_size: int, stride: int):
    """4 (idx, weight) taps of the chained bilinear along one axis.

    Mirrors ``scalespace._axis_taps`` exactly (clip semantics, duplicate
    taps carrying additive weight). q: (1, P) f32 of integer-valued
    output coordinates.
    """
    pos_mid = (q + 0.5) * (size_mid / out_size) - 0.5
    m0 = jnp.floor(pos_mid)
    f_mid = pos_mid - m0
    m0i = jnp.clip(m0.astype(jnp.int32), 0, size_mid - 1)
    m1i = jnp.clip(m0.astype(jnp.int32) + 1, 0, size_mid - 1)

    def low(mid_idx):
        pos_low = (mid_idx.astype(jnp.float32) + 0.5) / float(stride) - 0.5
        l0 = jnp.floor(pos_low)
        f = pos_low - l0
        l0i = jnp.clip(l0.astype(jnp.int32), 0, size_low - 1)
        l1i = jnp.clip(l0.astype(jnp.int32) + 1, 0, size_low - 1)
        return (l0i, l1i), (1.0 - f, f)

    (a0, a1), (wa0, wa1) = low(m0i)
    (b0, b1), (wb0, wb1) = low(m1i)
    w0 = 1.0 - f_mid
    w1 = f_mid
    return ((a0, w0 * wa0), (a1, w0 * wa1), (b0, w1 * wb0), (b1, w1 * wb1))


def _selmat(taps, rows: int, p: int):
    """(rows, P) f32 weight matrix: duplicates accumulate additively."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (rows, p), 0)
    m = jnp.zeros((rows, p), jnp.float32)
    for idx, w in taps:
        m = m + jnp.where(iota == idx, w, 0.0)
    return m


def _sample_kernel(shapes, out_hw, stride, nch, my_ref, mx_ref,
                   *refs):
    map_refs = refs[:-1]
    out_ref = refs[-1]
    p = my_ref.shape[-1]
    out_h, out_w = out_hw
    my = my_ref[0, :, :]                                   # (1, P)
    mx = mx_ref[0, :, :]

    accs = [jnp.zeros((1, p), jnp.float32) for _ in range(nch)]
    for s, (hl, wl, hlp, wlp, rh, rw) in enumerate(shapes):
        y_taps = _taps(my, rh, hl, out_h, stride)
        x_taps = _taps(mx, rw, wl, out_w, stride)
        rs = _selmat(y_taps, hlp, p)                       # (Hlp, P)
        xw = _selmat(x_taps, wlp, p)                       # (Wlp, P)
        rows_t = jax.lax.dot(                              # (C*Wlp, P)
            map_refs[s][:, :], rs,
            precision=_HIGH, preferred_element_type=jnp.float32,
        )
        ones = jnp.ones((1, wlp), jnp.float32)
        for c in range(nch):
            prod = rows_t[c * wlp:(c + 1) * wlp, :] * xw
            accs[c] = accs[c] + jax.lax.dot(
                ones, prod, precision=_HIGH,
                preferred_element_type=jnp.float32)

    inv_n = 1.0 / float(len(shapes))
    out_ref[0, :, :] = jnp.concatenate(accs, axis=0) * inv_n


def _prep_map(m: jnp.ndarray, hlp: int, wlp: int) -> jnp.ndarray:
    """(Hl, Wl, C) -> (C*Wlp, Hlp) f32, zero-padded."""
    hl, wl, c = m.shape[-3], m.shape[-2], m.shape[-1]
    mt = jnp.moveaxis(m.astype(jnp.float32), -1, -3)       # (..., C, Wl, Hl)
    mt = jnp.swapaxes(mt, -1, -2)                          # (..., C, Wl, Hl)
    pad = [(0, 0)] * (mt.ndim - 2) + [(0, wlp - wl), (0, hlp - hl)]
    mt = jnp.pad(mt, pad)
    return mt.reshape(*mt.shape[:-3], c * wlp, hlp)


def fused_sample_avg(space, iy: jnp.ndarray, ix: jnp.ndarray,
                     *, interpret: bool | None = None) -> jnp.ndarray:
    """Drop-in for ``scalespace.sample_avg`` at large point counts.

    space: ScaleSpace of per-scale (Hl, Wl, C) maps (C small — the
    per-limb PAF pair); iy/ix int32 of any shape S -> (*S, C) f32.
    vmap-compatible (the batch/limb dims become extra grid axes).
    """
    if interpret is None:
        interpret = _INTERPRET
    nch = space.maps[0].shape[-1]
    out_h, out_w = space.out_hw
    shape = iy.shape
    iyf = iy.reshape(-1).astype(jnp.float32)
    ixf = ix.reshape(-1).astype(jnp.float32)
    p_tot = iyf.shape[0]
    nblk = max(1, -(-p_tot // _PBLK))
    padded = nblk * _PBLK
    # Singleton sublane axis: Mosaic requires the block's last-two dims
    # to be (8k, 128k) or to EQUAL the array dims — a (1, PBLK) block
    # over an (nblk, PBLK) array is rejected on real TPU once nblk > 1
    # (interpret mode does not enforce this), so the point blocks ride
    # as (nblk, 1, PBLK) with the grid stepping the leading axis only.
    iyf = jnp.pad(iyf, (0, padded - p_tot)).reshape(nblk, 1, _PBLK)
    ixf = jnp.pad(ixf, (0, padded - p_tot)).reshape(nblk, 1, _PBLK)

    shapes = []
    maps_t = []
    for m, (rh, rw) in zip(space.maps, space.geoms):
        hl, wl = m.shape[-3], m.shape[-2]
        hlp, wlp = _round_up(hl, 8), _round_up(wl, 8)
        shapes.append((hl, wl, hlp, wlp, rh, rw))
        maps_t.append(_prep_map(m, hlp, wlp))

    kern = functools.partial(
        _sample_kernel, tuple(shapes), (out_h, out_w), 8, nch)
    out = pl.pallas_call(
        kern,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, 1, _PBLK), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _PBLK), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec(mt.shape[-2:], lambda j: (0, 0),
                         memory_space=pltpu.VMEM)
            for mt in maps_t
        ],
        out_specs=pl.BlockSpec((1, nch, _PBLK), lambda j: (j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nblk, nch, _PBLK), jnp.float32),
        interpret=interpret,
    )(iyf, ixf, *maps_t)

    flat = jnp.moveaxis(out, -2, -1).reshape(padded, nch)[:p_tot]
    return flat.reshape(*shape, nch)
