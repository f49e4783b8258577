"""Fused VGG block-1 Pallas kernel: conv1_1 -> relu -> conv1_2 -> relu
-> 2x2 maxpool in ONE pass over the image (SURVEY C2 layer contract;
round-4 VERDICT next #3 — the last measured perf frontier).

Why XLA loses here: conv1_1 contracts only 3x3x3 = 27 values per output
pixel. In NHWC the 3 input channels sit on the lane (minor) dimension,
so every layout XLA picks pads 3 -> 128 lanes and the MXU runs at ~1.4%
MFU (fwd_profile_r3: 1.36 ms at 368^2 where HBM speed-of-light is
~25 us); conv1_2 then re-reads and re-writes the full-resolution 64-
channel activation (17 MB at 368^2) from HBM, and the pool reads it a
third time. The round-4 space-to-depth fold attacked the padding at the
XLA level and lost (0.94x — structural zeros quadruple the FLOPs).

This kernel instead changes the LAYOUT: channels ride the sublane
dimension and image WIDTH rides the lanes, so a conv row becomes a
small matmul

    out_row(64, W) = W^T(64, taps) @ A(taps, W)

where A stacks the 9 (dy, dx)-shifted copies of the input rows
(im2col on sublanes, lane-shifts via ``pltpu.roll``) — K = 27 (padded
32) for conv1_1 and K = 576 for conv1_2, both MXU-shaped. The kernel
streams row-blocks of the image top-to-bottom, keeping the conv1_1
activation rows it still needs in VMEM scratch (ring of one row-block +
one carry row), so the full-res 64-channel intermediate NEVER touches
HBM: per image the kernel reads H*W*3 once and writes the pooled
H/2 * W * 64 once.

Boundary semantics match SAME padding exactly: row taps outside
[0, H) are masked to zero per row-block position, column taps wrap
through the zeroed lane-padding (lanes >= W are kept zero in every
stored row, so a +-1 ``roll`` pulls in zeros at both edges).

Inference-only (no custom VJP): the estimator enables it; the trainer
keeps XLA's fused conv+relu path, which it can differentiate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TR = 8          # conv rows per grid step (must divide H; pooled rows TR/2)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _shift(row: jnp.ndarray, dx: int) -> jnp.ndarray:
    """Lane-shift so position x holds input column x + dx - 1.

    With all lanes >= W zeroed, the circular wrap injects exactly the
    zeros SAME padding wants at both column edges (W + 2 <= Wle).
    """
    if dx == 1:
        return row
    # pltpu.roll wants non-negative shifts (left-by-1 == right-by-(L-1))
    # and this backend's Mosaic only rotates 32-bit lanes — rotate an
    # f32 view and cast back (the casts are noise next to the matmuls)
    shift = (1 - dx) % row.shape[-1]
    if row.dtype.itemsize == 4:
        return pltpu.roll(row, shift, axis=row.ndim - 1)
    return pltpu.roll(
        row.astype(jnp.float32), shift, axis=row.ndim - 1
    ).astype(row.dtype)


def _block1_kernel(S, H, W, n_out, xb, w1t, b1, w2t, b2, out,
                   carry_in, prev_in, c1_carry, c1_prev, c1_cur, pool_buf):
    s = pl.program_id(1)
    Wle = xb.shape[-1]
    cdt = xb.dtype
    lane = jax.lax.broadcasted_iota(jnp.int32, (n_out, Wle), 1)
    lane_mask = (lane < W).astype(jnp.float32)

    # --- phase A: conv1_1 rows y = (s-1)*TR + i -------------------------
    @pl.when((s >= 1) & (s <= S))
    def _():
        # rows (s-1)*TR - 1 .. s*TR  (carry row + previous block + first
        # row of this block). At s == S the input block is clamped to
        # S-1, so the trailing row is garbage — masked below (y+1 == H).
        in_ext = jnp.concatenate([carry_in[:], prev_in[:], xb[0, 0:1]], 0)
        top = s == 1     # row -1 is SAME-padding zero (and masks the
        bot = s == S     # uninitialized carry); row H likewise
        for i in range(_TR):
            taps = []
            for dy in range(3):
                row = in_ext[i + dy]                       # (3, Wle)
                if dy == 0 and i == 0:
                    row = jnp.where(top, jnp.zeros_like(row), row)
                if dy == 2 and i == _TR - 1:
                    row = jnp.where(bot, jnp.zeros_like(row), row)
                for dx in range(3):
                    taps.append(_shift(row, dx))
            a1 = jnp.concatenate(
                taps + [jnp.zeros((5, Wle), cdt)], 0)      # (32, Wle)
            o = jnp.dot(w1t[:], a1, preferred_element_type=jnp.float32)
            o = jnp.maximum(o + b1[:], 0.0) * lane_mask
            c1_cur[i] = o.astype(cdt)

    # --- phase B: conv1_2 + pool rows y2 = (s-2)*TR + i ------------------
    @pl.when((s >= 2) & (s <= S + 1))
    def _():
        c1_ext = jnp.concatenate(
            [c1_carry[:], c1_prev[:], c1_cur[0:1]], 0)
        top = s == 2
        bot = s == S + 1
        for i in range(_TR):
            taps = []
            for dy in range(3):
                row = c1_ext[i + dy]                       # (64, Wle)
                if dy == 0 and i == 0:
                    row = jnp.where(top, jnp.zeros_like(row), row)
                if dy == 2 and i == _TR - 1:
                    row = jnp.where(bot, jnp.zeros_like(row), row)
                for dx in range(3):
                    taps.append(_shift(row, dx))
            a2 = jnp.concatenate(taps, 0)                  # (576, Wle)
            o2 = jnp.dot(w2t[:], a2, preferred_element_type=jnp.float32)
            o2 = jnp.maximum(o2 + b2[:], 0.0)
            if i % 2 == 0:
                pool_buf[:] = o2
            else:
                m = jnp.maximum(pool_buf[:], o2)
                pm = jnp.maximum(m, _shift(m, 2))   # max(col x, col x+1)
                out[0, i // 2] = pm.astype(out.dtype)

    # --- phase C: advance the carries ------------------------------------
    carry_in[:] = prev_in[_TR - 1:_TR]
    prev_in[:] = xb[0]
    c1_carry[:] = c1_prev[_TR - 1:_TR]
    c1_prev[:] = c1_cur[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_block1(x: jnp.ndarray, k1, b1, k2, b2,
                 *, interpret: bool = False) -> jnp.ndarray:
    """conv1_1+relu+conv1_2+relu+maxpool2x2, one HBM pass.

    x: (N, H, W, 3) normalized image (any float dtype; computed in
    bfloat16 like the nn.Conv path). k1: (3, 3, 3, 64), k2:
    (3, 3, 64, 64) HWIO, biases (64,). Returns (N, H/2, W/2, 64)
    bfloat16. Requires H % 8 == 0 and W % 2 == 0 (the caller falls back
    to the XLA path otherwise).
    """
    n, h, w, cin = x.shape
    assert cin == 3 and h % _TR == 0 and w % 2 == 0, (x.shape,)
    n_out = k1.shape[-1]
    wle = _round_up(w + 2, 128)
    cdt = jnp.bfloat16
    s_blocks = h // _TR

    # (N, H, W, 3) -> (N, H, 3, Wle), lanes >= W zero
    xt = jnp.transpose(x.astype(cdt), (0, 1, 3, 2))
    xt = jnp.pad(xt, ((0, 0), (0, 0), (0, 0), (0, wle - w)))

    # weights -> (out, taps) with taps ordered (dy, dx, c) to match the
    # kernel's A-matrix stacking; conv1_1 padded K 27 -> 32
    w1t = k1.astype(cdt).reshape(27, n_out).T
    w1t = jnp.pad(w1t, ((0, 0), (0, 5)))
    w2t = k2.astype(cdt).reshape(9 * k2.shape[2], n_out).T
    b1c = b1.astype(jnp.float32).reshape(n_out, 1)
    b2c = b2.astype(jnp.float32).reshape(n_out, 1)

    kern = functools.partial(_block1_kernel, s_blocks, h, w, n_out)
    out = pl.pallas_call(
        kern,
        grid=(n, s_blocks + 2),
        in_specs=[
            pl.BlockSpec(
                (1, _TR, 3, wle),
                lambda i, s: (i, jnp.minimum(s, s_blocks - 1), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w1t
            pl.BlockSpec(memory_space=pltpu.VMEM),   # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w2t
            pl.BlockSpec(memory_space=pltpu.VMEM),   # b2
        ],
        out_specs=pl.BlockSpec(
            (1, _TR // 2, n_out, wle),
            lambda i, s: (
                i, jnp.clip(s - 2, 0, s_blocks - 1), 0, 0),
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n, h // 2, n_out, wle), cdt),
        scratch_shapes=[
            pltpu.VMEM((1, 3, wle), cdt),           # carry_in
            pltpu.VMEM((_TR, 3, wle), cdt),         # prev_in
            pltpu.VMEM((1, n_out, wle), cdt),       # c1_carry
            pltpu.VMEM((_TR, n_out, wle), cdt),     # c1_prev
            pltpu.VMEM((_TR, n_out, wle), cdt),     # c1_cur
            pltpu.VMEM((n_out, wle), jnp.float32),  # pool_buf
        ],
        interpret=interpret,
    )(xt, w1t, b1c, w2t, b2c)

    # pooled columns live on even lanes; compact + back to NHWC
    return jnp.transpose(out[:, :, :, 0:w:2], (0, 1, 3, 2))


def block1_reference(x, k1, b1, k2, b2, dtype=jnp.bfloat16):
    """The XLA path this kernel replaces (parity oracle): two SAME
    convs + relus + 2x2/2 maxpool, bf16 like nn.Conv(dtype=bf16)."""
    dn = ("NHWC", "HWIO", "NHWC")
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), k1.astype(dtype), (1, 1), "SAME",
        dimension_numbers=dn)
    y = jnp.maximum(y + b1.astype(dtype), 0)
    y = jax.lax.conv_general_dilated(
        y, k2.astype(dtype), (1, 1), "SAME", dimension_numbers=dn)
    y = jnp.maximum(y + b2.astype(dtype), 0)
    return jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
