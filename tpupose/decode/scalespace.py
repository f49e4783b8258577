"""Scale-space PAF readout: sample the pyramid without materialising it.

The reference decode (SURVEY.md C5/C7) upsamples every pyramid scale's
PAF output to image resolution, averages, then reads ~K*K*mid_num points
off the averaged map. Both steps are linear, so the averaged full-res
value at any pixel equals the average over scales of the chained
bilinear interpolant (``ops.image.upsample_to``: x8 bilinear -> crop ->
bilinear to image size) evaluated at that pixel. This module evaluates
that interpolant directly on the low-res network outputs:

  * the 38-channel x8 upsample + average (the dominant share of the
    pyramid's post-CNN HBM traffic) is never materialised, and
  * the point readout touches (Hl, Wl) maps instead of (H, W) — 64x
    fewer values resident, ~8x smaller one-hot matmuls.

Each output point depends on <= 4 low-res taps per axis (2 taps of the
final resize, each hitting 2 taps of the x8 upsample), so a point eval
is a 16-tap separable weighted sum, expressed as a weighted one-hot
row-selection matmul (MXU) + masked column reduce — the same TPU-native
pattern as ``paf._sample_points_onehot``, with interpolation weights in
place of the 1.0s. Weights/accumulation are f32, so values match the
materialised bf16 pipeline to ~bf16 eps (tests pin the f32 contract to
1e-5 and end-to-end people parity).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
class ScaleSpace:
    """Per-scale low-res maps + static resize geometry.

    ``maps``: one array per pyramid scale, (Hl, Wl, C) — or (N, Hl, Wl, C)
    batched, or (L, Hl, Wl, c) per-limb — where (Hl, Wl) is the PADDED
    network-output grid (padded_size / stride).
    ``geoms``: matching static tuples (rh, rw) — the pre-pad resize size
    each scale's x8 upsample is cropped to (``scale_sizes`` rh/rw).
    ``out_hw``: the image size the decode's coordinates live in.
    """

    def __init__(self, maps, geoms, out_hw):
        self.maps = tuple(maps)
        self.geoms = tuple(tuple(g) for g in geoms)
        self.out_hw = tuple(out_hw)
        if len(self.maps) != len(self.geoms):
            raise ValueError("one (rh, rw) geom per scale map")

    def tree_flatten(self):
        return self.maps, (self.geoms, self.out_hw)

    @classmethod
    def tree_unflatten(cls, aux, children):
        geoms, out_hw = aux
        obj = object.__new__(cls)
        obj.maps = tuple(children)
        obj.geoms = geoms
        obj.out_hw = out_hw
        return obj

    def map_scales(self, fn) -> "ScaleSpace":
        """Apply ``fn`` to every scale's map, keeping the geometry."""
        return ScaleSpace([fn(m) for m in self.maps], self.geoms, self.out_hw)


def _axis_taps(q: jnp.ndarray, size_mid: int, size_low: int, out_size: int,
               stride: int = 8):
    """Low-res taps/weights of the chained bilinear along one axis.

    ``upsample_to`` resizes (size_low -> size_low*stride), crops to
    ``size_mid``, then resizes to ``out_size`` — all half-pixel-centre
    bilinear with edge clamp (jax.image.resize "linear" renormalisation
    is identical to clamping for a 2-tap kernel). For an integer output
    coordinate ``q`` this composes to <= 4 taps. Returns (idx, w) of
    shape (*q.shape, 4); duplicate (clamped) indices carry additive
    weights.
    """
    qf = q.astype(jnp.float32)
    pos_mid = (qf + 0.5) * (size_mid / out_size) - 0.5
    m0 = jnp.floor(pos_mid)
    f_mid = pos_mid - m0
    m0i = jnp.clip(m0.astype(jnp.int32), 0, size_mid - 1)
    m1i = jnp.clip(m0.astype(jnp.int32) + 1, 0, size_mid - 1)

    def low_taps(mid_idx):
        pos_low = (mid_idx.astype(jnp.float32) + 0.5) / float(stride) - 0.5
        l0 = jnp.floor(pos_low)
        f = pos_low - l0
        l0i = jnp.clip(l0.astype(jnp.int32), 0, size_low - 1)
        l1i = jnp.clip(l0.astype(jnp.int32) + 1, 0, size_low - 1)
        return (l0i, l1i), (1.0 - f, f)

    (a0, a1), (wa0, wa1) = low_taps(m0i)
    (b0, b1), (wb0, wb1) = low_taps(m1i)
    w0 = 1.0 - f_mid
    w1 = f_mid
    idx = jnp.stack([a0, a1, b0, b1], axis=-1)
    w = jnp.stack([w0 * wa0, w0 * wa1, w1 * wb0, w1 * wb1], axis=-1)
    return idx, w


def _weighted_onehot(idx: jnp.ndarray, w: jnp.ndarray, size: int) -> jnp.ndarray:
    """(P, 4) taps -> (P, size) f32 row-weight matrix (duplicates add)."""
    p = idx.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (p, size, 1), 1)
    hits = (iota == idx[:, None, :]).astype(jnp.float32)     # (P, size, 4)
    return (hits * w[:, None, :]).sum(axis=-1)               # (P, size)


def sample_chain(
    map_low: jnp.ndarray,   # (Hl, Wl, C)
    iy: jnp.ndarray,
    ix: jnp.ndarray,
    rh: int,
    rw: int,
    out_h: int,
    out_w: int,
    stride: int = 8,
) -> jnp.ndarray:
    """``upsample_to(map_low, rh, rw, out_h, out_w)[iy, ix]`` evaluated
    directly on the low-res map. iy/ix int32 of any shape S -> (*S, C),
    f32. Row selection rides the MXU (weighted one-hot matmul at HIGHEST
    precision); the column reduce runs on the VPU.
    """
    hl, wl, c = map_low.shape
    shape = iy.shape
    iyf = iy.reshape(-1)
    ixf = ix.reshape(-1)
    p = iyf.shape[0]
    y_idx, y_w = _axis_taps(iyf, rh, hl, out_h, stride)
    x_idx, x_w = _axis_taps(ixf, rw, wl, out_w, stride)
    oh_y = _weighted_onehot(y_idx, y_w, hl)                  # (P, Hl)
    rows = jax.lax.dot(
        oh_y,
        map_low.astype(jnp.float32).reshape(hl, wl * c),
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(p, wl, c)
    oh_x = _weighted_onehot(x_idx, x_w, wl)                  # (P, Wl)
    out = (rows * oh_x[:, :, None]).sum(axis=1)              # (P, C)
    return out.reshape(*shape, c)


def _linear_resize_matrix(n_out: int, n_in: int) -> "np.ndarray":
    """(n_out, n_in) weights of a half-pixel-centre 2-tap linear resize
    (cv2.INTER_LINEAR / jax.image.resize(antialias=False) semantics;
    clamped edge taps accumulate)."""
    import numpy as np

    m = np.zeros((n_out, n_in), np.float64)
    scale = n_in / n_out
    for i in range(n_out):
        src = (i + 0.5) * scale - 0.5
        j0 = int(np.floor(src))
        f = src - j0
        m[i, min(max(j0, 0), n_in - 1)] += 1.0 - f
        m[i, min(max(j0 + 1, 0), n_in - 1)] += f
    return m


def resize_chain_matrix(size_low: int, rh: int, out_size: int,
                        stride: int = 8) -> "np.ndarray":
    """(out_size, size_low) f32 matrix of ``upsample_to`` along one axis:
    x``stride`` bilinear -> crop to ``rh`` -> bilinear to ``out_size``.
    The whole chain is linear, so it IS a matrix; building it once at
    trace time turns the per-scale upsample into an MXU matmul."""
    import numpy as np

    w1 = _linear_resize_matrix(size_low * stride, size_low)[:rh]
    w2 = _linear_resize_matrix(out_size, rh)
    return np.asarray(w2 @ w1, np.float32)


def gaussian_reflect_matrix(size: int, sigma: float) -> "np.ndarray":
    """(size, size) f32 matrix of the scipy-'reflect' gaussian blur along
    one axis (numpy 'symmetric' border: d c b a | a b c d | d c b a)."""
    import numpy as np

    from tpupose.decode.peaks import gaussian_kernel1d

    k = gaussian_kernel1d(sigma).astype(np.float64)
    r = (len(k) - 1) // 2
    m = np.zeros((size, size), np.float64)
    for i in range(size):
        for t in range(-r, r + 1):
            j = i + t
            while j < 0 or j >= size:
                if j < 0:
                    j = -1 - j
                if j >= size:
                    j = 2 * size - 1 - j
            m[i, j] += k[t + r]
    return m.astype(np.float32)


def pyramid_heat_maps(
    space: ScaleSpace, sigma: float
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(averaged, blurred-averaged) full-res maps from per-scale low-res.

    The peaks stage needs two (H, W, C) maps: the scale-averaged heatmap
    (peak scores) and its sigma-blurred version (NMS). Upsample, average
    and blur are all linear, so both are per-scale products with
    CONSTANT weight matrices:

        avg  = sum_s  Wy_s @ M_s @ Wx_s^T / n
        blur = sum_s (G @ Wy_s) @ M_s @ (G @ Wx_s)^T / n

    — a handful of small MXU matmuls per scale instead of materialising
    four per-scale full-res upsamples and a 25-tap separable conv.
    Accepts (Hl, Wl, C) or batched (N, Hl, Wl, C) maps.
    """
    out_h, out_w = space.out_hw
    n = float(len(space.maps))
    gy = gaussian_reflect_matrix(out_h, sigma)
    gx = gaussian_reflect_matrix(out_w, sigma)
    avg = None
    blur = None
    for m, (rh, rw) in zip(space.maps, space.geoms):
        hl, wl = m.shape[-3], m.shape[-2]
        wy = resize_chain_matrix(hl, rh, out_h)
        wx = resize_chain_matrix(wl, rw, out_w)
        m32 = m.astype(jnp.float32)

        def apply(left, right, x=m32):
            return jnp.einsum(
                "yh,...hwc,xw->...yxc",
                jnp.asarray(left),
                x,
                jnp.asarray(right),
                precision=jax.lax.Precision.HIGHEST,
            )

        a = apply(wy, wx) / n
        b = apply(gy @ wy, gx @ wx) / n
        avg = a if avg is None else avg + a
        blur = b if blur is None else blur + b
    return avg, blur


def sample_avg(space: ScaleSpace, iy: jnp.ndarray, ix: jnp.ndarray) -> jnp.ndarray:
    """Scale-averaged pyramid value at integer image coords (iy, ix).

    Equals ``mean_s(upsample_to(maps[s], ...))[iy, ix]`` (linearity), the
    exact quantity the materialised product path reads — computed without
    ever building the full-res maps.
    """
    out_h, out_w = space.out_hw
    n = float(len(space.maps))
    acc = None
    for m, (rh, rw) in zip(space.maps, space.geoms):
        v = sample_chain(m, iy, ix, rh, rw, out_h, out_w)
        acc = v if acc is None else acc + v
    return acc / n
