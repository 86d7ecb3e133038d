"""Motion estimation / compensation, TPU-first.

The reference walks a 64-step spiral per macroblock with early exits
(motionEstimation, enc src:2073-2155).  Rebuilt as a dense batched
computation: all 64 candidate SADs for all MBs of a frame at once —
shape (64, mbh, mbw) — followed by an argmin that reproduces the
reference's selection rule exactly:

* first *strict* minimum in spiral order wins (comparison is `min > SAD`)
* except when two or more candidates have SAD == 0: the loop breaks at
  the *second* zero (the `else if (SAD==0)` branch only fires once min
  is already 0), so that candidate wins.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import SPIRAL
from .medians import median3, median3_mv_y


def spiral_search(cur_y: jnp.ndarray, pad_prev: jnp.ndarray, bs: int = 16) -> jnp.ndarray:
    """cur_y: (..., H, W) uint8 current frame; pad_prev: (..., H+2b, W+2b)
    padded previous reconstruction.  Returns mv (..., mbh, mbw, 2) int32
    in the reference sign convention mv = -(chosen offset), (x, y).
    """
    h, w = cur_y.shape[-2], cur_y.shape[-1]
    mbh, mbw = h // bs, w // bs
    lead = cur_y.shape[:-2]
    cur = cur_y.reshape(lead + (mbh, bs, mbw, bs))  # stay uint8: the SAD
    # loop is HBM-bandwidth-bound (64 reads of the padded frame), so the
    # absolute difference runs in u8 (max-min) and only the reduction
    # widens to int32

    # stack the 64 shifted windows: static slices, unrolled at trace time
    sads = []
    for (ox, oy) in np.asarray(SPIRAL):
        win = jax.lax.slice_in_dim(
            jax.lax.slice_in_dim(pad_prev, bs + int(oy), bs + int(oy) + h, axis=-2),
            bs + int(ox),
            bs + int(ox) + w,
            axis=-1,
        )
        win = win.reshape(lead + (mbh, bs, mbw, bs))
        diff = jnp.maximum(cur, win) - jnp.minimum(cur, win)  # |a-b| in u8
        sad = diff.astype(jnp.int32).sum(axis=(-3, -1))  # (..., mbh, mbw)
        sads.append(sad)
    sads = jnp.stack(sads, axis=-3)  # (..., 64, mbh, mbw)

    best = jnp.argmin(sads, axis=-3)  # first occurrence of the minimum
    zeros = sads == 0
    nz = jnp.cumsum(zeros, axis=-3)
    is_second_zero = zeros & (nz == 2)
    has_second = is_second_zero.any(axis=-3)
    second_idx = jnp.argmax(is_second_zero, axis=-3)
    best = jnp.where(has_second, second_idx, best)

    # numpy constant (a trace-time jnp constant would force a slow
    # device->host readback at lowering); mv = -(chosen offset)
    return jnp.take(-np.asarray(SPIRAL), best, axis=0)


def gather_pred(pad: jnp.ndarray, mv: jnp.ndarray, bs: int) -> jnp.ndarray:
    """Fetch per-MB (bs x bs) predictor blocks at origin - mv + pad.

    pad: (..., PH, PW); mv: (..., mbh, mbw, 2).  A flat gather — XLA turns
    it into a vectorized dynamic-gather; no per-block loop.
    """
    mbh, mbw = mv.shape[-3], mv.shape[-2]
    by = jnp.arange(mbh, dtype=jnp.int32) * bs
    bx = jnp.arange(mbw, dtype=jnp.int32) * bs
    ry = (by[:, None] - mv[..., 1] + bs).reshape(mv.shape[:-3] + (mbh * mbw,))
    rx = (bx[None, :] - mv[..., 0] + bs).reshape(mv.shape[:-3] + (mbh * mbw,))

    # vmapped dynamic_slice lowers to a gather of whole (bs, bs) tiles —
    # orders of magnitude cheaper on TPU than per-pixel flat gathers
    def slice_one(img, y0, x0):
        return jax.lax.dynamic_slice(img, (y0, x0), (bs, bs))

    per_mb = jax.vmap(slice_one, in_axes=(None, 0, 0))
    if pad.ndim == 2:
        out = per_mb(pad, ry, rx)
        return out.reshape(mbh, mbw, bs, bs)
    per_batch = jax.vmap(per_mb, in_axes=(0, 0, 0))
    out = per_batch(pad, ry, rx)
    return out.reshape(pad.shape[:-2] + (mbh, mbw, bs, bs))


def mv_diff_field(mv: jnp.ndarray) -> jnp.ndarray:
    """Differential MVs, fully parallel (mvPrediction enc src:2353-2425).

    The predictors use neighbors' *reconstructed* MVs, which equal the
    original MVs (ImvPrediction adds the identical predictor back), so the
    whole field vectorizes.  Includes the right-edge (l,ul,u) variant and
    the y-median typo.
    """
    mbh, mbw = mv.shape[-3], mv.shape[-2]
    x = mv[..., 0]
    y = mv[..., 1]

    def shift(a, dy, dx):
        return jnp.roll(jnp.roll(a, dy, axis=-2), dx, axis=-1)

    lx, ly = shift(x, 0, 1), shift(y, 0, 1)
    ux, uy = shift(x, 1, 0), shift(y, 1, 0)
    ulx, uly = shift(x, 1, 1), shift(y, 1, 1)
    urx, ury = shift(x, 1, -1), shift(y, 1, -1)

    col = jnp.arange(mbw)
    row = jnp.arange(mbh)
    is_right = col == mbw - 1
    # interior: right edge -> median(l, ul, u); else median(l, u, ur)
    bx = jnp.where(is_right, ulx, ux)
    by_ = jnp.where(is_right, uly, uy)
    cx = jnp.where(is_right, ux, urx)
    cy = jnp.where(is_right, uy, ury)
    px = median3(lx, bx, cx)
    py = median3_mv_y(ly, by_, cy, cx)

    px = jnp.where(row[:, None] == 0, lx, jnp.where(col[None, :] == 0, ux, px))
    py = jnp.where(row[:, None] == 0, ly, jnp.where(col[None, :] == 0, uy, py))
    px = px.at[..., 0, 0].set(8)
    py = py.at[..., 0, 0].set(8)
    return jnp.stack([x - px, y - py], axis=-1)
