"""Legacy slice-based pallas ME/MC kernels — TEST FIXTURES ONLY.

Moved out of ops/pallas_me.py (r4 verdict ask #7): these are the
original slice-based formulations kept as interpret-mode spec oracles.
They are NOT production code and MUST NOT run compiled on this
environment's v5e Mosaic: compiled sad_sweep returned wrong SAD sums
(mis-lowered misaligned VMEM slicing) and mc_gather's per-MB dynamic
sublane slicing (offsets not provably multiples of 8) is rejected
outright.  The production kernels (ops/pallas_me.py) avoid misaligned
slicing entirely via pltpu.roll + 0/1 block-sum matmuls.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from icspcodec_tpu.constants import SPIRAL



def _col_mask(w: int, mbw: int, bs: int) -> np.ndarray:
    """(w, mbw) 0/1 matrix summing bs-wide column groups via the MXU."""
    return np.kron(np.eye(mbw, dtype=np.float32), np.ones((bs, 1), np.float32))


@functools.partial(jax.jit, static_argnames=("interpret",))
def sad_sweep(cur: jnp.ndarray, pad: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """cur: (G, H, W) uint8; pad: (G, H+32, W+32) uint8.
    Returns SADs (G, 64, mbh, mbw) int32 in spiral order."""
    g, h, w = cur.shape
    mbh, mbw = h // 16, w // 16
    mask = _col_mask(w, mbw, 16)
    offsets = [(int(ox), int(oy)) for ox, oy in np.asarray(SPIRAL)]

    def kernel(cur_ref, pad_ref, mask_ref, out_ref):
        # pixel arithmetic in f32: Mosaic (v5e) has no vector i16 abs/max
        c = cur_ref[0].astype(jnp.int32).astype(jnp.float32)
        m = mask_ref[:]
        for o, (ox, oy) in enumerate(offsets):
            win = pad_ref[0, 16 + oy:16 + oy + h, 16 + ox:16 + ox + w].astype(jnp.int32).astype(jnp.float32)
            d = jnp.abs(c - win)
            dr = d.reshape(mbh, 16, w).sum(axis=1)          # (mbh, w)
            s = jnp.dot(dr, m, preferred_element_type=jnp.float32)
            out_ref[0, o] = s.astype(jnp.int32)

    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h + 32, w + 32), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, mbw), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 64, mbh, mbw), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((g, 64, mbh, mbw), jnp.int32),
        interpret=interpret,
    )(cur, pad, jnp.asarray(mask))


@functools.partial(jax.jit, static_argnames=("bs", "interpret"))
def mc_gather(pad: jnp.ndarray, mv: jnp.ndarray, bs: int, interpret: bool = False) -> jnp.ndarray:
    """pad: (G, H+2bs, W+2bs) uint8; mv: (G, mbh, mbw, 2) int32.
    Returns predictor blocks (G, mbh, mbw, bs, bs) int32."""
    g, mbh, mbw = mv.shape[0], mv.shape[1], mv.shape[2]
    h, w = mbh * bs, mbw * bs

    def kernel(mv_ref, pad_ref, out_ref):
        def body(i, _):
            by = i // mbw
            bx = i % mbw
            ry = by * bs - mv_ref[0, by, bx, 1] + bs
            rx = bx * bs - mv_ref[0, by, bx, 0] + bs
            blk = pad_ref[0, pl.ds(ry, bs), pl.ds(rx, bs)]
            out_ref[0, by, bx] = blk.astype(jnp.int32)
            return 0

        jax.lax.fori_loop(0, mbh * mbw, body, 0)

    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, mbh, mbw, 2), lambda i: (i, 0, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h + 2 * bs, w + 2 * bs), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, mbh, mbw, bs, bs), lambda i: (i, 0, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((g, mbh, mbw, bs, bs), jnp.int32),
        interpret=interpret,
    )(mv, pad)
