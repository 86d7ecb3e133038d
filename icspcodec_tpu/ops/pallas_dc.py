"""Fused pallas DC-DPCM chains (forward quantizing + inverse).

The transform-domain DC prediction chain (reference: DPCM enc
src:851-1499 DC branches / decoder dec src:3643-3990) is the remaining
sequential lax.scan after the fused intra wavefront: a 56-step scan for
the CIF chroma grid and a 114-step scan for the inter luma grid, each
step a few microseconds of math under ~70 us of scan-step overhead.
This runs the whole chain as ONE pallas program using the same
shear/mod-NB diagonal row layout as ops/pallas_intra.py (lane
m = f*NB + gy%NB; static neighbor rotates; VMEM scratch history).

Math mirrors engine/wavefront.dc_dpcm_scan / idc_dpcm_scan
expression-for-expression on the fast f32 path:

  forward: resid = dc - pred;  t = floor/trunc(resid + 0.5)
           q = C-div(t, qstep);  dq = q*qstep + pred
  inverse: dq = iq + pred

with pred = the kind-coded DC predictor over already-dequantized
neighbor DCs (kind 0 -> 1024, 1 -> left, 2 -> up, 3 -> med(l,ul,u),
4 -> med(l,u,ur)); chroma quantizes with floor, luma with C truncation.

Equality vs the XLA scans: tests/test_pallas_intra.py (interpret) and
tests/test_tpu_chip.py (Mosaic).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..engine.wavefront import chroma_dc_kind, diag_layout, luma_dc_kind
from .pallas_intra import _cdiv, _dc_pred, _f32, _rows_unpack, _shear_pack


@functools.lru_cache(maxsize=None)
def _dc_tables(gh: int, gw: int, f: int, chroma: bool):
    """(nsteps, NB, Mp, kind_t, lane0_t) for the shear/mod-NB layout."""
    nsteps, nmax, _, _, _, _ = diag_layout(gh, gw)
    nb = nmax
    m = f * nb
    mp = -(-m // 128) * 128
    kind_grid = (chroma_dc_kind if chroma else luma_dc_kind)(gh, gw)

    kind = np.zeros((nsteps, nb), np.int32)
    for d in range(nsteps):
        lo = max(0, -(-(d - gw + 1) // 2))
        hi = min(gh - 1, d // 2)
        for gy in range(lo, hi + 1):
            kind[d, gy % nb] = kind_grid[gy, d - 2 * gy]

    kind_t = np.zeros((nsteps, 1, mp), np.int32)
    kind_t[:, 0, :m] = np.tile(kind, (1, f))
    lane0 = np.zeros((1, 1, mp), np.int32)
    lane0[0, 0, :m] = (np.arange(m) % nb == 0).astype(np.int32)
    return nsteps, nb, mp, kind_t, lane0


@functools.partial(
    jax.jit, static_argnames=("nb", "qstep", "chroma", "inverse", "interpret")
)
def _dc_rows_fused(vrows, kind_t, lane0_t, nb: int, qstep: int,
                   chroma: bool, inverse: bool, interpret: bool = False):
    """vrows: (nsteps, 1, Mp) f32 DC values (forward) or i32 dequantized
    residuals (inverse).  Returns (q_rows, dq_rows) i32 (forward) or
    (dq_rows, dq_rows) (inverse)."""
    nsteps, _, mp = vrows.shape
    wrap = mp - nb + 1

    def kernel(v_ref, kind_ref, l0_ref, q_ref, dq_ref, h1, h2, h3):
        d_id = pl.program_id(0)

        @pl.when(d_id == 0)
        def _init():
            for ref in (h1, h2, h3):
                ref[...] = jnp.zeros((1, mp), jnp.int32)

        is0 = l0_ref[0] != 0

        def up_lane(x):
            a = pltpu.roll(x, 1, axis=1)
            b = pltpu.roll(x, wrap, axis=1)
            return jnp.where(is0, b, a)

        l = h1[...]
        ur = up_lane(h1[...])
        u = up_lane(h2[...])
        ul = up_lane(h3[...])
        kind = kind_ref[0]
        pred = _dc_pred(kind, l, ul, u, ur)             # (1, Mp) i32

        vrow = v_ref[0]
        if inverse:
            dq = vrow + pred
            q = dq
        else:
            resid = vrow - _f32(pred)
            half = resid + 0.5
            t = (jnp.floor(half) if chroma else half).astype(jnp.int32)
            q = _cdiv(t, qstep)
            dq = q * qstep + pred
        q_ref[0] = q
        dq_ref[0] = dq

        h3[...] = h2[...]
        h2[...] = h1[...]
        h1[...] = dq

    row_spec = pl.BlockSpec((1, 1, mp), lambda d: (d, 0, 0), memory_space=pltpu.VMEM)
    fix_spec = pl.BlockSpec((1, 1, mp), lambda d: (0, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=[row_spec, row_spec, fix_spec],
        out_specs=(row_spec, row_spec),
        out_shape=(
            jax.ShapeDtypeStruct((nsteps, 1, mp), jnp.int32),
            jax.ShapeDtypeStruct((nsteps, 1, mp), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((1, mp), jnp.int32)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 2**20,
        ),
        interpret=interpret,
    )(vrows, kind_t, lane0_t)


def dc_dpcm_fused(dc: jnp.ndarray, qstep: int, chroma: bool,
                  interpret: bool = False):
    """Fused forward DC chain; same contract (and bits, fast f32 path) as
    wavefront.dc_dpcm_scan: dc (F, gh, gw) float -> (q, dq) int32."""
    fdim, gh, gw = dc.shape
    nsteps, nb, mp, kind_t, lane0 = _dc_tables(gh, gw, fdim, chroma)
    vrows = _shear_pack(dc.astype(jnp.float32)[..., None], gh, gw, nb, mp)
    q, dq = _dc_rows_fused(vrows, kind_t, lane0, nb, qstep, chroma,
                           False, interpret)
    return (
        _rows_unpack(q, fdim, gh, gw, nb)[..., 0],
        _rows_unpack(dq, fdim, gh, gw, nb)[..., 0],
    )


def idc_dpcm_fused(iq_dc: jnp.ndarray, chroma: bool, interpret: bool = False):
    """Fused inverse DC chain; same contract as wavefront.idc_dpcm_scan:
    iq_dc (F, gh, gw) int32 dequantized residuals -> dq (F, gh, gw) i32."""
    fdim, gh, gw = iq_dc.shape
    nsteps, nb, mp, kind_t, lane0 = _dc_tables(gh, gw, fdim, chroma)
    vrows = _shear_pack(iq_dc.astype(jnp.int32)[..., None], gh, gw, nb, mp)
    _, dq = _dc_rows_fused(vrows, kind_t, lane0, nb, 1, chroma,
                           True, interpret)
    return _rows_unpack(dq, fdim, gh, gw, nb)[..., 0]
