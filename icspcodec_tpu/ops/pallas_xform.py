"""Fused pallas FORWARD transform chain: DCT + DC-DPCM + quant +
zig-zag + dequant + IDCT as ONE kernel.

(An inverse-chain twin was built and REMOVED: at decode batch shapes it
measured 5x slower than the batched XLA composition + fused DC kernel —
0.50 vs 0.10 ms per 30 CIF frames, tools/probe_r5_inter.py — because
the inverse has no mode/quant logic for fusion to save and the rows
relayout costs more than the launch overhead it removes.  The forward
chain earns its fusion inside the encode GOP scan, where it replaced
several launches plus a zig-zag gather and an acflag reduction.)

The inter luma residual chain and the chroma chain (intra and inter,
reference: Quantization enc src:2780 / CQuantization :4642, DPCM DC
branches :851-1499, zigzagScanning :3014) previously ran as an XLA
batched pipeline around the fused DC-DPCM kernel (ops/pallas_dc.py):
per frame-step that is several kernel launches plus a full-grid zig-zag
gather and an acflag reduction pass.  These kernels run the whole chain
in one pallas program over the shear/mod-NB diagonal row layout of
ops/pallas_intra.py — the only sequential dependency is the
transform-domain DC prediction, whose dequantized-DC history lives in
VMEM scratch exactly like ops/pallas_dc.py.

Per-step math is expression-for-expression the fast (f32) XLA path:

  d   = M_f @ x                       (DEFAULT MXU precision == einsum)
  dc0 = d[0] - pred(kind; dq history)
  t   = floor(v + 0.5)  [chroma]  |  (int)(v + 0.5)  [luma]
  q   = C-div(t, qdc | qac);  sc = P_zz @ q  (exact split matmuls)
  iq  = q*qac,  iq[0] = q[0]*qdc + pred;  r = M_i @ iq

The reconstruction output regime is static: inter luma emits
trunc(r) int16 rows ((int) cast of the IDCT, mergeBlock enc src:4812);
chroma emits raw float32 rows — the reference adds the predictor BEFORE
its (int) cast, and f32 addition can round across an integer boundary,
so the engine must perform `pred + r` itself in the original order to
stay bit-exact.

Equality vs the XLA composition is pinned by tests/test_pallas_intra.py
(interpret) and on-chip by tests/test_tpu_chip.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_dc import _dc_tables
from .pallas_intra import (
    _HI, _cdiv, _dc_pred, _f32, _mm, _perm64, _rows_unpack, _shear_pack,
    _zz_matrix,
)
from .transforms import _fdct_matrix, _idct_matrix, _table_key


@functools.partial(
    jax.jit,
    static_argnames=("nb", "qdc", "qac", "chroma", "table_key", "interpret"),
)
def _xform_rows_fused(vrows, kind_t, lane0_t, nb: int, qdc: int, qac: int,
                      chroma: bool, table_key: str, interpret: bool = False):
    """vrows: (nsteps, 64, Mp) int16 input blocks (chroma pixels or inter
    residuals) in yx order.  Returns (sc, acf, r):
      sc  (nsteps, 64, Mp) int16  quantized symbols in zig-zag order
      acf (nsteps, 1, Mp)  int32  AC-empty flag
      r   (nsteps, 64, Mp) int16 trunc(idct) [luma] or float32 idct [chroma]
    """
    nsteps, _, mp = vrows.shape
    m_f = _fdct_matrix(table_key, "float32")
    m_i = _idct_matrix(table_key, "float32")
    m_z = _zz_matrix(inverse=False)
    wrap = mp - nb + 1

    def kernel(v_ref, kind_ref, l0_ref, mf_ref, mi_ref, mz_ref,
               sc_ref, acf_ref, r_ref, h1, h2, h3):
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
        pred = _dc_pred(kind_ref[0], l, ul, u, ur)      # (1, Mp) i32

        yx1 = jax.lax.broadcasted_iota(jnp.int32, (64, 1), 0)
        row0 = yx1 == 0

        x = _f32(v_ref[0].astype(jnp.int32))            # |x| <= 255: exact
        d = _mm(mf_ref[...], x)                         # (64, Mp) f32
        d = jnp.where(row0, d - jnp.broadcast_to(_f32(pred), (64, mp)), d)
        half = d + 0.5
        # chroma floors, luma truncates toward zero ((int) cast)
        t = (jnp.floor(half) if chroma else half).astype(jnp.int32)
        q = jnp.where(row0, _cdiv(t, qdc), _cdiv(t, qac))
        iq = jnp.where(
            row0, q * qdc + jnp.broadcast_to(pred, (64, mp)), q * qac
        )
        new_dq = _mm(_f32(row0).T, _f32(iq), _HI).astype(jnp.int32)
        r = _mm(mi_ref[...], _f32(iq))                  # (64, Mp) f32

        sczz = _perm64(mz_ref, q)
        nz = jnp.where(row0, 0, (sczz != 0).astype(jnp.int32))
        acf = (jnp.sum(nz, axis=0, keepdims=True) == 0).astype(jnp.int32)

        sc_ref[0] = sczz.astype(jnp.int16)
        acf_ref[0] = acf
        if chroma:
            r_ref[0] = r                                # raw f32 (see module doc)
        else:
            r_ref[0] = r.astype(jnp.int32).astype(jnp.int16)  # trunc to zero

        h3[...] = h2[...]
        h2[...] = h1[...]
        h1[...] = new_dq

    row_spec = lambda r: pl.BlockSpec((1, r, mp), lambda d: (d, 0, 0), memory_space=pltpu.VMEM)
    fix_spec = lambda r: pl.BlockSpec((1, r, mp), lambda d: (0, 0, 0), memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec((64, 64), lambda d: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=[row_spec(64), row_spec(1), fix_spec(1),
                  mat_spec, mat_spec, mat_spec],
        out_specs=(row_spec(64), row_spec(1), row_spec(64)),
        out_shape=(
            jax.ShapeDtypeStruct((nsteps, 64, mp), jnp.int16),
            jax.ShapeDtypeStruct((nsteps, 1, mp), jnp.int32),
            jax.ShapeDtypeStruct(
                (nsteps, 64, mp), jnp.float32 if chroma else jnp.int16
            ),
        ),
        scratch_shapes=[pltpu.VMEM((1, mp), jnp.int32)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret,
    )(vrows, kind_t, lane0_t, m_f, m_i, m_z)


def xform_fwd_fused(blocks: jnp.ndarray, qdc: int, qac: int, chroma: bool,
                    table, interpret: bool = False, r_plane: bool = False):
    """Forward chain for (F, gh, gw, 8, 8) int blocks (chroma pixels or
    inter luma residuals, |v| <= 255).  Returns dict(scan (F,gh,gw,64)
    i16 zig-zag, acflag (F,gh,gw) i32, r) where r is trunc(idct) int32
    blocks [luma] or float32 idct blocks [chroma].  r_plane=True (luma)
    returns r as ready (F, gh*8, gw*8) planes instead — one fewer
    relayout pass for callers reconstructing whole frames."""
    from .pallas_intra import _rows_unpack_plane

    fdim, gh, gw = blocks.shape[:3]
    nsteps, nb, mp, kind_t, lane0 = _dc_tables(gh, gw, fdim, chroma)
    vrows = _shear_pack(
        blocks.reshape(fdim, gh, gw, 64).astype(jnp.int16), gh, gw, nb, mp
    )
    sc, acf, r = _xform_rows_fused(
        vrows, kind_t, lane0, nb, qdc, qac, chroma,
        _table_key(np.asarray(table)), interpret,
    )
    out = dict(
        scan=_rows_unpack(sc, fdim, gh, gw, nb),
        acflag=_rows_unpack(acf, fdim, gh, gw, nb)[..., 0],
    )
    if r_plane and not chroma:
        out["r_plane"] = _rows_unpack_plane(r, fdim, gh, gw, nb).astype(jnp.int32)
    else:
        rg = _rows_unpack(r, fdim, gh, gw, nb)
        out["r"] = (rg if chroma else rg.astype(jnp.int32)).reshape(
            fdim, gh, gw, 8, 8
        )
    return out
