"""Fused pallas intra-luma wavefront (encode + decode fast paths).

The packed-diagonal XLA scan (engine/wavefront.intra_luma_scan_packed)
is scan-step latency-bound: 114 steps x ~70 us of per-step launch/fusion
overhead for CIF300 (~7.9 ms) against a ~0.7 ms bandwidth bound.  These
kernels run the ENTIRE wavefront as ONE pallas program: the grid
iterates the anti-diagonals sequentially (TPU grids execute in order),
per-step boundary state (right pixel column, bottom pixel row, mode,
dequantized DC — the only sequential dependencies) lives in VMEM scratch
across grid steps, and each step's block math runs on (64, M) tiles.

Lane layout — chosen so host<->kernel relayout needs NO gathers (XLA:TPU
lowers multi-dimensional gathers near-serially; an index-map gather
formulation of pack/unpack measured ~200x slower than the kernel):

    lane m = f * NB + (gy mod NB),   NB = nmax (max anti-diagonal length)

* Packing is a pure pad+reshape shear: padding each grid row to width
  L and re-viewing the flat buffer with row length L-2 shifts row gy
  left by 2*gy — exactly the d = 2*gy+gx anti-diagonal schedule — and a
  sum over gh/NB row groups folds gy down to gy mod NB (each (step,
  residue) holds at most one diagonal cell, the rest are zeros, so the
  fold is exact).  Unpacking inverts it with a tile + the reverse
  reshape trick.  Everything is pad/reshape/transpose/reduce — no
  gathers.  The zig-zag (and inverse) permutations are the existing
  production constant-index ops applied on the grid-shaped arrays.
* Neighbor reads become STATIC lane rotates: left neighbors live at the
  SAME lane (shift 0), and all up-row neighbors at lane-1 within the
  frame's NB-group — one +1 rotate, plus a second rotate + select to fix
  the group-internal wraparound at residue 0.  Rotation wraps across
  frame boundaries where the XLA formulation clips; both produce garbage
  only at lanes the availability masks kill, so consumed values are
  identical.

Math is expression-for-expression the fast (float32) path of
intra_luma_scan_packed (reference: allintraPrediction enc src:446-555,
DPCM_pix_block :851, DCT_block :2685, Quantization :2780):

* mode search / MPM / DC-DPCM / recon: i32 vector ops on (64|8|1, M)
* DCT / IDCT: the same 64x64 one-matmul formulation as
  ops/transforms.fdct fast path, at DEFAULT MXU precision so the bf16
  single-pass rounding matches XLA's einsum bit-for-bit
* row extractions: 0/1 matmuls (HIGHEST where inputs exceed bf16's
  exact-integer range; f32-exact for < 2^24)
* C integer division: power-of-two -> logical shift; otherwise an
  f32 reciprocal quotient with a +-1 correction step (exact for
  |t| < 2^24; Mosaic has no vector i32 divide)

Two Mosaic traps pinned by tools/smoke_compile.py: jnp.select lowers to
an integer argmax Mosaic only implements for f32, and jnp.where with i1
vector branches crashes the compiler backend (pre-cast branches to i32).

Equality vs the XLA scan is pinned in interpret mode by
tests/test_pallas_intra.py and on the real chip by tests/test_tpu_chip.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import COS_ENC, IZIGZAG, ZIGZAG
from ..engine.wavefront import diag_layout, luma_dc_kind
from .transforms import _fdct_matrix, _idct_matrix, _table_key


@functools.lru_cache(maxsize=None)
def _zz_matrix(inverse: bool) -> np.ndarray:
    """The zig-zag scan (or its inverse) as a 64x64 0/1 permutation matrix
    applied on the (64, M) coefficient tiles the kernels already hold:
    sc = P_zz @ q_flat  /  q_flat = P_izz @ sc  (zigzagScanning enc
    src:3014-3096).  numpy (not jnp): trace-time device constants stall
    lowering through the axon tunnel (CLAUDE.md)."""
    perm = IZIGZAG if inverse else ZIGZAG
    m = np.zeros((64, 64), np.float32)
    m[np.arange(64), np.asarray(perm)] = 1.0
    return m


def _perm64(mz_ref, x):
    """Apply a 64-permutation matrix to (64, M) int32 x, exactly, at
    DEFAULT MXU precision: the v5e runs f32 matmuls as a single bf16
    pass, exact only for inputs <= 2^8, so split x+32768 (17 bits,
    covers the whole int16 symbol domain) into two bf16-exact byte
    halves and recombine in the exact f32 accumulator."""
    p = x + 32768
    hi = jax.lax.shift_right_logical(p, np.int32(8))    # <= 255
    lo = p & 255
    y = _mm(mz_ref[...], _f32(hi)) * 256.0 + _mm(mz_ref[...], _f32(lo))
    return y.astype(jnp.int32) - 32768


def _sgn(x):
    return jnp.where(x > 0, 1, jnp.where(x < 0, -1, 0)).astype(jnp.int32)


def _iabs(x):
    # no vector i32 abs on this Mosaic: |x| = max(x, -x)
    return jnp.maximum(x, -x)


def _udiv(a, q: int):
    """a // q for a >= 0 int32, static q >= 1 (C division support).

    Guaranteed exact for a <= 2^22: the +-1 correction fixes the
    off-by-one from the f32-reciprocal quotient, but near 2^24 the
    combined rounding of fl(1/q) and the product can reach ~2 ulp.  The
    codec's dividends are |t| <~ 2^13 — far inside the bound."""
    if q == 1:
        return a
    if q & (q - 1) == 0:
        return jax.lax.shift_right_logical(a, np.int32(int(q).bit_length() - 1))
    qq = jnp.floor(a.astype(jnp.float32) * np.float32(1.0 / q)).astype(jnp.int32)
    r = a - qq * q
    return qq + jnp.where(r >= q, 1, 0) - jnp.where(r < 0, 1, 0)


def _cdiv(t, q: int):
    return _sgn(t) * _udiv(_iabs(t), q)


def _median3(a, b, c):
    m1 = jnp.maximum(b, c)
    m2 = jnp.maximum(a, c)
    m3 = jnp.maximum(a, b)
    return jnp.where((a > b) & (a > c), m1, jnp.where((b > a) & (b > c), m2, m3))


def _dc_pred(kind, l, ul, u, ur):
    # nested wheres, not jnp.select: select lowers via an integer argmax
    # Mosaic only implements for f32
    med_lulu = _median3(l, ul, u)
    med_luur = _median3(l, u, ur)
    return jnp.where(
        kind == 0,
        jnp.full_like(l, 1024),
        jnp.where(kind == 1, l, jnp.where(kind == 2, u, jnp.where(kind == 3, med_lulu, med_luur))),
    )


def _f32(x):
    return x.astype(jnp.float32)


_HI = jax.lax.Precision.HIGHEST


def _mm(a, b, precision=None):
    return jnp.dot(a, b, preferred_element_type=jnp.float32, precision=precision)


@functools.partial(
    jax.jit,
    static_argnames=("nb", "qdc", "qac", "table_key", "interpret", "want_recon"),
)
def _intra_rows_fused(orows, hu_t, hl_t, kind_t, lane0_t, nb: int,
                      qdc: int, qac: int, table_key: str,
                      interpret: bool = False, want_recon: bool = True):
    """orows: (nsteps, 64, Mp) uint8 diagonal rows, lane m = f*NB + gy%NB;
    hu/hl/kind_t: (nsteps, 1, Mp) i32 per-lane tables; lane0_t: (1, 1, Mp)
    i32 mask of residue-0 lanes (group-internal wraparound fix).
    Returns (rec, sc, flag, bit, acf) rows: rec (nsteps, 64, Mp) u8 (None
    when want_recon=False — the pixel wavefront still runs, only the HBM
    output is dropped), sc (nsteps, 64, Mp) i16 quantized symbols ALREADY
    IN ZIG-ZAG ORDER (the scan permutation runs in-kernel), and
    (nsteps, 1, Mp) i32 mpm flag / remainder bit / AC-empty flag."""
    nsteps, _, mp = orows.shape
    m_f = _fdct_matrix(table_key, "float32")           # (64, 64)
    m_i = _idct_matrix(table_key, "float32")
    m_z = _zz_matrix(inverse=False)
    wrap = mp - nb + 1                                 # static rotate amounts

    def kernel(orow_ref, hu_ref, hl_ref, kind_ref, l0_ref,
               mf_ref, mi_ref, mz_ref, *refs):
        if want_recon:
            rec_ref, sc_ref, flag_ref, bit_ref, acf_ref = refs[:5]
            scratch = refs[5:]
        else:
            rec_ref = None
            sc_ref, flag_ref, bit_ref, acf_ref = refs[:4]
            scratch = refs[4:]
        (h1rc, h2rc, h3rc, h1br, h2br, h3br,
         h1md, h2md, h3md, h1dc, h2dc, h3dc) = scratch
        d_id = pl.program_id(0)

        @pl.when(d_id == 0)
        def _init():
            for ref in (h1rc, h2rc, h3rc, h1br, h2br, h3br):
                ref[...] = jnp.zeros((8, mp), jnp.int32)
            for ref in (h1md, h2md, h3md, h1dc, h2dc, h3dc):
                ref[...] = jnp.zeros((1, mp), jnp.int32)

        is0 = l0_ref[0] != 0                            # (1, Mp)

        def up_lane(x):
            # read lane-1 within the frame's NB-group: global rotate by 1,
            # with the residue-0 wraparound fixed by a second rotate
            a = pltpu.roll(x, 1, axis=1)                # x[m-1]
            b = pltpu.roll(x, wrap, axis=1)             # x[m+NB-1]
            return jnp.where(jnp.broadcast_to(is0, x.shape), b, a)

        left8 = h1rc[...]                               # (8, Mp) i32, shift 0
        l_md = h1md[...]
        l_dq = h1dc[...]
        ur_dq = up_lane(h1dc[...])
        up8 = up_lane(h2br[...])
        u_md = up_lane(h2md[...])
        u_dq = up_lane(h2dc[...])
        ul_md = up_lane(h3md[...])
        ul_dq = up_lane(h3dc[...])

        hu = hu_ref[0] != 0                             # (1, Mp) bool
        hl = hl_ref[0] != 0
        first = ~hu & ~hl
        kind = kind_ref[0]

        # broadcast / extraction matrices, generated in-register from iota
        ryx = jax.lax.broadcasted_iota(jnp.int32, (64, 8), 0)
        c8 = jax.lax.broadcasted_iota(jnp.int32, (64, 8), 1)
        t_up = _f32((ryx & 7) == c8)                    # (64,8): row[x]
        t_lf = _f32((ryx >> 3) == c8)                   # (64,8): col[y]
        r8 = jax.lax.broadcasted_iota(jnp.int32, (8, 64), 0)
        cyx = jax.lax.broadcasted_iota(jnp.int32, (8, 64), 1)
        e_rc = _f32(((cyx >> 3) == r8) & ((cyx & 7) == 7))   # right column
        e_br = _f32(((cyx >> 3) == 7) & ((cyx & 7) == r8))   # bottom row
        yx1 = jax.lax.broadcasted_iota(jnp.int32, (64, 1), 0)
        row0 = yx1 == 0                                 # (64, 1) DC mask
        ones64 = jnp.ones((1, 64), jnp.float32)

        cur = orow_ref[0].astype(jnp.int32)             # (64, Mp)

        # --- candidate residuals and SAEs ---
        up_b = _mm(t_up, _f32(up8)).astype(jnp.int32)   # (64, Mp) pixel <=255
        lf_b = _mm(t_lf, _f32(left8)).astype(jnp.int32)
        e0 = cur - up_b
        e1 = cur - lf_b
        lsum = jnp.where(hl, jnp.sum(left8, axis=0, keepdims=True), 1024)
        usum = jnp.where(hu, jnp.sum(up8, axis=0, keepdims=True), 1024)
        d16 = cur * 16 - jnp.broadcast_to(lsum + usum, (64, mp))
        e2 = _sgn(d16) * (_iabs(d16) >> 4)
        sae0 = _mm(ones64, _f32(_iabs(e0))).astype(jnp.int32)   # (1, Mp)
        sae1 = _mm(ones64, _f32(_iabs(e1))).astype(jnp.int32)
        sae2 = _mm(ones64, _f32(_iabs(e2))).astype(jnp.int32)

        mode_both = jnp.where(
            (sae0 <= sae1) & (sae0 <= sae2), 0, jnp.where(sae1 <= sae2, 1, 2)
        )
        mode = jnp.where(
            first,
            2,
            jnp.where(
                hu & hl,
                mode_both,
                jnp.where(
                    hl, jnp.where(sae2 > sae1, 1, 2), jnp.where(sae2 > sae0, 0, 2)
                ),
            ),
        )                                               # (1, Mp)
        mode_b = jnp.broadcast_to(mode, (64, mp))
        err = jnp.where(mode_b == 0, e0, jnp.where(mode_b == 1, e1, e2))

        # --- MPM flag / remainder bit ---
        pred_mode = jnp.where(
            hu & hl, _median3(l_md, ul_md, u_md), jnp.where(hl, l_md, u_md)
        )
        flag = ((mode == pred_mode) & ~first).astype(jnp.int32)
        # branches pre-cast to i32: jnp.where on i1 vector operands crashes
        # this Mosaic's compiler backend (found by tools/smoke_compile.py)
        bit = jnp.where(
            (flag != 0) | first,
            0,
            jnp.where(
                pred_mode == 2,
                (mode == 1).astype(jnp.int32),
                (mode == 2).astype(jnp.int32),
            ),
        )

        # --- transform chain (fast f32 path; DEFAULT = XLA's einsum) ---
        d = _mm(mf_ref[...], _f32(err))                 # (64, Mp) f32
        dc_pred = _dc_pred(kind, l_dq, ul_dq, u_dq, ur_dq)   # (1, Mp) i32
        dc_pred_b = jnp.broadcast_to(_f32(dc_pred), (64, mp))
        d = jnp.where(row0, d - dc_pred_b, d)
        t = (d + 0.5).astype(jnp.int32)                 # trunc toward zero
        q = jnp.where(row0, _cdiv(t, qdc), _cdiv(t, qac))
        iq = jnp.where(
            row0,
            q * qdc + jnp.broadcast_to(dc_pred, (64, mp)),
            q * qac,
        )
        new_dq = _mm(_f32(row0).T, _f32(iq), _HI).astype(jnp.int32)  # (1, Mp)
        r = _mm(mi_ref[...], _f32(iq))                  # (64, Mp) f32

        # --- pixel reconstruction ---
        up_m = jnp.where(hu, up8, 128)                  # (8, Mp)
        lf_m = jnp.where(hl, left8, 128)
        pred0 = _mm(t_up, _f32(up_m))
        pred1 = _mm(t_lf, _f32(lf_m))
        pv = jnp.broadcast_to(_f32(lsum + usum) * np.float32(0.0625), (64, mp))
        predsel = jnp.where(mode_b == 0, pred0, jnp.where(mode_b == 1, pred1, pv))
        rec = jnp.clip((r + predsel).astype(jnp.int32), 0, 255)

        # zig-zag in-kernel (exact split-matmul permutation) + AC-empty
        # flag (row 0 of the zig-zag layout is the DC)
        sczz = _perm64(mz_ref, q)
        nz = jnp.where(row0, 0, (sczz != 0).astype(jnp.int32))
        acf = (jnp.sum(nz, axis=0, keepdims=True) == 0).astype(jnp.int32)

        if want_recon:
            rec_ref[0] = rec.astype(jnp.uint8)
        # |q| <= ~4.2k (DC residual at qdc=1), well inside int16: halve
        # the stream (the AC bound is ~2k)
        sc_ref[0] = sczz.astype(jnp.int16)
        flag_ref[0] = flag
        bit_ref[0] = bit
        acf_ref[0] = acf

        # --- rotate boundary history (fixed slots) ---
        rc_new = _mm(e_rc, _f32(rec)).astype(jnp.int32)
        br_new = _mm(e_br, _f32(rec)).astype(jnp.int32)
        for h1, h2, h3, new in (
            (h1rc, h2rc, h3rc, rc_new),
            (h1br, h2br, h3br, br_new),
            (h1md, h2md, h3md, mode),
            (h1dc, h2dc, h3dc, new_dq),
        ):
            h3[...] = h2[...]
            h2[...] = h1[...]
            h1[...] = new

    row_spec = lambda r: pl.BlockSpec((1, r, mp), lambda d: (d, 0, 0), memory_space=pltpu.VMEM)
    fix_spec = lambda r: pl.BlockSpec((1, r, mp), lambda d: (0, 0, 0), memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec((64, 64), lambda d: (0, 0), memory_space=pltpu.VMEM)
    out_specs = [row_spec(64), row_spec(1), row_spec(1), row_spec(1)]
    out_shape = [
        jax.ShapeDtypeStruct((nsteps, 64, mp), jnp.int16),
        jax.ShapeDtypeStruct((nsteps, 1, mp), jnp.int32),
        jax.ShapeDtypeStruct((nsteps, 1, mp), jnp.int32),
        jax.ShapeDtypeStruct((nsteps, 1, mp), jnp.int32),
    ]
    if want_recon:
        out_specs.insert(0, row_spec(64))
        out_shape.insert(0, jax.ShapeDtypeStruct((nsteps, 64, mp), jnp.uint8))
    out = pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=[
            row_spec(64), row_spec(1), row_spec(1), row_spec(1), fix_spec(1),
            mat_spec, mat_spec, mat_spec,
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.VMEM((8, mp), jnp.int32)] * 6
        + [pltpu.VMEM((1, mp), jnp.int32)] * 6,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret,
    )(orows, hu_t, hl_t, kind_t, lane0_t, m_f, m_i, m_z)
    return out if want_recon else (None,) + tuple(out)


@functools.partial(
    jax.jit, static_argnames=("nb", "qdc", "qac", "table_key", "interpret")
)
def _intra_decode_rows_fused(srows, frows, brows, hu_t, hl_t, kind_t, lane0_t,
                             nb: int, qdc: int, qac: int, table_key: str,
                             interpret: bool = False):
    """Fused intra-luma DECODE wavefront: one pallas program running
    dequantization + the DC-DPCM inverse chain + IDCT + the
    mode-from-MPM-bits pixel reconstruction (reference decoder:
    IDPCM_pix_block dec src:3643-3990) per diagonal.

    srows: (nsteps, 64, Mp) i16 quantized symbols in ZIG-ZAG order (the
    inverse zig-zag permutation runs in-kernel — exact split matmuls,
    _perm64); frows/brows: (nsteps, 1, Mp) i32 mpm flag / remainder bit;
    tables as in _intra_rows_fused.  Returns rec rows (nsteps, 64, Mp)
    uint8."""
    nsteps, _, mp = srows.shape
    m_i = _idct_matrix(table_key, "float32")
    m_z = _zz_matrix(inverse=True)
    wrap = mp - nb + 1

    def kernel(srow_ref, f_ref, b_ref, hu_ref, hl_ref, kind_ref, l0_ref,
               mi_ref, mz_ref, rec_ref,
               h1rc, h2rc, h3rc, h1br, h2br, h3br,
               h1md, h2md, h3md, h1dc, h2dc, h3dc):
        d_id = pl.program_id(0)

        @pl.when(d_id == 0)
        def _init():
            for ref in (h1rc, h2rc, h3rc, h1br, h2br, h3br):
                ref[...] = jnp.zeros((8, mp), jnp.int32)
            for ref in (h1md, h2md, h3md, h1dc, h2dc, h3dc):
                ref[...] = jnp.zeros((1, mp), jnp.int32)

        is0 = l0_ref[0] != 0

        def up_lane(x):
            a = pltpu.roll(x, 1, axis=1)
            b = pltpu.roll(x, wrap, axis=1)
            return jnp.where(jnp.broadcast_to(is0, x.shape), b, a)

        left8 = h1rc[...]
        l_md = h1md[...]
        l_dq = h1dc[...]
        ur_dq = up_lane(h1dc[...])
        up8 = up_lane(h2br[...])
        u_md = up_lane(h2md[...])
        u_dq = up_lane(h2dc[...])
        ul_md = up_lane(h3md[...])
        ul_dq = up_lane(h3dc[...])

        hu = hu_ref[0] != 0
        hl = hl_ref[0] != 0
        first = ~hu & ~hl
        kind = kind_ref[0]

        ryx = jax.lax.broadcasted_iota(jnp.int32, (64, 8), 0)
        c8 = jax.lax.broadcasted_iota(jnp.int32, (64, 8), 1)
        t_up = _f32((ryx & 7) == c8)
        t_lf = _f32((ryx >> 3) == c8)
        r8 = jax.lax.broadcasted_iota(jnp.int32, (8, 64), 0)
        cyx = jax.lax.broadcasted_iota(jnp.int32, (8, 64), 1)
        e_rc = _f32(((cyx >> 3) == r8) & ((cyx & 7) == 7))
        e_br = _f32(((cyx >> 3) == 7) & ((cyx & 7) == r8))
        yx1 = jax.lax.broadcasted_iota(jnp.int32, (64, 1), 0)
        row0 = yx1 == 0

        # --- inverse transform chain ---
        # i16 zig-zag symbols in; inverse scan permutation in-kernel
        q = _perm64(mz_ref, srow_ref[0].astype(jnp.int32))
        dc_pred = _dc_pred(kind, l_dq, ul_dq, u_dq, ur_dq)   # (1, Mp)
        iq = jnp.where(
            row0,
            q * qdc + jnp.broadcast_to(dc_pred, (64, mp)),
            q * qac,
        )
        new_dq = _mm(_f32(row0).T, _f32(iq), _HI).astype(jnp.int32)
        r = _mm(mi_ref[...], _f32(iq))                  # (64, Mp) f32

        # --- mode from MPM flag / remainder bit ---
        fl = f_ref[0]
        bt = b_ref[0]
        pred_mode = jnp.where(
            hu & hl, _median3(l_md, ul_md, u_md), jnp.where(hl, l_md, u_md)
        )
        lo = jnp.where(pred_mode == 0, 1, 0)
        hi = jnp.where(pred_mode == 2, 1, 2)
        mode = jnp.where(
            first, 2, jnp.where(fl == 1, pred_mode, jnp.where(bt == 0, lo, hi))
        )
        mode_b = jnp.broadcast_to(mode, (64, mp))

        # --- pixel reconstruction ---
        lsum = jnp.where(hl, jnp.sum(left8, axis=0, keepdims=True), 1024)
        usum = jnp.where(hu, jnp.sum(up8, axis=0, keepdims=True), 1024)
        up_m = jnp.where(hu, up8, 128)
        lf_m = jnp.where(hl, left8, 128)
        pred0 = _mm(t_up, _f32(up_m))
        pred1 = _mm(t_lf, _f32(lf_m))
        pv = jnp.broadcast_to(_f32(lsum + usum) * np.float32(0.0625), (64, mp))
        predsel = jnp.where(mode_b == 0, pred0, jnp.where(mode_b == 1, pred1, pv))
        rec = jnp.clip((r + predsel).astype(jnp.int32), 0, 255)
        rec_ref[0] = rec.astype(jnp.uint8)

        rc_new = _mm(e_rc, _f32(rec)).astype(jnp.int32)
        br_new = _mm(e_br, _f32(rec)).astype(jnp.int32)
        for h1, h2, h3, new in (
            (h1rc, h2rc, h3rc, rc_new),
            (h1br, h2br, h3br, br_new),
            (h1md, h2md, h3md, mode),
            (h1dc, h2dc, h3dc, new_dq),
        ):
            h3[...] = h2[...]
            h2[...] = h1[...]
            h1[...] = new

    row_spec = lambda r: pl.BlockSpec((1, r, mp), lambda d: (d, 0, 0), memory_space=pltpu.VMEM)
    fix_spec = lambda r: pl.BlockSpec((1, r, mp), lambda d: (0, 0, 0), memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec((64, 64), lambda d: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=[
            row_spec(64), row_spec(1), row_spec(1),
            row_spec(1), row_spec(1), row_spec(1), fix_spec(1),
            mat_spec, mat_spec,
        ],
        out_specs=row_spec(64),
        out_shape=jax.ShapeDtypeStruct((nsteps, 64, mp), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((8, mp), jnp.int32)] * 6
        + [pltpu.VMEM((1, mp), jnp.int32)] * 6,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret,
    )(srows, frows, brows, hu_t, hl_t, kind_t, lane0_t, m_i, m_z)


@functools.lru_cache(maxsize=None)
def _fused_tables(gh: int, gw: int, f: int):
    """Host-side constants for the fused kernels at one (grid, batch)
    shape, lane layout m = f*NB + (gy mod NB) with NB = nmax:
    (nsteps, NB, Mp, hu_t, hl_t, kind_t, lane0_t)."""
    nsteps, nmax, _, _, _, _ = diag_layout(gh, gw)
    nb = nmax
    m = f * nb
    mp = -(-m // 128) * 128
    kind_grid = luma_dc_kind(gh, gw)

    hu = np.zeros((nsteps, nb), np.int32)
    hl = np.zeros((nsteps, nb), np.int32)
    kind = np.zeros((nsteps, nb), np.int32)
    for d in range(nsteps):
        lo = max(0, -(-(d - gw + 1) // 2))
        hi = min(gh - 1, d // 2)
        for gy in range(lo, hi + 1):
            gx = d - 2 * gy
            lane = gy % nb
            hu[d, lane] = int(gy > 0)
            hl[d, lane] = int(gx > 0)
            kind[d, lane] = kind_grid[gy, gx]

    def tile(x):
        out = np.zeros((nsteps, 1, mp), np.int32)
        out[:, 0, :m] = np.tile(x, (1, f))
        return out

    lane0 = np.zeros((1, 1, mp), np.int32)
    lane0[0, 0, :m] = (np.arange(m) % nb == 0).astype(np.int32)
    return nsteps, nb, mp, tile(hu), tile(hl), tile(kind), lane0


def _shear_pack(x, gh: int, gw: int, nb: int, mp: int):
    """(F, gh, gw, C) -> (nsteps, C, Mp) diagonal rows at lane
    m = f*NB + gy%NB, via pad + reshape (the shear trick) + group fold.
    All relayouts are pad/reshape/transpose/reduce — no gathers."""
    fdim, _, _, c = x.shape
    nsteps = 2 * (gh - 1) + gw
    ghp = -(-gh // nb) * nb
    # row width L: padded rows' sheared reads must land in zero padding
    # (L - 2*r >= gw for every padded row r), not in a real row's data
    big_l = gw + 2 * ghp
    x = jnp.pad(x, ((0, 0), (0, ghp - gh), (0, big_l - gw), (0, 0)))
    # shear: re-view flat rows with width L-2 => row gy shifts left by 2*gy
    x = x.reshape(fdim, ghp * big_l, c)[:, : ghp * (big_l - 2)]
    x = x.reshape(fdim, ghp, big_l - 2, c)[:, :, :nsteps]
    # fold gy -> gy mod NB: at most one diagonal cell per (step, residue),
    # everything else is zero, so the group-sum is exact
    x = x.reshape(fdim, ghp // nb, nb, nsteps, c)
    x = x.sum(axis=1, dtype=x.dtype)                    # (F, NB, nsteps, C)
    x = jnp.transpose(x, (2, 3, 0, 1)).reshape(nsteps, c, fdim * nb)
    return jnp.pad(x, ((0, 0), (0, 0), (0, mp - fdim * nb)))


@functools.lru_cache(maxsize=None)
def _pack_maps(gh: int, gw: int, nb: int):
    """(gy, gx) of the unique diagonal cell per (step, residue) — the
    inverse of _unpack_maps (OOB entries -> cell (0,0), masked later)."""
    nsteps = 2 * (gh - 1) + gw
    gy_of = np.zeros((nsteps, nb), np.int64)
    gx_of = np.zeros((nsteps, nb), np.int64)
    for d in range(nsteps):
        lo = max(0, -(-(d - gw + 1) // 2))
        hi = min(gh - 1, d // 2)
        for gy in range(lo, hi + 1):
            gy_of[d, gy % nb] = gy
            gx_of[d, gy % nb] = d - 2 * gy
    return gy_of, gx_of


def _rows_pack_gather(x, nb: int, mp: int):
    """(F, gh, gw, C) -> (nsteps, C, Mp) diagonal rows via transpose +
    a SINGLE-AXIS constant-map take (the fast direction-mirror of
    _rows_unpack; used for the wide decode inputs where the shear pack's
    i32 relayout chain is pass-heavy).  Flattened one-axis takes only:
    XLA:TPU's multi-axis gather hard-crashed the TPU worker at 720p
    shapes (in-bounds indices — a backend fault, not OOB)."""
    fdim, gh, gw, c = x.shape
    gy_of, gx_of = _pack_maps(gh, gw, nb)
    xt = jnp.transpose(x, (1, 2, 0, 3)).reshape(gh * gw, fdim, c)
    rows = jnp.take(xt, gy_of * gw + gx_of, axis=0)     # (nsteps, NB, F, C)
    rows = jnp.transpose(rows, (0, 3, 2, 1)).reshape(rows.shape[0], c, fdim * nb)
    return jnp.pad(rows, ((0, 0), (0, 0), (0, mp - fdim * nb)))


@functools.lru_cache(maxsize=None)
def _unpack_maps(gh: int, gw: int, nb: int):
    step_of = np.zeros((gh, gw), np.int64)
    lane_of = np.zeros((gh, gw), np.int64)
    for gy in range(gh):
        for gx in range(gw):
            step_of[gy, gx] = 2 * gy + gx
            lane_of[gy, gx] = gy % nb
    return step_of, lane_of


def _rows_unpack_plane(rows, fdim: int, gh: int, gw: int, nb: int):
    """(nsteps, 64, Mp) uint8 recon rows -> (F, gh*8, gw*8) pixel planes
    in one take + one transpose (composing _rows_unpack with the
    engine's from_blocks would spend an extra relayout pass on the
    intermediate (F, gh, gw, 8, 8) block grid)."""
    nsteps, c, _ = rows.shape
    step_of, lane_of = _unpack_maps(gh, gw, nb)
    x = rows[:, :, : fdim * nb].reshape(nsteps, c, fdim, nb)
    x = jnp.transpose(x, (0, 3, 2, 1)).reshape(nsteps * nb, fdim, c)
    out = jnp.take(x, (step_of * nb + lane_of).ravel(), axis=0)
    out = out.reshape(gh, gw, fdim, 8, 8)
    return jnp.transpose(out, (2, 0, 3, 1, 4)).reshape(fdim, gh * 8, gw * 8)


def _rows_unpack(rows, fdim: int, gh: int, gw: int, nb: int):
    """(nsteps, C, Mp) diagonal rows -> (F, gh, gw, C).  Transpose +
    SINGLE-AXIS constant-map take: measured ~2-3x faster than the
    inverse reshape-shear on this chip (the tile+unshear relayout chain
    is pass-heavy) and ~100x faster than a multi-dim index-map gather,
    which XLA:TPU lowers near-serially.  Flattened one-axis takes only:
    the two-axis form (advanced indices split around a slice) hard-
    crashed the TPU worker at 720p shapes despite in-bounds indices."""
    nsteps, c, _ = rows.shape
    step_of, lane_of = _unpack_maps(gh, gw, nb)
    x = rows[:, :, : fdim * nb].reshape(nsteps, c, fdim, nb)
    x = jnp.transpose(x, (0, 3, 2, 1)).reshape(nsteps * nb, fdim, c)
    out = jnp.take(x, step_of * nb + lane_of, axis=0)   # (gh, gw, F, C)
    return jnp.moveaxis(out, 2, 0)


def intra_luma_scan_fused(orig: jnp.ndarray, qdc: int, qac: int,
                          table=COS_ENC, dtype=jnp.float32,
                          interpret: bool = False,
                          want_recon: bool = True,
                          recon_plane: bool = False):
    """Fused-pallas intra luma encoder; same contract (and, on the fast
    f32 path, the same bits) as wavefront.intra_luma_scan_packed.

    orig: (F, gh, gw, 8, 8) int blocks -> dict(recon, scan, mpm,
    mode_bit, acflag) on the (F, gh, gw, ...) grid.  scan is int16 and
    acflag comes straight out of the kernel (both were separate XLA
    passes over the full grid before).  want_recon=False drops the recon
    output entirely (the bitstream path doesn't need it — the pixel
    wavefront still runs on-chip for the boundary state);
    recon_plane=True returns recon as ready (F, H, W) uint8 planes
    instead of int32 blocks (one fewer relayout pass)."""
    if dtype not in (jnp.float32, np.float32):
        raise ValueError("intra_luma_scan_fused is the fast-path kernel; "
                         "use the XLA scan for the exact float64 path")
    fdim, gh, gw = orig.shape[:3]
    if gw % 2:
        # odd-width grids put kind-4 cells on the right edge, where the
        # clamped `ur` DC read is formulation-dependent (grid and packed
        # XLA already disagree there).  Unreachable in practice: luma
        # gw = W/8 with W % 16 == 0 is always even.
        raise ValueError("intra_luma_scan_fused requires an even block-grid "
                         f"width; got gw={gw}")
    nsteps, nb, mp, hu_t, hl_t, kind_t, lane0 = _fused_tables(gh, gw, fdim)

    orows = _shear_pack(
        orig.reshape(fdim, gh, gw, 64).astype(jnp.uint8), gh, gw, nb, mp
    )
    # numpy (not jnp) table constants: trace-time device constants stall
    # lowering through the axon tunnel (CLAUDE.md)
    rec, sc, flag, bit, acf = _intra_rows_fused(
        orows, hu_t, hl_t, kind_t, lane0, nb, qdc, qac,
        _table_key(np.asarray(table)), interpret, want_recon,
    )
    out = dict(
        scan=_rows_unpack(sc, fdim, gh, gw, nb),        # i16, zig-zag order
        mpm=_rows_unpack(flag, fdim, gh, gw, nb)[..., 0],
        mode_bit=_rows_unpack(bit, fdim, gh, gw, nb)[..., 0],
        acflag=_rows_unpack(acf, fdim, gh, gw, nb)[..., 0],
    )
    if want_recon:
        if recon_plane:
            out["recon_plane"] = _rows_unpack_plane(rec, fdim, gh, gw, nb)
        else:
            out["recon"] = (
                _rows_unpack(rec, fdim, gh, gw, nb)
                .astype(jnp.int32).reshape(fdim, gh, gw, 8, 8)
            )
    return out


def intra_luma_decode_fused(y_scan: jnp.ndarray, mpm: jnp.ndarray,
                            mode_bit: jnp.ndarray, qdc: int, qac: int,
                            table, dtype=jnp.float32,
                            interpret: bool = False):
    """Fused-pallas intra luma DECODER: zig-zag symbols -> reconstructed
    blocks in one kernel (inverse zig-zag + dequant + inverse DC chain +
    IDCT + pixel wavefront).  Bit-identical to the XLA composition in
    engine.intra.decode_intra_frames on the fast f32 path.

    y_scan: (F, gh, gw, 64) int; mpm/mode_bit: (F, gh, gw) int.
    Returns recon blocks (F, gh, gw, 8, 8) int32.

    Symbols wider than int16 are CLAMPED to the int16 domain before
    packing (a compliant stream's |q| bound is ~4.2k; only a corrupt or
    hostile stream can exceed it, and clamping keeps the divergence
    deterministic instead of wrapping)."""
    if dtype not in (jnp.float32, np.float32):
        raise ValueError("intra_luma_decode_fused is the fast-path kernel; "
                         "use the XLA scan for the exact float64 path")
    fdim, gh, gw = y_scan.shape[:3]
    if gw % 2:
        raise ValueError("intra_luma_decode_fused requires an even "
                         f"block-grid width; got gw={gw}")
    nsteps, nb, mp, hu_t, hl_t, kind_t, lane0 = _fused_tables(gh, gw, fdim)

    # symbols travel as i16 (|q| <= ~4.2k): halves the packed stream; the
    # inverse zig-zag runs IN-KERNEL (the grid izigzag was a full-grid
    # minor-axis gather pass)
    sc = jnp.asarray(y_scan)
    if sc.dtype != jnp.int16:
        sc = jnp.clip(sc, -32768, 32767).astype(jnp.int16)
    srows = _rows_pack_gather(sc.reshape(fdim, gh, gw, 64), nb, mp)
    frows = _shear_pack(
        jnp.asarray(mpm).astype(jnp.int32)[..., None], gh, gw, nb, mp
    )
    brows = _shear_pack(
        jnp.asarray(mode_bit).astype(jnp.int32)[..., None], gh, gw, nb, mp
    )
    rec = _intra_decode_rows_fused(
        srows, frows, brows, hu_t, hl_t, kind_t, lane0, nb, qdc, qac,
        _table_key(np.asarray(table)), interpret,
    )
    return _rows_unpack(rec, fdim, gh, gw, nb).astype(jnp.int32).reshape(
        fdim, gh, gw, 8, 8
    )
