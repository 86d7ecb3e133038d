"""Fused pallas intra-luma wavefront (encode fast path).

The packed-diagonal XLA scan (engine/wavefront.intra_luma_scan_packed)
is scan-step latency-bound: 114 steps x ~70 us of per-step launch/fusion
overhead for CIF300 (~7.9 ms) against a ~0.7 ms bandwidth bound.  This
kernel runs the ENTIRE wavefront as ONE pallas program: the grid
iterates the anti-diagonals sequentially (TPU grids execute in order),
per-step boundary state (right pixel column, bottom pixel row, mode,
dequantized DC — the only sequential dependencies) lives in VMEM scratch
across grid steps, and each step's block math runs on (64, M) tiles
where M = F * nmax lanes (frame-major packed diagonal).

Layout: sublane = yx (the 64 coefficients / pixels of an 8x8 block),
lane m = f * nmax + j (frame f, diagonal lane j).  Neighbor reads are
per-step constant lane shifts (wavefront.diag_layout), realized as
dynamic lane rotates (`pltpu.roll`, the production ME/MC mechanism on
this Mosaic — misaligned slicing is broken, see ops/pallas_me.py).
Rotation wraps across frame boundaries where the XLA formulation clips;
both produce garbage only at lanes the availability masks kill, so the
consumed values are identical.

Math is expression-for-expression the fast (float32) path of
intra_luma_scan_packed (reference: allintraPrediction enc src:446-555,
DPCM_pix_block :851, DCT_block :2685, Quantization :2780):

* mode search / MPM / DC-DPCM / recon: i32 vector ops on (64|8|1, M)
* DCT / IDCT: the same 64x64 one-matmul formulation as
  ops/transforms.fdct fast path, at DEFAULT MXU precision so the bf16
  single-pass rounding matches XLA's einsum bit-for-bit
* zigzag + row extractions: 0/1 matmuls at HIGHEST precision (inputs
  exceed bf16's exact-integer range; HIGHEST is f32-exact for < 2^24)
* C integer division: power-of-two -> logical shift; otherwise an
  f32 reciprocal quotient with a +-1 correction step (exact for
  |t| < 2^24; Mosaic has no vector i32 divide)

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

from ..constants import COS_ENC, ZIGZAG
from ..engine.wavefront import _intra_lane_tables, _pack_diag_nd, _unpack_diag_nd, diag_layout
from .transforms import _fdct_matrix, _idct_matrix, _table_key


def _sgn(x):
    return jnp.where(x > 0, 1, jnp.where(x < 0, -1, 0)).astype(jnp.int32)


def _iabs(x):
    # no vector i32 abs on this Mosaic: |x| = max(x, -x)
    return jnp.maximum(x, -x)


def _udiv(a, q: int):
    """Exact a // q for a >= 0 int32, static q >= 1 (C division support)."""
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
    jax.jit, static_argnames=("qdc", "qac", "table_key", "interpret")
)
def _intra_rows_fused(orows, hu_t, hl_t, kind_t, meta, qdc: int, qac: int,
                      table_key: str, interpret: bool = False):
    """orows: (nsteps, 64, Mp) uint8 packed original blocks (frame-major
    lanes); hu/hl/kind_t: (nsteps, 1, Mp) i32 per-lane tables; meta:
    (nsteps, 4) i32 lane-rotate amounts for the l/u/ul/ur neighbor reads.
    Returns (rec, sc, flag, bit) rows: (nsteps, 64, Mp) u8 / i32 and
    (nsteps, 1, Mp) i32 x2."""
    nsteps, _, mp = orows.shape
    m_f = _fdct_matrix(table_key, "float32")           # (64, 64)
    m_i = _idct_matrix(table_key, "float32")
    p_zz = np.zeros((64, 64), np.float32)              # sc[o] = q[ZZ[o]]
    p_zz[np.arange(64), np.asarray(ZIGZAG)] = 1.0

    def kernel(meta_ref, orow_ref, hu_ref, hl_ref, kind_ref,
               mf_ref, mi_ref, pzz_ref,
               rec_ref, sc_ref, flag_ref, bit_ref,
               h1rc, h2rc, h3rc, h1br, h2br, h3br,
               h1md, h2md, h3md, h1dc, h2dc, h3dc):
        d_id = pl.program_id(0)

        @pl.when(d_id == 0)
        def _init():
            for ref in (h1rc, h2rc, h3rc, h1br, h2br, h3br):
                ref[...] = jnp.zeros((8, mp), jnp.int32)
            for ref in (h1md, h2md, h3md, h1dc, h2dc, h3dc):
                ref[...] = jnp.zeros((1, mp), jnp.int32)

        # neighbor lane shifts: rolled[i] = x[(i + s) % Mp] via amt = -s % Mp
        a_l = meta_ref[d_id, 0]
        a_u = meta_ref[d_id, 1]
        a_ul = meta_ref[d_id, 2]
        a_ur = meta_ref[d_id, 3]

        def lane(x, amt):
            return pltpu.roll(x, amt, axis=1)

        left8 = lane(h1rc[...], a_l)                    # (8, Mp) i32
        l_md = lane(h1md[...], a_l)                     # (1, Mp)
        l_dq = lane(h1dc[...], a_l)
        ur_dq = lane(h1dc[...], a_ur)
        up8 = lane(h2br[...], a_u)
        u_md = lane(h2md[...], a_u)
        u_dq = lane(h2dc[...], a_u)
        ul_md = lane(h3md[...], a_ul)
        ul_dq = lane(h3dc[...], a_ul)

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
        sc = _mm(pzz_ref[...], _f32(q), _HI).astype(jnp.int32)
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

        rec_ref[0] = rec.astype(jnp.uint8)
        sc_ref[0] = sc
        flag_ref[0] = flag
        bit_ref[0] = bit

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
    mat_spec = pl.BlockSpec((64, 64), lambda d: (0, 0), memory_space=pltpu.VMEM)
    big = [(8, mp)] * 6
    small = [(1, mp)] * 6
    return pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # meta
            row_spec(64), row_spec(1), row_spec(1), row_spec(1),
            mat_spec, mat_spec, mat_spec,
        ],
        out_specs=(row_spec(64), row_spec(64), row_spec(1), row_spec(1)),
        out_shape=(
            jax.ShapeDtypeStruct((nsteps, 64, mp), jnp.uint8),
            jax.ShapeDtypeStruct((nsteps, 64, mp), jnp.int32),
            jax.ShapeDtypeStruct((nsteps, 1, mp), jnp.int32),
            jax.ShapeDtypeStruct((nsteps, 1, mp), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM(s, jnp.int32) for s in big]
        + [pltpu.VMEM(s, jnp.int32) for s in small],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret,
    )(meta, orows, hu_t, hl_t, kind_t, m_f, m_i, p_zz)


@functools.partial(
    jax.jit, static_argnames=("qdc", "qac", "table_key", "interpret")
)
def _intra_decode_rows_fused(srows, frows, brows, hu_t, hl_t, kind_t, meta,
                             qdc: int, qac: int, table_key: str,
                             interpret: bool = False):
    """Fused intra-luma DECODE wavefront: one pallas program running
    izigzag + dequantization + the DC-DPCM inverse chain + IDCT + the
    mode-from-MPM-bits pixel reconstruction (reference decoder:
    IDPCM_pix_block dec src:3643-3990) per diagonal.

    srows: (nsteps, 64, Mp) i32 zig-zag scan symbols; frows/brows:
    (nsteps, 1, Mp) i32 mpm flag / remainder bit; tables as in
    _intra_rows_fused.  Returns rec rows (nsteps, 64, Mp) uint8."""
    nsteps, _, mp = srows.shape
    m_i = _idct_matrix(table_key, "float32")
    p_izz = np.zeros((64, 64), np.float32)             # q[yx] = sc[IZZ[yx]]
    izz = np.zeros(64, np.int64)
    izz[np.asarray(ZIGZAG)] = np.arange(64)            # IZZ = argsort(ZZ)
    p_izz[np.arange(64), izz] = 1.0

    def kernel(meta_ref, srow_ref, f_ref, b_ref, hu_ref, hl_ref, kind_ref,
               mi_ref, pizz_ref, rec_ref,
               h1rc, h2rc, h3rc, h1br, h2br, h3br,
               h1md, h2md, h3md, h1dc, h2dc, h3dc):
        d_id = pl.program_id(0)

        @pl.when(d_id == 0)
        def _init():
            for ref in (h1rc, h2rc, h3rc, h1br, h2br, h3br):
                ref[...] = jnp.zeros((8, mp), jnp.int32)
            for ref in (h1md, h2md, h3md, h1dc, h2dc, h3dc):
                ref[...] = jnp.zeros((1, mp), jnp.int32)

        a_l = meta_ref[d_id, 0]
        a_u = meta_ref[d_id, 1]
        a_ul = meta_ref[d_id, 2]
        a_ur = meta_ref[d_id, 3]

        def lane(x, amt):
            return pltpu.roll(x, amt, axis=1)

        left8 = lane(h1rc[...], a_l)
        l_md = lane(h1md[...], a_l)
        l_dq = lane(h1dc[...], a_l)
        ur_dq = lane(h1dc[...], a_ur)
        up8 = lane(h2br[...], a_u)
        u_md = lane(h2md[...], a_u)
        u_dq = lane(h2dc[...], a_u)
        ul_md = lane(h3md[...], a_ul)
        ul_dq = lane(h3dc[...], a_ul)

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
        q = _mm(pizz_ref[...], _f32(srow_ref[0]), _HI).astype(jnp.int32)
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

    row_spec = lambda r, dt=pltpu.VMEM: pl.BlockSpec((1, r, mp), lambda d: (d, 0, 0), memory_space=dt)
    mat_spec = pl.BlockSpec((64, 64), lambda d: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # meta
            row_spec(64), row_spec(1), row_spec(1),
            row_spec(1), row_spec(1), row_spec(1),
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
    )(meta, srows, frows, brows, hu_t, hl_t, kind_t, m_i, p_izz)


@functools.lru_cache(maxsize=None)
def _fused_tables(gh: int, gw: int, f: int):
    """Host-side constants for the fused kernel at one (grid, batch) shape:
    lane-tiled availability/kind rows, rotate amounts, padded lane count."""
    nsteps, nmax, _, _, _, shifts = diag_layout(gh, gw)
    _, hu, hl, kind = _intra_lane_tables(gh, gw)
    m = f * nmax
    mp = -(-m // 128) * 128

    def tile(x):
        out = np.zeros((nsteps, 1, mp), np.int32)
        out[:, 0, :m] = np.tile(x.astype(np.int32), (1, f))
        return out

    meta = np.zeros((nsteps, 4), np.int32)
    for i in range(4):
        meta[:, i] = (-shifts[:, i]) % mp
    return nsteps, nmax, mp, tile(hu), tile(hl), tile(kind), meta


def intra_luma_scan_fused(orig: jnp.ndarray, qdc: int, qac: int,
                          table=COS_ENC, dtype=jnp.float32,
                          interpret: bool = False):
    """Fused-pallas intra luma encoder; same contract (and, on the fast
    f32 path, the same bits) as wavefront.intra_luma_scan_packed.

    orig: (F, gh, gw, 8, 8) int blocks -> dict(recon, scan, mpm, mode_bit)
    on the (F, gh, gw, ...) grid."""
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
    nsteps, nmax, mp, hu_t, hl_t, kind_t, meta = _fused_tables(gh, gw, fdim)
    m = fdim * nmax

    # pack to frame-major diagonal lanes: (nsteps, yx, f*nmax + j)
    orows = _pack_diag_nd(orig.astype(jnp.uint8), gh, gw)  # (nsteps,F,nmax,8,8)
    orows = jnp.transpose(orows, (0, 3, 4, 1, 2)).reshape(nsteps, 64, m)
    orows = jnp.pad(orows, ((0, 0), (0, 0), (0, mp - m)))

    # numpy (not jnp) constants: trace-time device constants stall
    # lowering through the axon tunnel (CLAUDE.md)
    rec, sc, flag, bit = _intra_rows_fused(
        orows, hu_t, hl_t, kind_t, meta, qdc, qac,
        _table_key(np.asarray(table)), interpret,
    )

    def unpack(rows, lanes):
        x = rows[:, :, :m].reshape(rows.shape[0], lanes, fdim, nmax)
        x = jnp.transpose(x, (0, 2, 3, 1))              # (nsteps, F, nmax, L)
        return _unpack_diag_nd(x, gh, gw)

    return dict(
        recon=unpack(rec.astype(jnp.int32), 64).reshape(fdim, gh, gw, 8, 8),
        scan=unpack(sc, 64),
        mpm=unpack(flag, 1)[..., 0],
        mode_bit=unpack(bit, 1)[..., 0],
    )


def intra_luma_decode_fused(y_scan: jnp.ndarray, mpm: jnp.ndarray,
                            mode_bit: jnp.ndarray, qdc: int, qac: int,
                            table, dtype=jnp.float32,
                            interpret: bool = False):
    """Fused-pallas intra luma DECODER: zig-zag symbols -> reconstructed
    blocks in one kernel (izigzag + dequant + inverse DC chain + IDCT +
    pixel wavefront).  Bit-identical to the XLA composition in
    engine.intra.decode_intra_frames on the fast f32 path.

    y_scan: (F, gh, gw, 64) int; mpm/mode_bit: (F, gh, gw) int.
    Returns recon blocks (F, gh, gw, 8, 8) int32."""
    if dtype not in (jnp.float32, np.float32):
        raise ValueError("intra_luma_decode_fused is the fast-path kernel; "
                         "use the XLA scan for the exact float64 path")
    fdim, gh, gw = y_scan.shape[:3]
    if gw % 2:
        raise ValueError("intra_luma_decode_fused requires an even "
                         f"block-grid width; got gw={gw}")
    nsteps, nmax, mp, hu_t, hl_t, kind_t, meta = _fused_tables(gh, gw, fdim)
    m = fdim * nmax

    def pack(x, lanes, dt):
        rows = _pack_diag_nd(x.astype(dt).reshape(fdim, gh, gw, lanes), gh, gw)
        rows = jnp.transpose(rows, (0, 3, 1, 2)).reshape(nsteps, lanes, m)
        return jnp.pad(rows, ((0, 0), (0, 0), (0, mp - m)))

    srows = pack(y_scan, 64, jnp.int32)
    frows = pack(mpm[..., None], 1, jnp.int32)
    brows = pack(mode_bit[..., None], 1, jnp.int32)

    rec = _intra_decode_rows_fused(
        srows, frows, brows, hu_t, hl_t, kind_t, meta, qdc, qac,
        _table_key(np.asarray(table)), interpret,
    )
    x = rec[:, :, :m].astype(jnp.int32).reshape(nsteps, 64, fdim, nmax)
    x = jnp.transpose(x, (0, 2, 3, 1))
    return _unpack_diag_nd(x, gh, gw).reshape(fdim, gh, gw, 8, 8)
