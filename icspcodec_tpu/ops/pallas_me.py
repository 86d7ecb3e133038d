"""Pallas TPU kernels for motion estimation / compensation.

The XLA formulations (ops/me.py) are dominated by lane-misaligned
slicing of the padded reference frame: the 64 spiral-candidate windows
and the per-MB predictor gather each force full-frame relayouts through
HBM (~32 ms + ~21 ms per 30-frame batch on v5e).  These kernels keep the
whole padded frame in VMEM and produce every shifted window with
`pltpu.roll` (lane/sublane rotations, no misaligned slicing — an earlier
slice-based kernel was mis-lowered by this Mosaic version, see git
history), reducing the windows on the MXU via 0/1 block-sum matmuls:

* sad_best: all 64 spiral-candidate SADs per frame plus the reference's
  selection rule (first strict minimum in spiral order, overridden by
  the second zero when two zero-SAD candidates exist — motionEstimation
  enc src:2073-2155) fused into one kernel.  Output is the spiral index.
* mc_select: motion compensation as masked selection.  Every MV the
  encoder can emit is one of the 64 spiral offsets (and every chroma MV
  one of 38 mv/2 images), so instead of per-MB dynamic slices the kernel
  rolls the padded frame once per *offset* and selects per-pixel by
  comparing a block-index map against the offset id.  Used for luma MC,
  chroma MC (CmotionCompensation enc src:2500-2557), and the decoder.

Both have XLA fallbacks (ops/me.py) used on CPU; equality is pinned by
tests (CPU: interpret mode, TPU: ICSP_TEST_TPU=1).

The original slice-based formulations (sad_sweep / mc_gather) live in
tests/legacy_kernels.py as interpret-mode spec fixtures: on this
environment's v5e Mosaic the compiled sad_sweep returned wrong sums
(mis-lowered misaligned VMEM slicing) and mc_gather's per-MB dynamic
sublane slicing is rejected outright — production kernels avoid
misaligned slicing entirely.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import SPIRAL, SPIRAL_STATE_IDX, SPIRAL_UNION


def _chroma_table():
    """Unique chroma window offsets and the spiral-index -> chroma-index map.

    Chroma MC uses mv/2 with C truncation (enc src:2538); with
    mv = -spiral the chroma window offset is sign(o) * (|o| // 2)."""
    c = np.sign(SPIRAL) * (np.abs(SPIRAL) // 2)
    uniq, inv = np.unique(c, axis=0, return_inverse=True)
    return uniq.astype(np.int32), inv.astype(np.int32)


CHROMA_OFFSETS, SPIRAL_TO_CHROMA = _chroma_table()
NEG_SPIRAL = (-SPIRAL).astype(np.int32)
N_CANON = int(SPIRAL_STATE_IDX[0].max()) + 1  # canonical-unique union prefix


def _chroma_union_table():
    """Chroma analog of the 129-offset spiral union (stateful ME): unique
    mv/2 window offsets ordered by first appearance along the union rows,
    so the canonical chroma offsets form a prefix (mirrors SPIRAL_UNION's
    canonical-first layout)."""
    c = np.sign(SPIRAL_UNION) * (np.abs(SPIRAL_UNION) // 2)
    seen: dict = {}
    uniq = []
    inv = np.zeros(len(c), np.int32)
    for i, o in enumerate(map(tuple, c)):
        if o not in seen:
            seen[o] = len(uniq)
            uniq.append(o)
        inv[i] = seen[o]
    return np.asarray(uniq, np.int32), inv


CHROMA_U_OFFSETS, UNION_TO_CHROMA_U = _chroma_union_table()
NEG_UNION = (-SPIRAL_UNION).astype(np.int32)


def _lane_extend(pad: jnp.ndarray) -> jnp.ndarray:
    """Extend the last (lane) dim to a multiple of 128 with trailing zeros:
    Mosaic's dynamic lane rotate rejects non-multiple-of-128 widths.  All
    reads stay left of the extension (x + padlen + ox < original width),
    so the zeros never reach a consumer."""
    pw = pad.shape[-1]
    rem = (-pw) % 128
    if rem == 0:
        return pad
    return jnp.pad(pad, [(0, 0)] * (pad.ndim - 1) + [(0, rem)])


def _roll_shifts(offsets: np.ndarray, padlen: int, ph: int, pw: int) -> np.ndarray:
    """Precomputed (N, 2) non-negative roll shifts so that
    rolled[y, x] == pad[y + padlen + oy, x + padlen + ox] (mod shape);
    wrapped values only ever land outside the region the callers read."""
    sh = np.empty((len(offsets), 2), np.int32)
    sh[:, 0] = (-(padlen + offsets[:, 1])) % ph  # rows from oy
    sh[:, 1] = (-(padlen + offsets[:, 0])) % pw  # cols from ox
    return sh


def _iota_eq(n: int, m: int, scale: int) -> jnp.ndarray:
    """(n, m) f32 0/1 matrix with A[r, c] = (c // scale == r) — generated
    in-kernel (iota compare) so no host constants ride along."""
    r = jax.lax.broadcasted_iota(jnp.int32, (n, m), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, m), 1)
    return (c // scale == r).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def sad_best(cur: jnp.ndarray, pad: jnp.ndarray, interpret: bool = False):
    """cur: (G, H, W) uint8; pad: (G, H+32, W+32) uint8 (padded previous
    reconstruction).  Returns (best, zc) (G, mbh, mbw) int32: the spiral
    index selected by the reference's rule (mv = -SPIRAL[best]) and the
    per-MB count of zero-SAD evaluations along the canonical walk — an MB
    with zc >= 2 triggers the reference's early break (enc src:2136-2141),
    i.e. the fixed-table result is only exact when (zc >= 2) is nowhere
    true (engine.inter gates the stateful recompute on that)."""
    g, h, w = cur.shape
    pad = _lane_extend(pad)
    ph, pw = pad.shape[-2], pad.shape[-1]
    mbh, mbw = h // 16, w // 16
    shifts = _roll_shifts(np.asarray(SPIRAL), 16, ph, pw)

    def kernel(sh_ref, cur_ref, pad_ref, best_ref, zc_ref):
        cur_i = cur_ref[0].astype(jnp.int32)
        pad_i = pad_ref[0].astype(jnp.int32)
        rowsum = _iota_eq(mbh, h, 16)        # (mbh, H)
        colsum = _iota_eq(mbw, w, 16).T      # (W, mbw)

        def body(k, st):
            curmin, best, zc, second = st
            win = pltpu.roll(
                pltpu.roll(pad_i, sh_ref[k, 0], axis=0), sh_ref[k, 1], axis=1
            )[:h, :w]
            # no vector i32 abs on this Mosaic: |a-b| = max - min
            d = (jnp.maximum(cur_i, win) - jnp.minimum(cur_i, win)).astype(jnp.float32)
            # 16x16 block sums on the MXU; max 16*16*255 < 2^24: f32-exact.
            # The v5e MXU's default f32 matmul is a single bf16 pass:
            # exact for the FIRST matmul (inputs are 0/1 and u8 diffs
            # <= 255, both bf16-exact; products accumulate in f32), but
            # the SECOND's inputs are row sums up to 4080 (> bf16's 8
            # mantissa bits) and need precision=HIGHEST.  Keeping the
            # big first matmul at default precision is ~25x faster and
            # measured bit-identical (tools + on-chip equality tests).
            s = jnp.dot(
                jnp.dot(rowsum, d, preferred_element_type=jnp.float32),
                colsum,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ).astype(jnp.int32)
            lt = s < curmin                   # strict <: first minimum wins
            best = jnp.where(lt, k, best)
            curmin = jnp.where(lt, s, curmin)
            z = s == 0
            second = jnp.where(z & (zc == 1), k, second)
            zc = zc + z.astype(jnp.int32)
            return curmin, best, zc, second

        zeros = jnp.zeros((mbh, mbw), jnp.int32)
        init = (jnp.full((mbh, mbw), jnp.iinfo(jnp.int32).max, jnp.int32), zeros, zeros, zeros)
        _, best, zc, second = jax.lax.fori_loop(0, len(shifts), body, init)
        # the SAD==0 early-break fires only once min is already 0: with
        # >=2 zero candidates the *second* zero wins
        best_ref[0] = jnp.where(zc >= 2, second, best)
        zc_ref[0] = zc

    mb_spec = pl.BlockSpec((1, mbh, mbw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ph, pw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(mb_spec, mb_spec),
        out_shape=(
            jax.ShapeDtypeStruct((g, mbh, mbw), jnp.int32),
            jax.ShapeDtypeStruct((g, mbh, mbw), jnp.int32),
        ),
        compiler_params=_vmem_params(ph, pw, h, w, 4),
        interpret=interpret,
    )(jnp.asarray(shifts), cur, pad)


def _grouped_shifts(shifts: np.ndarray):
    """Group (N, 2) roll shifts by lane (column) shift, first-appearance
    order: [(col_shift, [(row_shift, rank), ...]), ...].  The spiral's 64
    offsets share only 9 distinct column shifts, so a kernel iterating
    group-major lane-rolls the padded frame once per GROUP and only
    sublane-rolls per offset — lane rolls (cross-lane data movement) are
    the expensive half of the per-offset cost."""
    groups: dict = {}
    order: list = []
    for rank, (rs, cs) in enumerate(np.asarray(shifts)):
        if int(cs) not in groups:
            groups[int(cs)] = []
            order.append(int(cs))
        groups[int(cs)].append((int(rs), rank))
    return [(cs, groups[cs]) for cs in order]


@functools.partial(jax.jit, static_argnames=("interpret",))
def sad_mc_best(cur: jnp.ndarray, pad: jnp.ndarray, interpret: bool = False):
    """Fused ME + luma MC + dense canonical SADs, grouped rolls: same (best, zc, sads, pred)
    outputs, ~half the roll work and no HIGHEST-precision matmul.

    * offsets iterate GROUP-major (9 lane rolls total, one sublane roll
      per offset) — the canonical spiral ORDER no longer matches the
      iteration order, so selection uses the order-independent key
      s*64 + rank (min-key == first strict minimum in spiral order).
    * the MB reduction's second matmul ran at precision=HIGHEST (row
      sums up to 4080 exceed the single-pass-bf16 exact range); here the
      column-sum stage converts to int and splits into bf16-exact
      nibble/byte halves, so BOTH matmuls run at default precision.
    * CONTRACT (narrower than sad_best's): best and pred are the
      canonical first-strict-minimum WITHOUT the two-zero-SAD override.
      They are exact whenever no MB reaches zc >= 2 — exactly the
      condition under which engine.inter's fixed branch consumes them
      (any zc >= 2 routes to the stateful union branch, which recomputes
      MVs and MC from the dense SAD rows and ignores best/pred).  zc and
      sads keep full semantics (they gate/feed that branch).
    """
    g, h, w = cur.shape
    pad = _lane_extend(pad)
    ph, pw = pad.shape[-2], pad.shape[-1]
    mbh, mbw = h // 16, w // 16
    shifts = _roll_shifts(np.asarray(SPIRAL), 16, ph, pw)
    groups = _grouped_shifts(shifts)
    step2row = SPIRAL_STATE_IDX[0].astype(np.int32)

    def kernel(cur_ref, pad_ref, best_ref, zc_ref, sads_ref, pred_ref):
        cur_i = cur_ref[0].astype(jnp.int32)
        pad_i = pad_ref[0].astype(jnp.int32)
        rowsum = _iota_eq(mbh, h, 16)        # (mbh, H)
        colsum = _iota_eq(mbw, w, 16).T      # (W, mbw)

        curkey = jnp.full((mbh, mbw), jnp.iinfo(jnp.int32).max, jnp.int32)
        zc = jnp.zeros((mbh, mbw), jnp.int32)
        pred = jnp.zeros((h, w), jnp.int32)
        for cs, members in groups:
            cached = pltpu.roll(pad_i, cs, axis=1)          # per-group
            for rs, rank in members:
                win = pltpu.roll(cached, rs, axis=0)[:h, :w]
                d = (jnp.maximum(cur_i, win) - jnp.minimum(cur_i, win)
                     ).astype(jnp.float32)
                # (H, W) @ (W, mbw): inputs <= 255, bf16-exact at
                # default precision; f32 accumulation exact (< 2^24)
                csum = jnp.dot(d, colsum, preferred_element_type=jnp.float32)
                csi = csum.astype(jnp.int32)                # <= 4080
                hi = jax.lax.shift_right_logical(csi, np.int32(4))
                lo = csi & 15
                s = (
                    jnp.dot(rowsum, _f32c(hi), preferred_element_type=jnp.float32)
                    * 16.0
                    + jnp.dot(rowsum, _f32c(lo), preferred_element_type=jnp.float32)
                ).astype(jnp.int32)
                sads_ref[0, step2row[rank]] = s
                key = s * 64 + rank
                lt = key < curkey
                um = jnp.dot(
                    jnp.dot(rowsum.T, lt.astype(jnp.float32),
                            preferred_element_type=jnp.float32),
                    colsum.T,
                    preferred_element_type=jnp.float32,
                )
                pred = jnp.where(um != 0, win, pred)
                curkey = jnp.where(lt, key, curkey)
                zc = zc + (s == 0).astype(jnp.int32)
        best_ref[0] = curkey & 63                           # rank of min key
        zc_ref[0] = zc
        pred_ref[0] = pred.astype(jnp.uint8)

    mb_spec = pl.BlockSpec((1, mbh, mbw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ph, pw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            mb_spec,
            mb_spec,
            pl.BlockSpec((1, N_CANON, mbh, mbw), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((g, mbh, mbw), jnp.int32),
            jax.ShapeDtypeStruct((g, mbh, mbw), jnp.int32),
            jax.ShapeDtypeStruct((g, N_CANON, mbh, mbw), jnp.int32),
            jax.ShapeDtypeStruct((g, h, w), jnp.uint8),
        ),
        compiler_params=_vmem_params(ph, pw, h, w, 6),
        interpret=interpret,
    )(cur, pad)


def _f32c(x):
    return x.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def sad_union_extra(cur: jnp.ndarray, pad: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Dense SADs at the NON-canonical union offsets only:
    (G, N_UNION - N_CANON, mbh, mbw) int32 in union-row order (rows
    N_CANON..).  Concatenated after sad_mc_best's canonical rows this
    yields the full union tensor at 66 extra rolls instead of 129."""
    return _sad_dense_rolls(cur, pad, SPIRAL_UNION[N_CANON:], interpret)


def _sad_dense_rolls(cur, pad, offsets, interpret):
    g, h, w = cur.shape
    pad = _lane_extend(pad)
    ph, pw = pad.shape[-2], pad.shape[-1]
    mbh, mbw = h // 16, w // 16
    shifts = _roll_shifts(np.asarray(offsets), 16, ph, pw)
    nu = len(shifts)

    def kernel(cur_ref, pad_ref, out_ref):
        cur_i = cur_ref[0].astype(jnp.int32)
        pad_i = pad_ref[0].astype(jnp.int32)
        rowsum = _iota_eq(mbh, h, 16)
        colsum = _iota_eq(mbw, w, 16).T

        # grouped rolls + bf16-exact split reduction (r5, as in
        # sad_mc_best): output rows are keyed by rank, so group-major
        # iteration is order-free
        for cs, members in _grouped_shifts(shifts):
            cached = pltpu.roll(pad_i, cs, axis=1)
            for rs, rank in members:
                win = pltpu.roll(cached, rs, axis=0)[:h, :w]
                d = (jnp.maximum(cur_i, win) - jnp.minimum(cur_i, win)
                     ).astype(jnp.float32)
                csum = jnp.dot(d, colsum, preferred_element_type=jnp.float32)
                csi = csum.astype(jnp.int32)            # <= 4080
                hi = jax.lax.shift_right_logical(csi, np.int32(4))
                lo = csi & 15
                s = (
                    jnp.dot(rowsum, _f32c(hi), preferred_element_type=jnp.float32)
                    * 16.0
                    + jnp.dot(rowsum, _f32c(lo), preferred_element_type=jnp.float32)
                ).astype(jnp.int32)
                out_ref[0, rank] = s

    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ph, pw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, nu, mbh, mbw), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((g, nu, mbh, mbw), jnp.int32),
        compiler_params=_vmem_params(ph, pw, h, w, 4),
        interpret=interpret,
    )(cur, pad)


@functools.partial(jax.jit, static_argnames=("interpret",))
def sad_union(cur: jnp.ndarray, pad: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Dense SADs at every stateful-union offset: (G, N_UNION, mbh, mbw)
    int32 in SPIRAL_UNION row order.  Feeds ops.me.stateful_select on the
    content class where the canonical fixed-table walk breaks early.
    The production engine prefers sad_mc_best's canonical rows +
    sad_union_extra (66 rolls); this full 129-roll sweep is kept for the
    tiles path spec tests and standalone use."""
    return _sad_dense_rolls(cur, pad, SPIRAL_UNION, interpret)


def _vmem_params(ph: int, pw: int, h: int, w: int, n32: int) -> pltpu.CompilerParams:
    """Scoped-VMEM limit for the roll kernels at large resolutions: the
    Mosaic default (16 MB) fits CIF but not 720p's i32 intermediates.
    n32 generously counts the 4-byte frame-sized live values (padded
    frame + rolled window + per-kernel accumulators); v5e has 128 MB of
    VMEM so the 2x-slack estimate is clamped there."""
    est = 4 * (2 * ph * pw + n32 * h * w)
    lim = int(min(120 * 2**20, max(32 * 2**20, 2 * est)))
    return pltpu.CompilerParams(vmem_limit_bytes=lim)


def _mc_select(pad, idx, offsets: tuple, block: int, padlen: int, interpret: bool):
    """pad: (B, H+2p, W+2p) uint8; idx: (B, H//block, W//block) int32 of
    offset-table indices.  Returns pred (B, H, W) uint8.

    `pltpu.roll` only lowers for 32-bit vectors on this Mosaic ("Rotate
    with non-32-bit data" — a uint8-roll variant failed chip compile in
    round 3), so the frame is widened to i32 for the rolls and narrowed
    back to uint8 only at the store; the 720p VMEM pressure that
    motivated the uint8 attempt is handled by raising the scoped-VMEM
    limit instead (_vmem_params)."""
    b, bh, bw = idx.shape
    h, w = bh * block, bw * block
    pad = _lane_extend(pad)
    ph, pw = pad.shape[-2], pad.shape[-1]
    shifts = _roll_shifts(np.asarray(offsets, np.int32), padlen, ph, pw)

    def kernel(sh_ref, idx_ref, pad_ref, out_ref):
        pad_i = pad_ref[0].astype(jnp.int32)
        # per-pixel offset-id map: elementwise block expansion via 0/1
        # matmuls (pltpu.repeat has tile, not elementwise, semantics).
        # Default (single-pass bf16) precision is exact here: every
        # value in play is a 0/1 or an offset index <= 128, and each
        # output element is a one-term product — nothing exceeds bf16's
        # exact-integer range at any point.
        rows = _iota_eq(bh, h, block)        # (bh, H)
        cols = _iota_eq(bw, w, block)        # (bw, W)
        bm = jnp.dot(
            jnp.dot(rows.T, idx_ref[0].astype(jnp.float32), preferred_element_type=jnp.float32),
            cols,
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)                   # (H, W)

        # NOT grouped-roll (unlike sad_mc_best/_sad_dense_rolls): the
        # statically-unrolled grouped variant deterministically crashed
        # the remote Mosaic compile helper at the 720p luma shape
        # (tpu_compile_helper exit 1; CIF compiled fine), so the select
        # keeps the compact fori_loop + SMEM shift-table formulation
        def body(u, pred):
            win = pltpu.roll(
                pltpu.roll(pad_i, sh_ref[u, 0], axis=0), sh_ref[u, 1], axis=1
            )[:h, :w]
            return jnp.where(bm == u, win, pred)

        pred = jax.lax.fori_loop(
            0, len(shifts), body, jnp.zeros((h, w), jnp.int32)
        )
        out_ref[0] = pred.astype(jnp.uint8)

    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bh, bw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ph, pw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.uint8),
        compiler_params=_vmem_params(ph, pw, h, w, 4),
        interpret=interpret,
    )(jnp.asarray(shifts), idx, pad)


@functools.partial(jax.jit, static_argnames=("interpret",))
def mc_select_luma(pad: jnp.ndarray, best: jnp.ndarray, interpret: bool = False):
    """Luma predictor frame from spiral indices (16-px pad, 16x16 MBs)."""
    offsets = tuple((int(ox), int(oy)) for ox, oy in np.asarray(SPIRAL))
    return _mc_select(pad, best, offsets, 16, 16, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def mc_select_chroma(pad: jnp.ndarray, cidx: jnp.ndarray, interpret: bool = False):
    """Chroma predictor frame from chroma offset indices (8-px pad, 8x8
    blocks).  cidx = SPIRAL_TO_CHROMA[best]."""
    offsets = tuple((int(ox), int(oy)) for ox, oy in np.asarray(CHROMA_OFFSETS))
    return _mc_select(pad, cidx, offsets, 8, 8, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def mc_select_luma_union(pad: jnp.ndarray, best_u: jnp.ndarray, interpret: bool = False):
    """Luma predictor frame from *union* offset indices (stateful ME's
    slow branch: MVs can be any of the 129 state-machine offsets)."""
    offsets = tuple((int(ox), int(oy)) for ox, oy in SPIRAL_UNION)
    return _mc_select(pad, best_u, offsets, 16, 16, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def mc_select_chroma_union(pad: jnp.ndarray, cidx_u: jnp.ndarray, interpret: bool = False):
    """Chroma predictor frame from chroma-union offset indices
    (cidx_u = UNION_TO_CHROMA_U[best_u])."""
    offsets = tuple((int(ox), int(oy)) for ox, oy in CHROMA_U_OFFSETS)
    return _mc_select(pad, cidx_u, offsets, 8, 8, interpret)


def best_from_mv_union(mv: jnp.ndarray) -> jnp.ndarray:
    """Map MVs to union-offset indices (decode side, stateful ME): every
    bitstream MV is -SPIRAL_UNION[k] for some k; union rows are unique so
    the match is exact.  Same precondition/caveat as best_from_mv."""
    eq = (mv[..., None, 0] == NEG_UNION[:, 0]) & (mv[..., None, 1] == NEG_UNION[:, 1])
    return jnp.argmax(eq, axis=-1).astype(jnp.int32)


def best_from_mv(mv: jnp.ndarray) -> jnp.ndarray:
    """Map MVs back to spiral indices (decode side: every bitstream MV is
    -SPIRAL[k]; duplicates resolve to the first index, which selects the
    identical window).

    PRECONDITION: every MV must be one of the 64 spiral offsets — true for
    any bitstream this encoder (or the reference) produced.  An out-of-table
    MV (corrupted/foreign bitstream) silently maps to index 0 (argmax of an
    all-false row); callers needing to detect that case must route through
    the XLA decode path or validate MVs host-side first (codec.decode's
    exact path does the former)."""
    neg = NEG_SPIRAL  # (64, 2) numpy constant
    eq = (mv[..., None, 0] == neg[:, 0]) & (mv[..., None, 1] == neg[:, 1])
    return jnp.argmax(eq, axis=-1).astype(jnp.int32)
