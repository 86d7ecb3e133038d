"""Vectorized bitstream serialization.

The reference emits bits one at a time through a byte-shift loop
(intraBody/interBody, enc src:4923-5236).  Rebuilt as whole-frame numpy
array ops: every bitstream item (flag bits, VLC codes, the 63 zero bits
of an empty AC block) becomes one (code, length) pair; lengths prefix-sum
into bit positions and a single vectorized expansion packs the stream.

Key equivalence used for the empty-AC case: when acflag==1 the reference
writes 63 literal zero bits — exactly one '0' per AC coefficient — so the
item structure per coefficient block is *constant* (DC, acflag, 63 AC
items) with AC item length 1 when acflag==1, making the whole frame
vectorizable with no data-dependent layout.
"""
from __future__ import annotations

import numpy as np

from .oracle import pack_header  # single source of truth for the header


def vlc_encode(values: np.ndarray):
    """Vectorized 13-category VLC (DCentropy enc src:5417-5602).

    Returns (codes uint64, lengths int64); code bits are right-aligned.
    """
    x = values.astype(np.int64)
    v = np.abs(x)
    sign = (x >= 0).astype(np.uint64)
    # exponent = floor(log2(v)) for v >= 2
    exp = np.zeros_like(v)
    nz = v > 0
    exp[nz] = np.floor(np.log2(v[nz])).astype(np.int64)
    payload = (v - (np.int64(1) << np.maximum(exp, 0))).astype(np.uint64)

    codes = np.zeros(x.shape, dtype=np.uint64)
    lengths = np.zeros(x.shape, dtype=np.int64)

    m = v == 0
    codes[m], lengths[m] = 0, 2

    m = v == 1
    codes[m] = (np.uint64(0b010) << np.uint64(1)) | sign[m]
    lengths[m] = 4

    prefix_small = {1: 0b011, 2: 0b100, 3: 0b101, 4: 0b110}
    for e, p in prefix_small.items():
        m = (v >= 2) & (exp == e)
        codes[m] = (
            ((np.uint64(p) << np.uint64(1)) | sign[m]) << np.uint64(e)
        ) | payload[m]
        lengths[m] = 3 + 1 + e

    m = exp >= 5
    if m.any():
        e = exp[m].astype(np.uint64)
        ones = ((np.uint64(1) << (e - np.uint64(2))) - np.uint64(1)) << np.uint64(1)
        codes[m] = (((ones << np.uint64(1)) | sign[m]) << e) | payload[m]
        lengths[m] = 2 * exp[m]
    return codes, lengths


def pack_items(codes: np.ndarray, lengths: np.ndarray) -> bytes:
    """Concatenate right-aligned codes MSB-first into the reference's byte
    stream: final partial byte keeps its bits in the LOW positions and one
    extra zero byte is appended when the stream ends byte-aligned."""
    codes = codes.ravel().astype(np.uint64)
    lengths = lengths.ravel().astype(np.int64)
    total = int(lengths.sum())
    ends = np.cumsum(lengths)
    starts = ends - lengths
    sym = np.repeat(np.arange(codes.size), lengths)
    pos = np.arange(total) - starts[sym]
    shift = (lengths[sym] - 1 - pos).astype(np.uint64)
    bits = ((codes[sym] >> shift) & np.uint64(1)).astype(np.uint8)

    full = total // 8
    out = np.zeros(full + 1, dtype=np.uint8)
    if full:
        out[:full] = np.packbits(bits[: full * 8])
    acc = 0
    for b in bits[full * 8:]:
        acc = (acc << 1) | int(b)
    out[full] = acc
    return out.tobytes()


# ---------------------------------------------------------------------------
# frame item assembly
# ---------------------------------------------------------------------------


def _coeff_block_items(scan: np.ndarray, acflag: np.ndarray):
    """(n, 64) scan + (n,) acflag -> (n, 65) (codes, lengths) items:
    DC VLC, acflag bit, 63 AC items (1 zero bit each when acflag==1)."""
    n = scan.shape[0]
    dc_c, dc_l = vlc_encode(scan[:, 0])
    ac_c, ac_l = vlc_encode(scan[:, 1:])
    flag = acflag.astype(np.uint64)
    empty = (acflag == 1)[:, None]
    ac_c = np.where(empty, np.uint64(0), ac_c)
    ac_l = np.where(empty, 1, ac_l)
    codes = np.concatenate(
        [dc_c[:, None], flag[:, None], ac_c], axis=1
    )
    lengths = np.concatenate(
        [dc_l[:, None], np.ones((n, 1), np.int64), ac_l], axis=1
    )
    return codes, lengths


def _y_subblocks(arr: np.ndarray):
    """(gh, gw, ...) global grid -> (nmb, 4, ...) in MB/sub-block order."""
    gh, gw = arr.shape[:2]
    x = arr.reshape(gh // 2, 2, gw // 2, 2, *arr.shape[2:])
    x = np.moveaxis(x, 2, 1)  # (mbh, mbw, sy, sx, ...)
    return x.reshape((gh // 2) * (gw // 2), 4, *arr.shape[2:])


def frame_items(sym: dict, is_intra: bool):
    """Build the (codes, lengths) item arrays for one frame's symbols.

    sym fields are numpy arrays: y_scan (gh,gw,64), y_acflag, mpm,
    mode_bit, cb/cr_scan (mbh,mbw,64) + acflags, mv_diff (mbh,mbw,2).
    """
    ysc = _y_subblocks(sym["y_scan"])            # (nmb, 4, 64)
    yac = _y_subblocks(sym["y_acflag"])          # (nmb, 4)
    nmb = ysc.shape[0]
    yc, yl = _coeff_block_items(ysc.reshape(nmb * 4, 64), yac.reshape(nmb * 4))
    yc = yc.reshape(nmb, 4, 65)
    yl = yl.reshape(nmb, 4, 65)

    if is_intra:
        mpm = _y_subblocks(sym["mpm"]).astype(np.uint64)      # (nmb, 4)
        bit = _y_subblocks(sym["mode_bit"]).astype(np.uint64)
        # per sub-block: mpm(1) bit(1) + 65 coeff items = 67
        codes = np.concatenate([mpm[..., None], bit[..., None], yc], axis=2)
        lengths = np.concatenate(
            [np.ones((nmb, 4, 2), np.int64), yl], axis=2
        )
        head_c = np.zeros((nmb, 0), np.uint64)
        head_l = np.zeros((nmb, 0), np.int64)
    else:
        codes, lengths = yc, yl
        mvd = sym["mv_diff"].reshape(nmb, 2)
        mvx_c, mvx_l = vlc_encode(mvd[:, 0])
        mvy_c, mvy_l = vlc_encode(mvd[:, 1])
        one = np.ones(nmb, np.uint64)
        head_c = np.stack([one, mvx_c, mvy_c], axis=1)
        head_l = np.stack([np.ones(nmb, np.int64), mvx_l, mvy_l], axis=1)

    cbc, cbl = _coeff_block_items(
        sym["cb_scan"].reshape(nmb, 64), sym["cb_acflag"].reshape(nmb)
    )
    crc, crl = _coeff_block_items(
        sym["cr_scan"].reshape(nmb, 64), sym["cr_acflag"].reshape(nmb)
    )
    all_c = np.concatenate(
        [head_c, codes.reshape(nmb, -1), cbc, crc], axis=1
    )
    all_l = np.concatenate(
        [head_l, lengths.reshape(nmb, -1), cbl, crl], axis=1
    )
    return all_c.ravel(), all_l.ravel()


def write_bitstream(frames_syms: list, height: int, width: int, qdc: int, qac: int, period: int) -> bytes:
    """frames_syms: list of (sym dict of numpy arrays, is_intra)."""
    cs, ls = [], []
    for sym, is_intra in frames_syms:
        c, l = frame_items(sym, is_intra)
        cs.append(c)
        ls.append(l)
    body = pack_items(np.concatenate(cs), np.concatenate(ls))
    return pack_header(height, width, qdc, qac, period) + body
