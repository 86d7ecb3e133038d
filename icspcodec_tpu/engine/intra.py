"""Intra frame engine: batched whole-frame encode/decode.

Everything embarrassingly parallel (chroma DCT, AC quantization, IDCT,
plane assembly) runs as one batched op over all blocks of all frames;
only the DC chain and the luma pixel wavefront are lax.scans
(engine/wavefront.py).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..constants import COS_ENC
from ..ops.quant import ac_flag, c_div, c_trunc, dequant_block, quant_block
from ..ops.scanorder import izigzag, zigzag
from ..ops.transforms import fdct, idct
from .wavefront import (
    chroma_dc_kind,
    dc_dpcm_scan,
    idc_dpcm_scan,
    intra_luma_decode_scan,
    intra_luma_decode_scan_packed,
    intra_luma_scan,
    intra_luma_scan_packed,
    luma_dc_kind,
)


def to_blocks(plane: jnp.ndarray, bs: int = 8) -> jnp.ndarray:
    """(..., H, W) -> (..., H//bs, W//bs, bs, bs)"""
    h, w = plane.shape[-2:]
    lead = plane.shape[:-2]
    x = plane.reshape(lead + (h // bs, bs, w // bs, bs))
    return jnp.moveaxis(x, -3, -2)


def from_blocks(blocks: jnp.ndarray) -> jnp.ndarray:
    gh, gw, bs = blocks.shape[-4], blocks.shape[-3], blocks.shape[-1]
    x = jnp.moveaxis(blocks, -2, -3)
    return x.reshape(blocks.shape[:-4] + (gh * bs, gw * bs))


def encode_chroma_batch(planes: jnp.ndarray, qdc: int, qac: int, table=COS_ENC, dtype=jnp.float64, me: str = "xla", xform: bool = False):
    """Forward chroma chain for (F, H, W) pixel planes (intra: raw pixels)
    or (F, gh, gw, 8, 8) residual blocks (inter).

    Returns dict(scan, acflag, idct) — idct is the float inverse-DCT
    output; callers finish reconstruction their own way.

    me: "pallas"/"pallas_interpret" run the sequential DC-DPCM chain as
    one fused kernel (ops/pallas_dc.py) on the fast f32 path.
    xform=True additionally runs the WHOLE chain as one fused kernel
    (ops/pallas_xform.py) — identical bits.  Measured: a win inside the
    GOP frame scan (small F, launch-overhead-bound) but a LOSS for big
    intra batches (F=600 CIF: 1.3 ms -> 3.4 ms — chroma is elementwise
    except the DC row, and the rows layout moves 64x more data through
    the wavefront machinery than the DC chain needs), so intra callers
    leave it off."""
    if planes.ndim == 3:
        blocks = to_blocks(planes).astype(jnp.int32)
    else:
        blocks = planes
    fdim, ch, cw = blocks.shape[:3]
    if xform and me != "xla" and dtype in (jnp.float32, np.float32):
        from ..ops.pallas_xform import xform_fwd_fused

        out = xform_fwd_fused(
            blocks, qdc, qac, chroma=True, table=table,
            interpret=(me == "pallas_interpret"),
        )
        return dict(scan=out["scan"], acflag=out["acflag"], idct=out["r"])
    d = fdct(blocks, table=table, dtype=dtype)
    kind = chroma_dc_kind(ch, cw)
    if me != "xla" and dtype in (jnp.float32, np.float32):
        from ..ops.pallas_dc import dc_dpcm_fused

        q_dc, dq_dc = dc_dpcm_fused(
            d[..., 0, 0], qdc, chroma=True,
            interpret=(me == "pallas_interpret"),
        )
    else:
        q_dc, dq_dc = dc_dpcm_scan(d[..., 0, 0], kind, qdc, chroma=True)
    q = quant_block(d, qdc, qac, chroma=True)
    q = q.at[..., 0, 0].set(q_dc)
    sc = zigzag(q)
    acf = ac_flag(q)
    iq = dequant_block(q, qdc, qac)
    iq = iq.at[..., 0, 0].set(dq_dc)
    r = idct(iq, table=table, dtype=dtype)
    return dict(scan=sc, acflag=acf, idct=r)


def encode_intra_frames(y: jnp.ndarray, cb: jnp.ndarray, cr: jnp.ndarray, qdc: int, qac: int, table=COS_ENC, dtype=jnp.float64, me: str = "xla", return_recon: bool = True):
    """Encode a batch of intra frames.

    y: (F, H, W) uint8; cb/cr: (F, H/2, W/2) uint8.
    Returns dict of all bitstream symbols, plus the recon planes when
    return_recon=True (the bitstream path doesn't need them; skipping
    drops the recon relayout/output work entirely).

    me: implementation selector (same vocabulary as the inter engine):
    "xla" runs the packed-diagonal XLA scan; "pallas" /
    "pallas_interpret" run the fused single-kernel wavefront
    (ops/pallas_intra.py) on the fast f32 path — bit-identical output,
    one pallas program instead of 114 scan steps.  The exact float64
    path always uses the XLA scan (the fused kernel is f32-only).
    """
    orig = to_blocks(y).astype(jnp.int32)
    # packed-diagonal wavefront: bit-identical to intra_luma_scan, reads
    # only constant-shifted boundary rows per step instead of gathering
    # the full block grid (throughput; see wavefront.py)
    if me != "xla" and dtype in (jnp.float32, np.float32):
        from ..ops.pallas_intra import intra_luma_scan_fused

        # zig-zag + acflag run in-kernel; recon comes back (if at all)
        # as ready uint8 planes — no grid-shaped intermediates
        lum = intra_luma_scan_fused(
            orig, qdc, qac, table=table, dtype=dtype,
            interpret=(me == "pallas_interpret"),
            want_recon=return_recon, recon_plane=True,
        )
        out = dict(
            y_scan=lum["scan"],                          # i16, zig-zag
            y_acflag=lum["acflag"].astype(jnp.int8),
            mpm=lum["mpm"].astype(jnp.int8),
            mode_bit=lum["mode_bit"].astype(jnp.int8),
        )
        if return_recon:
            out["recon_y"] = lum["recon_plane"]
    else:
        lum = intra_luma_scan_packed(orig, qdc, qac, table=table, dtype=dtype)
        # symbols travel device->host: narrow dtypes halve the transfer
        out = dict(
            y_scan=lum["scan"].astype(jnp.int16),
            y_acflag=_acflag_from_scan(lum["scan"]).astype(jnp.int8),
            mpm=lum["mpm"].astype(jnp.int8),
            mode_bit=lum["mode_bit"].astype(jnp.int8),
        )
        if return_recon:
            out["recon_y"] = from_blocks(lum["recon"]).astype(jnp.uint8)
    # Cb and Cr share the chain; stack them into one batch (one DC scan)
    f = cb.shape[0]
    c = encode_chroma_batch(
        jnp.concatenate([cb, cr]), qdc, qac, table=table, dtype=dtype, me=me
    )
    if return_recon:
        # intra chroma recon = clamp((int)idct) (intraImgReconstruct
        # enc src:1944-1960: truncation toward zero, then clamp)
        rec = jnp.clip(c_trunc(c["idct"]), 0, 255).astype(jnp.uint8)
        rec = from_blocks(rec)
    for i, name in enumerate(("cb", "cr")):
        sl = slice(i * f, (i + 1) * f)
        if return_recon:
            out[f"recon_{name}"] = rec[sl]
        out[f"{name}_scan"] = c["scan"][sl].astype(jnp.int16)
        out[f"{name}_acflag"] = c["acflag"][sl].astype(jnp.int8)
    return out


def _acflag_from_scan(scan: jnp.ndarray) -> jnp.ndarray:
    return (jnp.count_nonzero(scan[..., 1:], axis=-1) == 0).astype(jnp.int32)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def decode_intra_frames(y_scan, mpm, mode_bit, cb_scan, cr_scan, qdc, qac, table, dtype=jnp.float64, me: str = "xla"):
    """Inverse pipeline for a batch of intra frames (symbols -> planes).

    me: "xla" composes the batched inverse ops + packed decode scan;
    "pallas"/"pallas_interpret" run the whole luma path (izigzag,
    dequant, DC chain, IDCT, pixel wavefront) as one fused kernel
    (ops/pallas_intra.py) on the fast f32 path — identical bits."""
    if me != "xla" and dtype in (jnp.float32, np.float32):
        from ..ops.pallas_intra import intra_luma_decode_fused

        recon = intra_luma_decode_fused(
            y_scan, mpm, mode_bit, qdc, qac, table, dtype=dtype,
            interpret=(me == "pallas_interpret"),
        )
    else:
        q = izigzag(y_scan)
        iq = dequant_block(q, qdc, qac)
        gh, gw = q.shape[1:3]
        dq_dc = idc_dpcm_scan(iq[..., 0, 0], luma_dc_kind(gh, gw))
        iq = iq.at[..., 0, 0].set(dq_dc)
        r = idct(iq, table=table, dtype=dtype)
        recon = intra_luma_decode_scan_packed(r, mpm, mode_bit, dtype=dtype)
    out = dict(y=from_blocks(recon).astype(jnp.uint8))
    # Cb and Cr share the inverse chain: one batch, one DC scan/kernel
    # (the fully-fused inverse chain is reserved for the GOP frame scan —
    # at intra batch sizes the batched XLA composition is faster, see
    # encode_chroma_batch)
    f = cb_scan.shape[0]
    qc = izigzag(jnp.concatenate([cb_scan, cr_scan]))
    iqc = dequant_block(qc, qdc, qac)
    ch, cw = qc.shape[1:3]
    if me != "xla" and dtype in (jnp.float32, np.float32):
        from ..ops.pallas_dc import idc_dpcm_fused

        dqc = idc_dpcm_fused(
            iqc[..., 0, 0], chroma=True, interpret=(me == "pallas_interpret")
        )
    else:
        dqc = idc_dpcm_scan(iqc[..., 0, 0], chroma_dc_kind(ch, cw))
    iqc = iqc.at[..., 0, 0].set(dqc)
    rinv = idct(iqc, table=table, dtype=dtype)
    rc = from_blocks(jnp.clip(c_trunc(rinv), 0, 255).astype(jnp.uint8))
    out["cb"], out["cr"] = rc[:f], rc[f:]
    return out
