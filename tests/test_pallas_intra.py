"""Fused pallas intra wavefront (ops/pallas_intra.py) == packed XLA scan.

Interpret mode on CPU; the real-chip Mosaic equality lives in
tests/test_tpu_chip.py (ICSP_TEST_TPU=1).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from icspcodec_tpu.constants import COS_ENC
from icspcodec_tpu.engine.wavefront import intra_luma_scan_packed
from icspcodec_tpu.ops.pallas_intra import intra_luma_scan_fused


def _blocks(f, gh, gw, seed):
    r = np.random.default_rng(seed)
    return jnp.asarray(r.integers(0, 256, (f, gh, gw, 8, 8), np.int32))


@pytest.mark.parametrize(
    "f,gh,gw,qdc,qac",
    [
        (3, 9, 12, 16, 16),   # small grid, pow2 qp
        (2, 36, 44, 8, 16),   # CIF grid
        (4, 6, 6, 10, 12),    # non-pow2 qp: f32-reciprocal C division
        (1, 4, 18, 16, 16),   # wide: nmax capped by gh
        (5, 18, 4, 16, 16),   # tall: short diagonals
    ],
)
def test_fused_equals_packed(f, gh, gw, qdc, qac):
    orig = _blocks(f, gh, gw, seed=gh * 100 + gw)
    ref = intra_luma_scan_packed(orig, qdc, qac, table=COS_ENC, dtype=jnp.float32)
    got = intra_luma_scan_fused(
        orig, qdc, qac, table=COS_ENC, dtype=jnp.float32, interpret=True
    )
    for k in ("recon", "scan", "mpm", "mode_bit"):
        np.testing.assert_array_equal(
            np.asarray(got[k]), np.asarray(ref[k]), err_msg=k
        )


def test_fused_through_engine():
    """encode_intra_frames(me="pallas_interpret") == default XLA output."""
    from icspcodec_tpu.engine.intra import encode_intra_frames

    r = np.random.default_rng(7)
    y = jnp.asarray(r.integers(0, 256, (2, 96, 128), np.uint8))
    cb = jnp.asarray(r.integers(0, 256, (2, 48, 64), np.uint8))
    cr = jnp.asarray(r.integers(0, 256, (2, 48, 64), np.uint8))
    ref = encode_intra_frames(y, cb, cr, 16, 16, table=COS_ENC, dtype=jnp.float32)
    got = encode_intra_frames(
        y, cb, cr, 16, 16, table=COS_ENC, dtype=jnp.float32, me="pallas_interpret"
    )
    for k in ref:
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(ref[k]), err_msg=k)


def test_fused_rejects_f64():
    with pytest.raises(ValueError):
        intra_luma_scan_fused(_blocks(1, 4, 4, 0), 16, 16, dtype=jnp.float64)


@pytest.mark.parametrize(
    "f,gh,gw,qdc,qac",
    [(3, 9, 12, 16, 16), (2, 36, 44, 8, 16), (4, 6, 6, 10, 12)],
)
def test_decode_fused_equals_xla(f, gh, gw, qdc, qac):
    """Fused decode kernel (izigzag+dequant+DC chain+IDCT+wavefront) ==
    the XLA composition, round-tripping real encoder symbols."""
    from icspcodec_tpu.constants import COS_DEC
    from icspcodec_tpu.engine.intra import decode_intra_frames
    from icspcodec_tpu.ops.pallas_intra import intra_luma_decode_fused
    from icspcodec_tpu.engine.intra import from_blocks

    orig = _blocks(f, gh, gw, seed=5 + gh)
    enc = intra_luma_scan_packed(orig, qdc, qac, table=COS_ENC, dtype=jnp.float32)
    got = intra_luma_decode_fused(
        enc["scan"], enc["mpm"], enc["mode_bit"], qdc, qac, COS_DEC,
        dtype=jnp.float32, interpret=True,
    )
    # reference: XLA inverse composition (engine.intra.decode_intra_frames
    # luma path) must reproduce the encoder's reconstruction
    import jax.numpy as jnp2
    from icspcodec_tpu.engine.wavefront import (
        idc_dpcm_scan, intra_luma_decode_scan_packed, luma_dc_kind,
    )
    from icspcodec_tpu.ops.quant import dequant_block
    from icspcodec_tpu.ops.scanorder import izigzag
    from icspcodec_tpu.ops.transforms import idct

    q = izigzag(enc["scan"])
    iq = dequant_block(q, qdc, qac)
    dq_dc = idc_dpcm_scan(iq[..., 0, 0], luma_dc_kind(gh, gw))
    iq = iq.at[..., 0, 0].set(dq_dc)
    r = idct(iq, table=COS_DEC, dtype=jnp.float32)
    ref = intra_luma_decode_scan_packed(r, enc["mpm"], enc["mode_bit"], dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize(
    "f,gh,gw,qstep,chroma",
    [
        (4, 18, 22, 16, True),    # CIF chroma grid
        (3, 9, 11, 10, True),     # odd-width chroma grid (QCIF), non-pow2 qp
        (2, 36, 44, 8, False),    # CIF luma grid (inter DC chain)
        (5, 4, 6, 1, True),       # qstep 1
    ],
)
def test_dc_chain_fused_equals_scan(f, gh, gw, qstep, chroma):
    """Fused DC-DPCM chain (ops/pallas_dc.py) == the XLA packed scan,
    forward (both rounding regimes) and inverse."""
    from icspcodec_tpu.engine.wavefront import (
        chroma_dc_kind, dc_dpcm_scan, idc_dpcm_scan, luma_dc_kind,
    )
    from icspcodec_tpu.ops.pallas_dc import dc_dpcm_fused, idc_dpcm_fused

    r = np.random.default_rng(f * 10 + gh)
    dc = jnp.asarray(r.uniform(-2000, 2000, (f, gh, gw)).astype(np.float32))
    kind = (chroma_dc_kind if chroma else luma_dc_kind)(gh, gw)
    q_ref, dq_ref = dc_dpcm_scan(dc, kind, qstep, chroma=chroma)
    q_got, dq_got = dc_dpcm_fused(dc, qstep, chroma=chroma, interpret=True)
    np.testing.assert_array_equal(np.asarray(q_got), np.asarray(q_ref))
    np.testing.assert_array_equal(np.asarray(dq_got), np.asarray(dq_ref))

    iq = jnp.asarray(r.integers(-2000, 2000, (f, gh, gw), np.int32))
    idq_ref = idc_dpcm_scan(iq, kind)
    idq_got = idc_dpcm_fused(iq, chroma=chroma, interpret=True)
    np.testing.assert_array_equal(np.asarray(idq_got), np.asarray(idq_ref))


@pytest.mark.parametrize(
    "f,gh,gw,qdc,qac,chroma",
    [
        (4, 18, 22, 16, 16, True),    # CIF chroma grid
        (3, 9, 11, 10, 12, True),     # odd-width chroma (QCIF), non-pow2 qp
        (2, 36, 44, 8, 16, False),    # CIF luma grid (inter residuals)
        (2, 6, 6, 1, 1, False),       # qstep 1: max symbol magnitudes
    ],
)
def test_xform_fused_equals_xla(f, gh, gw, qdc, qac, chroma):
    """Fused forward transform chain (ops/pallas_xform.py) == the XLA
    composition (fdct + dc_dpcm_scan + quant + zigzag + dequant + idct +
    acflag), both rounding regimes."""
    from icspcodec_tpu.constants import COS_DEC
    from icspcodec_tpu.engine.wavefront import (
        chroma_dc_kind, dc_dpcm_scan, idc_dpcm_scan, luma_dc_kind,
    )
    from icspcodec_tpu.ops.pallas_xform import xform_fwd_fused
    from icspcodec_tpu.ops.quant import ac_flag, c_trunc, dequant_block, quant_block
    from icspcodec_tpu.ops.scanorder import izigzag, zigzag
    from icspcodec_tpu.ops.transforms import fdct, idct

    r = np.random.default_rng(gh * 7 + gw)
    lo, hi = (0, 256) if chroma else (-255, 256)
    blocks = jnp.asarray(r.integers(lo, hi, (f, gh, gw, 8, 8), np.int32))
    kind = (chroma_dc_kind if chroma else luma_dc_kind)(gh, gw)

    d = fdct(blocks, table=COS_ENC, dtype=jnp.float32)
    q_dc, dq_dc = dc_dpcm_scan(d[..., 0, 0], kind, qdc, chroma=chroma)
    q = quant_block(d, qdc, qac, chroma=chroma)
    q = q.at[..., 0, 0].set(q_dc)
    sc_ref = zigzag(q)
    acf_ref = ac_flag(q)
    iq = dequant_block(q, qdc, qac)
    iq = iq.at[..., 0, 0].set(dq_dc)
    r_ref = idct(iq, table=COS_ENC, dtype=jnp.float32)
    if not chroma:
        r_ref = c_trunc(r_ref)

    got = xform_fwd_fused(blocks, qdc, qac, chroma, COS_ENC, interpret=True)
    np.testing.assert_array_equal(np.asarray(got["scan"]), np.asarray(sc_ref))
    np.testing.assert_array_equal(np.asarray(got["acflag"]), np.asarray(acf_ref))
    np.testing.assert_array_equal(np.asarray(got["r"]), np.asarray(r_ref))
    if not chroma:
        # r_plane: same values, frame layout
        from icspcodec_tpu.engine.intra import from_blocks

        gp = xform_fwd_fused(blocks, qdc, qac, chroma, COS_ENC,
                             interpret=True, r_plane=True)
        np.testing.assert_array_equal(
            np.asarray(gp["r_plane"]),
            np.asarray(from_blocks(r_ref.reshape(f, gh, gw, 8, 8))),
        )


def test_decode_fused_through_engine():
    from icspcodec_tpu.constants import COS_DEC
    from icspcodec_tpu.engine.intra import decode_intra_frames, encode_intra_frames

    r = np.random.default_rng(9)
    y = jnp.asarray(r.integers(0, 256, (2, 96, 128), np.uint8))
    cb = jnp.asarray(r.integers(0, 256, (2, 48, 64), np.uint8))
    cr = jnp.asarray(r.integers(0, 256, (2, 48, 64), np.uint8))
    enc = encode_intra_frames(y, cb, cr, 16, 16, table=COS_ENC, dtype=jnp.float32)
    args = (enc["y_scan"], enc["mpm"], enc["mode_bit"], enc["cb_scan"],
            enc["cr_scan"], 16, 16)
    ref = decode_intra_frames(*args, table=COS_DEC, dtype=jnp.float32)
    got = decode_intra_frames(*args, table=COS_DEC, dtype=jnp.float32,
                              me="pallas_interpret")
    for k in ref:
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(ref[k]), err_msg=k)
