"""Real-chip tests (opt-in: ICSP_TEST_TPU=1, TPU must be otherwise idle).

Run this file ALONE (`ICSP_TEST_TPU=1 pytest tests/test_tpu_chip.py`):
it must not share a process with modules that enable x64 — float64
tracing on the axon backend recurses in dtype canonicalization.
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("ICSP_TEST_TPU", "0") != "1",
    reason="real-chip test: set ICSP_TEST_TPU=1 (and keep the TPU single-client)",
)


def test_pallas_kernels_on_chip_match_xla():
    """Compiled (Mosaic) pallas ME/MC == XLA formulation on the real TPU,
    through the full inter GOP engine (encode).  Guards against the class
    of silent mis-lowerings documented in CLAUDE.md (misaligned slicing,
    single-pass-bf16 matmuls)."""
    import jax
    import jax.numpy as jnp

    from icspcodec_tpu.constants import COS_ENC
    from icspcodec_tpu.engine.inter import encode_gop

    assert jax.default_backend() != "cpu"
    rng = np.random.default_rng(11)
    g, p, h, w = 3, 4, 288, 352
    yn = rng.integers(0, 256, (g, p, h, w), np.uint8)
    # saturated static square: black reconstructs exactly (clip at 0), so
    # P-frames hit zero-SAD MBs -> the stateful break branch (sad_union +
    # mc_select_*_union kernels) compiles and runs on-chip too
    yn[..., 32:96, 32:96] = 0
    y = jnp.asarray(yn)
    cb = jnp.asarray(rng.integers(0, 256, (g, p, h // 2, w // 2), np.uint8))
    cr = jnp.asarray(rng.integers(0, 256, (g, p, h // 2, w // 2), np.uint8))
    a = jax.jit(lambda *t: encode_gop(*t, 16, 16, table=COS_ENC, dtype=jnp.float32, me="xla"))(y, cb, cr)
    b = jax.jit(lambda *t: encode_gop(*t, 16, 16, table=COS_ENC, dtype=jnp.float32, me="pallas"))(y, cb, cr)
    for pa, pb in zip(a, b):
        for k in pa:
            assert np.array_equal(np.asarray(pa[k]), np.asarray(pb[k])), k


def test_device_entropy_and_packed_intra_on_chip():
    """Round-3 surfaces on the real chip: (a) the device entropy pack
    emits bytes identical to the host writer, (b) the packed-diagonal
    intra wavefront equals the grid formulation when compiled by
    XLA:TPU (guards Mosaic/XLA lowering differences, as the r1 tests do
    for the ME kernels)."""
    import jax
    import jax.numpy as jnp

    from icspcodec_tpu.codec import encode
    from icspcodec_tpu.config import CodecConfig
    from icspcodec_tpu.engine.intra import to_blocks
    from icspcodec_tpu.engine.wavefront import intra_luma_scan, intra_luma_scan_packed
    from icspcodec_tpu.io import load_yuv420
    from tools.make_content import synth_sequence

    assert jax.default_backend() != "cpu"
    nf = 12
    raw = synth_sequence("synthStatic", nf).tobytes()
    y, cb, cr = load_yuv420(raw, 352, 288, nf)
    base = dict(qp_dc=16, qp_ac=16, intra_period=10, precision="fast")
    bh, _ = encode(y, cb, cr, CodecConfig(**base, entropy="host"))
    bd, _ = encode(y, cb, cr, CodecConfig(**base, entropy="device"))
    assert bh == bd

    orig = to_blocks(jnp.asarray(y[:2])).astype(jnp.int32)
    a = jax.jit(lambda o: intra_luma_scan(o, 16, 16, dtype=jnp.float32))(orig)
    b = jax.jit(lambda o: intra_luma_scan_packed(o, 16, 16, dtype=jnp.float32))(orig)
    for k in ("recon", "scan", "mpm", "mode_bit"):
        assert np.array_equal(np.asarray(a[k]), np.asarray(b[k])), k


def test_fused_intra_kernel_on_chip_matches_xla():
    """Compiled (Mosaic) fused intra wavefront kernel == packed XLA scan
    on the real TPU, at the bench's F=300 CIF shape and through the
    engine (chroma + symbol narrowing).  Covers the round-4 single-kernel
    wavefront (ops/pallas_intra.py): lane rotates, DEFAULT-precision
    DCT/IDCT matmuls, HIGHEST zigzag/extractions, f32 C-division."""
    import jax
    import jax.numpy as jnp

    from icspcodec_tpu.constants import COS_ENC
    from icspcodec_tpu.engine.intra import encode_intra_frames, to_blocks
    from icspcodec_tpu.engine.wavefront import intra_luma_scan_packed
    from icspcodec_tpu.ops.pallas_intra import intra_luma_scan_fused

    assert jax.default_backend() != "cpu"
    rng = np.random.default_rng(23)
    f, h, w = 300, 288, 352
    y = jnp.asarray(rng.integers(0, 256, (f, h, w), np.uint8))
    orig = to_blocks(y).astype(jnp.int32)
    a = jax.jit(lambda o: intra_luma_scan_packed(o, 16, 16, dtype=jnp.float32))(orig)
    b = jax.jit(lambda o: intra_luma_scan_fused(o, 16, 16, dtype=jnp.float32))(orig)
    for k in ("recon", "scan", "mpm", "mode_bit"):
        assert np.array_equal(np.asarray(a[k]), np.asarray(b[k])), k

    cb = jnp.asarray(rng.integers(0, 256, (4, h // 2, w // 2), np.uint8))
    cr = jnp.asarray(rng.integers(0, 256, (4, h // 2, w // 2), np.uint8))
    ya = y[:4]
    ea = jax.jit(lambda *t: encode_intra_frames(*t, 16, 16, table=COS_ENC, dtype=jnp.float32, me="xla"))(ya, cb, cr)
    eb = jax.jit(lambda *t: encode_intra_frames(*t, 16, 16, table=COS_ENC, dtype=jnp.float32, me="pallas"))(ya, cb, cr)
    for k in ea:
        assert np.array_equal(np.asarray(ea[k]), np.asarray(eb[k])), k

    # 720p shape: XLA:TPU's multi-axis gather hard-crashed the worker at
    # this grid (90x160) until the unpack switched to single-axis takes;
    # compile AND run the full fused path here so shape-dependent
    # backend faults can't ship again (VERDICT r3: large-resolution
    # operation must demonstrably run)
    y7 = jnp.asarray(rng.integers(0, 256, (2, 720, 1280), np.uint8))
    cb7 = jnp.asarray(rng.integers(0, 256, (2, 360, 640), np.uint8))
    cr7 = jnp.asarray(rng.integers(0, 256, (2, 360, 640), np.uint8))
    e7a = jax.jit(lambda *t: encode_intra_frames(*t, 16, 16, table=COS_ENC, dtype=jnp.float32, me="xla"))(y7, cb7, cr7)
    e7b = jax.jit(lambda *t: encode_intra_frames(*t, 16, 16, table=COS_ENC, dtype=jnp.float32, me="pallas"))(y7, cb7, cr7)
    for k in e7a:
        assert np.array_equal(np.asarray(e7a[k]), np.asarray(e7b[k])), f"720p {k}"

    # fused DECODE kernel: symbols -> planes, pallas == xla on chip
    from icspcodec_tpu.constants import COS_DEC
    from icspcodec_tpu.engine.intra import decode_intra_frames

    args = (eb["y_scan"], eb["mpm"], eb["mode_bit"], eb["cb_scan"], eb["cr_scan"])
    da = jax.jit(lambda *t: decode_intra_frames(*t, 16, 16, table=COS_DEC, dtype=jnp.float32, me="xla"))(*args)
    db = jax.jit(lambda *t: decode_intra_frames(*t, 16, 16, table=COS_DEC, dtype=jnp.float32, me="pallas"))(*args)
    for k in da:
        assert np.array_equal(np.asarray(da[k]), np.asarray(db[k])), k
    assert np.array_equal(np.asarray(db["y"]), np.asarray(ea["recon_y"]))


def test_pallas_decode_on_chip_matches_xla():
    """Compiled pallas GOP *decode* == XLA decode on the real TPU: compiles
    mc_select_luma/chroma AND the union variants (dec src:4371-4419) —
    lax.cond compiles both MC branches regardless of the runtime
    predicate, so this covers the full decode MC kernel surface.  Added
    after round 3 shipped a Mosaic-only MC regression the encode-side
    chip test was never run against (VERDICT r3 next #2)."""
    import jax
    import jax.numpy as jnp

    from icspcodec_tpu.codec import _decode_gop_jit
    from icspcodec_tpu.constants import COS_ENC
    from icspcodec_tpu.engine.inter import encode_gop

    assert jax.default_backend() != "cpu"
    rng = np.random.default_rng(17)
    g, p, h, w = 2, 4, 288, 352
    yn = rng.integers(0, 256, (g, p, h, w), np.uint8)
    yn[..., 32:96, 32:96] = 0  # zero-SAD MBs -> stateful MVs in the stream
    y = jnp.asarray(yn)
    cb = jnp.asarray(rng.integers(0, 256, (g, p, h // 2, w // 2), np.uint8))
    cr = jnp.asarray(rng.integers(0, 256, (g, p, h // 2, w // 2), np.uint8))
    intra, inter = jax.jit(
        lambda *t: encode_gop(*t, 16, 16, table=COS_ENC, dtype=jnp.float32, me="xla")
    )(y, cb, cr)
    sym_i = {k: intra[k] for k in ("y_scan", "mpm", "mode_bit", "cb_scan", "cr_scan")}
    sym_p = {k: inter[k] for k in ("y_scan", "mv_diff", "cb_scan", "cr_scan")}
    a = _decode_gop_jit(sym_i, sym_p, 16, 16, False, me="xla")
    b = _decode_gop_jit(sym_i, sym_p, 16, 16, False, me="pallas")
    for pa, pb in zip(a, b):
        for k in pa:
            assert np.array_equal(np.asarray(pa[k]), np.asarray(pb[k])), k
    # decode must reproduce the encoder's reconstruction
    assert np.array_equal(np.asarray(b[0]["y"]), np.asarray(intra["recon_y"]))
    assert np.array_equal(np.asarray(b[1]["y"]), np.asarray(inter["recon_y"]))
