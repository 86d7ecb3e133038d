#!/usr/bin/env python3
"""Round-5 on-chip attribution: where the intra-encode glue time and the
inter-step non-kernel time go (VERDICT r4 asks #1 and #3 decision data).

Carry-serialized fori_loop of K calls inside one jit, reported as
(t[K]-t[1])/(K-1) (CLAUDE.md methodology: ~24 ms tunnel floor,
block_until_ready unreliable).  Run ALONE on the chip.
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from icspcodec_tpu.constants import COS_ENC
    from icspcodec_tpu.engine.intra import (
        encode_chroma_batch, encode_intra_frames, to_blocks,
    )
    from icspcodec_tpu.io import load_yuv420
    from icspcodec_tpu.ops.pallas_intra import (
        _fused_tables, _intra_rows_fused, _rows_unpack, _shear_pack,
    )
    from icspcodec_tpu.ops.scanorder import zigzag
    from icspcodec_tpu.ops.transforms import _table_key
    from tools.make_content import synth_sequence

    NF, W, H = 300, 352, 288
    raw = synth_sequence("benchA", NF).tobytes()
    y, cb, cr = load_yuv420(raw, W, H, NF)
    yj, cbj, crj = jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr)
    orig = to_blocks(yj).astype(jnp.int32)
    fdim, gh, gw = orig.shape[:3]
    nsteps, nb, mp, hu_t, hl_t, kind_t, lane0 = _fused_tables(gh, gw, fdim)
    tkey = _table_key(np.asarray(COS_ENC))

    def per_call(body, k=9, args=()):
        # big operands must be jit ARGUMENTS: closure-captured arrays are
        # baked into the program as constants (a 189 MB constant blew the
        # remote compile service's request size limit)
        @functools.partial(jax.jit, static_argnames="k")
        def run(*arrs, k):
            def step(i, st):
                acc, d = st
                r = body(d, *arrs)
                return acc + r, (r % 2).astype(jnp.int32)
            return jax.lax.fori_loop(0, k, step, (jnp.int32(0), jnp.int32(0)))[0]

        def timed(kk):
            np.asarray(run(*args, k=kk))
            t0 = time.time()
            np.asarray(run(*args, k=kk))
            return time.time() - t0

        t1, tk = timed(1), timed(k)
        return max((tk - t1) / (k - 1), 1e-9)

    def cks(*vs):
        return sum(jnp.sum(v.astype(jnp.int32)) for v in vs)

    def kernel_rows(d, want_recon=True):
        orows = _shear_pack(
            (orig + d).reshape(fdim, gh, gw, 64).astype(jnp.uint8), gh, gw, nb, mp
        )
        return _intra_rows_fused(orows, hu_t, hl_t, kind_t, lane0, nb, 16, 16,
                                 tkey, want_recon=want_recon)

    # --- intra encode decomposition (r5 kernel: zig-zag + acflag in-kernel) ---
    def p_rows_only(d):
        rec, sc, flag, bit, acf = kernel_rows(d)
        return cks(rec, sc, flag, bit, acf)

    def p_rows_norec(d):
        _, sc, flag, bit, acf = kernel_rows(d, want_recon=False)
        return cks(sc, flag, bit, acf)

    def p_rows_rec_unpack(d):
        rec, sc, flag, bit, acf = kernel_rows(d)
        return cks(_rows_unpack(rec, fdim, gh, gw, nb), sc, flag, bit, acf)

    def p_rows_rec_plane(d):
        from icspcodec_tpu.ops.pallas_intra import _rows_unpack_plane

        rec, sc, flag, bit, acf = kernel_rows(d)
        return cks(_rows_unpack_plane(rec, fdim, gh, gw, nb), sc, flag, bit, acf)

    def p_rows_q_unpack(d):
        rec, sc, flag, bit, acf = kernel_rows(d)
        return cks(rec, _rows_unpack(sc, fdim, gh, gw, nb), flag, bit, acf)

    def p_rows_fb_unpack(d):
        rec, sc, flag, bit, acf = kernel_rows(d)
        return cks(rec, sc,
                   _rows_unpack(flag, fdim, gh, gw, nb),
                   _rows_unpack(bit, fdim, gh, gw, nb),
                   _rows_unpack(acf, fdim, gh, gw, nb))

    def p_chroma(d):
        out = encode_chroma_batch(
            jnp.concatenate([cbj, crj]) + d.astype(jnp.uint8), 16, 16,
            table=COS_ENC, dtype=jnp.float32, me="pallas",
        )
        return cks(*out.values())

    def p_full(d):
        out = encode_intra_frames(yj + d.astype(jnp.uint8), cbj, crj, 16, 16,
                                  table=COS_ENC, dtype=jnp.float32, me="pallas")
        return cks(*out.values())

    def p_full_norec(d):
        out = encode_intra_frames(yj + d.astype(jnp.uint8), cbj, crj, 16, 16,
                                  table=COS_ENC, dtype=jnp.float32, me="pallas",
                                  return_recon=False)
        return cks(*out.values())

    # --- device-entropy items + pack ---
    from icspcodec_tpu.bitstream_device import frame_items_dev, pack_frames_dev
    from icspcodec_tpu.engine.intra import _acflag_from_scan

    enc = jax.jit(
        lambda: encode_intra_frames(yj, cbj, crj, 16, 16, table=COS_ENC,
                                    dtype=jnp.float32, me="pallas")
    )()
    sym = {k: enc[k] for k in (
        "y_scan", "mpm", "mode_bit", "cb_scan", "cb_acflag", "cr_scan", "cr_acflag",
    )}
    sym["y_acflag"] = _acflag_from_scan(enc["y_scan"])
    ci, li = jax.jit(lambda: frame_items_dev(sym, True))()
    nbits = np.asarray(jnp.sum(li, axis=1))
    maxbytes = int(-(-int(nbits.max()) // (8 * 8192)) * 8192)
    print(f"items: {ci.shape}, max frame bits {nbits.max()}, maxbytes {maxbytes}",
          flush=True)

    def p_items(d):
        s2 = dict(sym, y_scan=sym["y_scan"] + d.astype(jnp.int16))
        c, l = frame_items_dev(s2, True)
        return cks(c, l)

    slab = 32
    cis, lis = ci[:slab], li[:slab]

    def p_pack_slab(d, c, l):
        p, n = pack_frames_dev(c + d.astype(jnp.uint32), l, maxbytes)
        return cks(p, n)

    def p_engine_items(d):
        from icspcodec_tpu.codec import _encode_intra_items_jit

        c, l, _ = _encode_intra_items_jit(
            yj + d.astype(jnp.uint8), cbj, crj, 16, 16, False,
            me="pallas", want_recon=False,
        )
        return cks(c, l)

    # decode with the in-kernel inverse zig-zag
    from icspcodec_tpu.constants import COS_DEC
    from icspcodec_tpu.engine.intra import decode_intra_frames

    def p_decode_full(d):
        out = decode_intra_frames(
            enc["y_scan"] + d.astype(jnp.int16), enc["mpm"], enc["mode_bit"],
            enc["cb_scan"], enc["cr_scan"], 16, 16, table=COS_DEC,
            dtype=jnp.float32, me="pallas",
        )
        return cks(*out.values())

    probes = [
        ("kernel+shearpack, rows checksummed", p_rows_only, ()),
        ("rows, want_recon=False", p_rows_norec, ()),
        ("+ rec unpack only (blocks)", p_rows_rec_unpack, ()),
        ("+ rec unpack only (plane)", p_rows_rec_plane, ()),
        ("+ sc unpack only", p_rows_q_unpack, ()),
        ("+ flag/bit/acf unpacks only", p_rows_fb_unpack, ()),
        ("chroma batch (fused DC)", p_chroma, ()),
        ("FULL intra encode (fused)", p_full, ()),
        ("FULL intra encode, no recon", p_full_norec, ()),
        ("frame_items_dev (clz vlc)", p_items, ()),
        (f"pack_frames_dev slab={slab}", p_pack_slab, (cis, lis)),
        ("engine+items, no recon (pixels->items)", p_engine_items, ()),
        ("FULL intra decode (fused, in-kernel izz)", p_decode_full, ()),
    ]
    for name, fn, extra in probes:
        t = per_call(fn, args=extra)
        scale = NF if not extra else slab
        print(f"{name:42s} {t*1e3:8.2f} ms -> {scale/t:8.0f} fps"
              + ("" if not extra else f" (per {slab} frames)"), flush=True)


if __name__ == "__main__":
    main()
