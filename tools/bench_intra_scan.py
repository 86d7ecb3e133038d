#!/usr/bin/env python3
"""On-chip A/B of the intra wavefront formulations (grid vs packed) and
the full intra frame encode.  Methodology: carry-serialized fori_loop of
K calls inside one jit, report (t[K]-t[1])/(K-1) (CLAUDE.md: the tunnel
has a ~24 ms round-trip floor; single-dispatch timings are garbage).

Run ALONE on the chip (single-client TPU).
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
    from icspcodec_tpu.engine.intra import encode_intra_frames, to_blocks
    from icspcodec_tpu.engine.wavefront import intra_luma_scan, intra_luma_scan_packed
    from icspcodec_tpu.io import load_yuv420
    from tools.make_content import synth_sequence

    NF, W, H = 300, 352, 288
    raw = synth_sequence("benchA", NF).tobytes()
    y, cb, cr = load_yuv420(raw, W, H, NF)
    orig = to_blocks(jnp.asarray(y)).astype(jnp.int32)
    yj, cbj, crj = jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr)

    def per_call(body, k=9):
        @functools.partial(jax.jit, static_argnames="k")
        def run(k):
            def step(i, st):
                acc, d = st
                r = body(d)
                return acc + r, (r % 2).astype(jnp.int32)
            return jax.lax.fori_loop(0, k, step, (jnp.int32(0), jnp.int32(0)))[0]

        def timed(kk):
            np.asarray(run(k=kk))
            t0 = time.time()
            np.asarray(run(k=kk))
            return time.time() - t0

        t1, tk = timed(1), timed(k)
        return max((tk - t1) / (k - 1), 1e-9)

    def lum_grid(d):
        out = intra_luma_scan(orig + d, 16, 16, table=COS_ENC, dtype=jnp.float32)
        return sum(jnp.sum(v.astype(jnp.int32)) for v in out.values())

    def lum_packed(d, unroll=1):
        out = intra_luma_scan_packed(orig + d, 16, 16, table=COS_ENC,
                                     dtype=jnp.float32, unroll=unroll)
        return sum(jnp.sum(v.astype(jnp.int32)) for v in out.values())

    def full(d, me="xla"):
        out = encode_intra_frames(yj + d.astype(jnp.uint8), cbj, crj, 16, 16,
                                  table=COS_ENC, dtype=jnp.float32, me=me)
        return sum(jnp.sum(v.astype(jnp.int32)) for v in out.values())

    # round-4 fused single-kernel wavefronts (ops/pallas_intra.py)
    from icspcodec_tpu.ops.pallas_intra import (
        intra_luma_decode_fused, intra_luma_scan_fused,
    )

    def lum_fused(d):
        out = intra_luma_scan_fused(orig + d, 16, 16, table=COS_ENC, dtype=jnp.float32)
        return sum(jnp.sum(v.astype(jnp.int32)) for v in out.values())

    # decode-side wavefronts
    from icspcodec_tpu.engine.wavefront import (
        intra_luma_decode_scan,
        intra_luma_decode_scan_packed,
    )

    rng = np.random.default_rng(0)
    rr = jnp.asarray(rng.uniform(-80, 300, (NF, 36, 44, 8, 8)).astype(np.float32))
    mpm = jnp.asarray(rng.integers(0, 2, (NF, 36, 44)).astype(np.int32))
    bit = jnp.asarray(rng.integers(0, 2, (NF, 36, 44)).astype(np.int32))

    def dec_grid(d):
        out = intra_luma_decode_scan(rr + d.astype(jnp.float32), mpm, bit, dtype=jnp.float32)
        return jnp.sum(out)

    def dec_packed(d):
        out = intra_luma_decode_scan_packed(rr + d.astype(jnp.float32), mpm, bit, dtype=jnp.float32)
        return jnp.sum(out)

    # fused decode: symbols -> recon (includes izigzag/dequant/DC/idct,
    # which the packed decode scan does NOT — compare against dec_packed
    # plus the batched inverse chain, i.e. the bench decode number)
    from icspcodec_tpu.constants import COS_DEC

    enc = jax.jit(lambda o: intra_luma_scan_fused(o, 16, 16, table=COS_ENC, dtype=jnp.float32))(orig)

    def dec_fused(d):
        out = intra_luma_decode_fused(
            enc["scan"] + d, enc["mpm"], enc["mode_bit"], 16, 16, COS_DEC,
            dtype=jnp.float32,
        )
        return jnp.sum(out)

    import functools as ft
    probes = [
        ("grid luma scan", lum_grid),
        ("packed luma scan", lum_packed),
        ("packed luma scan unroll=2", ft.partial(lum_packed, unroll=2)),
        ("packed luma scan unroll=4", ft.partial(lum_packed, unroll=4)),
        ("FUSED luma kernel", lum_fused),
        ("full intra encode (packed)", full),
        ("full intra encode (FUSED)", ft.partial(full, me="pallas")),
        ("grid decode scan", dec_grid),
        ("packed decode scan", dec_packed),
        ("FUSED decode kernel (incl. inverse chain)", dec_fused),
    ]
    for name, fn in probes:
        t = per_call(fn)
        print(f"{name}: {t*1e3:.1f} ms / {NF} frames -> {NF/t:.0f} fps", flush=True)


if __name__ == "__main__":
    main()
