#!/usr/bin/env python3
"""Decode all-intra throughput: attribution + variance bound (VERDICT r3
next #5: r2's driver-captured 44.6k fps vs r3's claimed 23-35k needed an
A/B with methodology, not a range).

Runs the bench's exact decode probe (decode_intra_frames: izigzag +
dequant + inverse DC chain + IDCT + pixel wavefront + chroma) REPEATEDLY
in one process, for each luma implementation:
  xla    — batched inverse ops + packed-diagonal decode scan (r3 path)
  pallas — fused single-kernel wavefront (r4, ops/pallas_intra.py)
plus the isolated luma scan stages, carry-serialized as everywhere
(CLAUDE.md methodology).  Run ALONE on the chip.
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

    from icspcodec_tpu.constants import COS_DEC, COS_ENC
    from icspcodec_tpu.engine.intra import decode_intra_frames, encode_intra_frames
    from icspcodec_tpu.io import load_yuv420
    from tools.make_content import synth_sequence

    NF, W, H = 300, 352, 288
    raw = synth_sequence("benchA", NF).tobytes()
    y, cb, cr = load_yuv420(raw, W, H, NF)
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

    enc = jax.jit(
        lambda: encode_intra_frames(yj, cbj, crj, 16, 16, table=COS_ENC, dtype=jnp.float32)
    )()

    def dec_body(d, me):
        out = decode_intra_frames(
            enc["y_scan"] + d.astype(jnp.int16), enc["mpm"], enc["mode_bit"],
            enc["cb_scan"], enc["cr_scan"], 16, 16, table=COS_DEC,
            dtype=jnp.float32, me=me,
        )
        return sum(jnp.sum(v.astype(jnp.int32)) for v in out.values())

    reps = 5
    for me in ("xla", "pallas"):
        ts = [per_call(functools.partial(dec_body, me=me)) for _ in range(reps)]
        fps = [NF / t for t in ts]
        print(f"decode all-intra me={me}: "
              f"{np.median(fps):7.0f} fps median of {reps} "
              f"(min {min(fps):.0f}, max {max(fps):.0f}; "
              f"ms: {', '.join(f'{t*1e3:.1f}' for t in ts)})", flush=True)


if __name__ == "__main__":
    main()
