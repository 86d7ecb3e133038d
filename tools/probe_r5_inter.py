#!/usr/bin/env python3
"""Round-5 inter diagnostics (run ALONE on the chip):

1. How often does benchA trigger the stateful zero-SAD break?  (the
   fixed-path step measures 2.17 ms but the bench GOP runs at ~3.9 ms
   equivalent - if the union branch fires, every triggered frame pays
   sad_union_extra + the 129/69-roll union MC selects)
2. Decode inverse-chain A/B: fused xform_inv vs the r4 XLA composition
   (izigzag + dequant + fused idc + idct) at GOP-scan batch sizes.
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

    from icspcodec_tpu.codec import encode
    from icspcodec_tpu.config import CodecConfig
    from icspcodec_tpu.io import load_yuv420
    from icspcodec_tpu.ops import pallas_me as pme
    from icspcodec_tpu.ops.pad import pad_image
    from tools.make_content import synth_sequence

    NF, W, H = 300, 352, 288
    raw = synth_sequence("benchA", NF).tobytes()
    y, cb, cr = load_yuv420(raw, W, H, NF)

    cfg = CodecConfig(qp_dc=16, qp_ac=16, intra_period=10, precision="fast")
    _, rec = encode(y, cb, cr, cfg, return_recon=True)

    # per P-frame zc: cur vs padded previous RECON (the true ME input)
    idx = np.asarray([i for i in range(NF) if i % 10 != 0])
    cur = jnp.asarray(y[idx])
    prev = jnp.asarray(rec["y"][idx - 1])

    @jax.jit
    def zcs(c, p):
        _, zc, _, _ = pme.sad_mc_best(c, pad_image(p, 16))
        return (zc >= 2).any(axis=(1, 2)), (zc >= 2).sum(axis=(1, 2))

    trig, nmb = zcs(cur, prev)
    trig = np.asarray(trig)
    print(f"stateful break fires on {trig.sum()}/{len(idx)} P-frames "
          f"({100*trig.mean():.0f}%); mean trigger MBs "
          f"{np.asarray(nmb)[trig].mean() if trig.any() else 0:.1f}/396",
          flush=True)

    # --- decode inverse chain A/B at GOP batch sizes ---
    from icspcodec_tpu.constants import COS_DEC
    from icspcodec_tpu.engine.intra import to_blocks
    from icspcodec_tpu.engine.wavefront import chroma_dc_kind, luma_dc_kind
    from icspcodec_tpu.ops.pallas_dc import idc_dpcm_fused
    from icspcodec_tpu.ops.quant import c_trunc, dequant_block
    from icspcodec_tpu.ops.scanorder import izigzag
    from icspcodec_tpu.ops.transforms import idct

    rng = np.random.default_rng(0)
    ysc = jnp.asarray(rng.integers(-300, 300, (30, 36, 44, 64), np.int16))
    csc = jnp.asarray(rng.integers(-300, 300, (60, 18, 22, 64), np.int16))

    def per_call(body, k=9):
        @functools.partial(jax.jit, static_argnames="k")
        def run(k):
            def step(i, st):
                acc, d = st
                r = body(d)
                return acc + r, (r % 2).astype(jnp.int16)
            return jax.lax.fori_loop(0, k, step, (jnp.int32(0), jnp.int16(0)))[0]

        def timed(kk):
            np.asarray(run(k=kk))
            t0 = time.time()
            np.asarray(run(k=kk))
            return time.time() - t0

        t1, tk = timed(1), timed(k)
        return max((tk - t1) / (k - 1), 1e-9)

    # NOTE: the fused inverse-chain kernel this A/B measured (5x slower
    # than the XLA composition below) was removed after the measurement;
    # the XLA timings remain as the production reference numbers.
    def luma_xla(d):
        q = izigzag(ysc + d)
        iq = dequant_block(q, 16, 16)
        dq = idc_dpcm_fused(iq[..., 0, 0], chroma=False)
        iq = iq.at[..., 0, 0].set(dq)
        return jnp.sum(c_trunc(idct(iq, table=COS_DEC, dtype=jnp.float32))).astype(jnp.int32)

    def chroma_xla(d):
        q = izigzag(csc + d)
        iq = dequant_block(q, 16, 16)
        dq = idc_dpcm_fused(iq[..., 0, 0], chroma=True)
        iq = iq.at[..., 0, 0].set(dq)
        return jnp.sum(idct(iq, table=COS_DEC, dtype=jnp.float32)).astype(jnp.int32)

    for name, fn in (("luma inv XLA+idcfused (30f)", luma_xla),
                     ("chroma inv XLA+idcfused (60p)", chroma_xla)):
        t = per_call(fn)
        print(f"{name:32s} {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
