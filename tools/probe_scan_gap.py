#!/usr/bin/env python3
"""Why does the GOP scan run ~13 ms/300f slower than 9x the isolated
inter step?  (bench: 34.8 ms/300f; parts: 9x2.17 + 1.77 = 21.3.)

Probes (carry-serialized, 30 GOPs):
  A. bench-style gop_body (encode_gop + checksum everything)
  B. encode_gop, checksum y_scan only (checksum-cost isolation)
  C. inter-only scan of 9 steps (no intra, no moveaxis)
  D. C with lax.scan unroll=3 and 9
  E. one isolated step at the same shapes (reference)
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
    from icspcodec_tpu.engine.inter import encode_gop, encode_inter_frame
    from icspcodec_tpu.io import load_yuv420
    from tools.make_content import synth_sequence

    NF, W, H = 300, 352, 288
    raw = synth_sequence("benchA", NF).tobytes()
    y, cb, cr = load_yuv420(raw, W, H, NF)
    g, p = 30, 10
    yg = jnp.asarray(y.reshape(g, p, H, W))
    cbg = jnp.asarray(cb.reshape(g, p, H // 2, W // 2))
    crg = jnp.asarray(cr.reshape(g, p, H // 2, W // 2))

    def per_call(body, k=9):
        @functools.partial(jax.jit, static_argnames="k")
        def run(k):
            def step(i, st):
                acc, d = st
                r = body(d)
                return acc + r, (r % 2).astype(jnp.uint8)
            return jax.lax.fori_loop(0, k, step, (jnp.int32(0), jnp.uint8(0)))[0]

        def timed(kk):
            np.asarray(run(k=kk))
            t0 = time.time()
            np.asarray(run(k=kk))
            return time.time() - t0

        t1, tk = timed(1), timed(k)
        return max((tk - t1) / (k - 1), 1e-9)

    def cks(tree):
        return sum(jnp.sum(v.astype(jnp.int32)) for v in tree.values())

    def a_body(d):
        intra, inter = encode_gop(yg + d, cbg, crg, 16, 16, table=COS_ENC,
                                  dtype=jnp.float32, me="pallas")
        return cks(intra) + cks(inter)

    def b_body(d):
        intra, inter = encode_gop(yg + d, cbg, crg, 16, 16, table=COS_ENC,
                                  dtype=jnp.float32, me="pallas")
        return jnp.sum(inter["y_scan"].astype(jnp.int32)) + jnp.sum(
            intra["y_scan"].astype(jnp.int32))

    def scan_body(d, unroll=1):
        init = (yg[:, 0] + d, cbg[:, 0], crg[:, 0])

        def stepf(carry, xs):
            cy, ccb, ccr = xs
            py, pcb, pcr = carry
            o = encode_inter_frame(cy, ccb, ccr, py, pcb, pcr, 16, 16,
                                   table=COS_ENC, dtype=jnp.float32, me="pallas")
            return (o["recon_y"], o["recon_cb"], o["recon_cr"]), o["y_scan"]

        xs = (jnp.moveaxis(yg[:, 1:], 1, 0), jnp.moveaxis(cbg[:, 1:], 1, 0),
              jnp.moveaxis(crg[:, 1:], 1, 0))
        _, ys = jax.lax.scan(stepf, init, xs, unroll=unroll)
        return jnp.sum(ys.astype(jnp.int32))

    def e_body(d):
        o = encode_inter_frame(yg[:, 1] + d, cbg[:, 1], crg[:, 1],
                               yg[:, 0], cbg[:, 0], crg[:, 0], 16, 16,
                               table=COS_ENC, dtype=jnp.float32, me="pallas")
        return cks(o)

    probes = [
        ("A bench gop_body (cks all)", a_body),
        ("B encode_gop (cks y_scan)", b_body),
        ("C inter-only scan x9", scan_body),
        ("D scan unroll=3", functools.partial(scan_body, unroll=3)),
        ("D scan unroll=9", functools.partial(scan_body, unroll=9)),
        ("E one step (cks all)", e_body),
    ]
    for name, fn in probes:
        t = per_call(fn)
        print(f"{name:28s} {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
