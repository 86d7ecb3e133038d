#!/usr/bin/env python3
"""Capture a jax.profiler trace of the inter GOP step on the real chip.

Writes a TensorBoard-loadable trace under traces/ (gitignored artifact;
PERF.md records the conclusions).  Run ALONE (single-client TPU).  If
the axon tunnel rejects profiling, the script says so and exits 0 —
the carry-serialized probes in tools/bench_*.py remain the fallback
attribution method (PERF.md).
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    from icspcodec_tpu.constants import COS_ENC
    from icspcodec_tpu.engine.inter import encode_gop
    from icspcodec_tpu.io import load_yuv420
    from tools.make_content import synth_sequence

    NF, W, H = 300, 352, 288
    raw = synth_sequence("benchA", NF).tobytes()
    y, cb, cr = load_yuv420(raw, W, H, NF)
    g, p = 30, 10
    yg = jnp.asarray(y.reshape(g, p, H, W))
    cbg = jnp.asarray(cb.reshape(g, p, H // 2, W // 2))
    crg = jnp.asarray(cr.reshape(g, p, H // 2, W // 2))
    me = "xla" if jax.default_backend() == "cpu" else "pallas"

    step = jax.jit(
        lambda a, b, c: encode_gop(a, b, c, 16, 16, table=COS_ENC,
                                   dtype=jnp.float32, me=me)
    )
    out = step(yg, cbg, crg)  # compile + warm outside the trace
    print("checksum:", np.asarray(jnp.sum(out[0]["recon_y"].astype(jnp.int32))))

    try:
        with jax.profiler.trace("/root/repo/traces"):
            out = step(yg, cbg, crg)
            np.asarray(jnp.sum(out[0]["recon_y"].astype(jnp.int32)))
        print("trace written to /root/repo/traces")
    except Exception as e:
        print(f"profiler unavailable in this environment: {e!r}")


if __name__ == "__main__":
    main()
