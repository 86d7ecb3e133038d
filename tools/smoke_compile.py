"""Compile-only smoke for every production pallas kernel (pre-commit gate).

The CPU suite runs the pallas kernels in interpret mode, which cannot see
Mosaic lowering restrictions (the round-3 uint8 `pltpu.roll` regression
shipped green on CPU and broke every MC kernel on the chip).  This tool
AOT-lowers and Mosaic-compiles each production kernel — no execution, no
data transfer — at CIF and 720p shapes, in minutes from a warm cache.

Run it on the real chip after ANY change to ops/pallas_me.py or engine/:

    python tools/smoke_compile.py            # CIF + 720p
    python tools/smoke_compile.py --shapes cif

Exit 0 = every kernel compiles; non-zero prints the failing kernel.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# persistent compile cache (remote Mosaic compiles take minutes cold)
import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp  # noqa: E402

from icspcodec_tpu.ops import pallas_me as pme  # noqa: E402

SHAPES = {
    "qcif": (176, 144),
    "cif": (352, 288),
    "4cif": (704, 576),
    "720p": (1280, 720),
}
G = 2  # small batch: the grid dim doesn't change Mosaic lowering


def _s(shape, dtype=jnp.uint8):
    return jax.ShapeDtypeStruct(shape, dtype)


def intra_fused_cases(w: int, h: int):
    """Fused intra wavefront (ops/pallas_intra.py) at the production
    batch shapes: F=300 (bench all-intra) and F=30 (GOP I-frames) for
    CIF; F=30 for larger resolutions."""
    import numpy as np

    from icspcodec_tpu.ops import pallas_intra as pin
    from icspcodec_tpu.engine.wavefront import diag_layout, _intra_lane_tables  # noqa: F401

    gh, gw = h // 8, w // 8
    fs = (300, 30) if (w, h) == (352, 288) else (30,)
    cases = []
    for f in fs:
        nsteps, nb, mp, hu, hl, kind, lane0 = pin._fused_tables(gh, gw, f)
        tabs = (
            _s((nsteps, 1, mp), jnp.int32),
            _s((nsteps, 1, mp), jnp.int32),
            _s((nsteps, 1, mp), jnp.int32),
            _s((1, 1, mp), jnp.int32),
        )
        args = (_s((nsteps, 64, mp)),) + tabs
        fn = lambda nb: (lambda *a: pin._intra_rows_fused(
            *a, nb=nb, qdc=16, qac=16, table_key="enc"))
        cases.append((f"intra_fused_f{f}", jax.jit(fn(nb)), args))
        # non-pow2 qp exercises the f32-reciprocal C division lowering
        fn10 = lambda nb: (lambda *a: pin._intra_rows_fused(
            *a, nb=nb, qdc=10, qac=12, table_key="enc"))
        cases.append((f"intra_fused_f{f}_q10", jax.jit(fn10(nb)), args))
        # bitstream-only variant: recon output dropped
        fnr = lambda nb: (lambda *a: pin._intra_rows_fused(
            *a, nb=nb, qdc=16, qac=16, table_key="enc", want_recon=False))
        cases.append((f"intra_fused_f{f}_norec", jax.jit(fnr(nb)), args))
        dargs = (
            _s((nsteps, 64, mp), jnp.int16),
            _s((nsteps, 1, mp), jnp.int32),
            _s((nsteps, 1, mp), jnp.int32),
        ) + tabs
        fnd = lambda nb: (lambda *a: pin._intra_decode_rows_fused(
            *a, nb=nb, qdc=16, qac=16, table_key="dec"))
        cases.append((f"intra_dec_fused_f{f}", jax.jit(fnd(nb)), dargs))

    # fused DC-DPCM chains (ops/pallas_dc.py): chroma grid fwd (floor
    # regime, incl. non-pow2 qp) + luma grid fwd/inverse
    from icspcodec_tpu.ops import pallas_dc as pdc

    # fused full transform chains (ops/pallas_xform.py): forward +
    # inverse, both rounding regimes, non-pow2 qp
    from icspcodec_tpu.ops import pallas_xform as pxf

    f = fs[0]
    for tag, cgh, cgw, chroma, qq in (
        ("xf_fwd_chroma", gh // 2, gw // 2, True, (16, 16)),
        ("xf_fwd_chroma_q10", gh // 2, gw // 2, True, (10, 12)),
        ("xf_fwd_luma", gh, gw, False, (16, 16)),
    ):
        ff = 2 * f if chroma else min(f, 30)
        nsteps, nb, mp, kind, lane0 = pdc._dc_tables(cgh, cgw, ff, chroma)
        xargs = (
            _s((nsteps, 64, mp), jnp.int16),
            _s((nsteps, 1, mp), jnp.int32),
            _s((1, 1, mp), jnp.int32),
        )
        qdc, qac = qq
        fn = lambda nb, chroma, qdc, qac: (lambda *a: pxf._xform_rows_fused(
            *a, nb=nb, qdc=qdc, qac=qac, chroma=chroma,
            table_key="enc"))
        cases.append(
            (f"{tag}_f{ff}", jax.jit(fn(nb, chroma, qdc, qac)), xargs)
        )

    for tag, cgh, cgw, chroma, inv, qs in (
        ("dc_fwd_chroma", gh // 2, gw // 2, True, False, 16),
        ("dc_fwd_chroma_q10", gh // 2, gw // 2, True, False, 10),
        ("dc_fwd_luma", gh, gw, False, False, 16),
        ("dc_inv_luma", gh, gw, False, True, 16),
    ):
        # chroma stacks cb+cr: 2f frames
        ff = 2 * f if chroma else f
        nsteps, nb, mp, kind, lane0 = pdc._dc_tables(cgh, cgw, ff, chroma)
        dt = jnp.int32 if inv else jnp.float32
        dargs = (
            _s((nsteps, 1, mp), dt),
            _s((nsteps, 1, mp), jnp.int32),
            _s((1, 1, mp), jnp.int32),
        )
        fn = lambda nb, qs, chroma, inv: (lambda *a: pdc._dc_rows_fused(
            *a, nb=nb, qstep=qs, chroma=chroma, inverse=inv))
        cases.append((f"{tag}_f{f}", jax.jit(fn(nb, qs, chroma, inv)), dargs))
    return cases


def kernel_cases(w: int, h: int):
    """(name, jitted fn, abstract args) for every production kernel."""
    mbh, mbw = h // 16, w // 16
    ch, cw = h // 2, w // 2
    cases = [
        ("sad_best", pme.sad_best, (_s((G, h, w)), _s((G, h + 32, w + 32)))),
        ("sad_mc_best", pme.sad_mc_best, (_s((G, h, w)), _s((G, h + 32, w + 32)))),
        ("sad_union_extra", pme.sad_union_extra, (_s((G, h, w)), _s((G, h + 32, w + 32)))),
        ("sad_union", pme.sad_union, (_s((G, h, w)), _s((G, h + 32, w + 32)))),
        ("mc_select_luma", pme.mc_select_luma,
         (_s((G, h + 32, w + 32)), _s((G, mbh, mbw), jnp.int32))),
        ("mc_select_luma_union", pme.mc_select_luma_union,
         (_s((G, h + 32, w + 32)), _s((G, mbh, mbw), jnp.int32))),
        ("mc_select_chroma", pme.mc_select_chroma,
         (_s((2 * G, ch + 16, cw + 16)), _s((2 * G, ch // 8, cw // 8), jnp.int32))),
        ("mc_select_chroma_union", pme.mc_select_chroma_union,
         (_s((2 * G, ch + 16, cw + 16)), _s((2 * G, ch // 8, cw // 8), jnp.int32))),
    ]
    return cases


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", nargs="*", default=["cif", "720p"],
                    choices=sorted(SHAPES))
    args = ap.parse_args()

    backend = jax.default_backend()
    print(f"backend={backend} devices={jax.devices()}")
    if backend == "cpu":
        print("WARNING: CPU backend — this does NOT validate Mosaic lowering", file=sys.stderr)

    failures = []
    for sh in args.shapes:
        w, h = SHAPES[sh]
        for name, fn, sds in kernel_cases(w, h) + intra_fused_cases(w, h):
            t0 = time.time()
            try:
                fn.lower(*sds).compile()
                print(f"  OK   {sh:5s} {name:24s} {time.time() - t0:6.1f}s")
            except Exception as e:
                failures.append((sh, name))
                msg = str(e).splitlines()[0][:160]
                print(f"  FAIL {sh:5s} {name:24s} {msg}")
    if failures:
        print(f"\n{len(failures)} kernel(s) FAILED Mosaic compile: {failures}")
        return 1
    print("\nall kernels compile")
    return 0


if __name__ == "__main__":
    sys.exit(main())
