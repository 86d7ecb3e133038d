#!/usr/bin/env python3
"""In-situ A/B of the device bit-pack algorithms (r5): byte-level
gather pack (production, bitstream_device.pack_frames_dev) vs the r4
expand-by-prefix-sum scatter pack (local copy below).

Carry-serialized probes hoist the offset machinery (loop-invariant), so
this tool times the REAL usage instead: dispatch per slab, pull the
packed rows, wall-clock the whole intra CIF300 pack.  Byte equality of
the two implementations is asserted first.
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


@functools.partial(__import__("jax").jit, static_argnames=("maxbytes",))
def pack_frames_scatter(codes, lengths, maxbytes: int):
    """r4 algorithm: scatter a mark per item start, cumsum over bit
    positions, gather (code, length, offset) per bit."""
    import jax.numpy as jnp

    f, n = codes.shape
    nbits_pad = maxbytes * 8
    off = jnp.cumsum(lengths, axis=1) - lengths
    nbits = (off[:, -1] + lengths[:, -1]).astype(jnp.int32)
    rows = jnp.arange(f)[:, None]
    mark = jnp.zeros((f, nbits_pad), jnp.int32).at[rows, off].add(1, mode="drop")
    itemid = jnp.cumsum(mark, axis=1) - 1
    o = jnp.take_along_axis(off, itemid, axis=1)
    l = jnp.take_along_axis(lengths, itemid, axis=1)
    c = jnp.take_along_axis(codes, itemid, axis=1)
    pos = jnp.arange(nbits_pad, dtype=jnp.int32)[None, :]
    j = pos - o
    valid = (j >= 0) & (j < l)
    shift = jnp.clip(l - 1 - j, 0, 31).astype(jnp.uint32)
    bit = ((c >> shift) & 1).astype(jnp.int32)
    bits = jnp.where(valid, bit, 0)
    weights = jnp.asarray((1 << np.arange(7, -1, -1)).astype(np.int32))
    packed = (bits.reshape(f, maxbytes, 8) * weights).sum(-1).astype(jnp.uint8)
    return packed, nbits


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from icspcodec_tpu.bitstream_device import frame_items_dev, pack_frames_dev
    from icspcodec_tpu.constants import COS_ENC
    from icspcodec_tpu.engine.intra import encode_intra_frames
    from icspcodec_tpu.io import load_yuv420
    from tools.make_content import synth_sequence

    NF, W, H = 300, 352, 288
    raw = synth_sequence("benchA", NF).tobytes()
    y, cb, cr = load_yuv420(raw, W, H, NF)
    enc = jax.jit(
        lambda: encode_intra_frames(
            jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr), 16, 16,
            table=COS_ENC, dtype=jnp.float32, me="pallas", return_recon=False,
        )
    )()
    sym = {k: enc[k] for k in (
        "y_scan", "mpm", "mode_bit", "cb_scan", "cb_acflag",
        "cr_scan", "cr_acflag", "y_acflag",
    )}
    ci, li = jax.jit(lambda: frame_items_dev(sym, True))()
    nbits = np.asarray(jnp.sum(li, axis=1))
    maxbytes = int(-(-int(nbits.max()) // (8 * 8192)) * 8192)
    print(f"maxbytes={maxbytes}", flush=True)

    def wall(impl, name, slab, overlap=False):
        slabs = [(s, min(s + slab, NF)) for s in range(0, NF, slab)]
        for a, b in slabs:  # warm/compile every slab shape
            p, n = impl(ci[a:b], li[a:b], maxbytes)
            np.asarray(p)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            outs = []
            if overlap:  # dispatch everything, then pull
                ds = [impl(ci[a:b], li[a:b], maxbytes) for a, b in slabs]
                outs = [(np.asarray(p), np.asarray(n)) for p, n in ds]
            else:
                for a, b in slabs:
                    p, n = impl(ci[a:b], li[a:b], maxbytes)
                    outs.append((np.asarray(p), np.asarray(n)))
            best = min(best, time.time() - t0)
        print(f"{name} slab={slab} overlap={overlap}: {best*1e3:.0f} ms / "
              f"{NF} frames (pull incl.)", flush=True)
        return outs

    ref = wall(pack_frames_scatter, "scatter", 32)
    for slab in (100, 300):
        wall(pack_frames_scatter, "scatter", slab)
    wall(pack_frames_scatter, "scatter", 300, overlap=True)
    wall(pack_frames_scatter, "scatter", 32, overlap=True)
    got = wall(pack_frames_dev, "prod", 300, overlap=True)
    pa = np.concatenate([p for p, _ in ref]); na = np.concatenate([n for _, n in ref])
    pb = np.concatenate([p for p, _ in got]); nb = np.concatenate([n for _, n in got])
    assert np.array_equal(na, nb) and np.array_equal(pa, pb)
    print("byte-identical outputs", flush=True)


if __name__ == "__main__":
    main()
