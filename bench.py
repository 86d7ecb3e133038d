#!/usr/bin/env python3
"""Benchmark: encoded frames/s/chip on CIF300 (fast/f32 TPU path).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Headline = device-side encode throughput (all symbols + reconstructions
computed on chip, consumed via on-device checksums so only scalars cross
the host link).  `wall_fps_*` adds the host-side costs (symbol readback +
native bitstream pack); in this dev environment the device<->host tunnel
runs at ~20 MB/s, so wall numbers are dominated by that link rather than
the chip (PCIe on a real TPU host moves the same ~90 MB in <10 ms).

Baselines (BASELINE.md, single-thread C++ scalar, foreman CIF300):
all-intra 300/17.21 ~ 17.4 frames/s; inter period-10 300/29.33 ~ 10.2.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

BASE_ALLINTRA_FPS = 300 / 17.21
BASE_INTER_FPS = 300 / 29.33
NF = 300
W, H = 352, 288


def main():
    import jax

    # persistent compilation cache: repeated bench runs (and rounds) skip
    # the multi-minute XLA compiles of the big scan programs
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from icspcodec_tpu.codec import encode
    from icspcodec_tpu.config import CodecConfig
    from icspcodec_tpu.constants import COS_ENC
    from icspcodec_tpu.engine.inter import encode_gop
    from icspcodec_tpu.engine.intra import encode_intra_frames
    from icspcodec_tpu.io import load_yuv420
    from tools.make_content import synth_sequence

    raw = synth_sequence("benchA", NF).tobytes()
    y, cb, cr = load_yuv420(raw, W, H, NF)

    import functools

    def checksum(tree):
        return sum(jnp.sum(v.astype(jnp.int32)) for v in tree.values())

    # pallas ME/MC roll kernels on a real chip, XLA fallback on CPU
    me = "xla" if jax.default_backend() == "cpu" else "pallas"

    # Timing methodology: the device<->host tunnel in this environment has
    # a ~24 ms fixed round-trip floor and block_until_ready does not
    # reliably block, so single-dispatch timings are garbage.  Each probe
    # runs K calls inside ONE jit as a carry-serialized fori_loop (the
    # carry perturbs the inputs so XLA cannot hoist work out of the loop)
    # and the reported per-call time is (t[K]-t[1])/(K-1): floor and
    # dispatch overheads cancel.  On a production TPU host (PCIe) the
    # plain single-call numbers converge to these.
    def per_call(body, k=9):
        @functools.partial(jax.jit, static_argnames="k")
        def run(k):
            def step(i, st):
                acc, d = st
                r = body(d)
                return acc + r, (r % 2).astype(jnp.uint8)
            return jax.lax.fori_loop(0, k, step, (jnp.int32(0), jnp.uint8(0)))[0]

        def timed(kk):
            np.asarray(run(k=kk))  # compile + warm
            t0 = time.time()
            np.asarray(run(k=kk))
            return time.time() - t0

        t1, tk = timed(1), timed(k)
        return max((tk - t1) / (k - 1), 1e-9)

    yj, cbj, crj = jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr)

    def intra_body(d):
        out = encode_intra_frames(yj + d, cbj, crj, 16, 16, table=COS_ENC, dtype=jnp.float32, me=me)
        return checksum(out)

    t_i = per_call(intra_body)
    fps_i = NF / t_i

    @jax.jit
    def intra_psnr(y, cb, cr):
        out = encode_intra_frames(y, cb, cr, 16, 16, table=COS_ENC, dtype=jnp.float32, me=me)
        return jnp.mean(
            (out["recon_y"].astype(jnp.float32) - y.astype(jnp.float32)) ** 2,
            axis=(1, 2),
        )
    mse = intra_psnr(yj, cbj, crj)
    psnr = float(np.mean(20 * np.log10(255.0 / np.sqrt(np.asarray(mse)))))

    g, p = 30, 10
    yg = jnp.asarray(y.reshape(g, p, H, W))
    cbg = jnp.asarray(cb.reshape(g, p, H // 2, W // 2))
    crg = jnp.asarray(cr.reshape(g, p, H // 2, W // 2))

    def gop_body(d):
        intra, inter = encode_gop(yg + d, cbg, crg, 16, 16, table=COS_ENC, dtype=jnp.float32, me=me)
        return checksum(intra) + checksum(inter)

    t_p = per_call(gop_body)
    fps_p = NF / t_p

    # codec-only variants: consume ONE output array instead of all 13+ —
    # tools/probe_scan_gap.py measured ~9.8 ms/300f of pure checksum
    # consumption inside the headline probes (an artifact of the harness,
    # not the codec; kept in the headline for round comparability)
    def intra_body_1cks(d):
        out = encode_intra_frames(yj + d, cbj, crj, 16, 16, table=COS_ENC,
                                  dtype=jnp.float32, me=me)
        return jnp.sum(out["y_scan"].astype(jnp.int32))

    def gop_body_1cks(d):
        intra, inter = encode_gop(yg + d, cbg, crg, 16, 16, table=COS_ENC,
                                  dtype=jnp.float32, me=me)
        return (jnp.sum(inter["y_scan"].astype(jnp.int32))
                + jnp.sum(intra["y_scan"].astype(jnp.int32)))

    fps_i1 = NF / per_call(intra_body_1cks)
    fps_p1 = NF / per_call(gop_body_1cks)

    # decoder device throughput: symbols (as the native parser would emit
    # them) -> planes, batched inverse pipelines + GOP scan
    from icspcodec_tpu.engine.intra import decode_intra_frames
    from icspcodec_tpu.codec import _decode_gop_jit
    from icspcodec_tpu.constants import COS_DEC

    enc_i = jax.jit(
        lambda: encode_intra_frames(yj, cbj, crj, 16, 16, table=COS_ENC, dtype=jnp.float32, me=me)
    )()
    enc_gi, enc_gp = jax.jit(
        lambda: encode_gop(yg, cbg, crg, 16, 16, table=COS_ENC, dtype=jnp.float32, me=me)
    )()

    def dec_intra_body(d):
        out = decode_intra_frames(
            enc_i["y_scan"] + d.astype(jnp.int16), enc_i["mpm"], enc_i["mode_bit"],
            enc_i["cb_scan"], enc_i["cr_scan"], 16, 16, table=COS_DEC, dtype=jnp.float32,
            me=me,
        )
        return checksum(out)

    t_di = per_call(dec_intra_body)

    def dec_gop_body(d):
        sym_i = {k: enc_gi[k] for k in ("y_scan", "mpm", "mode_bit", "cb_scan", "cr_scan")}
        sym_i = dict(sym_i, y_scan=sym_i["y_scan"] + d.astype(jnp.int16))
        sym_p = {k: enc_gp[k] for k in ("y_scan", "mv_diff", "cb_scan", "cr_scan")}
        first, rest = _decode_gop_jit(sym_i, sym_p, 16, 16, False, me=me)
        return checksum(first) + checksum(rest)

    t_dp = per_call(dec_gop_body)

    # wall-clock numbers: end-to-end encode() producing the final
    # bitstream.  The default path entropy-codes + packs ON DEVICE
    # (bitstream_device.py) so only packed frames (~the bitstream size)
    # cross the ~20 MB/s device<->host tunnel; `*_host_entropy` is the
    # round-2 path (pull ~150 MB of symbols, pack on host) for
    # attribution.  return_recon=False skips the recon readback — the
    # bitstream is the product; recon stays available on demand.
    cfg_i = CodecConfig(qp_dc=16, qp_ac=16, intra_period=0, precision="fast")
    cfg_p = CodecConfig(qp_dc=16, qp_ac=16, intra_period=10, precision="fast")
    def wall(cfg, **kw):
        encode(y, cb, cr, cfg, **kw)  # warm: same shapes, so the timed
        # run measures steady-state throughput, not jit compiles
        t0 = time.time()
        bits, _ = encode(y, cb, cr, cfg, **kw)
        return NF / (time.time() - t0), bits

    wall_i, bits_i = wall(cfg_i, return_recon=False)
    wall_p, bits_p = wall(cfg_p, return_recon=False)
    cfg_ih = CodecConfig(qp_dc=16, qp_ac=16, intra_period=0, precision="fast", entropy="host")
    cfg_ph = CodecConfig(qp_dc=16, qp_ac=16, intra_period=10, precision="fast", entropy="host")
    wall_ih, bits_ih = wall(cfg_ih)
    wall_ph, bits_ph = wall(cfg_ph)
    assert bits_ih == bits_i and bits_ph == bits_p  # same bytes, either path

    # streaming (per-GOP incremental, resumable) wall fps: the pthread
    # pool's end-to-end analog (ICSP_thread.cpp:39-77).  Should sit near
    # the plain encode wall number — the r3 ask #7 "measurement half"
    import shutil
    import tempfile
    from icspcodec_tpu.streaming import encode_streaming

    sdir = tempfile.mkdtemp(prefix="bench_stream_")
    try:
        encode_streaming(y, cb, cr, cfg_p, sdir + "/warm")  # compile+warm
        t0 = time.time()
        bits_s = encode_streaming(y, cb, cr, cfg_p, sdir + "/run")
        wall_s = NF / (time.time() - t0)
        assert bits_s == bits_p  # streaming container == single-shot bytes
    finally:
        shutil.rmtree(sdir, ignore_errors=True)

    # native host stage throughput (round-2 weak #5: never benchmarked):
    # the C bitstream parser and packer, MB/s over the real inter stream
    from icspcodec_tpu.runtime import parse_body, pack_items_native
    from icspcodec_tpu.oracle import parse_header
    from icspcodec_tpu.bitstream import frame_items as _fi

    t0 = time.time()
    syms_host = parse_body(bits_p[14:], NF, H, W, 10)
    parse_mbs = len(bits_p) / 1e6 / (time.time() - t0)
    isym = {k: syms_host[k][:1] for k in ("y_scan", "mpm", "mode_bit", "cb_scan", "cr_scan")}
    isym["y_acflag"] = (np.count_nonzero(isym["y_scan"][..., 1:], -1) == 0).astype(np.int32)
    isym["cb_acflag"] = (np.count_nonzero(isym["cb_scan"][..., 1:], -1) == 0).astype(np.int32)
    isym["cr_acflag"] = (np.count_nonzero(isym["cr_scan"][..., 1:], -1) == 0).astype(np.int32)
    pc, pl = _fi(isym, True)
    pc = np.tile(pc, (NF, 1)); pl = np.tile(pl, (NF, 1))
    t0 = time.time()
    packed = pack_items_native(pc.ravel().astype(np.uint64), pl.ravel().astype(np.int64))
    pack_mbs = len(packed) / 1e6 / (time.time() - t0)

    # weak-scaling efficiency of the gop mesh axis (BASELINE.md >= 0.8
    # target): measured on the 8-device virtual CPU mesh in a subprocess
    # (the axon chip is single-device here); see tools/bench_scaling.py
    # for the method + caveats
    import subprocess
    scaling = None
    try:
        out = subprocess.run(
            [sys.executable, "/root/repo/tools/bench_scaling.py"],
            capture_output=True, text=True, timeout=1800,
        )
        scaling = json.loads(out.stdout.strip().splitlines()[-1])
    except Exception as e:  # never let the CPU-mesh probe kill the bench
        scaling = {"error": str(e)[:200]}

    result = {
        "metric": "encode_fps_allintra_cif300_device",
        "value": round(fps_i, 1),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps_i / BASE_ALLINTRA_FPS, 1),
        "inter_p10_fps": round(fps_p, 1),
        "inter_vs_baseline": round(fps_p / BASE_INTER_FPS, 1),
        "encode_allintra_fps_single_cks": round(fps_i1, 1),
        "encode_inter_p10_fps_single_cks": round(fps_p1, 1),
        "decode_fps_allintra_device": round(NF / t_di, 1),
        "decode_fps_inter_p10_device": round(NF / t_dp, 1),
        "wall_fps_allintra": round(wall_i, 1),
        "wall_fps_inter_p10": round(wall_p, 1),
        "wall_fps_allintra_host_entropy": round(wall_ih, 1),
        "wall_fps_inter_p10_host_entropy": round(wall_ph, 1),
        "wall_fps_inter_p10_streaming": round(wall_s, 1),
        "wall_inter_vs_cpp": round(wall_p / BASE_INTER_FPS, 2),
        "native_parse_mbs": round(parse_mbs, 1),
        "native_pack_mbs": round(pack_mbs, 1),
        "scaling_efficiency": (scaling or {}).get("value"),
        "scaling_detail": scaling,
        "recon_psnr_y_db": round(psnr, 2),
        "bitstream_bytes": [len(bits_i), len(bits_p)],
        "precision": "fast",
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
