"""On-chip attribution of the inter frame-step cost (fast/f32, 30 GOPs).

Same methodology as bench_me_kernels.py: carry-serialized fori_loop of K
calls inside one jit; (t[K]-t[1])/(K-1) cancels the tunnel floor.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from icspcodec_tpu.constants import COS_ENC
from icspcodec_tpu.engine.inter import encode_inter_frame
from icspcodec_tpu.engine.intra import to_blocks, encode_intra_frames
from icspcodec_tpu.engine.wavefront import dc_dpcm_scan, luma_dc_kind, chroma_dc_kind
from icspcodec_tpu.ops.quant import quant_block, dequant_block
from icspcodec_tpu.ops.scanorder import zigzag
from icspcodec_tpu.ops.transforms import fdct, idct

G, H, W = 30, 288, 352
rng = np.random.default_rng(0)
cur = jnp.asarray(rng.integers(0, 256, (G, H, W), np.uint8))
prev = jnp.asarray(rng.integers(0, 256, (G, H, W), np.uint8))
curc = jnp.asarray(rng.integers(0, 256, (G, H // 2, W // 2), np.uint8))
prevc = jnp.asarray(rng.integers(0, 256, (G, H // 2, W // 2), np.uint8))


def timed(fn, k):
    f = jax.jit(fn, static_argnames=("k",))
    np.asarray(f(k=k))
    t0 = time.perf_counter()
    np.asarray(f(k=k))
    return time.perf_counter() - t0


def run(name, body):
    def fn(k):
        def step(i, st):
            acc, c = st
            r = body(c)
            return acc + r, cur + (r % 2).astype(jnp.uint8)
        return jax.lax.fori_loop(0, k, step, (jnp.int32(0), cur))[0]
    t1, tk = timed(fn, 1), timed(fn, 9)
    print(f"{name:32s} {(tk - t1) / 8 * 1e3:8.2f} ms  (t1={t1*1e3:.0f} tk={tk*1e3:.0f})")


def full_step(c):
    o = encode_inter_frame(c, curc, curc, prev, prevc, prevc, 16, 16,
                           table=COS_ENC, dtype=jnp.float32, me="pallas")
    return o["y_scan"].sum().astype(jnp.int32)


def dct_chain(c):
    resid = to_blocks(c.astype(jnp.int32) - prev.astype(jnp.int32))
    d = fdct(resid, table=COS_ENC, dtype=jnp.float32)
    q = quant_block(d, 16, 16, chroma=False)
    sc = zigzag(q)
    iq = dequant_block(q, 16, 16)
    r = idct(iq, table=COS_ENC, dtype=jnp.float32)
    return (sc.sum() + r.sum().astype(jnp.int32)).astype(jnp.int32)


def dc_scan_luma(c):
    resid = to_blocks(c.astype(jnp.int32) - prev.astype(jnp.int32))
    d = fdct(resid, table=COS_ENC, dtype=jnp.float32)
    q_dc, dq_dc = dc_dpcm_scan(d[..., 0, 0], luma_dc_kind(H // 8, W // 8), 16, chroma=False)
    return (q_dc.sum() + dq_dc.sum()).astype(jnp.int32)


def intra30(c):
    o = encode_intra_frames(c, curc, curc, 16, 16, table=COS_ENC, dtype=jnp.float32)
    return o["y_scan"].sum().astype(jnp.int32)


def xform_chain(c):
    """r5 fused transform-chain kernel (ops/pallas_xform.py): the whole
    luma residual chain incl. the DC wavefront, one kernel."""
    from icspcodec_tpu.ops.pallas_xform import xform_fwd_fused

    resid = to_blocks(c.astype(jnp.int32) - prev.astype(jnp.int32))
    o = xform_fwd_fused(resid, 16, 16, chroma=False, table=COS_ENC)
    return (o["scan"].astype(jnp.int32).sum() + o["r"].sum()
            + o["acflag"].sum()).astype(jnp.int32)


def chroma_chain(c):
    from icspcodec_tpu.engine.intra import encode_chroma_batch

    planes = jnp.concatenate([curc, curc]) + (c[0, 0, 0] % 2).astype(jnp.uint8)
    o = encode_chroma_batch(planes, 16, 16, table=COS_ENC,
                            dtype=jnp.float32, me="pallas")
    return (o["scan"].astype(jnp.int32).sum() + o["acflag"].sum()).astype(jnp.int32)


if __name__ == "__main__":
    print("devices:", jax.devices())
    run("full inter step (pallas)", full_step)
    run("luma dct+quant+zz+deq+idct", dct_chain)
    run("luma fdct + dc_dpcm_scan", dc_scan_luma)
    run("FUSED luma xform chain (r5)", xform_chain)
    run("chroma batch via xform (r5)", chroma_chain)
    run("intra 30-frame batch", intra30)
