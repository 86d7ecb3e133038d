"""Differential on-chip timing: XLA ME/MC path vs pallas roll kernels.

The device<->host tunnel has a ~24 ms fixed round-trip floor, so per-call
timing is garbage.  Instead each variant runs K kernel invocations inside
ONE jit (fori_loop, serialized by the carry) and we report
(t[K] - t[1]) / (K - 1): the floor and dispatch overhead cancel.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from icspcodec_tpu.ops.me import spiral_search, gather_pred
from icspcodec_tpu.ops import pallas_me as pme

G, H, W = 30, 288, 352
rng = np.random.default_rng(0)
cur = jnp.asarray(rng.integers(0, 256, (G, H, W), np.uint8))
pad = jnp.asarray(rng.integers(0, 256, (G, H + 32, W + 32), np.uint8))
padc = jnp.asarray(rng.integers(0, 256, (G, H // 2 + 16, W // 2 + 16), np.uint8))


def timed(name, fn, k):
    f = jax.jit(fn, static_argnames=("k",))
    out = f(k=k)  # compile
    np.asarray(out)
    t0 = time.perf_counter()
    np.asarray(f(k=k))
    return time.perf_counter() - t0


def run(name, fn):
    t1 = timed(name, fn, 1)
    tk = timed(name, fn, 9)
    per = (tk - t1) / 8 * 1e3
    print(f"{name:28s} per-call {per:8.2f} ms   (t1={t1*1e3:.1f} tk={tk*1e3:.1f})")
    return per


def loop(body):
    # the carry perturbs the kernel input each iteration so XLA cannot
    # hoist the loop-invariant computation (LICM/CSE) out of the loop
    # both cur AND pad must depend on the carry: in the real codec the
    # padded previous reconstruction changes every frame, so the 64 window
    # relayouts may not be hoisted out of the measured loop
    def fn(k):
        def step(i, st):
            acc, p, pc = st
            c = cur + (acc % 2).astype(jnp.uint8)
            acc = acc + body(c, p, pc)
            d = (acc % 2).astype(jnp.uint8)
            return acc, pad + d, padc + d
        return jax.lax.fori_loop(0, k, step, (jnp.int32(0), pad, padc))[0]
    return fn


# --- XLA reference path ---
def xla_sad(c, p, pc):
    mv = spiral_search(c, p)
    return mv.sum()

def xla_mc(c, p, pc):
    mv = spiral_search(c, p)
    pred = gather_pred(p.astype(jnp.int32), mv, 16)
    return pred.sum()

def xla_full(c, p, pc):
    mv = spiral_search(c, p)
    pred = gather_pred(p.astype(jnp.int32), mv, 16)
    mvc = jnp.sign(mv) * (jnp.abs(mv) // 2)
    predc = gather_pred(pc.astype(jnp.int32), mvc, 8)
    return pred.sum() + predc.sum()

# --- pallas path ---
def p_sad(c, p, pc):
    best, _ = pme.sad_best(c, p)
    return best.sum()

def p_sadmc(c, p, pc):
    best, _ = pme.sad_best(c, p)
    pred = pme.mc_select_luma(p, best)
    return pred.sum()

def p_full(c, p, pc):
    best, _ = pme.sad_best(c, p)
    pred = pme.mc_select_luma(p, best)
    cidx = jnp.asarray(pme.SPIRAL_TO_CHROMA)[best]
    predc = pme.mc_select_chroma(pc, cidx)
    return pred.sum() + predc.sum()

def p_fused(c, p, pc):
    best, zc, sads, pred = pme.sad_mc_best(c, p)
    return best.sum() + pred.sum().astype(jnp.int32) + sads.sum()


if __name__ == "__main__":
    print("devices:", jax.devices())
    run("xla spiral_search", loop(xla_sad))
    run("xla search+gather", loop(xla_mc))
    run("xla search+gather+chroma", loop(xla_full))
    run("pallas sad_best", loop(p_sad))
    run("pallas sad+mc_luma", loop(p_sadmc))
    run("pallas sad+mc_luma+chroma", loop(p_full))
    run("pallas sad_mc_best (grouped rolls, fused MC)", loop(p_fused))
