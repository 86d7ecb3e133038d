"""Batched 8x8 DCT/IDCT.

TPU-first formulation: the separable transform is two chained contractions
over the last axes — XLA maps them onto the MXU for the fast (float32)
path.  The exact (float64) path reproduces the reference C++ arithmetic
bit-for-bit: the einsum contraction accumulates in index order, matching
the C loops of DCT_block (enc src:2685-2749) / IDCT_block (:2825-2893),
which we verified bitwise against the compiled reference.

Two cosine-table regimes exist (constants.COS_ENC float-rounded /
COS_DEC double) — see constants.py for why.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import COS_ENC, IRT2


def _mulr(a, b):
    """Correctly-rounded multiply that XLA cannot contract into an FMA.

    The exact (float64) path must reproduce the C code's per-operation
    IEEE rounding.  XLA CPU contracts add(mul(a,b), c) into a
    single-rounding FMA — even across jax.lax.optimization_barrier — which
    flips half-ulp quantization ties vs. the reference.  Routing the
    product through a data-dependent select breaks the contraction pattern
    while keeping the exact rounded product (verified compiler-invariant
    incl. under --xla_force_host_platform_device_count).
    """
    p = a * b
    return jnp.where(p == p, p, jnp.zeros_like(p))


def _mm_exact(a: jnp.ndarray, rowsel, ct_cols) -> jnp.ndarray:
    """sum_k a[..., sel(k)] * ct_cols[k] accumulated in k order, with each
    product rounded separately (no FMA), matching the C loops."""
    acc = None
    for k in range(8):
        p = _mulr(rowsel(a, k), ct_cols(k))
        acc = p if acc is None else acc + p
    return acc


@functools.lru_cache(maxsize=None)
def _fdct_matrix(table_key: str, dtype: str) -> np.ndarray:
    """64x64 forward-DCT matrix: out[vu, yx] = s[v,u] * C[v,y] * C[u,x]
    with s folding the irt2 row/col weights and the global 1/4."""
    ct = np.asarray(_TABLES[table_key], dtype=np.float64)
    s = np.ones((8, 8))
    s[0, :] *= IRT2
    s[:, 0] *= IRT2
    s *= 0.25
    m = np.einsum("vu,vy,ux->vuyx", s, ct, ct).reshape(64, 64)
    return m.astype(dtype)


@functools.lru_cache(maxsize=None)
def _idct_matrix(table_key: str, dtype: str) -> np.ndarray:
    """64x64 inverse-DCT matrix: out[yx, vu] = Cu[u]*Cv[v]/4 * C[v,y]*C[u,x]."""
    ct = np.asarray(_TABLES[table_key], dtype=np.float64)
    cu = np.ones(8)
    cu[0] = IRT2
    m = np.einsum("v,u,vy,ux->yxvu", cu * 0.5, cu * 0.5, ct, ct).reshape(64, 64)
    return m.astype(dtype)


def _table_registry():
    from ..constants import COS_DEC

    return {"enc": COS_ENC, "dec": COS_DEC}


_TABLES = _table_registry()


def _table_key(table: np.ndarray) -> str:
    """Map a cosine table to its cached-matrix key.

    Identity first (the cheap common case: callers pass the module
    constants), falling back to value equality for copies (e.g. tables
    round-tripped through jit closures).  Any *other* table is an error —
    silently caching a custom table under a regime key would hand wrong
    constants to every later caller of that regime."""
    for key, known in _TABLES.items():
        if table is known:
            return key
    for key, known in _TABLES.items():
        if table.shape == known.shape and np.array_equal(table, known):
            return key
    raise ValueError(
        "fdct/idct fast path only supports the COS_ENC / COS_DEC regime "
        "tables (constants.py); got an unknown table"
    )


def fdct(err: jnp.ndarray, table: np.ndarray = COS_ENC, dtype=jnp.float64) -> jnp.ndarray:
    """Forward DCT of (..., 8, 8) integer residuals.

    out[v,u] = irt2^([v==0]+[u==0]) / 4 * sum_y ct[v,y] * (sum_x e[v,x]*ct[u,x])
    in the reference's stage order and summation order (DCT_block enc
    src:2685-2749).  float64 -> compiler-invariant exact path; float32 ->
    MXU-friendly einsum fast path.
    """
    e = err.astype(dtype)
    ct = np.asarray(table, dtype=dtype)
    if dtype == jnp.float64:
        # t1[..., v, u] = sum_x e[..., v, x] * ct[u, x]
        t1 = _mm_exact(e, lambda a, x: a[..., :, x, None], lambda x: ct[:, x])
        # out[..., v, u] = sum_y t1[..., y, u] * ct[v, y]
        out = _mm_exact(
            t1, lambda a, y: a[..., y, None, :], lambda y: ct[:, y][:, None]
        )
        out = out.at[..., 0, :].set(_mulr(out[..., 0, :], dtype(IRT2)))
        out = out.at[..., :, 0].set(_mulr(out[..., :, 0], dtype(IRT2)))
        return _mulr(out, dtype(0.25))
    # fast path: one 64x64 matmul on the MXU.  The separable transform is
    # kron(C, C) with the irt2 row/col scaling and the 1/4 folded into the
    # matrix (float32 only: folding changes rounding, which the fast path
    # does not pin).  K=N=64 keeps the systolic array fed, vs. the 8-wide
    # contractions of the separable form.
    m = _fdct_matrix(_table_key(table), np.dtype(dtype).name)
    flat = e.reshape(e.shape[:-2] + (64,))
    out = jnp.einsum("...k,ok->...o", flat, m, preferred_element_type=dtype)
    return out.reshape(e.shape)


def idct(iq: jnp.ndarray, table: np.ndarray, dtype=jnp.float64) -> jnp.ndarray:
    """Inverse DCT of (..., 8, 8) dequantized integers.

    Per-term order matches the C code: Cu[u]*(double)iq[y][u] is rounded
    first (the elementwise premultiply), then multiplied by the cosine and
    accumulated (IDCT_block enc src:2857-2878).
    """
    q = iq.astype(dtype)
    ct = np.asarray(table, dtype=dtype)
    cu = np.ones((8,), dtype=np.dtype(dtype))
    cu[0] = IRT2
    if dtype == jnp.float64:
        m = _mulr(q, cu[None, :])
        t1 = _mm_exact(m, lambda a, u: a[..., :, u, None], lambda u: ct[u, :])
        n = _mulr(t1, cu[:, None])
        out = _mm_exact(
            n, lambda a, v: a[..., v, None, :], lambda v: ct[v, :][:, None]
        )
        return _mulr(out, dtype(0.25))
    m = _idct_matrix(_table_key(table), np.dtype(dtype).name)
    flat = q.astype(dtype).reshape(q.shape[:-2] + (64,))
    out = jnp.einsum("...k,ok->...o", flat, m, preferred_element_type=dtype)
    return out.reshape(q.shape[:-2] + (8, 8))
