"""Scalar quantization with the reference's two rounding regimes.

luma:   q = (int)(v + 0.5) / Qstep      — truncation toward zero, then C
        integer division (Quantization_block enc src:2780)
chroma: q = (int)floor(v + 0.5) / Qstep — floor first (CQuantization_block
        enc src:4642); the two differ for negative half-open intervals.
"""
from __future__ import annotations

import jax.numpy as jnp


def c_trunc(x: jnp.ndarray) -> jnp.ndarray:
    """(int) cast of a floating value: truncation toward zero."""
    return jnp.trunc(x).astype(jnp.int32)


def c_div(a: jnp.ndarray, q) -> jnp.ndarray:
    """C integer division: truncates toward zero (numpy // floors)."""
    a = a.astype(jnp.int32)
    return jnp.sign(a) * (jnp.abs(a) // q)


def quant_block(dct: jnp.ndarray, qdc, qac, chroma: bool) -> jnp.ndarray:
    """Quantize (..., 8, 8) DCT blocks (DC at [0,0] uses qdc)."""
    half = dct + 0.5
    t = jnp.floor(half).astype(jnp.int32) if chroma else c_trunc(half)
    q = c_div(t, qac)
    return q.at[..., 0, 0].set(c_div(t[..., 0, 0], qdc))


def quant_scalar(v: jnp.ndarray, qstep, chroma: bool) -> jnp.ndarray:
    """Quantize scalars (used for the sequential DC chain)."""
    half = v + 0.5
    t = jnp.floor(half).astype(jnp.int32) if chroma else c_trunc(half)
    return c_div(t, qstep)


def dequant_block(q: jnp.ndarray, qdc, qac) -> jnp.ndarray:
    iq = (q * qac).astype(jnp.int32)
    return iq.at[..., 0, 0].set((q[..., 0, 0] * qdc).astype(jnp.int32))


def ac_flag(q: jnp.ndarray) -> jnp.ndarray:
    """1 iff all 63 AC coefficients of the (..., 8, 8) block are zero."""
    flat = q.reshape(q.shape[:-2] + (64,))
    return (jnp.count_nonzero(flat[..., 1:], axis=-1) == 0).astype(jnp.int32)
