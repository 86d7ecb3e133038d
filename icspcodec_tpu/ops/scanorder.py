"""Zig-zag scan as a constant-index gather (zigzagScanning enc src:3014-3096)."""
from __future__ import annotations

import jax.numpy as jnp

from ..constants import IZIGZAG, ZIGZAG

_ZZ = jnp.asarray(ZIGZAG)
_IZZ = jnp.asarray(IZIGZAG)


def zigzag(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 8, 8) -> (..., 64) in scan order."""
    return q.reshape(q.shape[:-2] + (64,))[..., _ZZ]


def izigzag(scan: jnp.ndarray) -> jnp.ndarray:
    """(..., 64) scan order -> (..., 8, 8)."""
    return scan[..., _IZZ].reshape(scan.shape[:-1] + (8, 8))
