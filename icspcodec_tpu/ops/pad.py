"""Replicate padding with the reference's off-by-one quirk.

getPaddingImage (enc src:2227-2269) pads `padlen` rows/cols of edge
replication on top/left but only `padlen-1` on bottom/right, leaving the
final padded row and column zero.  Motion candidates at extreme offsets
read those zeros, so the quirk is load-bearing for bit-exactness.
"""
from __future__ import annotations

import jax.numpy as jnp


def pad_image(img: jnp.ndarray, padlen: int) -> jnp.ndarray:
    """img: (..., H, W) -> (..., H+2p, W+2p)."""
    p = padlen
    out = jnp.pad(img, [(0, 0)] * (img.ndim - 2) + [(p, p), (p, p)], mode="edge")
    # zero the final row and column; shift the bottom/right replication up
    # by one is implicit: edge-pad replicates p rows, the reference only
    # p-1 + a zero row.  Rows p..p+H-1 are the image; replicated rows are
    # p+H..p+2p-1; the reference writes p+H-1..p+2p-2 with the edge value
    # (same for p+H-1 which is already the edge) and leaves p+2p-1 zero.
    out = out.at[..., -1, :].set(0)
    out = out.at[..., :, -1].set(0)
    return out
