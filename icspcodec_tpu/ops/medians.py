"""The reference's 3-way medians (DC/mode predictors and MV prediction).

median3 is a true median; median3_mv_y replicates the y-component typo of
mvPrediction/ImvPrediction (enc src:2399/2418/2472/2491): the middle
branch compares y1 against *x3* instead of y3.
"""
from __future__ import annotations

import jax.numpy as jnp


def median3(a, b, c):
    m1 = jnp.maximum(b, c)
    m2 = jnp.maximum(a, c)
    m3 = jnp.maximum(a, b)
    return jnp.where((a > b) & (a > c), m1, jnp.where((b > a) & (b > c), m2, m3))


def median3_mv_y(y1, y2, y3, x3):
    m1 = jnp.maximum(y2, y3)
    m2 = jnp.where(y1 > x3, y1, y3)
    m3 = jnp.maximum(y1, y2)
    return jnp.where(
        (y1 > y2) & (y1 > y3), m1, jnp.where((y2 > y1) & (y2 > y3), m2, m3)
    )
