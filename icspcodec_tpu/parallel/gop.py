"""GOP/data parallelism over a device mesh.

The reference's entire parallelism story is a pthread pool over closed
GOPs (ICSP_thread.cpp:39-77): GOPs never reference each other, so they
are embarrassingly parallel.  The TPU mapping is a mesh axis `gop`:
the (G, P, H, W) GOP batch is sharded on G and the whole encode_gop
program becomes SPMD with zero collectives — the direct analog of the
reference's job queue, but compiled.

Multi-host: the same jit works under jax.distributed with a global mesh;
per-host I/O feeds the local shard (closed GOPs need no halo).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..constants import COS_ENC
from ..engine.inter import encode_gop


def gop_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), axis_names=("gop",))


def encode_gops_sharded(y, cb, cr, qdc: int, qac: int, mesh: Mesh, dtype=jnp.float32, me: str = "xla"):
    """Encode (G, P, H, W) GOPs with G sharded across the mesh.

    G must be divisible by the mesh size.  Returns the same (intra, inter)
    pytrees as engine.inter.encode_gop, sharded on their leading G axis.
    me: ME/MC implementation (engine.inter.encode_inter_frame) — "pallas"
    on real TPU meshes, "xla" (default) is portable to any backend.
    """
    shard = NamedSharding(mesh, P("gop"))

    def run(y, cb, cr):
        return encode_gop(y, cb, cr, qdc, qac, table=COS_ENC, dtype=dtype, me=me)

    fn = jax.jit(run, in_shardings=(shard, shard, shard))
    return fn(
        jax.device_put(jnp.asarray(y), shard),
        jax.device_put(jnp.asarray(cb), shard),
        jax.device_put(jnp.asarray(cr), shard),
    )
