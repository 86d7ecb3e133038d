from .gop import (  # noqa: F401
    encode_gops_padded,
    encode_gops_sharded,
    encode_intra_padded,
    gop_mesh,
    mesh_for,
)
