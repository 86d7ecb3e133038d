from .gop import gop_mesh, encode_gops_sharded  # noqa: F401
