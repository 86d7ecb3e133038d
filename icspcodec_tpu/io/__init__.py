from .yuv import load_yuv420, save_yuv420, frames_to_planes  # noqa: F401
