"""Native runtime components (C, loaded via ctypes).

Compiled on first use into a cached shared object next to the source; the
environment ships gcc but not pybind11, so the binding layer is plain
ctypes over a C ABI.
"""
from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_DIR = pathlib.Path(__file__).resolve().parent
_LIB = None


def _build() -> pathlib.Path:
    src = _DIR / "vlcparse.c"
    so = _DIR / "_vlcparse.so"
    if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
        subprocess.run(
            ["cc", "-O2", "-shared", "-fPIC", "-o", str(so), str(src)],
            check=True,
        )
    return so


def _lib():
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(str(_build()))
        lib.parse_frames.restype = ctypes.c_long
        lib.parse_frames.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
        ] + [ctypes.c_void_p] * 9
        lib.pack_items.restype = ctypes.c_long
        lib.pack_items.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p,
        ]
        _LIB = lib
    return _LIB


def pack_items_native(codes: np.ndarray, lengths: np.ndarray) -> bytes:
    """MSB-first pack of (code, length<=56) items, reference tail rule."""
    total = int(lengths.sum())
    out = np.zeros(total // 8 + 1, dtype=np.uint8)
    n = _lib().pack_items(
        codes.ctypes.data_as(ctypes.c_void_p),
        lengths.ctypes.data_as(ctypes.c_void_p),
        codes.size,
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out[:n].tobytes()


def parse_body(body: bytes, nframes: int, height: int, width: int, period: int):
    """Parse the bitstream body into fixed-shape int32 symbol arrays."""
    mbh, mbw = height // 16, width // 16
    gh, gw = 2 * mbh, 2 * mbw
    out = dict(
        y_scan=np.zeros((nframes, gh, gw, 64), np.int32),
        y_acflag=np.zeros((nframes, gh, gw), np.int32),
        mpm=np.zeros((nframes, gh, gw), np.int32),
        mode_bit=np.zeros((nframes, gh, gw), np.int32),
        cb_scan=np.zeros((nframes, mbh, mbw, 64), np.int32),
        cb_acflag=np.zeros((nframes, mbh, mbw), np.int32),
        cr_scan=np.zeros((nframes, mbh, mbw, 64), np.int32),
        cr_acflag=np.zeros((nframes, mbh, mbw), np.int32),
        mv_diff=np.zeros((nframes, mbh, mbw, 2), np.int32),
    )
    used = _lib().parse_frames(
        body, len(body), nframes, mbh, mbw, period,
        *(a.ctypes.data_as(ctypes.c_void_p) for a in (
            out["y_scan"], out["y_acflag"], out["mpm"], out["mode_bit"],
            out["cb_scan"], out["cb_acflag"], out["cr_scan"], out["cr_acflag"],
            out["mv_diff"],
        )),
    )
    if used < 0:
        raise ValueError("truncated bitstream")
    return out
