"""Codec constants shared by the NumPy oracle and the JAX engines.

All values reverse-engineered behaviorally from the reference codec
(JawThrow/ICSPCodec); citations point at /root/reference source lines.
"""
from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# DCT cosine tables.
#
# The reference hardcodes an 8x8 table of cos((2x+1)*u*pi/16) decimal
# literals.  The encoder declares it `float` (encoder/ICSP_Codec_Encoder.h:
# 190-199) and the decoder declares the *same literals* `double`
# (decoder/ICSP_Codec_Decoder.h:16-26).  All arithmetic is carried out in
# double either way, so the only difference is the rounding of the constants
# themselves.  This is the root cause of the reference's own +-1 LSB
# encoder/decoder disagreement on P-frames; we reproduce both regimes.
# ---------------------------------------------------------------------------
_COS_LITERALS = [
    [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0],
    [0.980785, 0.83147, 0.55557, 0.19509, -0.19509, -0.55557, -0.83147, -0.980785],
    [0.92388, 0.382683, -0.382683, -0.92388, -0.92388, -0.382683, 0.382683, 0.92388],
    [0.83147, -0.19509, -0.980785, -0.55557, 0.55557, 0.980785, 0.19509, -0.83147],
    [0.707107, -0.707107, -0.707107, 0.707107, 0.707107, -0.707107, -0.707107, 0.707107],
    [0.55557, -0.980785, 0.19509, 0.83147, -0.83147, -0.19509, 0.980785, -0.55557],
    [0.382683, -0.92388, 0.92388, -0.382683, -0.382683, 0.92388, -0.92388, 0.382683],
    [0.19509, -0.55557, 0.83147, -0.980785, 0.980785, -0.83147, 0.55557, -0.19509],
]
# encoder: float-rounded constants, promoted to double for the arithmetic
COS_ENC = np.array(_COS_LITERALS, dtype=np.float32).astype(np.float64)
# decoder: the same literals kept at double precision
COS_DEC = np.array(_COS_LITERALS, dtype=np.float64)
IRT2 = 1.0 / np.sqrt(2.0)  # both sides: 1/sqrt(2) computed in double

# ---------------------------------------------------------------------------
# Zig-zag scan order: the hardcoded 64-entry order of
# encoder zigzagScanning (enc src:3014-3096) == CzigzagScanning (:2932-3013).
# Stored as flat row-major indices (y*8+x) in scan order.
# ---------------------------------------------------------------------------
_ZZ_PAIRS = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]
ZIGZAG = np.array([y * 8 + x for (y, x) in _ZZ_PAIRS], dtype=np.int32)
IZIGZAG = np.argsort(ZIGZAG).astype(np.int32)  # block-order -> scan position


def spiral_offsets(nsearch: int = 64) -> np.ndarray:
    """Cumulative (dx, dy) offsets of the reference's spiral search.

    Simulates the state machine of motionEstimation (enc src:2073-2155):
    flag/xflag/yflag persist across macroblocks but return to their initial
    state after each 64-step run, so every MB sees this same sequence.
    Sequence: (0,0),(0,0),(1,0),(1,-1),(-1,-1),... x in [-15,16], y in
    [-16,15].

    KNOWN DIVERGENCE (content-dependent): the return-to-initial-state
    property only holds for break-free 64-step runs.  The reference's
    SAD==0 early break (enc src:2136-2141) can exit mid-run — a perfectly
    static MB breaks at spiral step 1 with xflag/yflag mirrored, so in the
    C++ every *subsequent* MB of that frame walks a mirrored spiral.  This
    fixed table does not model that carry-over; on content with zero-SAD
    MBs (exact static repeats) the chosen MV can differ from the C++ (both
    choices have SAD 0 at the break, so recon quality is unaffected, but
    bitstreams would not be byte-identical).  The pinned golden content
    never triggers the break (verified: golden tests are byte-exact);
    tests/test_ops.py::test_spiral_zero_sad_break_divergence documents the
    triggering content class.
    """
    out = np.zeros((nsearch, 2), dtype=np.int32)
    x0 = y0 = 0
    flag, xflag, yflag = 0, 1, -1
    xcnt = ycnt = 0
    for cnt in range(nsearch):
        if not flag:
            x0 += xcnt if xflag <= 0 else -xcnt
            flag = 1
            xcnt += 1
            xflag *= -1
        else:
            y0 += ycnt if yflag < 0 else -ycnt
            flag = 0
            ycnt += 1
            yflag *= -1
        out[cnt] = (x0, y0)
    return out


SPIRAL = spiral_offsets()

# VLC category boundaries: value magnitude -> total code length in bits
# (DCentropy, enc src:5417-5602; identical tables for AC and MV).
#   cat 0 (v==0):   '00'                               2 bits
#   v==1:           '010' + sign                       4 bits
#   exp=1 (2..3):   '011' + sign + 1 payload bit       5 bits
#   exp=2 (4..7):   '100' + sign + 2                   6
#   exp=3 (8..15):  '101' + sign + 3                   7
#   exp=4 (16..31): '110' + sign + 4                   8
#   exp>=5:         '1'*(exp-2) + '0' + sign + exp     2*exp bits
# sign bit: 1 when value >= 0, 0 when negative; payload = v - 2**exp, MSB first.
VLC_MAX_BITS = 22
