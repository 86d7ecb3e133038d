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

    CAVEAT (handled): the return-to-initial-state property only holds for
    break-free 64-step runs.  The reference's SAD==0 early break (enc
    src:2136-2141) can exit mid-run — a perfectly static MB breaks at
    spiral step 1 with xflag/yflag mirrored, so in the C++ every
    *subsequent* MB of that frame walks a mirrored spiral.  This table is
    therefore only the CANONICAL walk; the full stateful model lives in
    SPIRAL_STATES / SPIRAL_UNION / SPIRAL_STATE_IDX / SPIRAL_TRANS below,
    is the production ME path (ops/me.py spiral_search hybrid), and is
    pinned byte-exact against the compiled C++ binary on zero-SAD trigger
    content (tests/test_codec_vs_golden.py synthStatic configs).
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


# ---------------------------------------------------------------------------
# Stateful spiral tables: exact model of the flag/xflag/yflag carry-over.
#
# The reference's (flag, xflag, yflag) persist across MBs within one
# motionEstimation call (enc src:2094-2109) and the SAD==0 early break
# (enc src:2136-2141) exits mid-run, so the state entering the NEXT MB can
# be mirrored.  The state space closure from the initial (0, 1, -1) under
# "advance t in 2..64 steps" has exactly four members; each defines a fixed
# 64-offset walk (an axis-swap/sign-mirror of the canonical spiral).  The
# union of the four walks is 129 distinct offsets spanning [-16,16]^2.
# ---------------------------------------------------------------------------


def _spiral_walk(state, nsteps: int = 64):
    """Offsets visited by the reference walk starting from `state`."""
    f, xf, yf = state
    x0 = y0 = xcnt = ycnt = 0
    offs = []
    for _ in range(nsteps):
        if not f:
            x0 += xcnt if xf <= 0 else -xcnt
            f = 1
            xcnt += 1
            xf = -xf
        else:
            y0 += ycnt if yf < 0 else -ycnt
            f = 0
            ycnt += 1
            yf = -yf
        offs.append((x0, y0))
    return offs


def _advance_state(state, nsteps: int):
    """State after taking `nsteps` steps (offsets irrelevant)."""
    f, xf, yf = state
    for _ in range(nsteps):
        if not f:
            f, xf = 1, -xf
        else:
            f, yf = 0, -yf
    return (f, xf, yf)


def _spiral_state_tables():
    # reachable closure from the initial state; id 0 = canonical
    states = [(0, 1, -1)]
    frontier = [states[0]]
    while frontier:
        s = frontier.pop()
        for t in range(2, 65):  # break at cnt>=1 -> 2..63 steps; 64 = full run
            ns = _advance_state(s, t)
            if ns not in states:
                states.append(ns)
                frontier.append(ns)
    states.sort(key=lambda s: (s != (0, 1, -1), s))  # canonical first
    walks = [_spiral_walk(s) for s in states]

    union: list[tuple[int, int]] = []
    seen: dict[tuple[int, int], int] = {}
    # canonical offsets first so SPIRAL_TO_UNION is a plain prefix map
    for w in walks:
        for o in w:
            if o not in seen:
                seen[o] = len(union)
                union.append(o)
    union_arr = np.asarray(union, dtype=np.int32)
    state_idx = np.asarray(
        [[seen[o] for o in w] for w in walks], dtype=np.int32
    )  # (4, 64): union row of step k from state s
    trans = np.zeros((len(states), 65), dtype=np.int32)
    for si, s in enumerate(states):
        for t in range(65):
            trans[si, t] = states.index(_advance_state(s, t))
    return tuple(states), union_arr, state_idx, trans


SPIRAL_STATES, SPIRAL_UNION, SPIRAL_STATE_IDX, SPIRAL_TRANS = _spiral_state_tables()
# canonical walk == SPIRAL; its offsets are the first rows of the union
assert np.array_equal(SPIRAL_UNION[SPIRAL_STATE_IDX[0]], SPIRAL)
N_SPIRAL_STATES = len(SPIRAL_STATES)           # 4
N_SPIRAL_UNION = SPIRAL_UNION.shape[0]         # 129

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
