"""Real-chip tests (opt-in: ICSP_TEST_TPU=1, TPU must be otherwise idle).

Run this file ALONE (`ICSP_TEST_TPU=1 pytest tests/test_tpu_chip.py`):
it must not share a process with modules that enable x64 — float64
tracing on the axon backend recurses in dtype canonicalization.
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("ICSP_TEST_TPU", "0") != "1",
    reason="real-chip test: set ICSP_TEST_TPU=1 (and keep the TPU single-client)",
)


def test_pallas_kernels_on_chip_match_xla():
    """Compiled (Mosaic) pallas ME/MC == XLA formulation on the real TPU,
    through the full inter GOP engine (encode).  Guards against the class
    of silent mis-lowerings documented in CLAUDE.md (misaligned slicing,
    single-pass-bf16 matmuls)."""
    import jax
    import jax.numpy as jnp

    from icspcodec_tpu.constants import COS_ENC
    from icspcodec_tpu.engine.inter import encode_gop

    assert jax.default_backend() != "cpu"
    rng = np.random.default_rng(11)
    g, p, h, w = 3, 4, 288, 352
    yn = rng.integers(0, 256, (g, p, h, w), np.uint8)
    # saturated static square: black reconstructs exactly (clip at 0), so
    # P-frames hit zero-SAD MBs -> the stateful break branch (sad_union +
    # mc_select_*_union kernels) compiles and runs on-chip too
    yn[..., 32:96, 32:96] = 0
    y = jnp.asarray(yn)
    cb = jnp.asarray(rng.integers(0, 256, (g, p, h // 2, w // 2), np.uint8))
    cr = jnp.asarray(rng.integers(0, 256, (g, p, h // 2, w // 2), np.uint8))
    a = jax.jit(lambda *t: encode_gop(*t, 16, 16, table=COS_ENC, dtype=jnp.float32, me="xla"))(y, cb, cr)
    b = jax.jit(lambda *t: encode_gop(*t, 16, 16, table=COS_ENC, dtype=jnp.float32, me="pallas"))(y, cb, cr)
    for pa, pb in zip(a, b):
        for k in pa:
            assert np.array_equal(np.asarray(pa[k]), np.asarray(pb[k])), k
