import os
import pathlib
import subprocess
import sys

# Sharding tests need a multi-device mesh; tests run on a virtual 11-device
# CPU platform (11 = a non-trivial divisor of CIF's 22 MB columns, so the
# tile_shards tests can run the maximum column split; gop tests use 8)
# unless ICSP_TEST_TPU=1 explicitly requests the real chip.
# NOTE: the axon TPU plugin overrides the JAX_PLATFORMS *env var*; only
# jax.config.update reliably selects the CPU backend here.  x64 must also
# be enabled via config for the exact (float64) conformance path — the
# TPU's f64 is double-double emulation (~1e-11), not IEEE double.
if os.environ.get("ICSP_TEST_TPU", "0") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=11"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import pytest  # noqa: E402

GOLDEN = REPO / "tests" / "golden"


@pytest.fixture(scope="session")
def golden_dir():
    """Golden artifacts from the C++ reference; regenerated on demand
    (they are gitignored — only MANIFEST.sha256 is committed)."""
    if not (GOLDEN / "synthA_compCIF_16_16_1.bin").exists():
        if not pathlib.Path("/root/reference").exists():
            pytest.skip("reference codec not available to generate goldens")
        subprocess.run(
            ["bash", str(REPO / "tools" / "gen_golden.sh")],
            check=True,
            capture_output=True,
        )
    return GOLDEN
