"""2-process jax.distributed simulation: the multi-host GOP-sharding path
(initialize + global mesh + host-local feeding) must produce the same
results as a single-process encode.

The reference's only parallelism is a single-process pthread pool; this
pins the TPU framework's cross-host story (SURVEY.md section 2.3) without
multi-host hardware: 2 coordinated processes x 2 virtual CPU devices.
"""
import pathlib
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_gop_sharding_matches_single(tmp_path):
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tools" / "multihost_worker.py"),
             str(pid), "2", str(port), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o

    # every process dumped the full global symbol arrays: byte-compare
    # across processes AND against a single-process encode of the same
    # data (array equality — a checksum could hide compensating errors)
    dumps = [dict(np.load(tmp_path / f"proc{i}.npz")) for i in range(2)]
    assert dumps[0].keys() == dumps[1].keys()
    for k in dumps[0]:
        assert np.array_equal(dumps[0][k], dumps[1][k]), k

    # single-process reference on identical data
    from icspcodec_tpu.constants import COS_ENC
    from icspcodec_tpu.engine.inter import encode_gop

    g, p, h, w = 4, 2, 64, 64
    rng = np.random.default_rng(0)
    y = rng.integers(0, 256, (g, p, h, w), dtype=np.uint8)
    cb = rng.integers(0, 256, (g, p, h // 2, w // 2), dtype=np.uint8)
    cr = rng.integers(0, 256, (g, p, h // 2, w // 2), dtype=np.uint8)
    intra, inter = jax.jit(
        lambda a, b, c: encode_gop(a, b, c, 16, 16, table=COS_ENC, dtype=jnp.float32)
    )(y, cb, cr)
    want = {
        f"{tag}_{k}": np.asarray(v)
        for tag, tree in (("intra", intra), ("inter", inter))
        for k, v in tree.items()
    }
    assert dumps[0].keys() == want.keys()
    for k in want:
        assert np.array_equal(dumps[0][k], want[k]), k
