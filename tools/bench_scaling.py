#!/usr/bin/env python3
"""Weak-scaling efficiency of the `gop` mesh axis (BASELINE.md target:
>= 80% throughput scaling efficiency across hosts).

Real multi-chip hardware is not reachable from this environment (one
tunneled chip), so the measurement runs on the virtual CPU mesh: encode
G = n GOPs sharded over n devices, for n in {1, 2, 4, 8}, and report

    eff(n) = t(1 GOP, 1 device) / t(n GOPs, n devices)

(perfect weak scaling -> 1.0).  CAVEATS, stated honestly: the virtual
devices share this host's physical cores and memory bandwidth, so the
numbers LOWER-BOUND what disjoint chips would do (a real mesh adds no
resource sharing; closed GOPs need zero collectives — the compiled
program is verified SPMD by tests/test_sharding.py::test_gop_sharding_is_spmd).

Prints one JSON line; bench.py runs this as a subprocess and folds the
result into BENCH_r*.json as `scaling_efficiency`.
"""
import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax

    # the axon plugin ignores env overrides; config.update is the only
    # reliable CPU selection (CLAUDE.md) — and must run before backend init
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from icspcodec_tpu.io import load_yuv420
    from icspcodec_tpu.parallel.gop import encode_gops_sharded, mesh_for
    from tools.make_content import synth_sequence

    W, H, P = 352, 288, 10
    nmax = 8
    raw = synth_sequence("benchA", nmax * P).tobytes()
    y, cb, cr = load_yuv420(raw, W, H, nmax * P)
    yg = y.reshape(nmax, P, H, W)
    cbg = cb.reshape(nmax, P, H // 2, W // 2)
    crg = cr.reshape(nmax, P, H // 2, W // 2)

    def timed(n):
        mesh = mesh_for(n, exact=False)
        args = (yg[:n], cbg[:n], crg[:n], 16, 16, mesh)
        out = encode_gops_sharded(*args, dtype=jnp.float32)  # compile+warm
        jax.block_until_ready(out)
        reps, best = 3, float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = encode_gops_sharded(*args, dtype=jnp.float32)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        return best

    times = {n: timed(n) for n in (1, 2, 4, 8)}
    eff = {str(n): round(times[1] / times[n], 3) for n in times}
    result = {
        "metric": "gop_weak_scaling_efficiency",
        "value": eff["8"],
        "unit": "t(1 GOP,1 dev)/t(8 GOPs,8 devs)",
        "efficiency_by_devices": eff,
        "seconds_by_devices": {str(n): round(times[n], 3) for n in times},
        "mesh": "8 virtual CPU devices (shared physical cores: lower bound)",
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
