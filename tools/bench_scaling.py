#!/usr/bin/env python3
"""Scaling efficiency of the `gop` mesh axis (BASELINE.md target:
>= 80% throughput scaling efficiency across hosts).

Real multi-chip hardware is not reachable from this environment (one
tunneled chip), and virtual CPU "devices" share this host's physical
cores — XLA already multithreads a single-device program across all of
them, so classic weak scaling CANNOT exceed ~1/n here by construction
and would be a dishonest number to report.  What IS measurable on
shared cores is the **sharding overhead**: the same G=8 GOP batch
encoded on 1 device vs sharded over 8.  Closed GOPs need zero
collectives (the compiled program is verified SPMD by
tests/test_sharding.py::test_gop_sharding_is_spmd), so on disjoint
chips throughput scales with device count times exactly this factor:

    sharding_efficiency = t(8 GOPs, 1 device) / t(8 GOPs, 8 devices)

(1.0 = partitioning adds nothing; >1.0 = the sharded program schedules
better).  The classic per-device weak-scaling column is still emitted
as `weak_scaling_shared_cores` with its caveat.

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
    nmax = 16  # bigger batch: ~1 s legs drown scheduler noise (the r5
    # first capture at 8 GOPs still spread 0.75-1.20 across pairs)
    raw = synth_sequence("benchA", nmax * P).tobytes()
    y, cb, cr = load_yuv420(raw, W, H, nmax * P)
    yg = y.reshape(nmax, P, H, W)
    cbg = cb.reshape(nmax, P, H // 2, W // 2)
    crg = cr.reshape(nmax, P, H // 2, W // 2)

    def timed(g, n, runs=5):
        """Encode g GOPs sharded over n devices; best of `runs` (warm)."""
        mesh = mesh_for(n, exact=False)
        args = (yg[:g], cbg[:g], crg[:g], 16, 16, mesh)
        out = encode_gops_sharded(*args, dtype=jnp.float32)  # compile+warm
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            out = encode_gops_sharded(*args, dtype=jnp.float32)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        return best

    # headline: same batch, 1 vs 8 devices (collective-free SPMD means
    # disjoint chips scale by device count x this factor).  The r4 value
    # was a single shot and swung 0.445..1.042 across captures — the two
    # legs were measured minutes apart under drifting host load (the
    # shared-core CPU mesh competes with everything else on this box).
    # Now: >= 5 repetitions of the (1dev, 8dev) pair measured
    # BACK-TO-BACK (so load drift hits both legs of a ratio equally),
    # reported as median + min/max spread — the same treatment
    # tools/bench_decode_variance.py gave the r3 decode variance.
    reps = []
    times = []
    for _ in range(5):
        t8_1 = timed(nmax, 1)
        t8_8 = timed(nmax, 8)
        reps.append(t8_1 / t8_8)
        times.append((t8_1, t8_8))
    reps_sorted = sorted(reps)
    sharding_eff = reps_sorted[len(reps) // 2]
    t8_1, t8_8 = times[reps.index(sharding_eff)]
    # secondary: classic weak scaling — meaningless >1/n on shared cores
    weak = {n: timed(n, n) for n in (1, 2, 4, 8)}
    result = {
        "metric": "gop_sharding_efficiency",
        "value": round(sharding_eff, 3),
        "unit": "t(16 GOPs, 1 dev) / t(16 GOPs, 8 devs); median of 5 back-to-back pairs, best-of-5 legs",
        "reps": [round(r, 3) for r in reps],
        "min": round(reps_sorted[0], 3),
        "max": round(reps_sorted[-1], 3),
        "spread_pct": round(
            100 * (reps_sorted[-1] - reps_sorted[0]) / sharding_eff, 1
        ),
        "seconds_batch": {"1dev": round(t8_1, 3), "8dev": round(t8_8, 3)},
        "weak_scaling_shared_cores": {
            str(n): round(weak[1] / weak[n], 3) for n in weak
        },
        "weak_seconds": {str(n): round(weak[n], 3) for n in weak},
        "mesh": (
            "8 virtual CPU devices sharing this host's cores: weak scaling "
            "is bounded by ~1/n here; sharding_efficiency is the honest "
            "shared-core measurement (program is collective-free SPMD)"
        ),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
