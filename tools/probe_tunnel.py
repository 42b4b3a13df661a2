"""Characterize the tunneled TPU transport's H2D budget (round 5).

The axon tunnel on this system meters host->device traffic PER PROCESS:
a burst budget at full rate, then a hard throttle with no observed refill
for the life of the process. Every recorded bench figure depends on where
inside that budget the measurement ran, so this probe records the budget
alongside the bench (TUNNEL_r{N}.json) — the transport state is part of
the measurement's provenance, like the reference recording the VCN
capability table per arch (rocjpeg_vaapi_decoder.cpp:294-305).

Method: device_put an 84 MB array (the mug leg's per-iteration H2D size)
in a loop, recording per-transfer GB/s until the rate collapses below
0.3 GB/s (the cliff is ~20x, unmistakable) or MAX_PUTS is reached; then
take more transfers at the penalty rate. Runs in THIS process — run it
fresh. Writes JSON to stdout and TUNNEL_OUT (default TUNNEL_r05.json).

Observed 2026-08-21: ~750-840 MB at 1.3-1.7 GB/s, then ~0.05-0.09 GB/s;
no refill after 60 s in-process; a fresh process resets the budget; a
45 s-old process that had not yet transferred still got the full burst
(so it is a byte budget, not an age cutoff); 1.6 GB of device-side
allocations (no H2D) did not drain it.
"""
import json
import os
import sys
import time

import numpy as np

MAX_PUTS = int(os.environ.get("PROBE_MAX_PUTS", "14"))
PENALTY_PUTS = int(os.environ.get("PROBE_PENALTY_PUTS", "2"))
OUT = os.environ.get("TUNNEL_OUT", "TUNNEL_r05.json")


def main():
    import jax
    x = np.random.randint(0, 2**31, size=(21_000_000,), dtype=np.uint32)
    mb = x.nbytes / 1e6
    rates = []
    cliff_at = None
    for i in range(MAX_PUTS):
        t0 = time.perf_counter()
        d = jax.device_put(x)
        d.block_until_ready()
        del d
        r = x.nbytes / (time.perf_counter() - t0) / 1e9
        rates.append(round(r, 3))
        print(f"put {i}: {r:.3f} GB/s", file=sys.stderr)
        if r < 0.3 and i > 0:
            cliff_at = i
            break
    penalty = []
    if cliff_at is not None:
        for _ in range(PENALTY_PUTS):
            t0 = time.perf_counter()
            d = jax.device_put(x)
            d.block_until_ready()
            del d
            penalty.append(round(x.nbytes / (time.perf_counter() - t0) / 1e9,
                                 3))
    burst = [r for r in rates if r >= 0.3]
    result = {
        "transfer_mb": round(mb, 1),
        "rates_gb_s": rates,
        "burst_budget_mb": round(mb * len(burst), 1) if cliff_at else None,
        "burst_rate_gb_s": round(float(np.median(burst)), 3) if burst else None,
        "penalty_rate_gb_s": (round(float(np.median(penalty)), 3)
                              if penalty else None),
        "cliff_hit": cliff_at is not None,
        "note": "per-process H2D byte budget; fresh process resets it; "
                "no in-process refill observed (60s)",
    }
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
