"""Sync-pass A/B with bench-grade discipline (VERDICT r04 #4 + #6).

Runs the mug (and optionally dri0) leg with the device sync pass OFF
(host index walk) and ON under a sweep of (chunk, margin) configurations,
each point the median of >= 3 fresh-process bench runs, and records
SYNC_AB_r05.json. The r04 A/B used margin=1536B on chunk=4096B — ~11x the
walk path's device step count by construction; the sweep here includes
margins sized from the measured sync distance (p50=560 bits,
tools/sync_experiment.py) to give the pass its honest shot at the niche
where its chain proof passes (optimized-table corpora like the mug).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

OUT = os.environ.get("SYNC_AB_OUT", "SYNC_AB_r05.json")
REPS = int(os.environ.get("BENCH_REPS", "3"))
LEGS = os.environ.get("SYNC_AB_LEGS", "mug").split(",")
# (chunk bytes, margin bytes); "off" = host walk baseline.
CONFIGS = os.environ.get(
    "SYNC_AB_CONFIGS", "off;4096,1536;2048,512;1024,256;1024,128").split(";")

out = {"metric": f"Mpix/s, median of {REPS} fresh-process runs per point",
       "reps": REPS, "legs": {}}
for leg in LEGS:
    res = {}
    for cfg in CONFIGS:
        env = dict(os.environ)
        if cfg == "off":
            os.environ["ROCJPEG_TPU_SYNC"] = "off"
            os.environ.pop("ROCJPEG_TPU_SYNC_CB", None)
            os.environ.pop("ROCJPEG_TPU_SYNC_MARGIN", None)
            label = "host-walk"
        else:
            cb, mg = cfg.split(",")
            os.environ["ROCJPEG_TPU_SYNC"] = "on"
            os.environ["ROCJPEG_TPU_SYNC_CB"] = cb
            os.environ["ROCJPEG_TPU_SYNC_MARGIN"] = mg
            label = f"sync_cb{cb}_m{mg}"
        try:
            med = bench.run_leg_subprocess(leg, reps=REPS)
            res[label] = round(med, 1)
        except RuntimeError as e:
            res[label] = f"failed: {e}"
        finally:
            os.environ.clear()
            os.environ.update(env)
        print(f"[sync-ab] {leg} {label}: {res[label]}", file=sys.stderr)
    out["legs"][leg] = res

with open(OUT, "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))
