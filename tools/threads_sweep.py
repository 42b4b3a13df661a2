"""Submit-thread sweep with bench-grade discipline (VERDICT r04 #6).

Runs the headline AND mug legs at 1..4 submit threads, each point the
median of >= 3 fresh-process reps (reusing bench.run_leg_subprocess — the
same machinery that records BENCH_r*.json), and writes THREADS_r05.json
(env THREADS_OUT). No single-rep numbers: the r04 sweep's 2-vs-3 ordering
(6149 vs 5519) did not survive its own +-30% noise declaration.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

OUT = os.environ.get("THREADS_OUT", "THREADS_r05.json")
REPS = int(os.environ.get("BENCH_REPS", "3"))
LEGS = os.environ.get("THREADS_LEGS", "headline,mug").split(",")
THREADS = [int(t) for t in
           os.environ.get("THREADS_SET", "1,2,3,4").split(",")]

out = {"metric": f"Mpix/s vs submit threads (median of {REPS} "
                 "fresh-process runs per point)",
       "reps": REPS, "legs": {}}
for leg in LEGS:
    res = {}
    for t in THREADS:
        os.environ["BENCH_THREADS"] = str(t)
        med = bench.run_leg_subprocess(leg, reps=REPS)
        res[str(t)] = round(med, 1)
        print(f"[sweep] {leg} threads={t}: {med:.1f} Mpix/s",
              file=sys.stderr)
    best = max(res, key=res.get)
    out["legs"][leg] = {"threads": res, "best": int(best)}

out["note"] = ("Each point is the median of fresh-process runs, the same "
               "discipline bench.py legs use. 2-core host: expect 2 "
               "threads to lead; the mug (host-walk-bound) leg shows the "
               "core scaling directly.")
with open(OUT, "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))
