"""End-to-end N-walk-core demonstration for the mug leg (VERDICT r04 #1c).

The mug leg (the reference's own 4K DRI=0 image) is bound by the host
index walk on this 2-core VM: the measured roofline (ROOFLINE_r05.json)
puts the walk at ~6 core-ms/image and predicts ~3 host cores feed the
2 Gpix/s target. This tool turns that prediction into a MEASURED
end-to-end number: it runs the real decode loop on the real chip while
emulating an N-core walk pool, and records Mpix/s vs N.

Emulation: with E emulated walk cores on 2 physical ones, exactly 2/E of
the decode calls run the real `rjt_index_scan32` walk; the rest are
served the (bit-identical, same-image corpus) cached walk records. Every
OTHER stage — native lane geometry, AVX-512 bit pack, the bundled H2D
stage, the Pallas wave, the transform epilogue — runs for real on every
iteration, so the measurement exercises the full pipeline at the walk
throughput an E-core host would provide. This emulates walk THROUGHPUT,
not latency (a real E-core host also finishes each batch's walk sooner);
the depth-2 submit pipeline absorbs the difference, and the E=2 point —
all walks real — doubles as the sanity anchor against bench.py's mug leg.

Each E point runs in a fresh subprocess (the tunnel's per-process H2D
budget, docs/performance.md "Transport budget") with the bench's usual
warmup + 6 iters x 32 images. Writes NCORE_r05.json (env NCORE_OUT).
"""
import json
import os
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = os.environ.get("NCORE_OUT", "NCORE_r05.json")
CORES = [int(x) for x in os.environ.get("NCORE_POINTS", "2,3,4,6").split(",")]
REPS = int(os.environ.get("NCORE_REPS", "3"))
ITERS = int(os.environ.get("NCORE_ITERS", "6"))
BATCH = 32


def run_point(emulated_cores: int) -> float:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rjt_xla_cache")
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    from rocjpeg_tpu import api
    from rocjpeg_tpu.runtime import native
    from rocjpeg_tpu.types import DecodeParams

    E = emulated_cores
    real = native.index_scan32
    state = {"cache": None, "n": 0}
    lock = threading.Lock()

    def emulated(plist, S, bufs=None):
        with lock:
            first = state["cache"] is None
            i = state["n"]
            state["n"] += 1
        if first:
            out = real(plist, S, bufs)
            if out is not None:
                state["cache"] = [tuple(np.copy(x) for x in r) for r in out]
            return out
        if (i % E) < 2:  # 2 physical walk cores out of E emulated
            return real(plist, S, bufs)
        return state["cache"]

    native.index_scan32 = emulated

    data = open("/root/reference/data/images/mug_420.jpg", "rb").read()
    dec = api.Decoder(check_errors=False)
    streams = [api.JpegStream(data) for _ in range(BATCH)]
    params = DecodeParams()
    imgs = dec.decode_batched(streams, params)
    imgs[0].channel[0].block_until_ready()

    import collections

    def worker(iters):
        inflight = collections.deque()
        for _ in range(iters):
            o = dec.decode_batched(streams, params)
            inflight.append(o)
            if len(inflight) > 1:
                inflight.popleft()[0].channel[0].block_until_ready()
        for o in inflight:
            o[0].channel[0].block_until_ready()

    per = [ITERS // 2 + (1 if t < ITERS % 2 else 0) for t in range(2)]
    t0 = time.perf_counter()
    ths = [threading.Thread(target=worker, args=(n,)) for n in per]
    for t in ths:
        t.start()
    for t in ths:
        t.join()
    wall = time.perf_counter() - t0
    return ITERS * BATCH * 3840 * 2160 / 1e6 / wall


def main():
    point = os.environ.get("NCORE_POINT")
    if point is not None:
        print(json.dumps({"mpix_s": round(run_point(int(point)), 1)}))
        return

    results = {}
    for e in CORES:
        vals = []
        for rep in range(REPS):
            env = dict(os.environ)
            env["NCORE_POINT"] = str(e)
            r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                               env=env, capture_output=True, text=True,
                               timeout=900)
            for line in r.stdout.splitlines():
                if line.startswith("{"):
                    v = json.loads(line)["mpix_s"]
                    vals.append(v)
                    print(f"E={e} rep{rep}: {v} Mpix/s", file=sys.stderr)
                    break
            else:
                print(f"E={e} rep{rep}: FAILED\n{r.stderr[-2000:]}",
                      file=sys.stderr)
        if vals:
            results[str(e)] = {"mpix_s": float(np.median(vals)),
                               "all": vals}
    out = {
        "metric": "Mpix/s, mug leg, emulated N-core walk pool "
                  "(median of %d fresh-process runs)" % REPS,
        "iters": ITERS, "batch": BATCH,
        "points": results,
        "note": "2/E of decode calls run the real walk; all other stages "
                "run for real every iteration. E=2 (all walks real) is "
                "the sanity anchor vs bench.py's mug leg.",
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
