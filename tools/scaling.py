"""Multi-host scaling-efficiency measurement (SCALING_r*.json).

Weak-scaling proxy on the virtual CPU mesh: N processes (N = 1, 2), each
pinned to ONE physical core via taskset so every process has identical
compute resources, each driving the same per-host corpus shard through
MeshDecoder.decode_batched_local over the global mesh. The per-host
images/s at N=2 divided by the rate at N=1 is the scaling efficiency —
the layout keeps image bytes host-local and uses a metrics-only collective
(dist/multihost.py), so any loss measures collective/dispatch overhead,
which is exactly what pod-scale scaling costs (BASELINE.md target >= 90%).

Usage: python tools/scaling.py [--out SCALING.json]
"""

import json
import os
import socket
import subprocess
import sys
import tempfile

WORKER = r"""
import os, sys, time
sys.path.insert(0, os.getcwd())  # repo root (workers run from /tmp scripts)
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); coord = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ.pop("AXON_PLUGIN_DIR", None)
import jax
if nproc > 1:
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)
import numpy as np
from rocjpeg_tpu import api
from rocjpeg_tpu.dist import mesh as mesh_lib, multihost, sharding
from rocjpeg_tpu.testing import encoder
from rocjpeg_tpu.types import DecodeParams, OutputFormat

PER_HOST = 8
ITERS = 6
# Host entropy front-end + sharded transform (device_entropy="off"): the
# wave program's CPU compile/run cost at measurement-sized shapes swamps a
# single pinned core, and tiny shapes make per-batch dispatch/sync dominate
# — 512x384 transform batches give each program real work so the ratio
# measures the layout's cross-process costs, not fixed overheads.
blobs = [encoder.encode_planes(
    encoder.random_planes("420", 512, 384, seed=100 * pid + s), "420",
    restart_interval=4) for s in range(PER_HOST)]
streams = [api.JpegStream(b) for b in blobs]
params = DecodeParams(OutputFormat.NATIVE)
md = sharding.MeshDecoder(mesh=mesh_lib.make_mesh(space=1),
                          device_entropy="off")

md.decode_batched_local(streams, params)  # warmup/compile

t0 = time.perf_counter()
for _ in range(ITERS):
    per_image, pitches, err = md.decode_batched_local(streams, params)
np.asarray(per_image[0][0])
t1 = time.perf_counter()

imgs, _, secs = multihost.allreduce_metrics(
    ITERS * PER_HOST, 0.0, t1 - t0)

# Dispatch-overhead probe: a trivial sharded program on the same mesh.
# Its per-call wall isolates the multi-controller launch cost from the
# decode pipeline itself (the decode program has no collectives).
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
sh = NamedSharding(md.mesh, P("data"))
x = jax.device_put(np.zeros((8, 128), np.float32), sh)
f = jax.jit(lambda a: a + 1, in_shardings=sh, out_shardings=sh)
f(x).block_until_ready()
t0 = time.perf_counter()
for _ in range(50):
    y = f(x)
y.block_until_ready()
t1 = time.perf_counter()
_, disp, _ = multihost.allreduce_metrics(0.0, (t1 - t0) / 50, 0.0)

if pid == 0:
    print("RESULT " + str(float(imgs) / float(secs)) + " " +
          str(float(disp) / max(1, nproc)), flush=True)
"""


def run(nproc: int) -> float:
    port = None
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(WORKER)
        path = f.name
    procs = []
    for pid in range(nproc):
        cmd = [sys.executable, path, str(pid), str(nproc), coord]
        if os.path.exists("/usr/bin/taskset"):
            cmd = ["taskset", "-c", str(pid % (os.cpu_count() or 1))] + cmd
        procs.append(subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, cwd=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))))
    rate = disp = None
    for p in procs:
        out, err = p.communicate(timeout=1500)
        if p.returncode != 0:
            raise RuntimeError(f"worker failed rc={p.returncode}:\n"
                               f"{(err or '')[-3000:]}")
        for line in (out or "").splitlines():
            if line.startswith("RESULT "):
                parts = line.split()
                rate = float(parts[1])
                disp = float(parts[2])
    os.unlink(path)
    assert rate is not None, "no RESULT line"
    return rate, disp


def main():
    out_path = "SCALING.json"
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    r1, d1 = run(1)
    r2, d2 = run(2)
    eff = (r2 / 2.0) / r1
    result = {
        "metric": "multi-process weak-scaling efficiency (images/s per host)",
        "images_per_s": {"1_proc": round(r1, 2), "2_proc_total": round(r2, 2)},
        "efficiency": round(eff, 4),
        "dispatch_overhead_ms_per_call": {"1_proc": round(d1 * 1e3, 2),
                                          "2_proc": round(d2 * 1e3, 2)},
        "method": "2 processes x 4 virtual CPU devices, one pinned core "
                  "each (taskset); per-host corpus, metrics-only collective",
        "analysis": "Steady-state decode runs on each process's LOCAL "
                    "sub-mesh (decode_batched_local default): the program "
                    "has no cross-shard communication, so no per-batch "
                    "multi-controller launch crosses processes — only the "
                    "end-of-run metrics allgather does. The trivial-"
                    "program probe reports the global-mesh per-call launch "
                    "cost that the local layout avoids. Correctness of "
                    "both layouts (local and global_arrays=True) is "
                    "verified bit-exact by tests/test_multihost.py.",
    }
    print(json.dumps(result))
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
