"""Multi-host scaling-efficiency measurement (SCALING_r*.json).

The north-star target is ">= 90% linear images/s scaling at N >= 2 hosts"
(BASELINE.md). On real pods every host brings its OWN CPUs; on this
machine the only way to run N "hosts" is N processes sharing ONE 2-core
VM, so a naive weak-scaling ratio (N-proc rate / N x 1-proc rate) mixes
two very different costs:

  (a) the distributed layer itself (jax.distributed coordination,
      multi-controller dispatch, the metrics collective) — the thing the
      layout must keep near zero for pod-scale linearity, and
  (b) shared-silicon contention (memory bandwidth, turbo license, LLC)
      between the co-located processes — a property of measuring N hosts
      on one VM, nonexistent across real hosts.

Round 2 measured the mixed number (0.53) and could not attribute it. This
harness separates the two with a CONTROL: the same worker, same pinning,
same simultaneous execution, but fully independent processes (no
jax.distributed, no collective — the strongest possible scaling baseline
for this hardware). Efficiencies reported:

  efficiency_layout  = rate(2 distributed procs) / rate(2 independent
                       procs)  -> the distributed layer's true cost; this
                       is the number that transfers to real pods, where
                       per-host compute is private by construction.
  efficiency_raw     = rate(2 distributed procs) / (2 x solo rate)
                       -> the round-2 style mixed number, for continuity.
  contention_factor  = rate(2 independent procs) / (2 x solo rate)
                       -> how much of the raw loss is shared silicon.

The steady state under test is MeshDecoder.decode_batched_local: per-host
corpora, process-local sub-mesh programs, image bytes never cross hosts,
and ONE metrics allgather at the end (dist/multihost.py) — per-thread file
partitioning of jpegdecodeperf.cpp:245-252 lifted to processes.

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
distributed = sys.argv[4] == "1"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ.pop("AXON_PLUGIN_DIR", None)
import jax
# The axon sitecustomize runs at interpreter start — BEFORE this script
# body — and calls jax.config.update("jax_platforms", "axon,cpu"), which
# overrides the env var set above. Force the platform back to CPU (same
# dance as tests/conftest.py) or the workers silently target the one real
# TPU chip through the tunnel — measuring chip contention, not host
# scaling.
jax.config.update("jax_platforms", "cpu")
if distributed and nproc > 1:
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)
import numpy as np
from rocjpeg_tpu import api
from rocjpeg_tpu.dist import mesh as mesh_lib, multihost, sharding
from rocjpeg_tpu.testing import encoder
from rocjpeg_tpu.types import DecodeParams, OutputFormat

PER_HOST = 8
ITERS = int(os.environ.get("SCALING_ITERS", "8"))
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

# Synchronize start across simultaneous processes (both modes) so the
# measured window is fully contended: wait until a shared wall-clock epoch.
t_start = float(sys.argv[5])
while time.time() < t_start:
    time.sleep(0.005)

t0 = time.perf_counter()
for _ in range(ITERS):
    per_image, pitches, err = md.decode_batched_local(streams, params)
np.asarray(per_image[0][0])
t1 = time.perf_counter()
rate_local = ITERS * PER_HOST / (t1 - t0)

if distributed and nproc > 1:
    imgs, _, secs = multihost.allreduce_metrics(
        ITERS * PER_HOST, 0.0, t1 - t0)
    # Dispatch-overhead probe: a trivial sharded program on the global
    # mesh isolates the multi-controller launch cost the local layout
    # avoids per batch (the decode program has no collectives).
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
        print("RESULT " + str(float(imgs) / float(secs)) + " "
              + str(float(disp) / max(1, nproc)), flush=True)
else:
    print("RESULT " + str(rate_local) + " 0.0", flush=True)
"""


def run(nproc: int, distributed: bool, warm_secs: float = 25.0):
    """Launch nproc simultaneous pinned workers; returns (total images/s,
    dispatch probe seconds). Independent mode sums per-process rates over
    the synchronized window; distributed mode allreduces inside."""
    port = None
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(WORKER)
        path = f.name
    import time
    t_start = time.time() + warm_secs  # cover encode+compile in each proc
    procs = []
    for pid in range(nproc):
        cmd = [sys.executable, path, str(pid), str(nproc), coord,
               "1" if distributed else "0", str(t_start)]
        if os.path.exists("/usr/bin/taskset"):
            cmd = ["taskset", "-c", str(pid % (os.cpu_count() or 1))] + cmd
        procs.append(subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, cwd=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))))
    rates = []
    disp = 0.0
    for p in procs:
        out, err = p.communicate(timeout=1500)
        if p.returncode != 0:
            raise RuntimeError(f"worker failed rc={p.returncode}:\n"
                               f"{(err or '')[-3000:]}")
        for line in (out or "").splitlines():
            if line.startswith("RESULT "):
                parts = line.split()
                rates.append(float(parts[1]))
                disp = max(disp, float(parts[2]))
    os.unlink(path)
    assert rates, "no RESULT line"
    total = rates[0] if distributed else sum(rates)
    return total, disp


def main():
    out_path = "SCALING.json"
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    solo, _ = run(1, distributed=False)
    indep2, _ = run(2, distributed=False)
    dist2, disp = run(2, distributed=True)
    eff_layout = dist2 / indep2
    eff_raw = dist2 / (2 * solo)
    contention = indep2 / (2 * solo)
    result = {
        "metric": "multi-process scaling efficiency (images/s)",
        "images_per_s": {"1_proc_solo": round(solo, 2),
                         "2_proc_independent": round(indep2, 2),
                         "2_proc_distributed": round(dist2, 2)},
        "efficiency_layout": round(eff_layout, 4),
        "efficiency_raw": round(eff_raw, 4),
        "contention_factor": round(contention, 4),
        "dispatch_probe_ms_per_call": round(disp * 1e3, 3),
        "method": "2 pinned single-core processes on one 2-core VM, "
                  "synchronized measurement windows; CONTROL = identical "
                  "simultaneous-but-independent processes (no "
                  "jax.distributed). efficiency_layout = distributed / "
                  "independent isolates the distributed layer's cost from "
                  "shared-silicon contention (contention_factor), which "
                  "does not exist across real pod hosts.",
        "analysis": "Steady state is MeshDecoder.decode_batched_local: "
                    "process-local sub-mesh programs, per-host corpora, "
                    "zero per-batch cross-process communication; only the "
                    "end-of-run metrics allgather is multi-controller. "
                    "The target transfers as efficiency_layout: on a real "
                    "pod each host owns its CPUs, so the independent-"
                    "process rate IS the linear-scaling baseline and the "
                    "distributed run must stay within 10% of it. "
                    "Correctness of the layout (local and "
                    "global_arrays=True) is bit-exact-verified by "
                    "tests/test_multihost.py.",
    }
    print(json.dumps(result, indent=1))
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
