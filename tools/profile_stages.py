"""Stage-attributed cost model for the two hot bench legs (VERDICT r04 #2).

Measures, at steady state on the real chip, every stage of the decode
pipeline for:
  - HEADLINE: synthetic 4K 4:2:0, restart interval 4 MCUs (restart path)
  - MUG:      /root/reference/data/images/mug_420.jpg x BATCH (DRI=0,
              virtual-restart path — the host index walk serves the wave)

and derives the implied ceiling of each stage (the leg throughput if that
stage were the only bound), the host-CPU account in core-ms/image, and the
N-core walk model for the mug leg. This replaces guessing with a measured
roofline: the reference's analog is the per-arch capability table it
compiles in (rocjpeg_vaapi_decoder.cpp:294-305).

Writes JSON to ROOFLINE_r05.json (env ROOFLINE_OUT) and a table to stderr.
Reps: median of PROF_REPS (default 3) per stage. Each leg runs in its own
subprocess (PROF_LEG) — the tunneled runtime degrades after multiple jitted
working sets in one process (see bench.py run_leg_subprocess), so stage
timings must not share a process across legs. End-to-end throughput is NOT
measured here: bench.py's fresh-process legs are the e2e system of record;
this tool attributes the cost WITHIN an iteration.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rjt_xla_cache")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from rocjpeg_tpu import api, pipeline
from rocjpeg_tpu.ops import device_entropy as de
from rocjpeg_tpu.runtime import host_decode
from rocjpeg_tpu.types import DecodeParams, OutputFormat

REPS = int(os.environ.get("PROF_REPS", "3"))
BATCH = int(os.environ.get("PROF_BATCH", "32"))
N_CORES = os.cpu_count() or 1
OUT = os.environ.get("ROOFLINE_OUT", "ROOFLINE_r05.json")


def med(fn, reps=REPS, warm=1):
    for _ in range(warm):
        fn()
    vals = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        vals.append(time.perf_counter() - t0)
    return float(np.median(vals))


def leg_mug():
    """Per-stage costs for the mug (DRI=0, virtual-restart) leg."""
    data = open("/root/reference/data/images/mug_420.jpg", "rb").read()
    B = BATCH
    mpix = B * 3840 * 2160 / 1e6
    S = int(os.environ.get("ROCJPEG_TPU_VSYMS", "768"))
    native = host_decode.native_index_module()
    stages = {}

    # parse (header-only; the handle model parses once per stream)
    stages["parse"] = {"ms": med(lambda: [api.JpegStream(data)
                                          for _ in range(B)]) * 1e3,
                       "host_cores": 1}

    plist = [api.JpegStream(data).params for _ in range(B)]
    geom = de.GroupGeometry.from_params(plist[0], B)
    tables, bank_of = de.DeviceScanTables.from_params_banked(plist)

    # index walk (unstuff fused inside; scan32 = dual 16-lane groups on ONE
    # core when AVX-512 + batch >= 32). Pooled buffers, as the shipping
    # path uses: fresh 75 MB record buffers per rep pay the TPU-process
    # fault tax (~15 us/page) and would overstate the walk by ~15%.
    from rocjpeg_tpu.runtime import native as nat
    caps = [nat.index_job_capacities(p, S) for p in plist]
    _tok, bufs = de._IDX_BUF_POOL.acquire(
        B, max(c[0] for c in caps), max(c[1] for c in caps))
    if B >= 32 and getattr(native, "index_scan16_available", lambda: 0)():
        walk = med(lambda: [native.index_scan32(plist[i:i + 32], S,
                                                bufs[i:i + 32])
                            for i in range(0, B, 32)])
    else:
        walk = med(lambda: native.index_scan8(plist[:8], S, bufs[:8])) \
            * (B / 8)
    stages["unstuff+walk"] = {"ms": walk * 1e3, "host_cores": 1}

    # full host pack (walk + pack_bits + numpy bookkeeping), single caller
    pack = med(lambda: de.pack_virtual_segments(
        plist, geom.total_blocks, S, bank_of=bank_of))
    stages["pack_total"] = {"ms": pack * 1e3, "host_cores": 1}
    stages["pack_bits+bookkeep"] = {"ms": (pack - walk) * 1e3,
                                    "host_cores": 1}

    packed, dc_flat, lane_of_mcu = de.pack_virtual_segments(
        plist, geom.total_blocks, S, bank_of=bank_of)

    # H2D: the dense stream + aux lane arrays (tunnel transfer, host-CPU
    # consuming on this platform)
    h2d_bytes = (packed.dense.nbytes + packed.word_off.nbytes
                 + packed.img_base.nbytes + packed.mcu_start.nbytes
                 + packed.mcu_count.nbytes + dc_flat.nbytes
                 + lane_of_mcu.nbytes)

    # The shipping path bundles ALL of these into ONE transfer
    # (de.stage_small_args; the tunnel charges ~30 ms latency per
    # transfer, so 7 separate puts used to cost more than the bytes).
    def do_h2d():
        staged = de.stage_small_args([
            ("dense", packed.dense), ("word_off", packed.word_off),
            ("img_base", packed.img_base), ("mcu_start", packed.mcu_start),
            ("mcu_count", packed.mcu_count), ("dc_flat", dc_flat),
            ("lane_of_mcu", lane_of_mcu)])
        jax.block_until_ready(tuple(staged.values()))

    stages["h2d"] = {"ms": med(do_h2d) * 1e3, "bytes": h2d_bytes,
                     "host_cores": 1, "note": "one bundled transfer"}

    # device: expand + wave + scatter with PRE-STAGED inputs (pure device)
    import dataclasses
    dense_dev = jax.device_put(packed.dense)
    wo_dev = jax.device_put(packed.word_off)
    packed_dev = dataclasses.replace(packed, dense=dense_dev,
                                     word_off=wo_dev)

    def do_wave():
        c, e, g = de.decode_coefficients_on_device(plist, tables,
                                                   packed_dev, batch=B)
        c.block_until_ready()

    stages["wave+scatter"] = {"ms": med(do_wave) * 1e3, "host_cores": 0}

    # transform epilogue (dequant + IDCT + plane layout)
    coeffs, err, geom2 = de.decode_coefficients_on_device(
        plist, tables, packed_dev, batch=B)
    from rocjpeg_tpu.core.zigzag import dezigzag
    qs = []
    for c in range(3):
        qs.append(np.stack([
            dezigzag(p.quantiser_tables[
                p.components[c].quantiser_table_selector].astype(np.int32))
            for p in plist]))
    fn = pipeline._transform_from_flat(
        geom2, plist[0].chroma_subsampling, plist[0].picture_width,
        plist[0].picture_height, OutputFormat.NATIVE, None, True)

    def do_transform():
        outs = fn(coeffs, qs[0], qs[1], qs[2], dc_flat, lane_of_mcu)
        jax.block_until_ready(outs)

    stages["transform"] = {"ms": med(do_transform) * 1e3, "host_cores": 0}

    # DEVICE-LIMIT run: pack once, decode repeatedly from staged inputs —
    # the N->infinity-walk-cores limit of this leg on this chip.
    def do_device_limit():
        c, e, g = de.decode_coefficients_on_device(plist, tables,
                                                   packed_dev, batch=B)
        outs = fn(c, qs[0], qs[1], qs[2], dc_flat, lane_of_mcu)
        jax.block_until_ready(outs)

    stages["device_limit"] = {"ms": med(do_device_limit) * 1e3,
                              "host_cores": 0}
    return {"batch": B, "mpix_per_iter": mpix, "vsyms": S,
            "scan_bytes": len(plist[0].slice_data), "stages": stages}


def leg_headline():
    """Per-stage costs for the headline (restart-interval) leg."""
    from bench import build_corpus
    B = 16
    datas = build_corpus(B, 3840, 2160, ri_mcus=4)
    mpix = B * 3840 * 2160 / 1e6
    stages = {}
    stages["parse"] = {"ms": med(lambda: [api.JpegStream(d)
                                          for d in datas]) * 1e3,
                       "host_cores": 1}
    plist = [api.JpegStream(d).params for d in datas]
    geom = de.GroupGeometry.from_params(plist[0], B)
    tables = de.DeviceScanTables.from_params(plist[0])

    pack = med(lambda: de.pack_segments(plist, geom.total_blocks,
                                        dense=True))
    stages["pack_total"] = {"ms": pack * 1e3, "host_cores": N_CORES}
    packed = de.pack_segments(plist, geom.total_blocks, dense=True)

    def do_h2d():
        staged = de.stage_small_args([
            ("dense", packed.dense), ("word_off", packed.word_off)])
        jax.block_until_ready(tuple(staged.values()))

    stages["h2d"] = {"ms": med(do_h2d) * 1e3,
                     "bytes": packed.dense.nbytes + packed.word_off.nbytes,
                     "host_cores": 1, "note": "one bundled transfer"}

    import dataclasses
    packed_dev = dataclasses.replace(packed,
                                     dense=jax.device_put(packed.dense),
                                     word_off=jax.device_put(packed.word_off))

    def do_wave():
        c, e, g = de.decode_coefficients_on_device(plist, tables,
                                                   packed_dev, batch=B)
        c.block_until_ready()

    stages["wave+scatter"] = {"ms": med(do_wave) * 1e3, "host_cores": 0}

    return {"batch": B, "mpix_per_iter": mpix, "stages": stages}


def report(name, leg):
    mpix = leg["mpix_per_iter"]
    print(f"\n== {name} (batch {leg['batch']}, {mpix:.0f} Mpix/iter) ==",
          file=sys.stderr)
    print(f"{'stage':<22}{'ms/iter':>9}{'ms/img':>8}{'ceiling Mpix/s':>16}",
          file=sys.stderr)
    for st, d in leg["stages"].items():
        ms = d["ms"]
        ceil = mpix / (ms / 1e3) if ms > 0 else float("inf")
        d["ceiling_mpix_s"] = round(ceil, 1)
        print(f"{st:<22}{ms:>9.1f}{ms / leg['batch']:>8.2f}{ceil:>16.0f}",
              file=sys.stderr)


def run_leg_subprocess(leg):
    import subprocess
    env = dict(os.environ)
    env["PROF_LEG"] = leg
    r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                       env=env, capture_output=True, text=True, timeout=1800)
    sys.stderr.write(r.stderr)
    for line in r.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"leg {leg} produced no result (exit {r.returncode})")


def main():
    leg = os.environ.get("PROF_LEG")
    if leg == "mug":
        m = leg_mug(); report("MUG (DRI=0 virtual path)", m)
        print(json.dumps(m)); return
    if leg == "headline":
        h = leg_headline(); report("HEADLINE (restart path)", h)
        print(json.dumps(h)); return

    out = {"host_cores": N_CORES,
           "cpu": open("/proc/cpuinfo").read().split("model name")[1]
           .split("\n")[0].split(":")[1].strip()}
    mug = run_leg_subprocess("mug")
    # N-core walk model: cores needed for the host side to feed the
    # device-limit rate (walk parallelizes across images; bookkeeping and
    # H2D partially — count them against the budget too).
    st = mug["stages"]
    # Steady-state host CPU per image (parse excluded: the handle model
    # parses once per stream, outside the decode loop — bench.py lifecycle,
    # mirroring the reference's stream-handle reuse). The walk dominates
    # and is per-image independent, so it scales linearly with host cores;
    # pack/bookkeeping and the tunnel H2D ride the same budget.
    host_core_ms_img = (st["pack_total"]["ms"] + st["h2d"]["ms"]
                        ) / mug["batch"]
    dev_ms_img = (st["device_limit"]["ms"]) / mug["batch"]
    mpix_img = mug["mpix_per_iter"] / mug["batch"]
    need_rate = 2000.0 / mpix_img          # img/s for the 2 Gpix/s target
    cores_needed = need_rate * host_core_ms_img / 1e3
    mug["model"] = {
        "host_core_ms_per_img": round(host_core_ms_img, 2),
        "device_ms_per_img": round(dev_ms_img, 2),
        "device_limit_mpix_s": st["device_limit"]["ceiling_mpix_s"],
        "host_cores_for_2000": round(cores_needed, 1),
        "host_bound_ceiling_this_vm": round(
            N_CORES / host_core_ms_img * 1e3 * mpix_img, 1),
        "note": "parse excluded (once per stream handle, not per decode); "
                "ceilings assume perfect host/device overlap",
    }
    print(f"\nmug model: host {host_core_ms_img:.2f} core-ms/img, device "
          f"{dev_ms_img:.2f} ms/img -> device-limit "
          f"{st['device_limit']['ceiling_mpix_s']:.0f} Mpix/s; "
          f"{cores_needed:.1f} host cores would feed 2000 Mpix/s "
          f"(this VM: {N_CORES} cores -> ceiling "
          f"{mug['model']['host_bound_ceiling_this_vm']:.0f})",
          file=sys.stderr)

    headline = run_leg_subprocess("headline")
    out["mug"] = mug
    out["headline"] = headline
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(f"\nwrote {OUT}", file=sys.stderr)
    print(json.dumps({"roofline": OUT}))


if __name__ == "__main__":
    main()
