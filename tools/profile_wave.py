"""Stage-by-stage profile of the device-entropy decode path on the real chip.

Times, per batch: host parse, host pack, H2D, wave while-loop (no scatter),
wave incl. scatter, coefficient->output pipeline. Run from repo root:
    python tools/profile_wave.py
Env: PROF_BATCH, PROF_W, PROF_H, PROF_RI (MCUs per restart segment).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/rjt_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def timeit(fn, iters=5, warmup=1):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    if out is not None:
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    n_images = int(os.environ.get("PROF_BATCH", "16"))
    w = int(os.environ.get("PROF_W", "1024"))
    h = int(os.environ.get("PROF_H", "1024"))
    ri = int(os.environ.get("PROF_RI", "4"))

    from bench import build_corpus
    from rocjpeg_tpu.core.bitstream import JpegStreamParser

    def parse_stream(d):
        return JpegStreamParser().parse(d)
    from rocjpeg_tpu.ops import device_entropy as de
    from rocjpeg_tpu import pipeline
    from rocjpeg_tpu.types import OutputFormat

    t0 = time.time()
    datas = build_corpus(n_images, w, h, ri_mcus=ri)
    print(f"corpus built in {time.time()-t0:.1f}s; "
          f"avg {sum(map(len, datas))/n_images/1024:.0f} KiB", file=sys.stderr)
    mpix = n_images * w * h / 1e6

    # --- host parse ---
    t_parse = timeit(lambda: [parse_stream(d) for d in datas], iters=3)
    params_list = [parse_stream(d) for d in datas]

    # --- host pack ---
    t_pack = timeit(lambda: de.pack_segments(params_list), iters=3)
    packed = de.pack_segments(params_list)
    tables = de.DeviceScanTables.from_params(params_list[0])
    L, n_words = packed.words.shape
    print(f"segments: L={L} n_words={n_words} "
          f"({packed.words.nbytes/1e6:.1f} MB padded, "
          f"{packed.total_bytes/1e6:.1f} MB payload)", file=sys.stderr)

    # --- H2D ---
    def h2d():
        return jax.device_put(packed.words).block_until_ready()
    t_h2d = timeit(h2d, iters=3)

    # --- wave decode (full: loop + scatter) ---
    geom = de.GroupGeometry.from_params(params_list[0], n_images)

    def wave_full():
        coeffs, err, _ = de.decode_coefficients_on_device(
            params_list, tables, packed)
        return coeffs.block_until_ready()
    t_wave = timeit(wave_full, iters=3)

    # count total symbols for reference (host decode)
    nslots = len(geom.comp_of_slot)
    est = int(packed.mcu_count.max()) * nslots * 20 + 64
    hard = min(int(packed.mcu_count.max()) * nslots * 65, n_words * 32)
    max_steps = min(-(-min(est, hard) // 256) * 256, hard)
    print(f"geom: slots={nslots} total_blocks={geom.total_blocks} "
          f"max_steps={max_steps}", file=sys.stderr)

    # --- wave loop only (reuse compiled internals, skip final scatter) ---
    # Rebuild the decoder but return the raw buffers instead of scattering.
    import functools
    fn_full = de._compiled_wave_decoder(geom, L, n_words, max_steps)
    args = (jnp.asarray(packed.words), jnp.asarray(packed.img_idx),
            jnp.asarray(packed.mcu_start), jnp.asarray(packed.mcu_count),
            jnp.asarray(tables.mincode), jnp.asarray(tables.maxcode),
            jnp.asarray(tables.valptr), jnp.asarray(tables.values))

    t_wave_jit = timeit(lambda: jax.block_until_ready(fn_full(*args)), iters=3)

    # --- pipeline (coeffs -> NATIVE output) ---
    coeffs, err, _ = de.decode_coefficients_on_device(params_list, tables, packed)
    jax.block_until_ready(coeffs)

    def post():
        comps = de.unflatten_coefficients(coeffs, geom, params_list[0])
        return comps[0].block_until_ready()

    def full_pipeline():
        out = pipeline.decode_group_device_entropy(
            params_list, OutputFormat.NATIVE)
        return out[0][0][0].block_until_ready()
    t_e2e = timeit(full_pipeline, iters=3)

    print(f"\n=== per batch of {mpix:.1f} Mpix ===")
    print(f"host parse      : {t_parse*1e3:8.1f} ms  ({mpix/t_parse:7.1f} Mpix/s)")
    print(f"host pack       : {t_pack*1e3:8.1f} ms  ({mpix/t_pack:7.1f} Mpix/s)")
    print(f"H2D words       : {t_h2d*1e3:8.1f} ms  ({packed.words.nbytes/t_h2d/1e6:7.1f} MB/s)")
    print(f"wave (jit call) : {t_wave_jit*1e3:8.1f} ms  ({mpix/t_wave_jit:7.1f} Mpix/s)")
    print(f"wave (wrapper)  : {t_wave*1e3:8.1f} ms  ({mpix/t_wave:7.1f} Mpix/s)")
    print(f"e2e decode_group: {t_e2e*1e3:8.1f} ms  ({mpix/t_e2e:7.1f} Mpix/s)")


if __name__ == "__main__":
    main()
