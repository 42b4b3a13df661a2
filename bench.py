"""Benchmark: batched 4:2:0 JPEG decode throughput on one chip.

Measures the end-to-end decode path (host entropy front-end + H2D +
device dequant/IDCT/layout) over a synthesized photo-like 4:2:0 corpus
with per-MCU-row restart intervals, the headline configuration from
BASELINE.json ("jpegDecodeBatched: batch-sharded on one host";
target >= 2 Gpixel/s per chip, vs_baseline = value / 2000 Mpix/s).

Prints ONE JSON line on stdout; diagnostics go to stderr.
"""

import json
import os
import sys
import time

import numpy as np


def _smooth_plane(rng, h, w, detail=8):
    """Photo-like content: low-frequency base + mild noise (keeps the
    entropy-coded symbol rate realistic, unlike white noise)."""
    base = rng.integers(0, 256, (h // detail + 1, w // detail + 1)).astype(np.float32)
    up = np.kron(base, np.ones((detail, detail), np.float32))[:h, :w]
    noise = rng.normal(0, 6, (h, w)).astype(np.float32)
    return np.clip(up + noise, 0, 255).astype(np.uint8)


def build_corpus(n_images, w, h, seed=0, ri_mcus=None):
    from rocjpeg_tpu.testing import encoder
    rng = np.random.default_rng(seed)
    datas = []
    if ri_mcus is None:
        ri_mcus = (w + 15) // 16  # one MCU row per restart segment
    for i in range(n_images):
        planes = [_smooth_plane(rng, h, w),
                  _smooth_plane(rng, h // 2, w // 2),
                  _smooth_plane(rng, h // 2, w // 2)]
        datas.append(encoder.encode_planes(planes, "420",
                                           restart_interval=ri_mcus))
    return datas


def main():
    # Headline config: batches of 4K (3840x2160) images — the resolution of
    # the reference's bundled corpus (data/images/mug_*.jpg).
    n_images = int(os.environ.get("BENCH_BATCH", "16"))
    w = int(os.environ.get("BENCH_W", "3840"))
    h = int(os.environ.get("BENCH_H", "2160"))
    iters = int(os.environ.get("BENCH_ITERS", "16"))
    fmt_name = os.environ.get("BENCH_FMT", "native")
    ri_mcus = int(os.environ.get("BENCH_RI_MCUS", "4"))
    entropy_mode = os.environ.get("BENCH_ENTROPY", "auto")
    # Host threads submitting batches concurrently (the jpegDecodePerf
    # model, samples/jpegDecodePerf/jpegdecodeperf.cpp:228-258). Default 2:
    # the second thread overlaps one batch's host pack with the other's
    # H2D + dispatch; the Decoder's shared in-flight throttle (max 2) keeps
    # the device queue shallow (>= ~3 concurrent wave-kernel instances can
    # stall the runtime's scheduler on this platform — measured: threads=2
    # beats both 1 and 3).
    n_threads = int(os.environ.get("BENCH_THREADS", "2"))

    # Persistent XLA compile cache: the wave decoder is a large program
    # (~2-3 min cold compile on the tunneled chip); warm runs start instantly.
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/rjt_xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    t0 = time.time()
    datas = build_corpus(n_images, w, h, ri_mcus=ri_mcus)
    print(f"corpus: {n_images} x {w}x{h} 4:2:0, "
          f"avg {sum(map(len, datas))/n_images/1024:.0f} KiB, "
          f"built in {time.time()-t0:.1f}s", file=sys.stderr)

    from rocjpeg_tpu import api
    from rocjpeg_tpu.runtime import host_decode
    from rocjpeg_tpu.tools.common import FMT_NAMES
    from rocjpeg_tpu.types import DecodeParams

    params = DecodeParams(output_format=FMT_NAMES[fmt_name])
    # check_errors=False: no host<->device sync inside the decode loop; the
    # error flags stay on device and are verified once after timing.
    decoder = api.Decoder(device_entropy=entropy_mode, check_errors=False)
    streams = [api.JpegStream(d) for d in datas]
    print(f"host entropy backend: {host_decode.backend_name()}; "
          f"device_entropy={entropy_mode}; ri={ri_mcus} MCUs", file=sys.stderr)

    # Warmup (jit compile + caches).
    imgs = decoder.decode_batched(streams, params)
    for img in imgs:
        for ch in img.channel:
            if ch is not None and hasattr(ch, "block_until_ready"):
                ch.block_until_ready()
    print("warmup done", file=sys.stderr)

    mpix_per_batch = n_images * w * h / 1e6
    lasts = [None] * max(1, n_threads)

    def worker(tid, count):
        # Depth-2 pipeline: dispatch batch i, then block on batch i-1 —
        # at most two batches in flight, overlapping host work of the
        # current batch with device compute of the previous one.
        import collections
        inflight = collections.deque()
        out = None
        for _ in range(count):
            out = decoder.decode_batched(streams, params)
            inflight.append(out)
            if len(inflight) > 1:
                old = inflight.popleft()
                old[0].channel[0].block_until_ready()
        lasts[tid] = out

    t0 = time.perf_counter()
    if n_threads <= 1:
        worker(0, iters)
    else:
        import threading
        per = [iters // n_threads + (1 if t < iters % n_threads else 0)
               for t in range(n_threads)]
        ts = [threading.Thread(target=worker, args=(t, per[t]))
              for t in range(n_threads)]
        for th in ts:
            th.start()
        for th in ts:
            th.join()
    for last in lasts:
        for img in last or []:
            for ch in img.channel:
                if ch is not None and hasattr(ch, "block_until_ready"):
                    ch.block_until_ready()
    t1 = time.perf_counter()

    for e in decoder.last_error_flags:
        assert not bool(np.asarray(e).any()), "decode error flagged in bench"

    elapsed = t1 - t0
    mpix_s = iters * mpix_per_batch / elapsed
    images_s = iters * n_images / elapsed
    print(f"{iters} iters x {n_images} images in {elapsed:.2f}s "
          f"({images_s:.1f} img/s)", file=sys.stderr)
    print(json.dumps({
        "metric": "Mpixels/sec/chip batched 4:2:0 decode",
        "value": round(mpix_s, 1),
        "unit": "Mpixel/s",
        "vs_baseline": round(mpix_s / 2000.0, 4),
    }))


if __name__ == "__main__":
    main()
