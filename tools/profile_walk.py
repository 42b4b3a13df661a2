"""Micro-profile of the host index-walk stages on the mug corpus.

Isolates, warm (LUTs built, buffers reused by realloc each call as in
production): unstuff, index_scan8 (AVX2), index_scan16 (AVX-512),
pack_bits, and the pack_virtual_segments Python bookkeeping — per-image
ms and MB/s of scan bytes, so walk optimization work is attributed
against a measured baseline rather than the e2e residue.

Env: N (copies, default 16), REPS (default 5), VSYMS (default 256).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from rocjpeg_tpu.core.bitstream import JpegStreamParser
from rocjpeg_tpu.runtime import host_decode

N = int(os.environ.get("N", "16"))
REPS = int(os.environ.get("REPS", "5"))
S = int(os.environ.get("VSYMS", "256"))

mug = open("/root/reference/data/images/mug_420.jpg", "rb").read()


def _parse(d):
    ps = JpegStreamParser()
    ps.parse(d)
    return ps.params


params_list = [_parse(mug) for _ in range(N)]
scan_bytes = len(params_list[0].slice_data)
native = host_decode.native_index_module()
print(f"N={N} copies, scan={scan_bytes/1e6:.2f} MB/img, S={S}", file=sys.stderr)


def timeit(name, fn, n_imgs, reps=REPS):
    fn()  # warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    per_img = best / n_imgs * 1e3
    rate = scan_bytes * n_imgs / best / 1e6
    print(f"{name:<28} {best*1e3:8.1f} ms  {per_img:7.2f} ms/img "
          f"{rate:8.0f} MB/s", file=sys.stderr)
    return best


# unstuff alone (native rjt_unstuff via the module-level binding)
from rocjpeg_tpu.runtime import native as nat
scan = bytes(params_list[0].slice_data)
timeit("unstuff x1", lambda: nat.unstuff(scan), 1)

timeit("index_scan8 (8 imgs)", lambda: native.index_scan8(params_list[:8], S), 8)
if getattr(native, "index_scan16_available", lambda: False)():
    timeit("index_scan16 (16 imgs)",
           lambda: native.index_scan16(params_list[:16], S), 16)
if hasattr(native, "index_scan32") and N >= 32 and \
        getattr(native, "index_scan16_available", lambda: False)():
    timeit("index_scan32 (32 imgs)",
           lambda: native.index_scan32(params_list[:32], S), 32)

# pack_virtual_segments end-to-end (includes the scans + pack_bits + numpy)
from rocjpeg_tpu.ops import device_entropy as de
geom = de.GroupGeometry.from_params(params_list[0], N)
tables, bank_of = de.DeviceScanTables.from_params_banked(params_list)
timeit(f"pack_virtual_segments ({N})",
       lambda: de.pack_virtual_segments(params_list, geom.total_blocks, S,
                                        bank_of=bank_of), N)

# pack pool split across 2 cores: two 8-img halves concurrently
import concurrent.futures
pool = concurrent.futures.ThreadPoolExecutor(2)
if N >= 16:
    def both():
        a = pool.submit(native.index_scan8, params_list[:8], S)
        b = pool.submit(native.index_scan8, params_list[8:16], S)
        a.result(), b.result()
    timeit("2x index_scan8 (2 cores)", both, 16)
    if getattr(native, "index_scan16_available", lambda: False)() and N >= 32:
        def both16():
            a = pool.submit(native.index_scan16, params_list[:16], S)
            b = pool.submit(native.index_scan16, params_list[16:32], S)
            a.result(), b.result()
        timeit("2x index_scan16 (2 cores)", both16, 32)
