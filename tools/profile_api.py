"""Fine-grained timing inside decode_batched (not part of the suite)."""
import os
import sys
import time

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir", "/tmp/rjt_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from bench import build_corpus  # noqa: E402

n_images, w, h, ri = 16, 3840, 2160, 4
datas = build_corpus(n_images, w, h, ri_mcus=ri)

from rocjpeg_tpu import api, pipeline
from rocjpeg_tpu.ops import device_entropy as de
from rocjpeg_tpu.types import DecodeParams

# Wrap the hot functions with timers.
acc = {}


def wrap(mod, name, key):
    orig = getattr(mod, name)

    def timed(*a, **k):
        t0 = time.perf_counter()
        r = orig(*a, **k)
        acc[key] = acc.get(key, 0.0) + time.perf_counter() - t0
        return r
    setattr(mod, name, timed)


wrap(de, "pack_segments", "pack")
wrap(de, "decode_coefficients_on_device", "wave_dispatch")
wrap(pipeline, "decode_group_device_entropy", "group_total")

streams = [api.JpegStream(d) for d in datas]
params = DecodeParams()
dec = api.Decoder(device_entropy="on", check_errors=False)
out = dec.decode_batched(streams, params)
out[0].channel[0].block_until_ready()
acc.clear()

N = 8
t0 = time.perf_counter()
for _ in range(N):
    out = dec.decode_batched(streams, params)
    out[0].channel[0].block_until_ready()
dt = (time.perf_counter() - t0) / N
for k, v in acc.items():
    print(f"{k}: {v/N*1e3:.1f} ms/batch")
print(f"e2e: {dt*1e3:.1f} ms/batch")
