"""Stage-level profile of the headline bench config (not part of the suite).

Times, per batch: host pack, H2D transfer of the dense stream, expand+wave
(Pallas) dispatch, scatter, transform, and full pipeline steady state.
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir", "/tmp/rjt_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from bench import build_corpus  # noqa: E402

n_images, w, h, ri = 16, 3840, 2160, 4
t0 = time.time()
datas = build_corpus(n_images, w, h, ri_mcus=ri)
print(f"corpus built in {time.time()-t0:.1f}s, avg "
      f"{sum(map(len, datas))/n_images/1024:.0f} KiB", file=sys.stderr)

from rocjpeg_tpu import api
from rocjpeg_tpu.ops import device_entropy as de
from rocjpeg_tpu.types import DecodeParams, OutputFormat

streams = [api.JpegStream(d) for d in datas]
plist = [s.params for s in streams]
p0 = plist[0]
batch = 16
geom = de.GroupGeometry.from_params(p0, batch)
tables = de.DeviceScanTables.from_params(p0)

# --- host pack ---
for _ in range(2):
    packed = de.pack_segments(plist, geom.total_blocks, dense=True)
t0 = time.perf_counter()
N = 8
for _ in range(N):
    packed = de.pack_segments(plist, geom.total_blocks, dense=True)
t_pack = (time.perf_counter() - t0) / N
print(f"pack: {t_pack*1e3:.1f} ms/batch  dense={packed.dense.nbytes/1e6:.1f} MB"
      f"  lanes={packed.n_lanes} words/lane={packed.n_words}")

# --- H2D of dense stream ---
dev = jax.devices()[0]
for _ in range(2):
    jax.device_put(packed.dense, dev).block_until_ready()
t0 = time.perf_counter()
for _ in range(N):
    jax.device_put(packed.dense, dev).block_until_ready()
t_h2d = (time.perf_counter() - t0) / N
print(f"h2d dense: {t_h2d*1e3:.1f} ms/batch "
      f"({packed.dense.nbytes/1e6/t_h2d:.0f} MB/s)")

# --- device stages, inputs pre-staged ---
L = packed.n_lanes
R = L // 128
l2 = lambda a: a.reshape(R, 128)
dense_d = jax.device_put(packed.dense, dev)
woff_d = jax.device_put(l2(packed.word_off), dev)
ib_d = jax.device_put(l2(packed.img_base), dev)
ms_d = jax.device_put(l2(packed.mcu_start), dev)
mc_d = jax.device_put(l2(packed.mcu_count), dev)
lt_d = jax.device_put(tables.lentab, dev)
vv_d = jax.device_put(tables.values, dev)

max_steps = de.max_steps_bound(geom, packed)
print(f"max_steps={max_steps}")
expand = de._expand_words(R, packed.n_words)
# Stage-level timing builds the production Pallas kernel directly — only
# meaningful where the library itself would pick it.
if de.wave_backend() != "pallas":
    raise SystemExit("profile_bench: requires a TPU backend "
                     f"(wave_backend()={de.wave_backend()!r}); the stage "
                     "breakdown times the Pallas kernel the library runs "
                     "on TPU, not the jnp fallback")
from rocjpeg_tpu.kernels import wave_pallas
wave = wave_pallas.build_wave_kernel(geom, L, packed.n_words, max_steps)
out_size = geom.batch * geom.total_blocks * 64
scatter = de._scatter_epilogue(out_size)


def timeit(name, fn, n=8):
    # Blocks only on the final iteration: numbers are steady-state
    # *pipelined* dispatch averages per batch, not single-call latency.
    r = fn()
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, r)
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1e3:.1f} ms/batch")
    return r, dt


words_d, _ = timeit("expand", lambda: expand(dense_d, woff_d))
(wres, t_wave) = timeit("wave", lambda: wave(words_d, ib_d, ms_d, mc_d, lt_d, vv_d))
idx_buf, val_buf, err2 = wres
coeffs, _ = timeit("scatter", lambda: scatter(idx_buf, val_buf))

from rocjpeg_tpu.pipeline import _transform_from_flat
qy = np.stack([np.ones(64, np.int32)] * batch)
tf = _transform_from_flat(geom, p0.chroma_subsampling, w, h,
                          OutputFormat.NATIVE, None)
timeit("transform", lambda: tf(coeffs, qy, qy, qy))

# full chain with pre-staged host arrays (device only)
def full():
    wd = expand(dense_d, woff_d)
    ib, vb, e2 = wave(wd, ib_d, ms_d, mc_d, lt_d, vv_d)
    cf = scatter(ib, vb)
    return tf(cf, qy, qy, qy)

timeit("device-chain", full)

# end-to-end single-thread decode_batched
dec = api.Decoder(device_entropy="on", check_errors=False)
params = DecodeParams()
out = dec.decode_batched(streams, params)
out[0].channel[0].block_until_ready()
t0 = time.perf_counter()
for _ in range(N):
    out = dec.decode_batched(streams, params)
    out[0].channel[0].block_until_ready()
dt = (time.perf_counter() - t0) / N
mpix = n_images * w * h / 1e6
print(f"e2e 1-thread: {dt*1e3:.1f} ms/batch -> {mpix/dt:.0f} Mpix/s")
