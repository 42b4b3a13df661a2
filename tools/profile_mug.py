"""Breakdown profile of the mug_420.jpg (DRI=0) decode path.

Times each stage of decode_group_device_entropy separately:
  - index walk (native rjt_index_scan8 over the batch)
  - bit-aligned pack (rjt_pack_bits)
  - H2D + expand + wave kernel + scatter (device, one program chain)
  - transform epilogue (dequant/IDCT/layout)
and the end-to-end decode_batched for reference.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rjt_xla_cache")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/rjt_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from rocjpeg_tpu import api
from rocjpeg_tpu.core.bitstream import JpegStreamParser
from rocjpeg_tpu.ops import device_entropy as de
from rocjpeg_tpu.types import DecodeParams, OutputFormat

N = int(os.environ.get("N", "8"))
ITERS = int(os.environ.get("ITERS", "8"))
VSYMS = int(os.environ.get("ROCJPEG_TPU_VSYMS", "0")) or None

mug = open("/root/reference/data/images/mug_420.jpg", "rb").read()
datas = [mug] * N


def _parse(d):
    ps = JpegStreamParser()
    ps.parse(d)
    return ps.params


params_list = [_parse(d) for d in datas]
p0 = params_list[0]
print(f"scan bytes per image: {len(p0.slice_data)}", file=sys.stderr)

geom0 = de.GroupGeometry.from_params(p0, N)
total_blocks = geom0.total_blocks

from rocjpeg_tpu import pipeline

vk = VSYMS or 256
print(f"virtual_k = {vk}", file=sys.stderr)

tables, bank_of = de.DeviceScanTables.from_params_banked(params_list)

# --- stage timings ---
def t_index():
    from rocjpeg_tpu.runtime import host_decode
    native = host_decode.native_index_module()
    t0 = time.perf_counter()
    out = native.index_scan8(params_list[:8], vk)
    t1 = time.perf_counter()
    return t1 - t0, out

dt, out = t_index()
print(f"index_scan8 (8 imgs, 1 call): {dt*1e3:.1f} ms", file=sys.stderr)
if out is not None:
    clean, bo, dc, mi, sc = out[0]
    print(f"  per-image: clean={len(clean)} bytes, lanes={len(bo)}, "
          f"max syms={sc.max() if sc.size else 0}", file=sys.stderr)

# full pack (index + pack_bits)
for _ in range(2):
    t0 = time.perf_counter()
    packed, dc_flat, lane_of_mcu = de.pack_virtual_segments(
        params_list, total_blocks, vk, bank_of=bank_of)
    t1 = time.perf_counter()
print(f"pack_virtual_segments total: {(t1-t0)*1e3:.1f} ms "
      f"(n_lanes={packed.n_lanes}, n_words={packed.n_words}, "
      f"dense={packed.dense.nbytes/1e6:.1f} MB, "
      f"max_lane_syms={packed.max_lane_syms})", file=sys.stderr)

# device: wave + scatter
batch = pipeline.bucket_batch(N)
coeffs, err, geom = de.decode_coefficients_on_device(
    params_list, tables, packed, batch=batch)
coeffs.block_until_ready()
t0 = time.perf_counter()
for _ in range(ITERS):
    coeffs, err, geom = de.decode_coefficients_on_device(
        params_list, tables, packed, batch=batch)
    coeffs.block_until_ready()
t1 = time.perf_counter()
print(f"wave+scatter (H2D incl): {(t1-t0)/ITERS*1e3:.1f} ms/iter",
      file=sys.stderr)

# device arrays pre-staged: isolates kernel from H2D
dense_dev = jax.device_put(packed.dense)
wo_dev = jax.device_put(packed.word_off)
import dataclasses
packed_dev = dataclasses.replace(packed, dense=dense_dev, word_off=wo_dev)
coeffs, err, geom = de.decode_coefficients_on_device(
    params_list, tables, packed_dev, batch=batch)
coeffs.block_until_ready()
t0 = time.perf_counter()
for _ in range(ITERS):
    coeffs, err, geom = de.decode_coefficients_on_device(
        params_list, tables, packed_dev, batch=batch)
    coeffs.block_until_ready()
t1 = time.perf_counter()
print(f"wave+scatter (pre-staged): {(t1-t0)/ITERS*1e3:.1f} ms/iter",
      file=sys.stderr)

# transform epilogue
from rocjpeg_tpu.core.zigzag import dezigzag
qy_rows = []
for p in params_list:
    qid = p.components[0].quantiser_table_selector
    qy_rows.append(dezigzag(p.quantiser_tables[qid].astype(np.int32)))
qy = np.stack(qy_rows)
qid = p0.components[1].quantiser_table_selector
qu = np.stack([dezigzag(p.quantiser_tables[p.components[1].quantiser_table_selector].astype(np.int32)) for p in params_list])
qv = np.stack([dezigzag(p.quantiser_tables[p.components[2].quantiser_table_selector].astype(np.int32)) for p in params_list])
fn = pipeline._transform_from_flat(geom, p0.chroma_subsampling,
                                   p0.picture_width, p0.picture_height,
                                   OutputFormat.NATIVE, None, True)
outs = fn(coeffs, qy, qu, qv, dc_flat, lane_of_mcu)
jax.block_until_ready(outs)
t0 = time.perf_counter()
for _ in range(ITERS):
    outs = fn(coeffs, qy, qu, qv, dc_flat, lane_of_mcu)
    jax.block_until_ready(outs)
t1 = time.perf_counter()
print(f"transform epilogue: {(t1-t0)/ITERS*1e3:.1f} ms/iter", file=sys.stderr)

# end-to-end
decoder = api.Decoder(device_entropy="on", check_errors=False)
streams = [api.JpegStream(d) for d in datas]
dp = DecodeParams(output_format=OutputFormat.NATIVE)
imgs = decoder.decode_batched(streams, dp)
jax.block_until_ready([c for img in imgs for c in img.channel if c is not None])
t0 = time.perf_counter()
for _ in range(ITERS):
    imgs = decoder.decode_batched(streams, dp)
    jax.block_until_ready([c for img in imgs for c in img.channel if c is not None])
t1 = time.perf_counter()
e2e = (t1 - t0) / ITERS
mpix = N * 3840 * 2160 / 1e6
print(f"e2e decode_batched: {e2e*1e3:.1f} ms/iter -> {mpix/e2e:.0f} Mpix/s",
      file=sys.stderr)
