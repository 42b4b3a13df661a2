"""Current end-to-end stage profile at the bench configuration."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/rjt_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def timeit(f, iters=5):
    jax.block_until_ready(f())
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f()
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    n = int(os.environ.get("PROF_BATCH", "32"))
    w = h = 1024
    from bench import build_corpus
    from rocjpeg_tpu.core.bitstream import JpegStreamParser
    from rocjpeg_tpu.ops import device_entropy as de
    from rocjpeg_tpu.kernels import wave_pallas
    from rocjpeg_tpu import pipeline, api
    from rocjpeg_tpu.types import DecodeParams, OutputFormat

    datas = build_corpus(n, w, h, ri_mcus=4)
    mpix = n * w * h / 1e6

    t_parse = timeit(lambda: [JpegStreamParser().parse(d) for d in datas])
    plist = [JpegStreamParser().parse(d) for d in datas]
    geom = de.GroupGeometry.from_params(plist[0], n)
    tables = de.DeviceScanTables.from_params(plist[0])
    t_pack = timeit(lambda: de.pack_segments(plist, geom.total_blocks))
    packed = de.pack_segments(plist, geom.total_blocks)
    R = packed.n_lanes // 128

    fn = wave_pallas.build_wave_kernel(geom, packed.n_lanes, packed.n_words,
                                       de.max_steps_bound(geom, packed))
    args = (jnp.asarray(packed.words),
            jnp.asarray(packed.img_base.reshape(R, 128)),
            jnp.asarray(packed.mcu_start.reshape(R, 128)),
            jnp.asarray(packed.mcu_count.reshape(R, 128)),
            jnp.asarray(tables.lentab), jnp.asarray(tables.values))
    t_wave = timeit(lambda: fn(*args))
    o = fn(*args)
    out_size = geom.batch * geom.total_blocks * 64
    sc = de._scatter_epilogue(out_size)
    t_scat = timeit(lambda: sc(o[0], o[1]))
    coeffs = sc(o[0], o[1])

    # IDCT + layout program alone
    comps = de.unflatten_coefficients(coeffs, geom, plist[0])
    qy = np.stack([np.ones(64, np.int32) * 16] * n)
    from rocjpeg_tpu.core.zigzag import dezigzag
    qrows = [dezigzag(plist[0].quantiser_tables[0].astype(np.int32))] * n
    qy = np.stack(qrows)
    qc = np.stack([dezigzag(plist[0].quantiser_tables[1].astype(np.int32))] * n)
    dfn = pipeline.compiled_decode(plist[0].chroma_subsampling, w, h,
                                   tuple(comps[0].shape[1:3]),
                                   tuple(comps[1].shape[1:3]),
                                   OutputFormat.NATIVE, None)
    t_idct = timeit(lambda: dfn(comps[0], comps[1], comps[2], qy, qc, qc))

    def e2e():
        out, err, _ = pipeline.decode_group_device_entropy(
            plist, OutputFormat.NATIVE)
        return out[0][0][0]
    t_e2e = timeit(e2e)

    dec = api.Decoder(device_entropy="auto", check_errors=False)
    streams = [api.JpegStream(d) for d in datas]
    params = DecodeParams(OutputFormat.NATIVE)
    t_api = timeit(lambda: dec.decode_batched(streams, params)[0].channel[0])

    print(f"batch {n} = {mpix:.1f} Mpix")
    print(f"parse      : {t_parse:7.1f} ms ({mpix/t_parse*1e3:7.0f} Mpix/s)")
    print(f"pack       : {t_pack:7.1f} ms ({mpix/t_pack*1e3:7.0f} Mpix/s)")
    print(f"wave (pls) : {t_wave:7.1f} ms ({mpix/t_wave*1e3:7.0f} Mpix/s)")
    print(f"scatter    : {t_scat:7.1f} ms ({mpix/t_scat*1e3:7.0f} Mpix/s)")
    print(f"idct+layout: {t_idct:7.1f} ms ({mpix/t_idct*1e3:7.0f} Mpix/s)")
    print(f"e2e group  : {t_e2e:7.1f} ms ({mpix/t_e2e*1e3:7.0f} Mpix/s)")
    print(f"api batched: {t_api:7.1f} ms ({mpix/t_api*1e3:7.0f} Mpix/s)")


if __name__ == "__main__":
    main()
