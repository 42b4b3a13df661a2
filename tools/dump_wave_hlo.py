"""Dump optimized HLO + buffer stats for the wave decoder to diagnose
fusion/spill behavior inside the while body."""
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/rjt_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def main():
    from bench import build_corpus
    from rocjpeg_tpu.core.bitstream import JpegStreamParser
    from rocjpeg_tpu.ops import device_entropy as de

    datas = build_corpus(2, 1024, 1024, ri_mcus=4)
    params_list = [JpegStreamParser().parse(d) for d in datas]
    packed = de.pack_segments(params_list)
    tables = de.DeviceScanTables.from_params(params_list[0])
    geom = de.GroupGeometry.from_params(params_list[0], len(params_list))
    L, n_words = packed.words.shape
    args = (jnp.asarray(packed.words), jnp.asarray(packed.img_idx),
            jnp.asarray(packed.mcu_start), jnp.asarray(packed.mcu_count),
            jnp.asarray(tables.mincode), jnp.asarray(tables.maxcode),
            jnp.asarray(tables.valptr), jnp.asarray(tables.values))
    max_steps = 768
    fn = de._compiled_wave_decoder(geom, L, n_words, max_steps)
    compiled = fn.lower(*args).compile()
    txt = compiled.as_text()
    with open("/tmp/wave_hlo.txt", "w") as f:
        f.write(txt)
    mem = compiled.memory_analysis()
    print("L =", L, "n_words =", n_words)
    print("memory:", mem)
    # Find the while body and list fusions with their output shapes.
    fusions = re.findall(r"(\S+) = (\S+) fusion\(", txt)
    print(f"{len(fusions)} fusions total")
    # Large tensors appearing as fusion outputs:
    big = []
    for m in re.finditer(r"= ((?:[a-z0-9]+\[[0-9,]+\][^ ]*|\((?:[^()]|\([^()]*\))*\))) fusion\(", txt):
        shapes = re.findall(r"[a-z]+[0-9]+\[([0-9,]+)\]", m.group(1))
        for s in shapes:
            dims = [int(x) for x in s.split(",") if x]
            n = int(np.prod(dims)) if dims else 1
            if n >= (1 << 21):
                big.append((n, m.group(1)[:120]))
    big.sort(reverse=True)
    print("largest fusion outputs:")
    seen = set()
    for n, desc in big[:20]:
        if desc in seen:
            continue
        seen.add(desc)
        print(f"  {n/1e6:8.1f}M  {desc}")


if __name__ == "__main__":
    main()
