"""Scatter-drop vs padded in-bounds scatter vs dezigzag gather, on TPU."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/rjt_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
from rocjpeg_tpu.ops.device_entropy import INV_ZIGZAG

MAXS, R, LANE = 1280, 128, 128
OUT = 16 * 24576 * 64


def timeit(f, *a):
    jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(3):
        o = f(*a)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / 3 * 1e3


def main():
    rng = np.random.default_rng(0)
    idx = np.full((MAXS, R, LANE), OUT, np.int32)
    mask = rng.random((MAXS, R, LANE)) < 0.25
    idx[mask] = rng.integers(0, OUT, int(mask.sum()))
    val = rng.integers(-255, 255, (MAXS, R, LANE)).astype(np.int16)
    didx, dval = jax.device_put(idx), jax.device_put(val)
    inv = jnp.asarray(INV_ZIGZAG)

    @jax.jit
    def scat_drop(i, v):
        out = jnp.zeros(OUT, jnp.int16)
        return out.at[i.reshape(-1)].set(v.reshape(-1), mode="drop")

    t = timeit(scat_drop, didx, dval)
    print(f"scatter drop      : {t:8.1f} ms", flush=True)

    @jax.jit
    def scat_pad(i, v):
        out = jnp.zeros(OUT + 64, jnp.int16)
        out = out.at[i.reshape(-1)].set(v.reshape(-1),
                                        mode="promise_in_bounds")
        return out[:OUT]

    t = timeit(scat_pad, didx, dval)
    print(f"scatter pad/inb   : {t:8.1f} ms", flush=True)

    @jax.jit
    def dezig(c):
        return c.reshape(-1, 64)[:, inv].reshape(-1)

    c = scat_pad(didx, dval)
    t = timeit(dezig, c)
    print(f"dezigzag gather   : {t:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
