"""Isolate: XLA TPU scatter cost vs wave loop cost, and 1D vs 2D lane layout.

Times, on the real chip:
  1. the final coefficient scatter alone (idx/val buffers -> flat tensor)
  2. a stripped wave loop (no emission buffers, no scatter)
  3. the same stripped loop with 2D (R,128) lane layout
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


def timeit(fn, iters=3, warmup=1):
    for _ in range(warmup):
        jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


MAXS, L = 768, 16384
OUT = 16 * 24576 * 64


def main():
    rng = np.random.default_rng(0)
    idx = rng.integers(0, OUT, (MAXS, L)).astype(np.int32)
    val = rng.integers(-255, 255, (MAXS, L)).astype(np.int16)
    didx = jax.device_put(idx)
    dval = jax.device_put(val)

    @jax.jit
    def scat(i, v):
        out = jnp.zeros(OUT, jnp.int16)
        return out.at[i.reshape(-1)].set(v.reshape(-1), mode="drop")

    t = timeit(lambda: scat(didx, dval))
    print(f"scatter {MAXS*L/1e6:.1f}M pairs -> {OUT/1e6:.1f}M flat: {t*1e3:.1f} ms")

    # DUS-append emission cost in isolation: loop that only appends rows.
    @jax.jit
    def dus_loop(v):
        def step(state):
            buf, n = state
            buf = jax.lax.dynamic_update_slice(buf, v[:1], (n, 0))
            return buf, n + 1

        buf = jnp.zeros((MAXS, L), jnp.int16)
        buf, n = jax.lax.while_loop(lambda s: s[1] < MAXS, step, (buf, jnp.int32(0)))
        return buf

    t = timeit(lambda: dus_loop(dval))
    print(f"DUS-append loop {MAXS} iters on ({MAXS},{L}) buf: {t*1e3:.1f} ms "
          f"({t/MAXS*1e6:.2f} us/iter)")

    # Minimal while_loop step cost: elementwise state updates only, 1D vs 2D.
    def mk_loop(shape, iters):
        @jax.jit
        def f(x):
            def step(s):
                a, b, n = s
                a = a + b
                b = b ^ (a >> 3)
                a = jnp.where(b > 0, a * 3, a)
                return a, b, n + 1
            a, b, n = jax.lax.while_loop(
                lambda s: s[2] < iters, step,
                (x, x + 1, jnp.int32(0)))
            return a + b
        return f

    x1 = jax.device_put(rng.integers(0, 1 << 20, (L,)).astype(np.int32))
    x2 = jax.device_put(rng.integers(0, 1 << 20, (L // 128, 128)).astype(np.int32))
    f1 = mk_loop((L,), 768)
    f2 = mk_loop((L // 128, 128), 768)
    t1 = timeit(lambda: f1(x1))
    t2 = timeit(lambda: f2(x2))
    print(f"768-iter minimal loop, 1D ({L},): {t1*1e3:.2f} ms ({t1/768*1e6:.2f} us/iter)")
    print(f"768-iter minimal loop, 2D ({L//128},128): {t2*1e3:.2f} ms ({t2/768*1e6:.2f} us/iter)")

    # One-hot table select cost at realistic widths, 1D vs 2D lanes.
    for shape, tag in (((L,), "1D"), ((L // 128, 128), "2D")):
        lanes = jax.device_put(rng.integers(0, 348, shape).astype(np.int32))
        table = jnp.asarray(rng.integers(0, 255, 348).astype(np.int32))

        @jax.jit
        def onehot_sum(ix, tb, iters=64):
            def step(s):
                acc, n = s
                oh = (jnp.arange(348, dtype=jnp.int32) ==
                      (ix + n)[..., None] % 348)
                acc = acc + jnp.sum(jnp.where(oh, tb, 0), axis=-1)
                return acc, n + 1
            acc, _ = jax.lax.while_loop(lambda s: s[1] < iters, step,
                                        (jnp.zeros_like(ix), jnp.int32(0)))
            return acc

        t = timeit(lambda: onehot_sum(lanes, table))
        print(f"64x one-hot-348 select {tag} {shape}: {t*1e3:.2f} ms "
              f"({t/64*1e6:.2f} us/select)")


if __name__ == "__main__":
    main()
