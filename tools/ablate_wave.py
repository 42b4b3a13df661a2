"""Ablate the wave step to locate per-step cost on the real chip.

Builds variants of the decode step with pieces replaced by constants, all
with identical state/shapes and a fixed iteration count, and times each.
Pieces: refill, lendec (length decode), symfetch, geom (block index math),
emit (DUS buffers). Run: python tools/ablate_wave.py
"""
import os
import sys
import time
import functools

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/rjt_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

R, LANE = 128, 128           # 16384 lanes
N_WORDS = 64
N_SLABS = N_WORDS // 8
STEPS = 256
NSLOTS, NCOMP = 6, 3
OUT_SIZE = 16 * 24576 * 64
VAL_WORDS = 89
VAL_TOTAL = 356
VAL_OFFS = (0, 16, 32, 194)


def mid(arr, dtype=jnp.int32):
    return jnp.asarray(arr, dtype).reshape(1, -1, 1)


def build(flags):
    refill_on = "refill" in flags
    lendec_on = "lendec" in flags
    sym_on = "symfetch" in flags
    geom_on = "geom" in flags
    emit_on = "emit" in flags

    slot_iota = mid(np.arange(NSLOTS))
    len_iota = mid(np.arange(16))
    word8_iota = mid(np.arange(8))
    slab_iota = mid(np.arange(N_SLABS))
    vword_iota = mid(np.arange(VAL_WORDS))
    tslot_iota = mid(np.arange(4))
    lengths16 = mid(np.arange(1, 17), jnp.uint32)
    val_offs_t = mid(VAL_OFFS)
    flat_off_t = mid(np.arange(NSLOTS))
    row_step_t = mid(np.arange(NSLOTS) + 2)
    col_step_t = mid(np.arange(NSLOTS) + 1)
    dc_slot_t = mid([0, 0, 0, 0, 1, 1])
    ac_slot_t = mid([2, 2, 2, 2, 3, 3])
    comp_slots = [[0, 1, 2, 3], [4], [5]]

    def decoder(words, lentab, values):
        words4 = words.reshape(R, N_SLABS, 8, LANE)
        lentabu = lentab.astype(jnp.uint32)
        values32 = values.astype(jnp.int32)
        mcus_w = jnp.int32(64)

        def e(x):
            return x[:, None, :]

        def step(state):
            (acc0, acc1, navail, wcur, slab, slab_id,
             mx, my, mcu_rem, slot, k, dc_pred, err, nstep,
             idx_buf, val_buf) = state
            active = (mcu_rem > 0) & ~err

            if refill_on:
                need = navail <= 32
                want_slab = wcur >> 3
                reload = need & (want_slab != slab_id)
                slab_oh = (slab_iota[:, :, None, :] ==
                           e(want_slab)[:, :, None, :])
                slab_new = jnp.sum(jnp.where(slab_oh, words4, jnp.uint32(0)),
                                   axis=1)
                slab = jnp.where(reload[:, None, :], slab_new, slab)
                slab_id = jnp.where(reload, want_slab, slab_id)
                word_oh = (word8_iota == e(wcur & 7))
                w = jnp.sum(jnp.where(word_oh, slab, jnp.uint32(0)), axis=1)
                na_u = (navail & 31).astype(jnp.uint32)
                hi_or = jnp.where(navail < 32, w >> na_u, jnp.uint32(0))
                lo_or = jnp.where(
                    navail == 0, jnp.uint32(0),
                    jnp.where(navail == 32, w,
                              w << ((32 - navail) & 31).astype(jnp.uint32)))
                acc0 = jnp.where(need, acc0 | hi_or, acc0)
                acc1 = jnp.where(need, acc1 | lo_or, acc1)
                navail = jnp.where(need, navail + 32, navail)
                wcur = jnp.where(need, wcur + 1, wcur)

            win = acc0
            is_dc = k == 0
            slot_oh = (slot_iota == e(slot))

            def sel_slot(table):
                return jnp.sum(jnp.where(slot_oh, table, 0), axis=1)

            if lendec_on:
                tslot = jnp.where(is_dc, sel_slot(dc_slot_t),
                                  sel_slot(ac_slot_t))
                t_oh = (tslot_iota == e(tslot))
                packed16 = jnp.sum(
                    jnp.where(t_oh[:, :, None, :],
                              lentabu[None, :, :, None], jnp.uint32(0)),
                    axis=1)
                maxc1 = (packed16 >> 15).astype(jnp.int32)
                base15 = (packed16 & 0x7FFF).astype(jnp.int32)
                cand = (e(win) >> (32 - lengths16)).astype(jnp.int32)
                valid = (cand < maxc1)
                has = jnp.any(valid, axis=1)
                lsel = jnp.argmax(valid, axis=1).astype(jnp.int32)
                oh16 = (len_iota == e(lsel))
                codelen = lsel + 1
                code = jnp.sum(jnp.where(oh16, cand, 0), axis=1)
                base = jnp.sum(jnp.where(oh16, base15, 0), axis=1)
                sym_idx = (code + base) & 0x7FFF
                err = err | (active & ~has)
            else:
                t_oh = (tslot_iota == e(jnp.zeros_like(k)))
                codelen = (win & 7).astype(jnp.int32) + 1
                sym_idx = (win >> 5).astype(jnp.int32) & 0xFF

            if sym_on:
                toff = jnp.sum(jnp.where(t_oh, val_offs_t, 0), axis=1)
                flat_sym = jnp.clip(toff + sym_idx, 0, VAL_TOTAL - 1)
                widx = flat_sym >> 2
                v_oh = (vword_iota == e(widx))
                vword = jnp.sum(jnp.where(v_oh, values32[None, :, None], 0),
                                axis=1)
                symbol = (vword >> ((flat_sym & 3) << 3)) & 0xFF
            else:
                symbol = sym_idx & 0xFF

            run = symbol >> 4
            size = symbol & 15
            ext_shift = (32 - codelen.astype(jnp.uint32)
                         - size.astype(jnp.uint32))
            ext = ((win >> ext_shift)
                   & ((jnp.uint32(1) << size.astype(jnp.uint32)) - 1)
                   ).astype(jnp.int32)
            half = jnp.int32(1) << jnp.maximum(size - 1, 0)
            val = jnp.where(size == 0, 0,
                            jnp.where(ext < half, ext - (half << 1) + 1, ext))

            comp_oh = [functools.reduce(jnp.logical_or,
                                        [slot_oh[:, s, :]
                                         for s in comp_slots[c]])
                       for c in range(NCOMP)]
            dc_cur = sum(jnp.where(comp_oh[c], dc_pred[c], 0)
                         for c in range(NCOMP))
            dc_new = dc_cur + val
            upd = (active & is_dc)
            dc_pred_next = tuple(
                jnp.where(upd & comp_oh[c], dc_new, dc_pred[c])
                for c in range(NCOMP))

            is_eob = (~is_dc) & (size == 0) & (run != 15)
            is_zrl = (~is_dc) & (size == 0) & (run == 15)
            k_coeff = jnp.where(is_dc, 0, jnp.minimum(k + run, 63))
            overrun = (~is_dc) & (size > 0) & (k + run > 63)
            writes = active & (is_dc | ((~is_dc) & (size > 0) & ~overrun))
            err = err | (active & overrun)
            write_val = jnp.where(is_dc, dc_new, val).astype(jnp.int16)

            if geom_on:
                block_flat = (sel_slot(flat_off_t)
                              + my * sel_slot(row_step_t)
                              + mx * sel_slot(col_step_t))
                coeff_idx = block_flat * 64 + k_coeff
                coeff_idx = jnp.where(writes, coeff_idx, OUT_SIZE)
            else:
                coeff_idx = jnp.where(writes, k_coeff, OUT_SIZE)

            if emit_on:
                idx_buf = jax.lax.dynamic_update_slice(
                    idx_buf, coeff_idx[None], (nstep, 0, 0))
                val_buf = jax.lax.dynamic_update_slice(
                    val_buf, write_val[None], (nstep, 0, 0))

            k_next = jnp.where(is_dc, 1,
                               jnp.where(is_eob, 64,
                                         jnp.where(is_zrl, k + 16,
                                                   k + run + 1)))
            block_done = k_next >= 64
            slot_next = jnp.where(block_done, slot + 1, slot)
            mcu_done = slot_next >= NSLOTS
            slot_next = jnp.where(mcu_done, 0, slot_next)
            k_next = jnp.where(block_done, 0, k_next)
            mx_next = jnp.where(mcu_done, mx + 1, mx)
            row_wrap = mx_next >= mcus_w
            mx_next = jnp.where(row_wrap, 0, mx_next)
            my_next = jnp.where(row_wrap, my + 1, my)
            mcu_rem_next = jnp.where(mcu_done, mcu_rem - 1, mcu_rem)

            n_u = (codelen + size).astype(jnp.uint32) & 31
            acc0n = (acc0 << n_u) | ((acc1 >> 1) >> (31 - n_u))
            acc1n = acc1 << n_u
            acc0 = jnp.where(active, acc0n, acc0)
            acc1 = jnp.where(active, acc1n, acc1)
            navail = jnp.where(active, navail - (codelen + size), navail)

            return (acc0, acc1, navail, wcur, slab, slab_id,
                    jnp.where(active, mx_next, mx),
                    jnp.where(active, my_next, my),
                    jnp.where(active, mcu_rem_next, mcu_rem),
                    jnp.where(active, slot_next, slot),
                    jnp.where(active, k_next, k),
                    dc_pred_next, err, nstep + 1, idx_buf, val_buf)

        def cond(state):
            return state[13] < STEPS

        lane0 = jnp.zeros((R, LANE), jnp.int32)
        init = (
            lane0.astype(jnp.uint32), lane0.astype(jnp.uint32),
            lane0, lane0,
            jnp.zeros((R, 8, LANE), jnp.uint32), lane0 - 1,
            lane0, lane0, lane0 + 10**6, lane0, lane0,
            tuple(lane0 for _ in range(NCOMP)),
            jnp.zeros((R, LANE), jnp.bool_),
            jnp.int32(0),
            jnp.full((STEPS, R, LANE), OUT_SIZE, jnp.int32),
            jnp.zeros((STEPS, R, LANE), jnp.int16),
        )
        final = jax.lax.while_loop(cond, step, init)
        return final[0], final[12], final[14][-1]

    return jax.jit(decoder)


def main():
    rng = np.random.default_rng(0)
    words = rng.integers(0, 1 << 32, (R, N_WORDS, LANE), dtype=np.uint64
                         ).astype(np.uint32)
    lentab = rng.integers(0, 1 << 31, (4, 16), dtype=np.uint64).astype(np.uint32)
    values = rng.integers(0, 1 << 32, (VAL_WORDS,), dtype=np.uint64).astype(np.uint32)
    args = (jnp.asarray(words), jnp.asarray(lentab), jnp.asarray(values))

    variants = [
        ("full", {"refill", "lendec", "symfetch", "geom", "emit"}),
        ("-refill", {"lendec", "symfetch", "geom", "emit"}),
        ("-lendec", {"refill", "symfetch", "geom", "emit"}),
        ("-symfetch", {"refill", "lendec", "geom", "emit"}),
        ("-geom", {"refill", "lendec", "symfetch", "emit"}),
        ("-emit", {"refill", "lendec", "symfetch", "geom"}),
        ("minimal", set()),
    ]
    for name, flags in variants:
        fn = build(frozenset(flags))
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(3):
            out = fn(*args)
        jax.block_until_ready(out)
        t = (time.perf_counter() - t0) / 3
        print(f"{name:12s}: {t*1e3:7.1f} ms  ({t/STEPS*1e6:6.2f} us/step)",
              flush=True)


if __name__ == "__main__":
    main()
