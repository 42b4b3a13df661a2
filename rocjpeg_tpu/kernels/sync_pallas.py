"""Pallas TPU kernel for the sync pass — device-side discovery of virtual
restart points in DRI=0 scans via Huffman self-synchronization.

The wave decoder needs per-lane entry state (bit offset, MCU index, DC
predictors). For scans with restart markers the parser supplies it; for
DRI=0 scans rounds 1-2 recovered it with a *sequential host walk* over the
whole stream (csrc/rocjpeg_entropy.cpp rjt_index_scan*), which caps the
realistic-workload throughput at what one or two host cores can Huffman-walk
(~140 MB/s/core). This kernel moves that discovery on-chip:

- The clean (unstuffed) scan is split into fixed-size byte chunks. Each
  chunk is a lane. A lane starts decoding ``margin`` bytes BEFORE its chunk
  with assumed state (k=0, slot=0) — garbage at first, but canonical Huffman
  walks self-synchronize: measured on the reference's own mug_420.jpg, a
  walk from an arbitrary byte offset converges to the true decode within
  p50=560 / max=10718 bits (tools/sync_experiment.py). By the time the lane
  reaches its chunk it is, with high probability, ON the true walk.
- At the first MCU boundary at/after its chunk start the lane records ``g``
  (the true-walk entry bit) and zeroes its MCU/symbol/DC counters; at the
  first MCU boundary at/after the NEXT chunk's start it stops, recording
  ``end`` plus the span's MCU count, symbol count, and per-component DC
  deltas. Invalid codes before sync slide one bit (benign repair); after
  sync they flag the lane.

Correctness is NOT probabilistic. The chain check (ops/sync_entropy.py)
verifies end[j] == g[j+1] for every adjacent lane pair. Lane 0 starts at
bit 0 in the TRUE state, so its span decode is the true walk and its end is
a true MCU boundary; if end[0] == g[1] then g[1] is a true boundary, making
lane 1's span decode the true walk, and so on by induction — if every check
passes, every span is provably true. Mis-synced lanes (possible on
low-entropy streams that phase-lock) can only FAIL the check, triggering
the host-walk fallback; they can never pass it wrongly.

Reference context: this replaces the restart-interval metadata the reference
forwards to the VCN ASIC (slice_parameter_buffer.restart_interval,
src/rocjpeg_parser.cpp:374-390) for streams that carry none — parallelism
the fixed-function hardware does not have.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import wave_common as wc

LANE = 128
SYNC_UNROLL = 4
_VAL_WORDS = wc.VAL_WORDS


@functools.lru_cache(maxsize=32)
def build_sync_kernel(geom, n_lanes: int, n_words: int, max_steps: int,
                      interpret: bool = False, n_banks: int = 1,
                      overshoot_bits: int = 4096):
    """Compile the sync-pass kernel for one static geometry.

    Returns fn(words(R,n_words,128) u32, abs0(R,128) i32, a_t(R,128) i32,
               b_t(R,128) i32, lentab(4*n_banks,16) u32,
               values(n_banks*_VAL_WORDS,) u32 [, bank(R,128) i32])
      -> (g, end, span_mcus, span_syms, dc0, dc1, dc2, status) all (R,128) i32

    abs0 is the absolute bit position (within the image's clean stream) of
    the lane's window bit 0; a_t / b_t are the record/stop target bits
    (chunk start / next chunk start; the image-last lane's b_t is
    stream_bits - 7 so it stops at the final MCU boundary inside the padded
    last byte; padding lanes set abs0 == a_t == b_t and finish at init).

    status: 0 = clean stop; 1 = invalid code after sync, or no stop within
    max_steps (window exhausted / corrupt stream).
    """
    nslots = len(geom.dc_slot)
    ncomp = geom.ncomp
    R = n_lanes // LANE
    n_slabs = n_words // 8
    per_row = n_words * LANE * 4
    budget = 6 * 1024 * 1024
    rt = max(1, budget // per_row)
    rt = 1 << (rt.bit_length() - 1)
    # Mosaic requires the sublane block dim to be a multiple of 8 (or the
    # whole array); R is pow2, so 8 always divides it when R >= 8.
    R_T = int(min(max(rt, 8), R))
    grid = R // R_T
    dc_slot = geom.dc_slot
    ac_slot = geom.ac_slot
    comp_slots = [
        [s for s in range(nslots) if geom.comp_of_slot[s] == c]
        for c in range(ncomp)
    ]

    def kernel(words_ref, abs0_ref, a_ref, b_ref, lentab_ref, values_ref,
               *rest):
        if n_banks > 1:
            (bank_ref, g_ref, end_ref, spm_ref, sps_ref,
             dc0_ref, dc1_ref, dc2_ref, st_ref) = rest
            bank4 = bank_ref[:] * 4
            bank89 = bank_ref[:] * _VAL_WORDS
        else:
            (g_ref, end_ref, spm_ref, sps_ref,
             dc0_ref, dc1_ref, dc2_ref, st_ref) = rest
            bank4 = bank89 = None
        words4i = pltpu.bitcast(words_ref[:], jnp.int32).reshape(
            R_T, n_slabs, 8, LANE)
        lentab = lentab_ref[:]
        values = values_ref[:]
        abs0 = abs0_ref[:]
        a_t = a_ref[:]
        b_t = b_ref[:]

        def sel_slot(slot, table):
            out = jnp.full(slot.shape, table[0], jnp.int32)
            for s in range(1, nslots):
                out = jnp.where(slot == s, jnp.int32(table[s]), out)
            return out

        def one_symbol(carry):
            (acc0, acc1, navail, wcur, slab, slab_id,
             slot, k, dc_pred, mcu_cnt, sym_cnt,
             found, g, end, spm, sps, dco, done, erri) = carry
            active = (done == 0) & (erri == 0)

            # Bit-window exhaustion: a refill past n_words would silently
            # yield zero bits (the one-hot slab select sums to 0 out of
            # range) and the lane would "decode" fabricated symbols with
            # status 0 — flag it as an error instead. Active lanes must
            # stop (real MCU boundary) before their window runs out; only
            # lost lanes ever get here, and flagging them makes the chain
            # check fail so the group falls back to the host walk rather
            # than emitting corrupt output (advisor r3, high).
            erri = jnp.where(active & (navail <= 32) & (wcur >= n_words),
                             jnp.int32(1), erri)

            acc0, acc1, navail, wcur, slab, slab_id = wc.refill(
                (acc0, acc1, navail, wcur, slab, slab_id), words4i,
                n_slabs, R_T)

            win = acc0
            is_dc = k == 0
            tslot = jnp.where(is_dc, sel_slot(slot, dc_slot),
                              sel_slot(slot, ac_slot))
            if n_banks > 1:
                tslot = tslot + bank4

            codelen, run, size, val, valid = wc.decode_symbol(
                win, tslot, lentab, values, n_banks, R_T,
                bank4=bank4, bank89=bank89)

            adv = active & valid
            # Invalid code before sync: slide one bit (the walk has not
            # locked yet — expected); after sync: corrupt, flag the lane.
            slide = active & ~valid & (found == 0)
            erri = jnp.where(active & ~valid & (found == 1),
                             jnp.int32(1), erri)

            # ---- DC accumulation (delta since g; reset at the g event) ----
            comp_oh = []
            for c in range(ncomp):
                m = slot == comp_slots[c][0]
                for s in comp_slots[c][1:]:
                    m = m | (slot == s)
                comp_oh.append(m)
            dc_cur = jnp.zeros_like(k)
            for c in range(ncomp):
                dc_cur = jnp.where(comp_oh[c], dc_pred[c], dc_cur)
            dc_new = dc_cur + val
            upd = adv & is_dc
            dc_pred = tuple(
                jnp.where(upd & comp_oh[c], dc_new, dc_pred[c])
                for c in range(ncomp))

            # ---- block / MCU advance ----
            is_eob = (~is_dc) & (size == 0) & (run != 15)
            is_zrl = (~is_dc) & (size == 0) & (run == 15)
            overrun = (~is_dc) & (size > 0) & (k + run > 63)
            erri = jnp.where(adv & overrun & (found == 1),
                             jnp.int32(1), erri)
            k_next = jnp.where(is_dc, 1,
                               jnp.where(is_eob, 64,
                                         jnp.where(is_zrl, k + 16,
                                                   k + run + 1)))
            block_done = k_next >= 64
            slot_next = jnp.where(block_done, slot + 1, slot)
            mcu_done = adv & (slot_next >= nslots)
            slot_next = jnp.where(slot_next >= nslots, 0, slot_next)
            k_next = jnp.where(block_done, 0, k_next)
            slot = jnp.where(adv, slot_next, slot)
            k = jnp.where(adv, k_next, k)
            sym_cnt = jnp.where(adv, sym_cnt + 1, sym_cnt)

            # ---- consume bits (decoded symbol, or the 1-bit slide) ----
            nbits = jnp.where(adv, codelen + size,
                              jnp.where(slide, jnp.int32(1), jnp.int32(0)))
            nb_u = jnp.maximum(nbits, 1).astype(jnp.uint32)
            acc0n, acc1n, navail_n = wc.consume(acc0, acc1, navail, nb_u)
            moved = nbits > 0
            acc0 = jnp.where(moved, acc0n, acc0)
            acc1 = jnp.where(moved, acc1n, acc1)
            navail = jnp.where(moved, navail_n, navail)
            abs_now = abs0 + (wcur * 32 - navail)

            # ---- events at a completed MCU (priority: stop > record) ----
            mcu_cnt = jnp.where(mcu_done & (found == 1), mcu_cnt + 1,
                                mcu_cnt)
            # A stop further than OVERSHOOT_BITS past its target would
            # overflow the pass-B emission window (sized CB*8 + OVERSHOOT);
            # flag instead of recording a span pass B would truncate
            # (advisor r3, high).
            past_b = mcu_done & (abs_now >= b_t)
            over = past_b & (abs_now - b_t > overshoot_bits)
            erri = jnp.where(over & (found == 1), jnp.int32(1), erri)
            stop = past_b & (found == 1) & ~over
            gev = mcu_done & (found == 0) & (abs_now >= a_t)
            # Degenerate empty span: the chunk holds no MCU boundary.
            dstop = gev & (abs_now >= b_t)

            end = jnp.where(stop | dstop, abs_now, end)
            spm = jnp.where(stop, mcu_cnt, jnp.where(dstop, 0, spm))
            sps = jnp.where(stop, sym_cnt, jnp.where(dstop, 0, sps))
            dco = tuple(
                jnp.where(stop, dc_pred[c] if c < ncomp else dco[c],
                          jnp.where(dstop, 0, dco[c]))
                for c in range(3))
            done = jnp.where(stop | dstop, jnp.int32(1), done)

            g = jnp.where(gev, abs_now, g)
            found = jnp.where(gev, jnp.int32(1), found)
            mcu_cnt = jnp.where(gev, 0, mcu_cnt)
            sym_cnt = jnp.where(gev, 0, sym_cnt)
            dc_pred = tuple(jnp.where(gev, 0, dc_pred[c])
                            for c in range(ncomp))

            return (acc0, acc1, navail, wcur, slab, slab_id,
                    slot, k, dc_pred, mcu_cnt, sym_cnt,
                    found, g, end, spm, sps, dco, done, erri)

        def step(state):
            carry, nstep = state
            for _ in range(SYNC_UNROLL):
                carry = one_symbol(carry)
            return carry, nstep + SYNC_UNROLL

        def cond(state):
            carry, nstep = state
            done, erri = carry[17], carry[18]
            return jnp.any((done == 0) & (erri == 0)) & (nstep < max_steps)

        z = jnp.zeros((R_T, LANE), jnp.int32)
        found0 = (abs0 >= a_t).astype(jnp.int32)
        done0 = ((found0 == 1) & (abs0 >= b_t)).astype(jnp.int32)
        init = (
            z.astype(jnp.uint32), z.astype(jnp.uint32), z, z,
            jnp.zeros((R_T, 8, LANE), jnp.int32), z - 1,
            z, z, tuple(z for _ in range(ncomp)), z, z,
            found0, jnp.where(found0 == 1, abs0, z),
            jnp.where(done0 == 1, abs0, z),        # end
            z, z, (z, z, z), done0, z,
        )
        final, _ = jax.lax.while_loop(cond, step, (init, jnp.int32(0)))
        (_, _, _, _, _, _, _, _, _, _, _,
         _, g, end, spm, sps, dco, done, erri) = final
        g_ref[:] = g
        end_ref[:] = end
        spm_ref[:] = spm
        sps_ref[:] = sps
        dc0_ref[:] = dco[0]
        dc1_ref[:] = dco[1]
        dc2_ref[:] = dco[2]
        st_ref[:] = jnp.where((erri == 1) | (done == 0), jnp.int32(1),
                              jnp.int32(0))

    lane_spec = pl.BlockSpec((R_T, LANE), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((R_T, n_words, LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            lane_spec, lane_spec, lane_spec,
            pl.BlockSpec((4 * n_banks, 16), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_banks * _VAL_WORDS), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + ([lane_spec] if n_banks > 1 else []),
        out_specs=[lane_spec] * 8,
    )
    pc = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((R, LANE), jnp.int32)] * 8,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )

    def fn(words, abs0, a_t, b_t, lentab, values, bank=None):
        args = [words, abs0, a_t, b_t, lentab, values.reshape(1, -1)]
        if n_banks > 1:
            args.append(bank)
        return pc(*args)

    return jax.jit(fn)
