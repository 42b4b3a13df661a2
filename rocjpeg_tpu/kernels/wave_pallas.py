"""Pallas TPU kernel for the wave Huffman decoder.

The jnp/while_loop formulation (ops/device_entropy.py) is correct but pays a
measured ~37us *fixed* cost per loop iteration on v5e: XLA splits the body
into several fusions and the loop state makes an HBM round trip between
them. This kernel runs the identical algorithm inside ONE Pallas program:

- all lane state lives in VMEM/vregs for the whole decode (no HBM traffic
  in the loop except the emission stream);
- the grid tiles lanes (R_TILE sublane-rows x 128 lanes per program) so the
  per-tile bitstream words fit VMEM regardless of segment length;
- emission is double-buffered: each inner round decodes FLUSH symbols into
  a VMEM ring slab, then an async DMA streams the slab to the HBM
  (max_steps, R, 128) index/value buffers while the next round computes;
- the (index, value) buffers feed the same bulk scatter + dezigzag epilogue
  as the jnp path (outside the kernel - XLA's TPU scatter is fast).

Bit-exactness contract: identical emission semantics to the jnp wave — the
test suite runs both against the host oracle (tests/test_device_entropy.py
covers the jnp wave; tests/test_wave_pallas.py runs THIS kernel under the
Pallas interpreter on CPU across the CSS x restart x corrupt matrix).

Reference context: this kernel is the TPU replacement for the VCN ASIC's
entropy stage (rocJPEG delegates it via src/rocjpeg_vaapi_decoder.cpp); the
restart-interval lane parallelism mirrors what the reference forwards to
hardware in slice_parameter_buffer.restart_interval (src/rocjpeg_parser.cpp
:374-390).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import wave_common as wc

FLUSH = 8          # symbols per emission round (= ring slab depth)
LANE = 128

_VAL_OFFS = wc.VAL_OFFS
_VAL_TOTAL = wc.VAL_TOTAL
_VAL_WORDS = wc.VAL_WORDS
_ZIGZAG = wc.ZIGZAG


def _pick_r_tile(R: int, n_words: int) -> int:
    """Lane-tile height (sublane rows per grid program): keep the tile's
    words (R_TILE * n_words * 128 * 4B) within ~6 MB of VMEM. Measured on
    v5e: this lands total scoped VMEM near the 16 MB default limit, which
    is the throughput sweet spot — RAISING the cap to let tiles grow
    (words-tile budget 16 MB, scoped ~64 MB) measured 3.4x SLOWER on the
    headline corpus, and shrinking tiles to stay under 12 MB scoped
    measured ~7x slower (the step's fixed overhead stops amortizing).
    vmem_limit_bytes below is raised ONLY as headroom for large-n_words
    packs whose scoped demand lands slightly past 16 MB."""
    rt = _r_tile_budget(n_words)
    if R <= rt:
        return int(R)  # whole-array block (any height is legal)
    # The grid is R // rt with no remainder handling: rt must divide R,
    # and a partial tile must stay >= 8 rows (Mosaic's sublane quantum).
    # pack_virtual_segments pads lanes to a multiple of rt * LANE, so this
    # loop is a no-op there; it protects other callers.
    while rt > 8 and R % rt:
        rt >>= 1
    if R % rt:
        return int(R)  # legacy odd R: one whole-array tile
    return rt


def _r_tile_budget(n_words: int) -> int:
    """VMEM-derived lane-tile height (pow2, >= 8) independent of the lane
    count — pack_virtual_segments uses this as the lane-padding quantum so
    the grid divides exactly."""
    budget = 6 * 1024 * 1024
    per_row = n_words * LANE * 4
    rt = max(8, budget // per_row)
    return 1 << (rt.bit_length() - 1)  # floor pow2


@functools.lru_cache(maxsize=64)
def build_wave_kernel(geom, n_lanes: int, n_words: int, max_steps: int,
                      interpret: bool = False, n_banks: int = 1):
    """Compile the Pallas wave decoder for one static geometry.

    Returns fn(words(R,n_words,128) u32, img_base(R,128) i32,
               mcu_start(R,128) i32, mcu_count(R,128) i32,
               lentab(4*n_banks,16) u32, values(1,n_banks*_VAL_WORDS) u32
               [, bank(R,128) i32 when n_banks > 1],
               idx_init(max_steps,R,128) i32)
      -> (idx_buf, val_buf, err(R,128) bool)

    n_banks > 1 selects PER-IMAGE Huffman tables by each lane's bank index
    (reference analog: per-image DHT forwarding, vaapi_decoder.cpp:694-834);
    n_banks is static, so 1-bank groups compile the exact original program.

    (mcu_start is converted to mx0/my0 outside the kernel — Mosaic has no
    integer division.)
    """
    nslots = len(geom.flat_off)
    ncomp = geom.ncomp
    R = n_lanes // LANE
    n_slabs = n_words // 8
    R_T = _pick_r_tile(R, n_words)
    grid = R // R_T
    out_size = geom.batch * geom.total_blocks * 64
    max_rounds = max_steps // FLUSH
    mcus_w = geom.mcus_w
    comp_slots = [
        [s for s in range(nslots) if geom.comp_of_slot[s] == c]
        for c in range(ncomp)
    ]
    flat_off = geom.flat_off
    row_step = geom.row_step
    col_step = geom.col_step
    dc_slot = geom.dc_slot
    ac_slot = geom.ac_slot

    def kernel(words_ref, img_base_ref, mx0_ref, my0_ref, mcu_count_ref,
               lentab_ref, values_ref, *rest):
        if n_banks > 1:
            (bank_ref, idx_init_ref, idx_hbm, val_hbm, err_ref,
             ring_idx, ring_val, sems) = rest
            bank4 = bank_ref[:] * 4
            bank89 = bank_ref[:] * _VAL_WORDS
        else:
            (idx_init_ref, idx_hbm, val_hbm, err_ref,
             ring_idx, ring_val, sems) = rest
            bank4 = bank89 = None
        del idx_init_ref  # aliased to idx_hbm; pre-filled with the sentinel
        t = pl.program_id(0)
        r0 = t * R_T
        # Mosaic cannot reduce unsigned ints: keep the one-hot sums in int32
        # (bit patterns are preserved) and bitcast to uint32 for shifting.
        words4i = pltpu.bitcast(words_ref[:], jnp.int32).reshape(
            R_T, n_slabs, 8, LANE)
        lentab = lentab_ref[:]          # (4 * n_banks, 16) uint32
        values = values_ref[:]          # (1, n_banks * _VAL_WORDS) uint32
        img_base = img_base_ref[:]
        mcus_w_i = jnp.int32(mcus_w)

        def sel_slot(slot, table):
            """table[slot] per lane; table is a static python tuple."""
            out = jnp.full(slot.shape, table[0], jnp.int32)
            for s in range(1, nslots):
                out = jnp.where(slot == s, jnp.int32(table[s]), out)
            return out

        def one_symbol(carry, ring_slot):
            (acc0, acc1, navail, wcur, slab, slab_id,
             mx, my, mcu_rem, slot, k, dc_pred, erri) = carry
            # err is carried as int32 (Mosaic can't carry i1 vectors).
            err = erri > 0
            active = (mcu_rem > 0) & ~err

            # ---- refill + symbol decode (shared with the sync kernel) ----
            acc0, acc1, navail, wcur, slab, slab_id = wc.refill(
                (acc0, acc1, navail, wcur, slab, slab_id), words4i,
                n_slabs, R_T)

            win = acc0
            is_dc = k == 0
            tslot = jnp.where(is_dc, sel_slot(slot, dc_slot),
                              sel_slot(slot, ac_slot))
            if n_banks > 1:
                tslot = tslot + bank4

            codelen, run, size, val, found = wc.decode_symbol(
                win, tslot, lentab, values, n_banks, R_T,
                bank4=bank4, bank89=bank89)
            err = err | (active & ~found)

            # ---- DC path ----
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
            upd = active & is_dc
            dc_pred = tuple(
                jnp.where(upd & comp_oh[c], dc_new, dc_pred[c])
                for c in range(ncomp))

            is_eob = (~is_dc) & (size == 0) & (run != 15)
            is_zrl = (~is_dc) & (size == 0) & (run == 15)
            k_coeff = jnp.where(is_dc, 0, jnp.minimum(k + run, 63))
            overrun = (~is_dc) & (size > 0) & (k + run > 63)
            writes = active & (is_dc | ((~is_dc) & (size > 0) & ~overrun))
            err = err | (active & overrun)
            write_val = jnp.where(is_dc, dc_new, val).astype(jnp.int16)

            # Zigzag -> natural position (static select chain; a post-loop
            # gather over the whole coefficient tensor is far slower).
            k_nat = jnp.zeros_like(k_coeff)
            for p in range(1, 64):
                k_nat = jnp.where(k_coeff == p, jnp.int32(_ZIGZAG[p]), k_nat)

            block_flat = (img_base + sel_slot(slot, flat_off)
                          + my * sel_slot(slot, row_step)
                          + mx * sel_slot(slot, col_step))
            coeff_idx = jnp.where(writes, block_flat * 64 + k_nat,
                                  jnp.int32(out_size))

            # ---- ring emission (parity dynamic, slot-in-round static) ----
            parity, j = ring_slot
            ring_idx[parity, j] = coeff_idx
            ring_val[parity, j] = write_val

            # ---- advance ----
            k_next = jnp.where(is_dc, 1,
                               jnp.where(is_eob, 64,
                                         jnp.where(is_zrl, k + 16,
                                                   k + run + 1)))
            block_done = k_next >= 64
            slot_next = jnp.where(block_done, slot + 1, slot)
            mcu_done = slot_next >= nslots
            slot_next = jnp.where(mcu_done, 0, slot_next)
            k_next = jnp.where(block_done, 0, k_next)
            mx_next = jnp.where(mcu_done, mx + 1, mx)
            row_wrap = mx_next >= mcus_w_i
            mx_next = jnp.where(row_wrap, 0, mx_next)
            my_next = jnp.where(row_wrap, my + 1, my)
            mcu_rem_next = jnp.where(mcu_done, mcu_rem - 1, mcu_rem)

            n_u = (codelen + size).astype(jnp.uint32)
            acc0n, acc1n, navail_n = wc.consume(acc0, acc1, navail, n_u)
            acc0 = jnp.where(active, acc0n, acc0)
            acc1 = jnp.where(active, acc1n, acc1)
            navail = jnp.where(active, navail_n, navail)

            return (acc0, acc1, navail, wcur, slab, slab_id,
                    jnp.where(active, mx_next, mx),
                    jnp.where(active, my_next, my),
                    jnp.where(active, mcu_rem_next, mcu_rem),
                    jnp.where(active, slot_next, slot),
                    jnp.where(active, k_next, k),
                    dc_pred, err.astype(jnp.int32))

        def dma_out(rnd):
            parity = rnd % 2
            return pltpu.make_async_copy(
                ring_idx.at[parity],
                idx_hbm.at[pl.ds(rnd * FLUSH, FLUSH), pl.ds(r0, R_T), :],
                sems.at[parity])

        def dma_out_val(rnd):
            parity = rnd % 2
            return pltpu.make_async_copy(
                ring_val.at[parity],
                val_hbm.at[pl.ds(rnd * FLUSH, FLUSH), pl.ds(r0, R_T), :],
                sems.at[2 + parity])

        def round_body(state):
            carry, rnd = state
            parity = rnd % 2

            # Reuse of this ring parity requires its previous DMA done.
            @pl.when(rnd >= 2)
            def _():
                dma_out(rnd - 2).wait()
                dma_out_val(rnd - 2).wait()

            for j in range(FLUSH):
                carry = one_symbol(carry, (parity, j))

            dma_out(rnd).start()
            dma_out_val(rnd).start()
            return carry, rnd + 1

        def cond(state):
            carry, rnd = state
            mcu_rem, erri = carry[8], carry[12]
            return (jnp.any((mcu_rem > 0) & (erri == 0))
                    & (rnd < max_rounds))

        z = jnp.zeros((R_T, LANE), jnp.int32)
        init_carry = (
            z.astype(jnp.uint32), z.astype(jnp.uint32), z, z,
            jnp.zeros((R_T, 8, LANE), jnp.int32), z - 1,
            mx0_ref[:], my0_ref[:],
            mcu_count_ref[:], z, z,
            tuple(z for _ in range(ncomp)),
            z,                       # err as int32 mask
        )
        final_carry, final_rnd = jax.lax.while_loop(
            cond, round_body, (init_carry, jnp.int32(0)))

        # Drain outstanding DMAs (the last two rounds, if they ran).
        @pl.when(final_rnd >= 2)
        def _():
            dma_out(final_rnd - 2).wait()
            dma_out_val(final_rnd - 2).wait()

        @pl.when(final_rnd >= 1)
        def _():
            dma_out(final_rnd - 1).wait()
            dma_out_val(final_rnd - 1).wait()

        err_ref[:] = (final_carry[12] | final_carry[8])

    # ---- pallas_call wiring ----
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((R_T, n_words, LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_T, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_T, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_T, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_T, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * n_banks, 16), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_banks * _VAL_WORDS), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + ([pl.BlockSpec((R_T, LANE), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)] if n_banks > 1 else [])
        + [
            pl.BlockSpec(memory_space=pl.ANY),   # idx_init (aliased)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # idx_buf (aliased init)
            pl.BlockSpec(memory_space=pl.ANY),   # val_buf
            pl.BlockSpec((R_T, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),  # err
        ],
        scratch_shapes=[
            pltpu.VMEM((2, FLUSH, R_T, LANE), jnp.int32),   # ring_idx
            pltpu.VMEM((2, FLUSH, R_T, LANE), jnp.int16),   # ring_val
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )

    pc = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((max_steps, R, LANE), jnp.int32),
            jax.ShapeDtypeStruct((max_steps, R, LANE), jnp.int16),
            jax.ShapeDtypeStruct((R, LANE), jnp.int32),  # err mask
        ],
        input_output_aliases={(8 if n_banks > 1 else 7): 0},  # idx_init
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )

    def fn(words, img_base, mcu_start, mcu_count, lentab, values,
           bank=None):
        mx0 = mcu_start % jnp.int32(mcus_w)
        my0 = mcu_start // jnp.int32(mcus_w)
        idx_init = jnp.full((max_steps, R, LANE), out_size, jnp.int32)
        args = [words, img_base, mx0, my0, mcu_count, lentab,
                values.reshape(1, -1)]
        if n_banks > 1:
            args.append(bank)
        args.append(idx_init)
        return pc(*args)

    return jax.jit(fn)
