"""Shared Pallas building blocks of the wave Huffman kernel.

The emission wave (kernels/wave_pallas.py, the decode proper) runs this
inner machinery: a branchless two-word bit-window refill and a
16-candidate canonical Huffman symbol decode. (A second consumer — the
device sync pass — was removed in round 5 after losing its final A/B 15x
to the host index walk, SYNC_AB_r05.json.) The emission semantics are
pinned against the host oracle by tests/test_wave_pallas.py.

Reference context: this is the symbol automaton of ITU-T T.81 Annex F that
the reference's VCN ASIC implements in silicon (delegated via
src/rocjpeg_vaapi_decoder.cpp); lanes are restart segments (real, virtual,
or speculative chunks), mirroring slice_parameter_buffer.restart_interval
forwarding (src/rocjpeg_parser.cpp:374-390).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

LANE = 128

# Per-table value capacity: DC tables hold <= 16 symbols, AC <= 162; the
# packed layout allots these byte offsets to (dc0, dc1, ac0, ac1) within a
# bank (see ops/device_entropy.DeviceScanTables).
VAL_OFFS = (0, 16, 32, 194)
VAL_TOTAL = 356
VAL_WORDS = (VAL_TOTAL + 3) // 4

# Natural index of the k-th zigzag coefficient (ITU-T T.81 Figure 5).
ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)


def refill(state, words4i, n_slabs, R_T):
    """Branchless refill: insert one 32-bit word into the 64-bit window when
    fewer than 33 bits remain (max consumption per symbol is 16+11=27).

    state = (acc0, acc1, navail, wcur, slab, slab_id), all (R_T, LANE)
    except slab (R_T, 8, LANE). words4i is the lane-major word tensor
    bitcast to int32 and reshaped (R_T, n_slabs, 8, LANE). Returns the
    updated state tuple."""
    acc0, acc1, navail, wcur, slab, slab_id = state
    need = navail <= 32
    want_slab = wcur >> 3
    reload = need & (want_slab != slab_id)
    slab_oh = (jax.lax.broadcasted_iota(
        jnp.int32, (R_T, n_slabs, 1, LANE), 1)
        == want_slab[:, None, None, :])
    slab_new = jnp.sum(jnp.where(slab_oh, words4i, 0),
                       axis=1)                      # (R_T, 8, LANE) i32
    slab = jnp.where(reload[:, None, :], slab_new, slab)
    slab_id = jnp.where(reload, want_slab, slab_id)
    word_oh = (jax.lax.broadcasted_iota(
        jnp.int32, (R_T, 8, LANE), 1) == (wcur & 7)[:, None, :])
    w = pltpu.bitcast(jnp.sum(jnp.where(word_oh, slab, 0), axis=1),
                      jnp.uint32)
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
    return acc0, acc1, navail, wcur, slab, slab_id


def consume(acc0, acc1, navail, nbits_u):
    """Shift nbits (uint32 per lane, >= 1, <= 27) out of the 64-bit window."""
    acc0n = (acc0 << nbits_u) | ((acc1 >> 1) >> (31 - nbits_u))
    acc1n = acc1 << nbits_u
    return acc0n, acc1n, navail - nbits_u.astype(jnp.int32)


def decode_symbol(win, tslot, lentab, values, n_banks, R_T,
                  bank4=None, bank89=None):
    """Decode one canonical Huffman symbol + its magnitude from the 32-bit
    MSB-first window ``win`` using table slot ``tslot`` (0..4*n_banks-1).

    Returns (codelen, run, size, val, found):
      codelen (R_T, LANE) i32 — code length 1..16
      run/size — the (run, size) nibbles of the symbol byte
      val — the signed extended magnitude (0 when size == 0)
      found — bool, False = invalid code (win matched no length)
    """
    # First-valid code length: static loop over 16 lengths, scalar table
    # reads broadcast per candidate. (Mosaic cannot reduce unsigned ints:
    # one-hot sums stay in int32.)
    found = jnp.zeros(win.shape, jnp.bool_)
    codelen = jnp.ones(win.shape, jnp.int32)
    code = jnp.zeros(win.shape, jnp.int32)
    base = jnp.zeros(win.shape, jnp.int32)
    nrows = 4 * n_banks
    for li in range(16):
        cand = (win >> jnp.uint32(31 - li)).astype(jnp.int32)
        ent = jnp.full(tslot.shape, lentab[nrows - 1, li], lentab.dtype)
        for trow in range(nrows - 2, -1, -1):
            ent = jnp.where(tslot == trow, lentab[trow, li], ent)
        maxc1 = (ent >> 15).astype(jnp.int32)
        b15 = (ent & 0x7FFF).astype(jnp.int32)
        ok = (cand < maxc1) & ~found
        codelen = jnp.where(ok, li + 1, codelen)
        code = jnp.where(ok, cand, code)
        base = jnp.where(ok, b15, base)
        found = found | ok
    sym_idx = (code + base) & 0x7FFF

    # Symbol byte from the packed value LUT (one-hot reduction).
    tslot_in_bank = tslot - bank4 if n_banks > 1 else tslot
    toff = (jnp.where(tslot_in_bank == 0, VAL_OFFS[0],
            jnp.where(tslot_in_bank == 1, VAL_OFFS[1],
            jnp.where(tslot_in_bank == 2, VAL_OFFS[2],
                      VAL_OFFS[3]))))
    flat_sym = jnp.clip(toff + sym_idx, 0, VAL_TOTAL - 1)
    widx = flat_sym >> 2
    if n_banks > 1:
        widx = widx + bank89
    v_oh = (jax.lax.broadcasted_iota(
        jnp.int32, (R_T, n_banks * VAL_WORDS, LANE), 1)
        == widx[:, None, :])
    vword = jnp.sum(
        jnp.where(v_oh, values[0][None, :, None].astype(jnp.int32), 0),
        axis=1)
    symbol = (vword >> ((flat_sym & 3) << 3)) & 0xFF

    run = symbol >> 4
    size = symbol & 15

    # Magnitude (extend) bits immediately after the code.
    ext_shift = (32 - codelen - size).astype(jnp.uint32)
    ext = ((win >> ext_shift)
           & ((jnp.uint32(1) << size.astype(jnp.uint32)) - 1)
           ).astype(jnp.int32)
    half = jnp.int32(1) << jnp.maximum(size - 1, 0)
    val = jnp.where(size == 0, 0,
                    jnp.where(ext < half, ext - (half << 1) + 1, ext))
    return codelen, run, size, val, found
