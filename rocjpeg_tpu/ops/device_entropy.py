"""On-device (TPU) baseline Huffman entropy decoder.

This is the piece the reference delegates to fixed-function silicon (the VCN
ASIC behind src/rocjpeg_vaapi_decoder.cpp) re-designed for a vector machine:

- The *restart interval* (ParseDRI, src/rocjpeg_parser.cpp:374-390) segments
  the scan into independently decodable pieces (DC predictors reset at every
  RSTn marker). Segments become SIMD *lanes*: a whole batch's segments
  decode in lockstep, one Huffman symbol per lane per step of a
  ``lax.while_loop``.
- Decoding is branch-free: all 16 candidate code lengths are evaluated at
  once against canonical max-code tables and the first valid one selected
  (argmax), the symbol is fetched with a single small gather, and all state
  transitions (DC/AC, EOB, ZRL, block/MCU advance) are masked selects.
- Each decoded coefficient is scattered (mode='drop' for masked lanes)
  straight into the batch coefficient tensor that feeds the fused
  dequant+IDCT pipeline — decoded samples never leave the chip.

Why this beats the host path on this system: the JPEG bitstream is ~10-25x
smaller than its coefficient planes, so shipping bits (not coefficients)
through the narrow host->device link and expanding them on-chip removes the
H2D bottleneck entirely (measured 164 MB/s H2D => 55 Mpix/s ceiling for the
coefficient-shipping architecture).

v1 restriction: all images in a decode group must share Huffman tables
(typical for corpora from one encoder); the API groups by table digest and
falls back to the host path otherwise.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.bitstream import JpegStreamParams
from ..core.entropy import split_restart_segments, unstuff
from ..core.zigzag import ZIGZAG_ORDER
from ..status import RocJpegError, Status

MAX_VALUES = 162


# ---------------------------------------------------------------------------
# Host-side preparation
# ---------------------------------------------------------------------------

def build_canonical_tables(bits: np.ndarray, values: np.ndarray):
    """Canonical Huffman decode tables (T.81 Annex F.2.2.3 layout):
    mincode/maxcode/valptr indexed by code length 1..16 (slot 0 unused).
    maxcode = -1 for lengths with no codes."""
    mincode = np.zeros(17, np.int32)
    maxcode = np.full(17, -1, np.int32)
    valptr = np.zeros(17, np.int32)
    code = 0
    k = 0
    for length in range(1, 17):
        n = int(bits[length - 1])
        if n:
            valptr[length] = k
            mincode[length] = code
            maxcode[length] = code + n - 1
            code += n
            k += n
        code <<= 1
    vals = np.zeros(MAX_VALUES, np.uint8)
    vals[:min(len(values), MAX_VALUES)] = values[:MAX_VALUES]
    return mincode, maxcode, valptr, vals


@dataclasses.dataclass
class DeviceScanTables:
    """Stacked decode tables for the 4 (dc0, dc1, ac0, ac1) table slots."""
    mincode: np.ndarray  # (4, 17) int32
    maxcode: np.ndarray  # (4, 17) int32
    valptr: np.ndarray   # (4, 17) int32
    values: np.ndarray   # (4, MAX_VALUES) uint8
    digest: bytes

    @classmethod
    def from_params(cls, p: JpegStreamParams) -> "DeviceScanTables":
        rows = []
        for which in ("dc", "ac"):
            for tid in (0, 1):
                t = p.huffman_tables[tid] if tid < len(p.huffman_tables) else None
                if t is None or not p.load_huffman_table[tid]:
                    rows.append(build_canonical_tables(
                        np.zeros(16, np.uint8), np.zeros(0, np.uint8)))
                elif which == "dc":
                    rows.append(build_canonical_tables(t.num_dc_codes, t.dc_values))
                else:
                    rows.append(build_canonical_tables(t.num_ac_codes, t.ac_values))
        mincode = np.stack([r[0] for r in rows])
        maxcode = np.stack([r[1] for r in rows])
        valptr = np.stack([r[2] for r in rows])
        values = np.stack([r[3] for r in rows])
        digest = (mincode.tobytes() + maxcode.tobytes() + valptr.tobytes()
                  + values.tobytes())
        return cls(mincode, maxcode, valptr, values, digest)


@dataclasses.dataclass
class PackedSegments:
    """Device-ready segment wave for one decode group."""
    words: np.ndarray      # (n_segs, n_words) uint32, big-endian packed bits
    img_idx: np.ndarray    # (n_segs,) int32
    mcu_start: np.ndarray  # (n_segs,) int32
    mcu_count: np.ndarray  # (n_segs,) int32
    n_words: int
    total_bytes: int


def _segment_image(scan: bytes):
    """One vectorized pass over a scan: remove byte stuffing (0xFF00 -> 0xFF)
    and RSTn markers, returning (clean bytes, segment start offsets within
    clean). Semantics identical to split_restart_segments + unstuff, without
    per-segment numpy-call overhead (thousands of segments per image)."""
    b = np.frombuffer(scan, np.uint8)
    if b.size < 2:
        return b.copy(), np.zeros(0, np.int64)
    ff = np.flatnonzero(b[:-1] == 0xFF)
    nxt = b[ff + 1]
    stuffed = ff[nxt == 0x00] + 1               # drop the stuffed 0x00
    markers = ff[(nxt >= 0xD0) & (nxt <= 0xD7)]  # drop both marker bytes
    del_pos = np.concatenate([stuffed, markers, markers + 1])
    del_pos.sort(kind="stable")
    clean = np.delete(b, del_pos) if del_pos.size else b.copy()
    # Each segment starts right after a marker; translate marker positions
    # into cleaned-coordinate boundaries.
    bounds = markers - np.searchsorted(del_pos, markers)
    return clean, bounds


def pack_segments(params_list: Sequence[JpegStreamParams]) -> PackedSegments:
    """Split each image's scan at RSTn markers, unstuff, and pack all
    segments of the group into one padded uint32 word matrix (bits MSB-first
    within each big-endian word)."""
    cleans: List[np.ndarray] = []
    starts: List[np.ndarray] = []
    lengths: List[np.ndarray] = []
    img_idx: List[np.ndarray] = []
    mcu_start: List[np.ndarray] = []
    mcu_count: List[np.ndarray] = []
    for i, p in enumerate(params_list):
        interleaved = len(p.scan_components) > 1
        if interleaved:
            total = p.num_mcus
        else:
            total = ((p.picture_width + 7) // 8) * ((p.picture_height + 7) // 8)
        ri = p.restart_interval if p.restart_interval > 0 else total
        needed = (total + ri - 1) // ri
        clean, bounds = _segment_image(p.slice_data)
        if bounds.size + 1 < needed:
            raise RocJpegError(Status.BAD_JPEG, "missing restart segments")
        seg_starts = np.concatenate([[0], bounds])[:needed]
        seg_ends = np.concatenate([bounds, [clean.size]])[:needed]
        cleans.append(clean)
        starts.append(seg_starts)
        lengths.append(seg_ends - seg_starts)
        img_idx.append(np.full(needed, i, np.int32))
        ms = np.arange(needed, dtype=np.int32) * ri
        mcu_start.append(ms)
        mcu_count.append(np.minimum(ri, total - ms).astype(np.int32))

    all_len = np.concatenate(lengths)
    n_segs = all_len.size
    max_len = int(all_len.max()) if n_segs else 0
    n_words = (max_len + 3) // 4 + 2  # +2 pad words so window fetch is safe
    n_words = -(-n_words // 8) * 8   # whole 8-word slabs for the bit reader
    row_bytes = n_words * 4
    flat = np.zeros(n_segs * row_bytes, np.uint8)
    # Vectorized row packing: every clean byte lands at
    # row*row_bytes + (pos - seg_start).
    row0 = 0
    for clean, seg_starts, lens in zip(cleans, starts, lengths):
        nseg = lens.size
        used = int(seg_starts[-1] + lens[-1]) if nseg else 0
        rows = np.repeat(np.arange(row0, row0 + nseg, dtype=np.int64), lens)
        within = np.arange(used, dtype=np.int64) - np.repeat(seg_starts, lens)
        flat[rows * row_bytes + within] = clean[:used]
        row0 += nseg
    words = flat.reshape(n_segs, n_words, 4)
    w32 = ((words[:, :, 0].astype(np.uint32) << 24)
           | (words[:, :, 1].astype(np.uint32) << 16)
           | (words[:, :, 2].astype(np.uint32) << 8)
           | words[:, :, 3].astype(np.uint32))
    return PackedSegments(
        words=w32,
        img_idx=np.concatenate(img_idx),
        mcu_start=np.concatenate(mcu_start),
        mcu_count=np.concatenate(mcu_count),
        n_words=n_words,
        total_bytes=int(all_len.sum()),
    )


# ---------------------------------------------------------------------------
# Static per-group geometry
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class GroupGeometry:
    """Static decode geometry for one shape group (hashable jit key)."""
    batch: int
    mcus_w: int
    # Per scan-block-slot schedule within one MCU:
    comp_of_slot: Tuple[int, ...]
    dy_of_slot: Tuple[int, ...]
    dx_of_slot: Tuple[int, ...]
    # Per component:
    h_samp: Tuple[int, ...]
    v_samp: Tuple[int, ...]
    blocks_w: Tuple[int, ...]   # bw per component plane
    comp_base: Tuple[int, ...]  # flat block offset of each component plane
    dc_tid: Tuple[int, ...]     # dc table slot (0/1) per component
    ac_tid: Tuple[int, ...]     # ac table slot per component
    total_blocks: int           # per image, all components

    @classmethod
    def from_params(cls, p: JpegStreamParams, batch: int) -> "GroupGeometry":
        ncomp = len(p.scan_components)
        interleaved = ncomp > 1
        comp_of_slot, dy, dx = [], [], []
        if interleaved:
            for ci in range(ncomp):
                fc = p.components[ci]
                for v in range(fc.v_sampling_factor):
                    for u in range(fc.h_sampling_factor):
                        comp_of_slot.append(ci)
                        dy.append(v)
                        dx.append(u)
            mcus_w = p.mcus_per_row
        else:
            comp_of_slot, dy, dx = [0], [0], [0]
            mcus_w = (p.picture_width + 7) // 8
        h_samp, v_samp, blocks_w, comp_base = [], [], [], []
        base = 0
        for ci in range(len(p.components)):
            bh, bw = p.component_block_dims(ci)
            if not interleaved:
                bh = (p.picture_height + 7) // 8
                bw = (p.picture_width + 7) // 8
            h_samp.append(p.components[ci].h_sampling_factor if interleaved else 1)
            v_samp.append(p.components[ci].v_sampling_factor if interleaved else 1)
            blocks_w.append(bw)
            comp_base.append(base)
            base += bh * bw
        dc_tid = tuple(sc.dc_table_selector for sc in p.scan_components)
        ac_tid = tuple(sc.ac_table_selector for sc in p.scan_components)
        return cls(batch=batch, mcus_w=mcus_w,
                   comp_of_slot=tuple(comp_of_slot), dy_of_slot=tuple(dy),
                   dx_of_slot=tuple(dx), h_samp=tuple(h_samp),
                   v_samp=tuple(v_samp), blocks_w=tuple(blocks_w),
                   comp_base=tuple(comp_base), dc_tid=dc_tid, ac_tid=ac_tid,
                   total_blocks=base)


# ---------------------------------------------------------------------------
# The device kernel (pure jnp; runs under jit on TPU or CPU)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=64)
def _compiled_wave_decoder(geom: GroupGeometry, n_segs: int, n_words: int,
                           max_steps: int):
    """Build + jit the wave decoder for one static geometry.

    Memory strategy: the loop never scatters into the (large) coefficient
    tensor — XLA would copy it every iteration. Instead each step appends
    one (flat-index, value) pair per lane into step-indexed buffers via
    dynamic_update_slice (provably in-place inside while_loop), and a single
    scatter materializes the coefficient tensor afterwards. ``max_steps``
    bounds the pair buffers: every Huffman symbol consumes >= 1 bit, so
    symbols/lane <= segment bits; it is also <= mcus x slots x 65."""

    ncomp = len(geom.h_samp)
    nslots = len(geom.comp_of_slot)
    comp_of_slot = jnp.asarray(geom.comp_of_slot, jnp.int32)
    dy_of_slot = jnp.asarray(geom.dy_of_slot, jnp.int32)
    dx_of_slot = jnp.asarray(geom.dx_of_slot, jnp.int32)
    h_samp = jnp.asarray(geom.h_samp, jnp.int32)
    v_samp = jnp.asarray(geom.v_samp, jnp.int32)
    blocks_w = jnp.asarray(geom.blocks_w, jnp.int32)
    comp_base = jnp.asarray(geom.comp_base, jnp.int32)
    dc_tid = jnp.asarray([geom.dc_tid[c] if c < len(geom.dc_tid) else 0
                          for c in range(ncomp)], jnp.int32)
    ac_tid = jnp.asarray([geom.ac_tid[c] + 2 if c < len(geom.ac_tid) else 2
                          for c in range(ncomp)], jnp.int32)
    zigzag = jnp.asarray(ZIGZAG_ORDER, jnp.int32)
    out_size = geom.batch * geom.total_blocks * 64

    def decoder(words, img_idx, mcu_start, mcu_count,
                mincode, maxcode, valptr, values):
        # TPU has no fast per-lane gather: every "lookup" below is either a
        # one-hot masked reduction over a small constant table or pure bit
        # arithmetic on a per-lane 64-bit shift register (two uint32s).
        L = n_segs
        n_slabs = n_words // 8
        words3 = words.reshape(L, n_slabs, 8)
        lengths16 = jnp.arange(1, 17, dtype=jnp.uint32)
        len_iota = jnp.arange(16, dtype=jnp.int32)
        slab_iota = jnp.arange(n_slabs, dtype=jnp.int32)
        word8_iota = jnp.arange(8, dtype=jnp.int32)
        slot_iota = jnp.arange(nslots, dtype=jnp.int32)
        comp_iota = jnp.arange(ncomp, dtype=jnp.int32)
        zig_iota = jnp.arange(64, dtype=jnp.int32)
        val_iota = jnp.arange(4 * MAX_VALUES, dtype=jnp.int32)
        minc_t = mincode[:, 1:].astype(jnp.int32)   # (4, 16), lengths 1..16
        maxc_t = maxcode[:, 1:].astype(jnp.int32)
        valp_t = valptr[:, 1:].astype(jnp.int32)
        values_flat = values.reshape(-1).astype(jnp.int32)  # (4*162,)
        tslot_iota = jnp.arange(4, dtype=jnp.int32)

        def sel_small(idx, table):
            """table[idx] per lane via one-hot reduce; table is (N,) const."""
            n = table.shape[0]
            oh = (jnp.arange(n, dtype=jnp.int32)[None, :] == idx[:, None])
            return jnp.sum(jnp.where(oh, table[None, :], 0), axis=1)

        def step(state):
            (acc0, acc1, navail, wcur, slab, slab_id,
             mcu_abs, mcu_rem, slot, k, dc_pred, err, nstep,
             idx_buf, val_buf) = state
            active = (mcu_rem > 0) & ~err

            # ---- refill: insert one 32-bit word when fewer than 33 bits
            # remain (max consumption per symbol is 16+11=27 bits). ----
            need = navail <= 32
            want_slab = wcur >> 3
            reload = need & (want_slab != slab_id)
            slab_oh = (slab_iota[None, :, None] == want_slab[:, None, None])
            slab_new = jnp.sum(jnp.where(slab_oh, words3,
                                         jnp.uint32(0)), axis=1)   # (L, 8)
            slab = jnp.where(reload[:, None], slab_new, slab)
            slab_id = jnp.where(reload, want_slab, slab_id)
            word_oh = (word8_iota[None, :] == (wcur & 7)[:, None])
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

            win = acc0  # next 32 bits, MSB-first
            comp = sel_small(slot, comp_of_slot)
            is_dc = k == 0

            # Table slot (0/1 dc, 2/3 ac) for this lane's current symbol.
            tslot = jnp.where(is_dc, sel_small(comp, dc_tid),
                              sel_small(comp, ac_tid))
            t_oh = (tslot_iota[None, :, None] == tslot[:, None, None])  # (L,4,1)
            minc = jnp.sum(jnp.where(t_oh, minc_t[None], 0), axis=1)   # (L,16)
            maxc = jnp.sum(jnp.where(t_oh, maxc_t[None], 0), axis=1)
            valp = jnp.sum(jnp.where(t_oh, valp_t[None], 0), axis=1)

            # All 16 candidate codes at once; first valid length wins
            # (canonical prefix property: shorter prefixes of a longer code
            # always exceed that length's maxcode).
            cand = (win[:, None] >> (32 - lengths16[None, :])).astype(jnp.int32)
            valid = (cand <= maxc) & (maxc >= 0)
            has = jnp.any(valid, axis=1)
            lsel = jnp.argmax(valid, axis=1).astype(jnp.int32)  # 0..15
            oh16 = (len_iota[None, :] == lsel[:, None])
            codelen = lsel + 1
            code = jnp.sum(jnp.where(oh16, cand, 0), axis=1)
            sym_idx = (jnp.sum(jnp.where(oh16, valp, 0), axis=1) + code
                       - jnp.sum(jnp.where(oh16, minc, 0), axis=1))
            flat_idx = jnp.clip(tslot * MAX_VALUES + sym_idx,
                                0, 4 * MAX_VALUES - 1)
            sym_oh = (val_iota[None, :] == flat_idx[:, None])
            symbol = jnp.sum(jnp.where(sym_oh, values_flat[None, :], 0), axis=1)
            err = err | (active & ~has)

            run = symbol >> 4
            size = symbol & 15

            # Extend bits immediately after the code.
            ext_shift = (32 - codelen.astype(jnp.uint32)
                         - size.astype(jnp.uint32))
            ext = ((win >> ext_shift)
                   & ((jnp.uint32(1) << size.astype(jnp.uint32)) - 1)
                   ).astype(jnp.int32)
            half = jnp.int32(1) << jnp.maximum(size - 1, 0)
            val = jnp.where(size == 0, 0,
                            jnp.where(ext < half, ext - (half << 1) + 1, ext))

            # --- DC path ---
            comp_onehot = (comp_iota[None, :] == comp[:, None])
            dc_cur = jnp.sum(jnp.where(comp_onehot, dc_pred, 0), axis=1)
            dc_new = dc_cur + val
            dc_pred_next = jnp.where(
                (active & is_dc)[:, None] & comp_onehot, dc_new[:, None],
                dc_pred)

            # --- AC path ---
            is_eob = (~is_dc) & (size == 0) & (run != 15)
            is_zrl = (~is_dc) & (size == 0) & (run == 15)
            k_coeff = jnp.where(is_dc, 0, jnp.minimum(k + run, 63))
            writes = active & (is_dc | ((~is_dc) & (size > 0) & (k + run <= 63)))
            err = err | (active & (~is_dc) & (size > 0) & (k + run > 63))
            write_val = jnp.where(is_dc, dc_new, val).astype(jnp.int16)

            # Flat output index.
            my = mcu_abs // geom.mcus_w
            mx = mcu_abs % geom.mcus_w
            by = my * sel_small(comp, v_samp) + sel_small(slot, dy_of_slot)
            bx = mx * sel_small(comp, h_samp) + sel_small(slot, dx_of_slot)
            block_flat = (img_idx * geom.total_blocks
                          + sel_small(comp, comp_base)
                          + by * sel_small(comp, blocks_w) + bx)
            coeff_idx = block_flat * 64 + sel_small(k_coeff, zigzag)
            # Masked lanes target one-past-the-end: the final scatter uses
            # mode='drop' to discard out-of-bounds writes (a negative index
            # would *wrap* like numpy and corrupt the last element).
            coeff_idx = jnp.where(writes, coeff_idx, out_size)
            idx_buf = jax.lax.dynamic_update_slice(
                idx_buf, coeff_idx[None, :], (nstep, 0))
            val_buf = jax.lax.dynamic_update_slice(
                val_buf, write_val[None, :], (nstep, 0))

            # Advance within-block position.
            k_next = jnp.where(is_dc, 1,
                               jnp.where(is_eob, 64,
                                         jnp.where(is_zrl, k + 16,
                                                   k + run + 1)))
            block_done = k_next >= 64
            slot_next = jnp.where(block_done, slot + 1, slot)
            mcu_done = slot_next >= nslots
            slot_next = jnp.where(mcu_done, 0, slot_next)
            k_next = jnp.where(block_done, 0, k_next)
            mcu_abs_next = jnp.where(mcu_done, mcu_abs + 1, mcu_abs)
            mcu_rem_next = jnp.where(mcu_done, mcu_rem - 1, mcu_rem)

            # Consume codelen+size bits (>= 1, <= 27).
            n_u = (codelen + size).astype(jnp.uint32)
            acc0n = (acc0 << n_u) | ((acc1 >> 1) >> (31 - n_u))
            acc1n = acc1 << n_u
            acc0 = jnp.where(active, acc0n, acc0)
            acc1 = jnp.where(active, acc1n, acc1)
            navail = jnp.where(active, navail - (codelen + size), navail)

            return (acc0, acc1, navail, wcur, slab, slab_id,
                    jnp.where(active, mcu_abs_next, mcu_abs),
                    jnp.where(active, mcu_rem_next, mcu_rem),
                    jnp.where(active, slot_next, slot),
                    jnp.where(active, k_next, k),
                    dc_pred_next, err, nstep + 1, idx_buf, val_buf)

        def cond(state):
            mcu_rem = state[7]
            err = state[11]
            nstep = state[12]
            return jnp.any((mcu_rem > 0) & ~err) & (nstep < max_steps)

        init = (
            jnp.zeros(L, jnp.uint32),                   # acc0
            jnp.zeros(L, jnp.uint32),                   # acc1
            jnp.zeros(L, jnp.int32),                    # navail
            jnp.zeros(L, jnp.int32),                    # wcur
            jnp.zeros((L, 8), jnp.uint32),              # slab
            jnp.full(L, -1, jnp.int32),                 # slab_id
            mcu_start.astype(jnp.int32),                # mcu_abs
            mcu_count.astype(jnp.int32),                # mcu_rem
            jnp.zeros(L, jnp.int32),                    # slot
            jnp.zeros(L, jnp.int32),                    # k
            jnp.zeros((L, ncomp), jnp.int32),           # dc_pred
            jnp.zeros(L, jnp.bool_),                    # err
            jnp.int32(0),                               # nstep
            jnp.full((max_steps, L), out_size, jnp.int32),  # idx_buf
            jnp.zeros((max_steps, L), jnp.int16),       # val_buf
        )
        final = jax.lax.while_loop(cond, step, init)
        mcu_rem = final[7]
        err = final[11]
        idx_buf, val_buf = final[13], final[14]
        # Lanes that hit max_steps while still holding MCUs are *incomplete*
        # (the caller escalates max_steps and retries), distinct from decode
        # errors (corrupt stream).
        incomplete = (~err) & (mcu_rem > 0)
        out = jnp.zeros(out_size, jnp.int16)
        out = out.at[idx_buf.reshape(-1)].set(val_buf.reshape(-1), mode="drop")
        return out, err, incomplete

    return jax.jit(decoder)


def decode_coefficients_on_device(params_list: Sequence[JpegStreamParams],
                                  tables: DeviceScanTables,
                                  packed: PackedSegments):
    """Run the wave decoder for one group. Returns (coeffs_flat jnp int16 of
    shape (B*total_blocks*64,), err bool array, geometry)."""
    p0 = params_list[0]
    geom = GroupGeometry.from_params(p0, len(params_list))
    # Hard symbol-count bound per lane: every symbol costs >= 1 bit, and a
    # block yields at most 65 symbols (1 DC + up to 63 AC + EOB).
    nslots = len(geom.comp_of_slot)
    block_bound = int(packed.mcu_count.max()) * nslots * 65
    bits_bound = packed.n_words * 32
    hard_bound = int(min(block_bound, bits_bound))
    # The emission buffers (and the final scatter) scale with max_steps, so
    # start from a typical-content estimate (~20 symbols per block) and
    # escalate 4x whenever a lane runs out of steps. Each size compiles once
    # (persistently cached); photos rarely escalate.
    est = int(packed.mcu_count.max()) * nslots * 20 + 64
    max_steps = min(-(-min(est, hard_bound) // 256) * 256, hard_bound)
    args = (packed.words, packed.img_idx, packed.mcu_start, packed.mcu_count,
            tables.mincode, tables.maxcode, tables.valptr, tables.values)
    while True:
        fn = _compiled_wave_decoder(geom, int(packed.words.shape[0]),
                                    int(packed.n_words), max_steps)
        coeffs, err, incomplete = fn(*args)
        if not bool(np.asarray(incomplete).any()):
            break
        if max_steps >= hard_bound:
            err = err | incomplete  # ran the hard bound: stream is corrupt
            break
        max_steps = min(-(-(max_steps * 4) // 256) * 256, hard_bound)
    return coeffs, err, geom


def unflatten_coefficients(coeffs_flat, geom: GroupGeometry,
                           params: JpegStreamParams):
    """Split the flat coefficient tensor into per-component
    (B, bh, bw, 64) views (device arrays, no copy beyond reshape)."""
    out = []
    per_img = coeffs_flat.reshape(geom.batch, geom.total_blocks * 64)
    for ci in range(len(geom.comp_base)):
        base = geom.comp_base[ci]
        bw = geom.blocks_w[ci]
        nxt = (geom.comp_base[ci + 1] if ci + 1 < len(geom.comp_base)
               else geom.total_blocks)
        nblocks = nxt - base
        bh = nblocks // bw
        comp = per_img[:, base * 64:nxt * 64].reshape(geom.batch, bh, bw, 64)
        out.append(comp)
    return out
