"""Device-side DRI=0 entropy decode: the sync pass + the emission wave.

Replaces the sequential host index walk (pack_virtual_segments /
csrc rjt_index_scan*) for large restart-free scans — the realistic-workload
bottleneck (a 4K photographic scan is ~2.3 MB that one host core walks at
~140 MB/s). Here the host only unstuffs the scan (one vectorized native
pass) and ships the clean bits; chunk-parallel lanes on the TPU discover
the virtual restart points by Huffman self-synchronization
(kernels/sync_pallas.py), a chain check proves them correct by induction,
and the unmodified emission wave (kernels/wave_pallas.py) decodes the spans
with device-computed entry state (MCU index via segmented cumsum, DC
predictors via the existing dc-fixup epilogue).

Exactly one tiny device->host fetch happens per group (the (B+1,) vector of
per-image validity + the max span symbol count that sizes the emission
buffers); everything else stays asynchronous.

Images whose chain check fails — low-entropy streams can phase-lock the
speculative walk, and truly corrupt streams always fail — fall back to the
host-walk path per image; a consecutive-failure memo disables the sync
attempt for corpora that keep failing (see :func:`record_outcome`).

Content sensitivity (measured, round 4): self-synchronization depends on
the HUFFMAN TABLES, not just the content. Streams encoded with per-image
OPTIMIZED tables (like the reference's bundled mug corpus) sync within the
default margin; the Annex-K default tables phase-lock persistently on
synthetic photographic content — a bit-shifted walk stays valid
indefinitely and EVERY lane fails the chain proof (only healable one lane
per fixup round). This is a second reason — besides the measured 6-10x
round-3 slowdown — that the sync path is opt-in: its win is content-
conditional, while the host walk is not.

Reference context: the reference forwards restart metadata to the VCN ASIC
(src/rocjpeg_parser.cpp:374-390) and has no path at all for intra-image
parallelism on DRI=0 scans; this subsystem has no counterpart there.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.bitstream import JpegStreamParams
from . import device_entropy as de

LANE = 128
OVERSHOOT_BITS = 4096  # max allowed distance from a stop target to the
                       # next MCU boundary before a lane is declared lost


def _env_int(name: str, default: int) -> int:
    try:
        return int(os.environ.get(name, default))
    except ValueError:
        return default


def chunk_bytes() -> int:
    """Span length per sync lane (bytes; multiple of 4)."""
    return max(64, _env_int("ROCJPEG_TPU_SYNC_CB", 4096)) & ~3


def margin_bytes() -> int:
    """Speculative run-in before each chunk. Sync distance on the bundled
    mug corpus measured p50=560 / max=10718 bits (tools/sync_experiment.py);
    1536 bytes covers the observed max with ~15 percent slack."""
    return max(4, _env_int("ROCJPEG_TPU_SYNC_MARGIN", 1536)) & ~3


def min_scan_bytes() -> int:
    """Below this scan size the host walk is already cheap; skip the sync
    attempt (and its fixed per-group cost)."""
    return _env_int("ROCJPEG_TPU_SYNC_MIN", 65536)


_fail_memo: dict = {}
_fail_lock = __import__("threading").Lock()
_FAIL_LIMIT = 2
_MEMO_MAX = 256


def _memo_key(p: JpegStreamParams):
    return (int(p.chroma_subsampling), p.picture_width, p.picture_height,
            len(p.slice_data) >> 16)


def record_outcome(params_list, ok) -> None:
    """Track consecutive failed sync attempts per *image* signature; after
    _FAIL_LIMIT consecutive failures the sync path stops trying for that
    signature (the host-walk path serves it without paying the failed sync
    pass first). ``ok`` is the per-image chain-proof verdict (bool array
    aligned with params_list). Thread-safe and bounded: decoder threads
    mutate the memo concurrently, and signatures are evicted FIFO past
    _MEMO_MAX so a long-lived process cannot grow it without bound."""
    with _fail_lock:
        for p, good in zip(params_list, ok):
            k = _memo_key(p)
            if good:
                _fail_memo.pop(k, None)
            else:
                _fail_memo[k] = _fail_memo.get(k, 0) + 1
                while len(_fail_memo) > _MEMO_MAX:
                    _fail_memo.pop(next(iter(_fail_memo)))


def enabled(params_list: Sequence[JpegStreamParams]) -> bool:
    """Whether the device sync pass should attempt this group.

    Gated OFF by default (``ROCJPEG_TPU_SYNC=off``): round-3 on-chip A/B
    measured the sync pass at ~6-10x slower than the host index walk it
    replaces on the realistic DRI=0 corpora (dri0 1428 vs 222 Mpix/s, mug
    192.6 vs 19.6 — see docs/performance.md), so it must be opted into
    (``on`` forces it, ``auto`` applies the eligibility heuristics) until
    it beats the host walk."""
    mode = os.environ.get("ROCJPEG_TPU_SYNC", "off")
    if mode not in ("on", "auto"):
        return False
    if de.wave_backend() == "jnp" and mode != "on":
        return False
    from ..runtime import host_decode
    native = getattr(host_decode, "_native", None)
    if native is None or not getattr(native, "UNSTUFF_AVAILABLE", False):
        return False
    lo = min_scan_bytes()
    if any(len(p.slice_data) < lo for p in params_list):
        return False
    with _fail_lock:
        sigs = {_memo_key(p) for p in params_list}
        if all(_fail_memo.get(s, 0) >= _FAIL_LIMIT for s in sigs):
            return False
    return True


@functools.lru_cache(maxsize=32)
def _expand_shifted(R: int, n_words: int):
    """On-device window build for the emission pass: gather each lane's
    words from the shared clean stream and left-shift by the lane's entry
    bit phase, so lane bit 0 is exactly its span's first bit and the wave
    kernel needs no skip-bits support."""

    @jax.jit
    def expand(dense, word_off, skip):
        idx = (word_off.reshape(R, 1, LANE)
               + jnp.arange(n_words, dtype=jnp.int32).reshape(1, n_words, 1))
        w0 = jnp.take(dense, idx, axis=0, mode="clip")
        w1 = jnp.take(dense, idx + 1, axis=0, mode="clip")
        s = skip.reshape(R, 1, LANE).astype(jnp.uint32)
        return (w0 << s) | ((w1 >> 1) >> (31 - s))

    return expand


@functools.lru_cache(maxsize=32)
def _fixup_prep(n_lanes: int):
    """Inputs for a sync fixup round: lanes whose entry disagrees with the
    predecessor's (trusted) end — or whose own walk failed — restart AT that
    end with the true-walk state (found-at-init); everything else enters
    inert (done at init) and keeps its round-0 outputs on merge. When all
    chains already agree the round's kernel exits in one step, so running
    it unconditionally costs only its launch."""

    @jax.jit
    def f(g, end, status, valid, is_first, b_t, word_base):
        prev_end = jnp.roll(end, 1)
        prev_st = jnp.roll(status, 1)
        redo = ((valid == 1) & (is_first == 0) & (prev_st == 0)
                & ((prev_end != g) | (status != 0)))
        entry = jnp.maximum(prev_end, 0)
        abs0 = jnp.where(redo, entry, 0)
        a_t = abs0
        b_t2 = jnp.where(redo, b_t, 0)
        word_off = jnp.where(redo, word_base + (entry >> 5), 0)
        skip = jnp.where(redo, entry & 31, 0)
        return redo.astype(jnp.int32), abs0, a_t, b_t2, word_off, skip

    return f


@functools.lru_cache(maxsize=32)
def _merge8(n_lanes: int):
    @jax.jit
    def f(redo, old, new):
        r = redo.reshape(old[0].shape) == 1
        return tuple(jnp.where(r, nw, ol) for ol, nw in zip(old, new))
    return f


@functools.lru_cache(maxsize=32)
def _glue(n_lanes: int, B: int, batch: int, total_mcus: int, Lmax: int,
          span_max_bits: int):
    """Jitted post-sync bookkeeping: chain validation, segmented cumsums
    (absolute MCU index + DC predictor entering each span), the
    (batch, total_mcus) lane-of-MCU map for the DC fixup, and the single
    (B+1,) fetch vector [ok_img..., max_span_syms].

    span_max_bits: hard bound any recorded span must fit (the pass-B
    emission window); a longer span means a lost lane slipped through and
    the image is rejected rather than silently truncated (advisor r3)."""

    @jax.jit
    def f(g, end, spm, sps, dc0, dc1, dc2, status,
          valid, is_last, stream_b7, img_of, first_lane, lane_mat,
          word_base):
        v = valid == 1
        next_g = jnp.roll(g, -1)
        ok_lane = jnp.where(
            v,
            (status == 0) & (end - g <= span_max_bits) & jnp.where(
                is_last == 1,
                (end >= stream_b7) & (end <= stream_b7 + 7),
                end == next_g),
            True)
        bad_per_img = jnp.zeros(B, jnp.int32).at[img_of].add(
            jnp.where(v & ~ok_lane, 1, 0), mode="drop")
        spm_v = jnp.where(v, spm, 0)
        mcus_per_img = jnp.zeros(B, jnp.int32).at[img_of].add(
            spm_v, mode="drop")
        ok_img = (bad_per_img == 0) & (mcus_per_img == total_mcus)
        ok_full = jnp.take(ok_img, jnp.clip(img_of, 0, B - 1),
                           mode="clip") & v

        def seg_excl(x):
            xv = jnp.where(v, x, 0)
            cs = jnp.cumsum(xv) - xv
            off = jnp.take(cs, first_lane, mode="clip")
            return cs - jnp.take(off, jnp.clip(img_of, 0, B - 1),
                                 mode="clip")

        mcu_start = seg_excl(spm)
        mcu_count = jnp.where(ok_full, spm, 0)
        dc_flat = jnp.stack([seg_excl(dc0), seg_excl(dc1), seg_excl(dc2)],
                            axis=1)
        max_syms = jnp.max(jnp.where(ok_full, sps, 0))

        # lane_of_mcu: per image, which global lane decodes MCU m.
        rows = jnp.where(lane_mat >= 0,
                         jnp.take(mcu_start, jnp.clip(lane_mat, 0, None),
                                  mode="clip"),
                         total_mcus)                       # (B, Lmax)
        marr = jnp.arange(total_mcus, dtype=jnp.int32)

        def row_search(row, fl):
            loc = jnp.searchsorted(row, marr, side="right") - 1
            return fl + jnp.clip(loc, 0, Lmax - 1)

        lom = jax.vmap(row_search)(rows, first_lane)       # (B, total)
        lom = jnp.concatenate(
            [lom, jnp.zeros((batch - B, total_mcus), lom.dtype)], axis=0)
        fetch = jnp.concatenate([ok_img.astype(jnp.int32),
                                 max_syms.reshape(1)])
        word_off_b = word_base + (g >> 5)
        skip = g & 31
        return (fetch, mcu_start, mcu_count, dc_flat, lom, word_off_b, skip)

    return f


def _bucket256(n: int) -> int:
    b = 256
    while b < n:
        b += 256 if b < 2048 else b // 4
    return b


def decode_coefficients_sync(params_list: Sequence[JpegStreamParams],
                             tables: de.DeviceScanTables,
                             bank_of: Optional[np.ndarray],
                             batch: int):
    """Sync-pass + wave decode of one DRI=0 group. Returns
    (coeffs_flat, err_lanes, geom, dc_flat, lane_of_mcu, ok (B,) bool,
    lane_img (n_lanes,) int32) — or None when the group is ineligible.
    ok[i] False means image i was NOT decoded (its coefficient rows are
    garbage) and must be re-decoded by the caller via the host-walk path."""
    if not enabled(params_list):
        return None
    from ..kernels import wave_pallas
    from ..kernels import sync_pallas
    from ..runtime import host_decode
    native = host_decode._native

    p0 = params_list[0]
    B = len(params_list)
    geom = de.GroupGeometry.from_params(p0, batch)
    interleaved = len(p0.scan_components) > 1
    if interleaved:
        total = p0.num_mcus
    else:
        total = (((p0.picture_width + 7) // 8)
                 * ((p0.picture_height + 7) // 8))
    CB = chunk_bytes()
    MB = margin_bytes()

    # ---- host: unstuff + big-endian word stream (one contiguous run per
    # image; all lanes of an image share it) ----
    pool = de._pack_pool()
    cleans = list(pool.map(native.unstuff,
                           [p.slice_data for p in params_list])) \
        if B > 1 else [native.unstuff(p0.slice_data)]
    n_words_a = -(-((CB + MB) * 8 + 24 + OVERSHOOT_BITS) // 32) + 2
    n_words_a = -(-n_words_a // 8) * 8
    word_bases = []
    wacc = 0
    for c in cleans:
        word_bases.append(wacc)
        wacc += (len(c) + 3) // 4
    w_pad = de._bucket_fine(wacc + n_words_a + 2, 1 << 16)
    dense = np.zeros(w_pad, np.uint32)

    def _fill(i):
        c = cleans[i]
        nb = len(c)
        nw = (nb + 3) // 4
        pad = np.zeros(nw * 4, np.uint8)
        pad[:nb] = c
        dense[word_bases[i]:word_bases[i] + nw] = \
            pad.view(">u4").astype(np.uint32)

    if B > 1:
        list(pool.map(_fill, range(B)))
    else:
        _fill(0)

    # ---- lane tables ----
    counts = [max(1, -(-len(c) // CB)) for c in cleans]
    lane_starts = np.zeros(B + 1, np.int64)
    np.cumsum(counts, out=lane_starts[1:])
    n_real = int(lane_starts[-1])
    n_lanes = 256
    while n_lanes < n_real:
        n_lanes <<= 1
    R = n_lanes // LANE

    word_off_a = np.zeros(n_lanes, np.int32)
    abs0 = np.zeros(n_lanes, np.int32)
    a_t = np.zeros(n_lanes, np.int32)
    b_t = np.zeros(n_lanes, np.int32)
    valid = np.zeros(n_lanes, np.int32)
    is_first = np.zeros(n_lanes, np.int32)
    is_last = np.zeros(n_lanes, np.int32)
    stream_b7 = np.zeros(n_lanes, np.int32)
    img_of = np.full(n_lanes, B, np.int32)
    word_base_l = np.zeros(n_lanes, np.int32)
    img_base = np.zeros(n_lanes, np.int32)
    lane_bank = np.zeros(n_lanes, np.int32)
    Lmax = max(counts)
    lane_mat = np.full((B, Lmax), -1, np.int32)
    for i in range(B):
        l0, c = int(lane_starts[i]), counts[i]
        sl = slice(l0, l0 + c)
        j = np.arange(c, dtype=np.int64)
        start_b = np.maximum(0, j * CB - MB) & ~np.int64(3)
        sbits = len(cleans[i]) * 8
        word_off_a[sl] = word_bases[i] + (start_b >> 2)
        abs0[sl] = start_b * 8
        a_t[sl] = j * CB * 8
        bt = np.minimum((j + 1) * CB * 8, max(0, sbits - 7))
        bt[-1] = max(0, sbits - 7)
        b_t[sl] = bt
        valid[sl] = 1
        is_first[l0] = 1
        is_last[l0 + c - 1] = 1
        stream_b7[sl] = max(0, sbits - 7)
        img_of[sl] = i
        word_base_l[sl] = word_bases[i]
        img_base[sl] = i * geom.total_blocks
        if bank_of is not None:
            lane_bank[sl] = bank_of[i]
        lane_mat[i, :c] = np.arange(l0, l0 + c, dtype=np.int32)

    backend = de.wave_backend()
    # The sync kernel has no jnp twin: off-TPU it runs under the Pallas
    # interpreter (tests/test_sync_entropy.py forces this via
    # ROCJPEG_TPU_SYNC=on under the CPU backend).
    interpret = backend != "pallas"

    def lanes2(a):
        return a.reshape(R, LANE)

    n_banks = getattr(tables, "n_banks", 1)
    bank_args = (lanes2(lane_bank),) if n_banks > 1 else ()

    # ---- pass A: expand windows + sync kernel ----
    words_a = de._expand_words(R, n_words_a)(dense, lanes2(word_off_a))
    max_steps_a = (CB + MB) * 8 + OVERSHOOT_BITS + 256
    sync_fn = sync_pallas.build_sync_kernel(
        geom, n_lanes, n_words_a, max_steps_a, interpret=interpret,
        n_banks=n_banks, overshoot_bits=OVERSHOOT_BITS)
    outs = sync_fn(words_a, lanes2(abs0), lanes2(a_t), lanes2(b_t),
                   tables.lentab, tables.values, *bank_args)

    # Fixup rounds: lanes that missed sync (margin tail) restart from the
    # predecessor's end — the true boundary when the chain up to it holds.
    # Near-free when round 0 was already clean (all lanes finish at init).
    for _ in range(max(0, _env_int("ROCJPEG_TPU_SYNC_FIXUP", 2))):
        redo, abs0f, a_tf, b_tf, wof, skf = _fixup_prep(n_lanes)(
            outs[0].reshape(-1), outs[1].reshape(-1), outs[7].reshape(-1),
            valid, is_first, b_t, word_base_l)
        words_f = _expand_shifted(R, n_words_a)(dense, wof.reshape(R, LANE),
                                                skf.reshape(R, LANE))
        new = sync_fn(words_f, abs0f.reshape(R, LANE),
                      a_tf.reshape(R, LANE), b_tf.reshape(R, LANE),
                      tables.lentab, tables.values, *bank_args)
        outs = _merge8(n_lanes)(redo, outs, new)

    # Any recorded span must fit the pass-B window (the sync kernel enforces
    # end <= b_t + OVERSHOOT_BITS, and g >= a_t with b_t - a_t <= CB*8).
    span_max_bits = CB * 8 + OVERSHOOT_BITS
    n_words_b = -(-(span_max_bits + 63) // 32) + 2
    n_words_b = -(-n_words_b // 8) * 8

    flat = [x.reshape(-1) for x in outs]
    fetch, mcu_start, mcu_count, dc_flat, lom, word_off_b, skip = _glue(
        n_lanes, B, batch, total, Lmax, min(span_max_bits,
                                            32 * n_words_b - 64))(
        *flat, valid, is_last, stream_b7, img_of,
        lane_starts[:B].astype(np.int32), lane_mat, word_base_l)

    # The ONE host<->device sync of the group: per-image validity + the
    # span-symbol max that sizes the emission buffers.
    fetch_np = np.asarray(fetch)
    ok = fetch_np[:B].astype(bool)
    max_syms = int(fetch_np[B])
    # Emission-buffer bound (advisor r3, medium): fixed-byte chunks are not
    # symbol-balanced, so a low-entropy stream can put tens of thousands of
    # symbols in one span — and the wave's (max_steps, R, 128) idx/val
    # buffers scale with it (6 bytes per step per lane). Cap the HBM the
    # emission pass may allocate; groups past the cap are rejected to the
    # host-walk path (which symbol-balances its lanes) instead of risking
    # a multi-GB allocation / OOM.
    cap = _env_int("ROCJPEG_TPU_SYNC_MAX_SYMS", 0) \
        or max(2048, (384 << 20) // (6 * n_lanes))
    if max_syms > cap:
        ok[:] = False
    record_outcome(params_list, ok)
    if max_syms <= 0 or not ok.any():
        err = jnp.zeros(n_lanes, jnp.bool_)
        return (None, err, geom, None, None, ok, img_of)

    # ---- pass B: the unmodified emission wave over the proven spans ----
    max_steps = _bucket256(max_syms)
    words_b = _expand_shifted(R, n_words_b)(dense, lanes2(word_off_b),
                                            lanes2(skip))
    out_size = batch * geom.total_blocks * 64
    if backend.startswith("pallas"):
        fn = wave_pallas.build_wave_kernel(
            geom, n_lanes, n_words_b, max_steps, interpret=interpret,
            n_banks=n_banks)
        idx_buf, val_buf, err2 = fn(
            words_b, lanes2(img_base), lanes2(mcu_start),
            lanes2(mcu_count), tables.lentab, tables.values, *bank_args)
        coeffs = de._scatter_epilogue(out_size)(idx_buf, val_buf)
        err = (err2 > 0).reshape(-1)
    else:
        fn = de._compiled_wave_decoder(geom, n_lanes, n_words_b, max_steps,
                                       n_banks)
        coeffs, err = fn(words_b, lanes2(img_base), lanes2(mcu_start),
                         lanes2(mcu_count), tables.lentab, tables.values,
                         *bank_args)
    return (coeffs, err, geom, dc_flat, lom, ok, img_of)
