// Native host entropy decoder for rocjpeg_tpu.
//
// TPU-native equivalent of the reference's native CPU front-end: rocJPEG
// parses on the CPU (src/rocjpeg_parser.cpp) and entropy-decodes in the VCN
// ASIC; here baseline Huffman decode runs on host cores, parallelized over
// restart-interval segments (the DC predictor resets at every RSTn marker,
// making segments independent — the same property the reference forwards to
// hardware via slice_parameter_buffer.restart_interval, parser.cpp:374-390).
//
// Contract: bit-exact with the Python oracle in rocjpeg_tpu/core/entropy.py
// (same 16-bit-window LUT walk, same EXTEND semantics, natural-order int16
// output planes). Exposed as a C ABI consumed via ctypes from
// rocjpeg_tpu/runtime/native.py.
//
// Build: g++ -O3 -std=c++17 -shared -fPIC -pthread (see csrc/build.py).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int kMaxComponents = 3;
constexpr int kMaxTables = 4;

// Natural index of the k-th zigzag coefficient (ITU-T T.81 Figure 5).
constexpr uint8_t kZigzag[64] = {
    0,  1,  8,  16, 9,  2,  3,  10, 17, 24, 32, 25, 18, 11, 4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6,  7,  14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63};

struct DecodeLut {
  // Indexed by the next 16 scan bits: symbol + code length (0 = invalid).
  std::vector<uint8_t> sym;
  std::vector<uint8_t> len;

  int build(const uint8_t* bits, const uint8_t* values) {
    sym.assign(1u << 16, 0);
    len.assign(1u << 16, 0);
    uint32_t code = 0;
    int k = 0;
    for (int length = 1; length <= 16; ++length) {
      for (int i = 0; i < bits[length - 1]; ++i) {
        if (code >= (1u << length)) return -1;  // overlong code
        uint32_t lo = code << (16 - length);
        uint32_t hi = lo + (1u << (16 - length));
        std::memset(sym.data() + lo, values[k], hi - lo);
        std::memset(len.data() + lo, length, hi - lo);
        ++code;
        ++k;
      }
      code <<= 1;
    }
    return 0;
  }
};

// MSB-first bit reader over stuffed entropy data: 0xFF00 yields a literal
// 0xFF; 0xFF followed by anything else ends the segment (marker).
struct BitReader {
  const uint8_t* p;
  const uint8_t* end;
  uint64_t acc = 0;
  int bits = 0;
  long overrun = 0;  // bytes of zero padding shifted in past the end

  BitReader(const uint8_t* data, size_t n) : p(data), end(data + n) {}

  inline void refill() {
    while (bits <= 56) {
      uint8_t b = 0;
      if (p < end) {
        b = *p++;
        if (b == 0xFF) {
          if (p < end && *p == 0x00) {
            ++p;  // stuffed byte
          } else {
            // Marker: stop consuming; feed zeros (decode should be done).
            --p;
            b = 0;
            ++overrun;
          }
        }
      } else {
        ++overrun;
      }
      acc = (acc << 8) | b;
      bits += 8;
    }
  }

  inline uint32_t peek16() {
    refill();
    return (uint32_t)((acc >> (bits - 16)) & 0xFFFF);
  }

  inline void skip(int n) { bits -= n; }

  inline int32_t get_bits(int n) {
    refill();
    bits -= n;
    return (int32_t)((acc >> bits) & ((1u << n) - 1));
  }
};

inline int32_t extend(int32_t v, int s) {
  // T.81 F.2.2.1 EXTEND.
  return (v < (1 << (s - 1))) ? v - (1 << s) + 1 : v;
}

}  // namespace

extern "C" {

// One scan-decode job; caller (Python) fills pointers from parsed params and
// preallocated output arrays. All geometry is precomputed host-side.
struct RjtScanJob {
  const uint8_t* scan;
  long scan_len;
  int restart_interval;
  int num_components;   // components in the scan
  int interleaved;      // 0 => single-component raster (MCU = 1 block)
  int mcus_w;
  int total_mcus;
  // Per scan component:
  int h_samp[kMaxComponents];
  int v_samp[kMaxComponents];
  int dc_table[kMaxComponents];
  int ac_table[kMaxComponents];
  // Huffman table data per table id (bits: 16 entries; values: <=162):
  const uint8_t* dc_bits[kMaxTables];
  const uint8_t* dc_values[kMaxTables];
  const uint8_t* ac_bits[kMaxTables];
  const uint8_t* ac_values[kMaxTables];
  // Output planes, natural-order int16, shape (out_bh, out_bw, 64):
  int16_t* out[kMaxComponents];
  int out_bw[kMaxComponents];
  int num_threads;
};

// Error codes (mapped to Status.BAD_JPEG on the Python side).
enum {
  RJT_OK = 0,
  RJT_BAD_HUFFMAN_TABLE = 1,
  RJT_INVALID_CODE = 2,
  RJT_AC_OVERFLOW = 3,
  RJT_SCAN_EXHAUSTED = 4,
  RJT_BAD_SEGMENTS = 5,
};

namespace {

struct BlockPlanEntry {
  int comp;
  int dy;  // block row offset within MCU
  int dx;  // block col offset within MCU
  const DecodeLut* dc;
  const DecodeLut* ac;
};

// Decode MCUs [mcu_begin, mcu_end) from one entropy segment.
int decode_segment(const RjtScanJob& job,
                   const std::vector<BlockPlanEntry>& plan,
                   const uint8_t* seg, size_t seg_len, int mcu_begin,
                   int mcu_end) {
  BitReader br(seg, seg_len);
  int32_t dc_pred[kMaxComponents] = {0, 0, 0};
  for (int m = mcu_begin; m < mcu_end; ++m) {
    int my = m / job.mcus_w;
    int mx = m % job.mcus_w;
    for (const auto& pe : plan) {
      int ci = pe.comp;
      int vs = job.interleaved ? job.v_samp[ci] : 1;
      int hs = job.interleaved ? job.h_samp[ci] : 1;
      int by = my * vs + pe.dy;
      int bx = mx * hs + pe.dx;
      int16_t* out = job.out[ci] + ((long)by * job.out_bw[ci] + bx) * 64;
      std::memset(out, 0, 64 * sizeof(int16_t));

      // DC coefficient.
      uint32_t w = br.peek16();
      int s = pe.dc->sym[w];
      int length = pe.dc->len[w];
      if (length == 0) return RJT_INVALID_CODE;
      br.skip(length);
      int32_t diff = s ? extend(br.get_bits(s), s) : 0;
      dc_pred[ci] += diff;
      out[0] = (int16_t)dc_pred[ci];

      // AC coefficients.
      int k = 1;
      while (k < 64) {
        w = br.peek16();
        int rs = pe.ac->sym[w];
        length = pe.ac->len[w];
        if (length == 0) return RJT_INVALID_CODE;
        br.skip(length);
        int r = rs >> 4;
        int size = rs & 15;
        if (size == 0) {
          if (r != 15) break;  // EOB
          k += 16;             // ZRL
        } else {
          k += r;
          if (k > 63) return RJT_AC_OVERFLOW;
          out[kZigzag[k]] = (int16_t)extend(br.get_bits(size), size);
          ++k;
        }
      }
      if (br.overrun > 8) return RJT_SCAN_EXHAUSTED;
    }
  }
  return RJT_OK;
}

}  // namespace

int rjt_decode_scan(const RjtScanJob* jobp) {
  const RjtScanJob& job = *jobp;

  // Compile Huffman LUTs for the table ids used by the scan.
  DecodeLut dc_luts[kMaxTables], ac_luts[kMaxTables];
  bool built[kMaxTables] = {false, false, false, false};
  for (int c = 0; c < job.num_components; ++c) {
    for (int which = 0; which < 2; ++which) {
      int tid = which ? job.ac_table[c] : job.dc_table[c];
      if (tid < 0 || tid >= kMaxTables) return RJT_BAD_HUFFMAN_TABLE;
      if (!built[tid]) {
        if (!job.dc_bits[tid] || !job.ac_bits[tid])
          return RJT_BAD_HUFFMAN_TABLE;
        if (dc_luts[tid].build(job.dc_bits[tid], job.dc_values[tid]) ||
            ac_luts[tid].build(job.ac_bits[tid], job.ac_values[tid]))
          return RJT_BAD_HUFFMAN_TABLE;
        built[tid] = true;
      }
    }
  }

  // Block plan for one MCU.
  std::vector<BlockPlanEntry> plan;
  if (job.interleaved) {
    for (int c = 0; c < job.num_components; ++c)
      for (int v = 0; v < job.v_samp[c]; ++v)
        for (int u = 0; u < job.h_samp[c]; ++u)
          plan.push_back({c, v, u, &dc_luts[job.dc_table[c]],
                          &ac_luts[job.ac_table[c]]});
  } else {
    plan.push_back(
        {0, 0, 0, &dc_luts[job.dc_table[0]], &ac_luts[job.ac_table[0]]});
  }

  // Split the scan at RSTn markers (0xFFD0..0xFFD7). 0xFF00 is data.
  struct Seg {
    const uint8_t* p;
    size_t len;
  };
  std::vector<Seg> segs;
  {
    const uint8_t* s = job.scan;
    const uint8_t* end = s + job.scan_len;
    const uint8_t* seg_start = s;
    while (s + 1 < end) {
      if (s[0] == 0xFF && s[1] >= 0xD0 && s[1] <= 0xD7) {
        segs.push_back({seg_start, (size_t)(s - seg_start)});
        s += 2;
        seg_start = s;
      } else {
        ++s;
      }
    }
    segs.push_back({seg_start, (size_t)(end - seg_start)});
  }

  int ri = job.restart_interval > 0 ? job.restart_interval : job.total_mcus;
  int needed = ri > 0 ? (job.total_mcus + ri - 1) / ri : 1;
  if (needed <= 0) needed = 1;
  if ((int)segs.size() < needed) return RJT_BAD_SEGMENTS;

  // Decode segments in parallel; segment i covers MCUs [i*ri, min(...)).
  int nthreads = job.num_threads > 0 ? job.num_threads : 1;
  if (nthreads > needed) nthreads = needed;
  std::atomic<int> next(0);
  std::atomic<int> status(RJT_OK);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= needed || status.load() != RJT_OK) return;
      int mcu_begin = i * ri;
      int mcu_end = std::min((i + 1) * ri, job.total_mcus);
      int rc = decode_segment(job, plan, segs[i].p, segs[i].len, mcu_begin,
                              mcu_end);
      if (rc != RJT_OK) status.store(rc);
    }
  };
  if (nthreads <= 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    for (int t = 0; t < nthreads; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  return status.load();
}

// ---------------------------------------------------------------------------
// Native segment packer for the on-device wave entropy decoder
// (rocjpeg_tpu/ops/device_entropy.py). Splits a scan at RSTn markers,
// removes byte stuffing, and writes each segment's bytes into the TPU-ready
// (R, n_words, 128)-uint32 transposed word matrix: lane l = r*128 + li,
// byte i of the lane lands in word i>>2 at big-endian byte position within
// the little-endian uint32 — i.e. byte offset
//   (((r*n_words + (i>>2)) * 128 + li) * 4) + (3 - (i&3)).
// ---------------------------------------------------------------------------

// Phase 1: clean (unstuffed) byte length of each restart segment.
// Returns the number of segments found; lengths beyond max_segs are counted
// but not stored. Scans with memchr: runs between 0xFF bytes are counted in
// one step (JPEG entropy data is overwhelmingly non-0xFF).
long rjt_seg_lens(const uint8_t* data, long n, int* seg_lens, long max_segs) {
  const uint8_t* s = data;
  const uint8_t* end = data + n;
  long nseg = 0;
  long cur = 0;
  while (s < end) {
    const uint8_t* ff =
        (const uint8_t*)memchr(s, 0xFF, (size_t)(end - s));
    if (!ff) {
      cur += end - s;
      break;
    }
    cur += ff - s;
    s = ff;
    if (s + 1 < end) {
      uint8_t nx = s[1];
      if (nx == 0x00) {
        ++cur;  // stuffed 0xFF
        s += 2;
        continue;
      }
      if (nx >= 0xD0 && nx <= 0xD7) {
        if (nseg < max_segs) seg_lens[nseg] = (int)cur;
        ++nseg;
        cur = 0;
        s += 2;
        continue;
      }
    }
    ++cur;  // lone/terminal 0xFF copied as data
    ++s;
  }
  if (nseg < max_segs) seg_lens[nseg] = (int)cur;
  ++nseg;
  return nseg;
}

// Phase 2: write up to max_segs segments into the transposed word buffer,
// starting at global lane lane0. Returns segments written.
//
// Fast path: memchr finds the next 0xFF; the clean run before it is copied
// with big-endian word-composed 32-bit stores into the lane's strided
// column (word j of lane (r,li) lives at byte offset ((r*n_words+j)*128
// + li)*4 of the little-endian uint32 tensor).
long rjt_pack_rows(const uint8_t* data, long n, uint8_t* out, long lane0,
                   long n_words, long max_segs) {
  const uint8_t* s = data;
  const uint8_t* end = data + n;
  long seg = 0;
  long i = 0;  // clean byte index within current segment
  long lane = lane0;
  long r = lane >> 7, li = lane & 127;
  uint8_t* lane_base = out + ((r * n_words) * 128 + li) * 4;
  const long max_bytes = n_words * 4;

  auto emit = [&](uint8_t b) {
    if (i < max_bytes)
      lane_base[(i >> 2) * 512 + (3 - (i & 3))] = b;
    ++i;
  };
  auto emit_run = [&](const uint8_t* p, long len) {
    // Align to a word boundary of the clean index.
    while (len > 0 && (i & 3)) { emit(*p++); --len; }
    while (len >= 4 && i + 4 <= max_bytes) {
      uint32_t w = ((uint32_t)p[0] << 24) | ((uint32_t)p[1] << 16) |
                   ((uint32_t)p[2] << 8) | (uint32_t)p[3];
      std::memcpy(lane_base + (i >> 2) * 512, &w, 4);
      p += 4;
      i += 4;
      len -= 4;
    }
    while (len > 0) { emit(*p++); --len; }
  };
  while (s < end && seg < max_segs) {
    const uint8_t* ff =
        (const uint8_t*)memchr(s, 0xFF, (size_t)(end - s));
    if (!ff) {
      emit_run(s, end - s);
      break;
    }
    if (ff > s) emit_run(s, ff - s);
    s = ff;
    if (s + 1 < end) {
      uint8_t nx = s[1];
      if (nx == 0x00) {
        emit(0xFF);
        s += 2;
        continue;
      }
      if (nx >= 0xD0 && nx <= 0xD7) {
        ++seg;
        ++lane;
        r = lane >> 7;
        li = lane & 127;
        lane_base = out + ((r * n_words) * 128 + li) * 4;
        i = 0;
        s += 2;
        continue;
      }
    }
    emit(0xFF);
    ++s;
  }
  return seg < max_segs ? seg + 1 : seg;
}

// Dense variant of rjt_pack_rows: write up to max_segs segments into a
// DENSE big-endian word stream — segment k's bytes start at word
// word_off[k] (a precomputed exclusive prefix sum of ceil(len/4), so each
// segment is word-aligned and the stream carries no per-lane padding).
// The H2D payload this produces is the true entropy-coded size (~2x
// smaller than the lane-padded tensor, whose word count is bucketed to the
// LONGEST segment); the padded (R, n_words, 128) layout the wave kernel
// wants is reconstructed on-device by a gather (ops/device_entropy.py
// _expand_words). Returns segments written.
long rjt_pack_dense(const uint8_t* data, long n, uint8_t* out,
                    const int32_t* word_off, long max_segs) {
  const uint8_t* s = data;
  const uint8_t* end = data + n;
  long seg = 0;
  long i = 0;  // clean byte index within current segment
  uint8_t* seg_base = out + (long)word_off[0] * 4;

  auto emit = [&](uint8_t b) {
    seg_base[(i & ~3L) + (3 - (i & 3))] = b;
    ++i;
  };
  auto emit_run = [&](const uint8_t* p, long len) {
    while (len > 0 && (i & 3)) { emit(*p++); --len; }
    while (len >= 4) {
      uint32_t w = ((uint32_t)p[0] << 24) | ((uint32_t)p[1] << 16) |
                   ((uint32_t)p[2] << 8) | (uint32_t)p[3];
      std::memcpy(seg_base + i, &w, 4);
      p += 4;
      i += 4;
      len -= 4;
    }
    while (len > 0) { emit(*p++); --len; }
  };
  while (s < end && seg < max_segs) {
    const uint8_t* ff =
        (const uint8_t*)memchr(s, 0xFF, (size_t)(end - s));
    if (!ff) {
      emit_run(s, end - s);
      break;
    }
    if (ff > s) emit_run(s, ff - s);
    s = ff;
    if (s + 1 < end) {
      uint8_t nx = s[1];
      if (nx == 0x00) {
        emit(0xFF);
        s += 2;
        continue;
      }
      if (nx >= 0xD0 && nx <= 0xD7) {
        ++seg;
        if (seg < max_segs) seg_base = out + (long)word_off[seg] * 4;
        i = 0;
        s += 2;
        continue;
      }
    }
    emit(0xFF);
    ++s;
  }
  return seg < max_segs ? seg + 1 : seg;
}

// ---------------------------------------------------------------------------
// Native JPEG header parser — the C++ front-end mirroring the reference's
// RocJpegStreamParser (src/rocjpeg_parser.cpp:43-470) and bit-for-bit
// equivalent to the Python parser (rocjpeg_tpu/core/bitstream.py), which
// remains the portable fallback and oracle.
// ---------------------------------------------------------------------------

struct RjtParsedHeader {
  int32_t width, height, num_components;
  int32_t comp_id[4], h_samp[4], v_samp[4], quant_sel[4];
  uint8_t qtab[4][64];
  uint8_t load_qtab[4];
  uint8_t dc_bits[2][16], dc_vals[2][12];
  uint8_t ac_bits[2][16], ac_vals[2][162];
  uint8_t load_huff[2];
  int32_t num_scan_components;
  int32_t scan_comp_sel[4], scan_dc[4], scan_ac[4];
  int32_t restart_interval;
  int64_t scan_offset, scan_end;  // [scan_offset, scan_end) of the input
  int32_t subsampling;            // ChromaSubsampling enum value
  int64_t num_mcus;
};

namespace {

// ChromaSubsampling enum values (rocjpeg_tpu/types.py, mirroring
// api/rocjpeg.h:86-94 ordering). kCssUnknown MUST be -1 — it is the wire
// value ChromaSubsampling(...) constructs on the Python side, and UNKNOWN
// is a parse *result*, not a parse error (parser.cpp:432-470 classifies and
// lets the decoder reject later).
enum {
  kCss444 = 0, kCss440 = 1, kCss422 = 2, kCss420 = 3,
  kCss411 = 4, kCss400 = 5, kCssUnknown = -1,
};

int classify_css(int c1h, int c2h, int c3h, int c1v, int c2v, int c3v) {
  auto is = [&](int a, int b, int c, int d, int e, int f) {
    return c1h == a && c2h == b && c3h == c && c1v == d && c2v == e &&
           c3v == f;
  };
  if (is(1, 1, 1, 1, 1, 1) || is(2, 2, 2, 2, 2, 2) || is(4, 4, 4, 4, 4, 4))
    return kCss444;
  if (is(1, 1, 1, 2, 1, 1)) return kCss440;
  if (is(2, 1, 1, 1, 1, 1) || is(2, 1, 1, 2, 2, 2) || is(2, 2, 2, 2, 1, 1))
    return kCss422;
  if (is(2, 1, 1, 2, 1, 1)) return kCss420;
  if (is(4, 1, 1, 1, 1, 1)) return kCss411;
  if (c2h == 0 && c3h == 0 && c2v == 0 && c3v == 0 && c1h > 0 && c1v > 0)
    return kCss400;
  return kCssUnknown;
}

inline uint32_t be16(const uint8_t* p) {
  return ((uint32_t)p[0] << 8) | p[1];
}

}  // namespace

// Returns 0 on success, else a BAD_JPEG reason code (>0).
enum {
  RJT_PARSE_OK = 0,
  RJT_PARSE_NO_SOI = 10,
  RJT_PARSE_TRUNCATED = 11,
  RJT_PARSE_BAD_COMPONENTS = 12,
  RJT_PARSE_BAD_QTABLE = 13,
  RJT_PARSE_QTABLE_16BIT = 14,
  RJT_PARSE_BAD_HUFF = 15,
  RJT_PARSE_NO_DHT = 16,
  RJT_PARSE_NO_DQT = 17,
  RJT_PARSE_NO_SOS = 18,
  RJT_PARSE_BAD_SAMPLING = 19,
  RJT_PARSE_BAD_DRI = 20,
  RJT_PARSE_SOS_MISMATCH = 21,
};

int rjt_parse(const uint8_t* buf, long n, RjtParsedHeader* out) {
  std::memset(out, 0, sizeof(*out));
  out->subsampling = kCssUnknown;
  if (n < 4 || buf[0] != 0xFF || buf[1] != 0xD8) return RJT_PARSE_NO_SOI;

  long pos = 2;
  bool sos_found = false, dht_found = false, dqt_found = false;
  long scan_start = 0;

  while (!sos_found && pos < n) {
    while (pos < n && buf[pos] == 0xFF) ++pos;  // fill bytes
    if (pos >= n) break;
    uint8_t marker = buf[pos];
    ++pos;
    if (pos + 2 > n) break;
    long chunk_len = (long)be16(buf + pos);
    long next_chunk = pos + chunk_len;

    if (marker == 0xC0) {  // SOF0 (baseline only, parser.cpp:160)
      if (pos + 8 > n) return RJT_PARSE_TRUNCATED;
      out->height = (int32_t)be16(buf + pos + 3);
      out->width = (int32_t)be16(buf + pos + 5);
      out->num_components = buf[pos + 7];
      if (out->num_components > 3) return RJT_PARSE_BAD_COMPONENTS;
      long q = pos + 8;
      if (q + 3L * out->num_components > n) return RJT_PARSE_TRUNCATED;
      for (int i = 0; i < out->num_components; ++i) {
        out->comp_id[i] = buf[q];
        out->h_samp[i] = buf[q + 1] >> 4;
        out->v_samp[i] = buf[q + 1] & 0xF;
        out->quant_sel[i] = buf[q + 2];
        if (out->quant_sel[i] >= 4) return RJT_PARSE_BAD_QTABLE;
        q += 3;
      }
      int h0 = out->h_samp[0], v0 = out->v_samp[0];
      if (h0 == 0 || v0 == 0) return RJT_PARSE_BAD_SAMPLING;
      out->num_mcus = (long)((out->width + h0 * 8 - 1) / (h0 * 8)) *
                      ((out->height + v0 * 8 - 1) / (v0 * 8));
      int nc = out->num_components;
      out->subsampling = classify_css(
          out->h_samp[0], nc > 1 ? out->h_samp[1] : 0,
          nc > 2 ? out->h_samp[2] : 0, out->v_samp[0],
          nc > 1 ? out->v_samp[1] : 0, nc > 2 ? out->v_samp[2] : 0);
    } else if (marker == 0xC4) {  // DHT (parser.cpp:256)
      long length = chunk_len - 2;
      long q = pos + 2;
      while (length > 0) {
        if (q + 17 > n) return RJT_PARSE_TRUNCATED;
        uint8_t index = buf[q];
        ++q;
        bool is_ac = (index & 0xF0) != 0;
        int tid = index & 0x0F;
        if (tid >= 2) return RJT_PARSE_BAD_HUFF;
        long count = 0;
        for (int i = 0; i < 16; ++i) count += buf[q + i];
        if (q + 16 + count > n) return RJT_PARSE_TRUNCATED;
        if (is_ac) {
          if (count > 162) return RJT_PARSE_BAD_HUFF;
          std::memcpy(out->ac_bits[tid], buf + q, 16);
          std::memcpy(out->ac_vals[tid], buf + q + 16, count);
        } else {
          if (count > 12) return RJT_PARSE_BAD_HUFF;
          std::memcpy(out->dc_bits[tid], buf + q, 16);
          std::memcpy(out->dc_vals[tid], buf + q + 16, count);
        }
        out->load_huff[tid] = 1;
        q += 16 + count;
        length -= 1 + 16 + count;
      }
      dht_found = true;
    } else if (marker == 0xDB) {  // DQT (parser.cpp:217)
      long end = pos + chunk_len;
      long q = pos + 2;
      while (q < end) {
        if (q + 1 + 64 > n) return RJT_PARSE_TRUNCATED;
        uint8_t index = buf[q];
        ++q;
        if (index >> 4) return RJT_PARSE_QTABLE_16BIT;
        if (index >= 4) return RJT_PARSE_BAD_QTABLE;
        std::memcpy(out->qtab[index & 0x0F], buf + q, 64);
        out->load_qtab[index & 0x0F] = 1;
        q += 64;
      }
      dqt_found = true;
    } else if (marker == 0xDD) {  // DRI (parser.cpp:374)
      if (chunk_len != 4 || pos + 4 > n) return RJT_PARSE_BAD_DRI;
      out->restart_interval = (int32_t)be16(buf + pos + 2);
    } else if (marker == 0xDA) {  // SOS (parser.cpp:324)
      if (pos + 3 > n) return RJT_PARSE_TRUNCATED;
      int nsc = buf[pos + 2];
      if (nsc > 3) return RJT_PARSE_BAD_COMPONENTS;
      long q = pos + 3;
      if (q + 2L * nsc + 3 > n) return RJT_PARSE_TRUNCATED;
      out->num_scan_components = nsc;
      for (int i = 0; i < nsc; ++i) {
        int cid = buf[q];
        int table = buf[q + 1];
        q += 2;
        out->scan_comp_sel[i] = cid;
        out->scan_dc[i] = (table >> 4) & 0x0F;
        out->scan_ac[i] = table & 0x0F;
        if (out->scan_dc[i] >= 4 || out->scan_ac[i] >= 4)
          return RJT_PARSE_BAD_HUFF;
        if (i >= out->num_components || cid != out->comp_id[i])
          return RJT_PARSE_SOS_MISMATCH;
      }
      scan_start = q + 3;  // skip Ss, Se, Ah/Al
      sos_found = true;
    }
    pos = next_chunk;
  }

  if (!dht_found) return RJT_PARSE_NO_DHT;
  if (!dqt_found) return RJT_PARSE_NO_DQT;
  if (!sos_found) return RJT_PARSE_NO_SOS;

  // ParseEOI: slice data = [scan_start .. 0xFFD9) or rest of buffer.
  long end = n;
  for (const uint8_t* s = buf + scan_start;;) {
    const uint8_t* ff = (const uint8_t*)memchr(
        s, 0xFF, (size_t)(buf + n - s));
    if (!ff || ff + 1 >= buf + n) break;
    if (ff[1] == 0xD9) {
      end = ff - buf;
      break;
    }
    s = ff + 1;
  }
  out->scan_offset = scan_start;
  out->scan_end = end;
  return RJT_PARSE_OK;
}

int rjt_version() { return 3; }

}  // extern "C"
