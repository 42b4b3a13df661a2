// Standalone microbench for the SIMD index walkers: loads a JPEG, parses
// it with rjt_parse, builds RjtIndexJobs, and times rjt_index_scan8/16/32
// over N copies — kernel iteration without the Python harness.
//
// Build: g++ -O3 -std=c++17 csrc/bench_walk.cpp \
//            rocjpeg_tpu/runtime/librocjpeg_host.so -o build/bench_walk
// Usage: ./build/bench_walk [jpeg] [reps]
#include <algorithm>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {
// Mirrors csrc/rocjpeg_entropy.cpp's RjtParsedHeader (C ABI).
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
  int64_t scan_offset, scan_end;
  int32_t subsampling;
  int64_t num_mcus;
};
int rjt_parse(const uint8_t* buf, long n, RjtParsedHeader* out);

// Mirrors csrc/rocjpeg_entropy.cpp's RjtIndexJob (C ABI).
struct RjtIndexJob {
  const uint8_t* scan;
  long scan_len;
  int num_components;
  int interleaved;
  int total_mcus;
  int min_symbols;
  int h_samp[3], v_samp[3];
  int dc_table[3], ac_table[3];
  const uint8_t* dc_bits[4];
  const uint8_t* dc_values[4];
  const uint8_t* ac_bits[4];
  const uint8_t* ac_values[4];
  uint8_t* clean;
  int64_t* bit_off;
  int32_t* dc_out;
  int32_t* mcu_idx;
  int32_t* sym_count;
  long n_records;
  long n_found;
};
long rjt_index_scan8(RjtIndexJob** jobs, long n, long* clean_lens);
long rjt_index_scan16(RjtIndexJob** jobs, long n, long* clean_lens);
long rjt_index_scan32(RjtIndexJob** jobs, long n, long* clean_lens);
long rjt_index_scan16_available(void);
}

struct JobSet {
  RjtParsedHeader hdr;
  std::vector<RjtIndexJob> jobs;
  std::vector<RjtIndexJob*> ptrs;
  std::vector<std::vector<uint8_t>> cleans;
  std::vector<std::vector<int64_t>> bit_offs;
  std::vector<std::vector<int32_t>> dcs, mis, scs;
};

static void build(JobSet& js, const std::vector<uint8_t>& buf, int n,
                  int min_symbols) {
  if (rjt_parse(buf.data(), (long)buf.size(), &js.hdr)) {
    fprintf(stderr, "parse failed\n");
    exit(1);
  }
  RjtParsedHeader& h = js.hdr;
  long scan_len = h.scan_end - h.scan_offset;
  long n_rec = std::min(h.num_mcus, scan_len * 8 / min_symbols) + 2;
  js.jobs.resize(n);
  js.cleans.resize(n);
  js.bit_offs.resize(n);
  js.dcs.resize(n);
  js.mis.resize(n);
  js.scs.resize(n);
  for (int i = 0; i < n; ++i) {
    RjtIndexJob& j = js.jobs[i];
    std::memset(&j, 0, sizeof(j));
    j.scan = buf.data() + h.scan_offset;
    j.scan_len = scan_len;
    j.num_components = h.num_scan_components;
    j.interleaved = h.num_scan_components > 1;
    j.total_mcus = (int)h.num_mcus;
    j.min_symbols = min_symbols;
    for (int c = 0; c < h.num_scan_components; ++c) {
      j.h_samp[c] = h.h_samp[c];
      j.v_samp[c] = h.v_samp[c];
      j.dc_table[c] = h.scan_dc[c];
      j.ac_table[c] = h.scan_ac[c];
    }
    for (int t = 0; t < 2; ++t) {
      if (h.load_huff[t]) {
        j.dc_bits[t] = h.dc_bits[t];
        j.dc_values[t] = h.dc_vals[t];
        j.ac_bits[t] = h.ac_bits[t];
        j.ac_values[t] = h.ac_vals[t];
      }
    }
    js.cleans[i].assign(scan_len + 8, 0);
    js.bit_offs[i].resize(n_rec);
    js.dcs[i].resize(n_rec * 3);
    js.mis[i].resize(n_rec);
    js.scs[i].resize(n_rec);
    j.clean = js.cleans[i].data();
    j.bit_off = js.bit_offs[i].data();
    j.dc_out = js.dcs[i].data();
    j.mcu_idx = js.mis[i].data();
    j.sym_count = js.scs[i].data();
    j.n_records = n_rec;
  }
  js.ptrs.clear();
  for (int i = 0; i < n; ++i) js.ptrs.push_back(&js.jobs[i]);
}

int main(int argc, char** argv) {
  const char* path =
      argc > 1 ? argv[1] : "/root/reference/data/images/mug_420.jpg";
  int reps = argc > 2 ? atoi(argv[2]) : 5;
  FILE* f = fopen(path, "rb");
  if (!f) { perror("open"); return 1; }
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(sz);
  if (fread(buf.data(), 1, sz, f) != (size_t)sz) return 1;
  fclose(f);

  const int S = 256;
  long scan_len = 0;

  auto run = [&](const char* name, int n, auto fn) {
    JobSet js;
    build(js, buf, n, S);
    scan_len = js.jobs[0].scan_len;
    std::vector<long> lens(n);
    long rc = fn(js.ptrs.data(), n, lens.data());  // warm
    if (rc < 0) { printf("%-10s rc=%ld (skipped)\n", name, rc); return; }
    double best = 1e30;
    long recs = 0;
    int64_t sum = 0;
    for (int r = 0; r < reps; ++r) {
      build(js, buf, n, S);
      auto t0 = std::chrono::steady_clock::now();
      rc = fn(js.ptrs.data(), n, lens.data());
      auto t1 = std::chrono::steady_clock::now();
      if (rc < 0) { printf("%s rep rc=%ld\n", name, rc); return; }
      best = std::min(best,
                      std::chrono::duration<double>(t1 - t0).count());
      recs = js.jobs[0].n_found;
      for (long k = 0; k < recs; ++k) sum += js.bit_offs[0][k];
    }
    double mb = (double)scan_len * n / 1e6;
    printf("%-10s n=%2d  %7.1f ms  %6.2f ms/img  %5.0f MB/s  "
           "(recs/img %ld, chk %lld)\n",
           name, n, best * 1e3, best * 1e3 / n, mb / best, recs,
           (long long)sum);
  };

  run("scan8", 8, rjt_index_scan8);
  if (rjt_index_scan16_available()) {
    run("scan16", 16, rjt_index_scan16);
    run("scan32", 32, rjt_index_scan32);
  }
  printf("scan=%.2f MB/img\n", scan_len / 1e6);
  return 0;
}
