// ThreadSanitizer harness for the multithreaded parser (SURVEY §5.2).
//
// The reference has a known data race (the shared lgamma memo cache mutated
// inside its OpenMP loop); this framework's device math is functionally pure
// and the only threaded native code is the parser + CSV writers. This driver
// links parser.cpp directly and exercises parse + both writers under many
// threads so TSAN can observe every cross-thread interaction.
//
// Build & run (tests/test_native_tsan.py):
//   g++ -std=c++17 -g -fsanitize=thread -O1 -pthread \
//       -o tsan_check tools/tsan_check.cpp sid_tpu/native/parser.cpp...
// (parser.cpp is self-contained; this file #includes nothing from it and
// uses the C ABI.)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

extern "C" {
void* sidtpu_parse(const char*, int64_t, int, int, int, int);
void sidtpu_free(void*);
int64_t sidtpu_num_sites(void*);
const int32_t* sidtpu_chrom_id(void*);
const int32_t* sidtpu_pos(void*);
const uint16_t* sidtpu_counts(void*);
const char* sidtpu_chrom_blob(void*);
int64_t sidtpu_chrom_blob_len(void*);
int64_t sidtpu_write_csv(const char*, int64_t, const int32_t*, const int32_t*,
                         const uint8_t*, const int32_t*, const int32_t*,
                         const double*, const double*, const char*, int64_t,
                         int, int, char**);
void sidtpu_buffer_free(char*);
double sidtpu_compound_nll_ld(const int32_t*, const int64_t*, const double*,
                              const double*, double, double, int64_t, int);
void sidtpu_lynch_marginals_ld(const int32_t*, const double*, const double*,
                               double, int64_t, long double*, long double*,
                               int);
int sidtpu_quality_finalize(const uint16_t*, const int32_t*, const int32_t*,
                            const double*, const double*, const double*,
                            int64_t, double, double, int, double, double,
                            int64_t, double*, double*, uint8_t*, int);
void sidtpu_lrt_pvalues(const double*, const double*, double*, int64_t, int);
}

int main() {
  // synthesize a pileup large enough to fan out across all threads
  std::string data;
  data.reserve(1 << 22);
  char line[128];
  for (int i = 0; i < 50000; ++i) {
    snprintf(line, sizeof line, "chr%d\t%d\tA\t6\t..,,AaT+2ggC^I.\tIIIIII\tJJJJJJ\n",
             1 + i % 20, i + 1);
    data += line;
  }
  void* res = sidtpu_parse(data.data(), (int64_t)data.size(), 1, 1, 1, 16);
  int64_t n = sidtpu_num_sites(res);
  if (n != 50000) {
    fprintf(stderr, "unexpected site count %lld\n", (long long)n);
    return 1;
  }
  // exercise the threaded CSV writer on the parsed columns
  std::vector<uint8_t> is_het(n, 0);
  std::vector<int32_t> major(n, 0), second(n, 1);
  std::vector<double> c1(n, 0.5), c2(n, 0.25);
  char* out = nullptr;
  int64_t len = sidtpu_write_csv(
      sidtpu_chrom_blob(res), sidtpu_chrom_blob_len(res),
      sidtpu_chrom_id(res), sidtpu_pos(res),
      is_het.data(), major.data(), second.data(), c1.data(), c2.data(),
      "p_value", n, 1, 16, &out);
  if (len <= 0) return 1;
  sidtpu_buffer_free(out);

  // threaded long-double Lynch kernels: >=4096 profiles engages threading
  {
    const int64_t U = 8192;
    std::vector<int32_t> prof(U * 4, 0);
    std::vector<int64_t> mult(U, 3);
    std::vector<double> mc_log(U, 2.5);
    for (int64_t u = 0; u < U; ++u) {
      prof[u * 4] = 20 + (int)(u % 17);
      prof[u * 4 + 1] = (int)(u % 5);
    }
    double nt[4] = {0.7, 0.2, 0.07, 0.03};
    double val = sidtpu_compound_nll_ld(prof.data(), mult.data(),
                                        mc_log.data(), nt, 1e-3, 1e-3, U, 16);
    if (!(val == val)) return 1;
    std::vector<long double> lhom(U), lhet(U);
    sidtpu_lynch_marginals_ld(prof.data(), mc_log.data(), nt, 1e-3, U,
                              lhom.data(), lhet.data(), 16);
  }

  // threaded fused quality finalize + LRT over the parsed sites
  {
    std::vector<int32_t> maj(n, 0), sec(n, 1);
    std::vector<double> lh(n, -12.0), lt(n, -14.0), p1(n), p2(n);
    std::vector<uint8_t> het(n);
    std::vector<double> tab(4096, 0.0);
    for (size_t k = 1; k < tab.size(); ++k) tab[k] = tab[k - 1] + 0.1;
    int rc = sidtpu_quality_finalize(
        sidtpu_counts(res), maj.data(), sec.data(), lh.data(), lt.data(),
        tab.data(), (int64_t)tab.size(), -0.01, -4.6, 1, 0.05, -11399.0, n,
        p1.data(), p2.data(), het.data(), 16);
    if (rc != 0) return 1;
  }
  // threaded LRT kernel (threads engage at >= 1<<16 elements)
  {
    const int64_t m = 1 << 17;
    std::vector<double> a(m, -3.0), b(m, -2.0), p(m);
    sidtpu_lrt_pvalues(a.data(), b.data(), p.data(), m, 16);
  }

  sidtpu_free(res);
  printf("tsan_check ok: %lld sites\n", (long long)n);
  return 0;
}
