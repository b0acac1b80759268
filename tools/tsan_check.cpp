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
  sidtpu_free(res);
  printf("tsan_check ok: %lld sites\n", (long long)n);
  return 0;
}
