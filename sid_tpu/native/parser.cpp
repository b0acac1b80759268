// High-throughput mpileup parser for sid-tpu (host runtime, C++17).
//
// Implements the exact grammar of the reference parser
// (/root/reference/pileup.cpp:13-167 — described, not copied): whitespace-run
// tokenization; read-bases column with './,' reference resolution, case =
// strand, '^x' skip, '+N'/'-N' indel skip, everything else dropped; Phred+33
// qualities decoded (byte-33) mod 256 then clamped to >= 1; base qualities
// paired positionally with surviving bases (missing -> 1).
//
// Parallelism: the buffer is split into newline-aligned byte ranges, one
// worker thread per range filling thread-local columnar buffers; ranges are
// concatenated in order afterwards, so output is byte-identical to a serial
// parse. This is the component the reference left as dead OpenMP code
// (call.cpp:22-50) — here it is the production path feeding device tensors.
//
// C ABI (ctypes): sidtpu_parse() returns an opaque result; accessors expose
// the columnar arrays; sidtpu_free() releases.

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct ChromTable {
  // first-appearance-ordered chromosome names (few; linear scan is fine)
  std::vector<std::string> names;
  int32_t id_of(const char* s, size_t n) {
    for (size_t i = 0; i < names.size(); ++i) {
      if (names[i].size() == n && memcmp(names[i].data(), s, n) == 0)
        return static_cast<int32_t>(i);
    }
    names.emplace_back(s, n);
    return static_cast<int32_t>(names.size() - 1);
  }
};

struct Shard {
  std::vector<int32_t> chrom_id;
  std::vector<int32_t> pos;
  std::vector<uint8_t> ref_base;
  std::vector<uint16_t> counts;  // 4 per site
  // reads (CSR), only filled when want_reads
  std::vector<int32_t> read_len;  // per site
  std::vector<int8_t> read_code;
  std::vector<uint8_t> read_strand;
  std::vector<uint8_t> read_bq;
  std::vector<uint8_t> read_mq;
  // errors: line numbers (1-based within the shard, fixed up at merge)
  std::vector<int64_t> err_line;
  std::vector<int32_t> err_code;  // 0 = malformed, 1 = missing mapping quals
  ChromTable chroms;
  int64_t lines_seen = 0;
};

inline bool is_sep(char c) { return c == ' ' || c == '\t'; }

struct Tok {
  const char* p;
  size_t n;
};

// split a line into whitespace-run-separated tokens; returns count
inline int tokenize(const char* s, const char* end, Tok* toks, int max_toks) {
  int k = 0;
  const char* p = s;
  while (p < end && k < max_toks) {
    while (p < end && is_sep(*p)) ++p;
    const char* q = p;
    while (q < end && !is_sep(*q)) ++q;
    if (q > p) {
      toks[k].p = p;
      toks[k].n = static_cast<size_t>(q - p);
      ++k;
    }
    p = q;
  }
  return k;
}

inline int32_t parse_atoi(const char* p, size_t n) {
  size_t i = 0;
  while (i < n && (p[i] == ' ' || (p[i] >= '\t' && p[i] <= '\r'))) ++i;
  long sign = 1;
  if (i < n && (p[i] == '+' || p[i] == '-')) {
    if (p[i] == '-') sign = -1;
    ++i;
  }
  long v = 0;
  while (i < n && p[i] >= '0' && p[i] <= '9') {
    v = v * 10 + (p[i] - '0');
    ++i;
  }
  return static_cast<int32_t>(sign * v);
}

// base byte -> code (0..3) and strand; -1 if not a base
inline int base_code(uint8_t b, int* strand) {
  switch (b) {
    case 'a': *strand = 0; return 0;
    case 'A': *strand = 1; return 0;
    case 'c': *strand = 0; return 1;
    case 'C': *strand = 1; return 1;
    case 'g': *strand = 0; return 2;
    case 'G': *strand = 1; return 2;
    case 't': *strand = 0; return 3;
    case 'T': *strand = 1; return 3;
    default: return -1;
  }
}

inline uint8_t to_upper_ascii(uint8_t c) {
  return (c >= 'a' && c <= 'z') ? static_cast<uint8_t>(c - 32) : c;
}
inline uint8_t to_lower_ascii(uint8_t c) {
  return (c >= 'A' && c <= 'Z') ? static_cast<uint8_t>(c + 32) : c;
}

// Branchless counting tables: kCountTables[ref][byte] -> 0..3 (A,C,G,T) or
// 4 (dropped). One table per possible reference byte so './,' resolve with
// no branches. Valid only for tokens without '^'/'+'/'-' escapes (pre-scan).
struct CountTables {
  uint8_t t[256][256];
  CountTables() {
    for (int ref = 0; ref < 256; ++ref) {
      for (int b = 0; b < 256; ++b) {
        int strand;
        int code = base_code(static_cast<uint8_t>(b), &strand);
        t[ref][b] = code >= 0 ? static_cast<uint8_t>(code) : 4;
      }
      int strand;
      uint8_t up = to_upper_ascii(static_cast<uint8_t>(ref));
      uint8_t lo = to_lower_ascii(static_cast<uint8_t>(ref));
      int cu = base_code(up, &strand);
      int cl = base_code(lo, &strand);
      t[ref]['.'] = cu >= 0 ? static_cast<uint8_t>(cu) : 4;
      t[ref][','] = cl >= 0 ? static_cast<uint8_t>(cl) : 4;
    }
  }
};
const CountTables kCountTables;

// counts-only fast path: no escapes possible in the token
inline void count_bases_fast(const char* s, size_t n, uint8_t ref,
                             uint16_t counts[4]) {
  const uint8_t* tbl = kCountTables.t[ref];
  uint32_t cnt[5] = {0, 0, 0, 0, 0};
  size_t i = 0;
  for (; i + 4 <= n; i += 4) {
    cnt[tbl[static_cast<uint8_t>(s[i])]]++;
    cnt[tbl[static_cast<uint8_t>(s[i + 1])]]++;
    cnt[tbl[static_cast<uint8_t>(s[i + 2])]]++;
    cnt[tbl[static_cast<uint8_t>(s[i + 3])]]++;
  }
  for (; i < n; ++i) cnt[tbl[static_cast<uint8_t>(s[i])]]++;
  for (int k = 0; k < 4; ++k)
    counts[k] = static_cast<uint16_t>(counts[k] + cnt[k]);
}

// parse one read-bases token; appends codes/strands, fills counts[4]
inline void parse_read_bases(const Tok& t, uint8_t ref, uint16_t counts[4],
                             bool want_reads, Shard& out) {
  const char* s = t.p;
  const size_t n = t.n;
  uint8_t ref_up = to_upper_ascii(ref), ref_lo = to_lower_ascii(ref);
  for (size_t i = 0; i < n; ++i) {
    uint8_t b = static_cast<uint8_t>(s[i]);
    if (b == '.') b = ref_up;
    else if (b == ',') b = ref_lo;
    int strand;
    int code = base_code(b, &strand);
    if (code >= 0) {
      counts[code] = static_cast<uint16_t>(counts[code] + 1);
      if (want_reads) {
        out.read_code.push_back(static_cast<int8_t>(code));
        out.read_strand.push_back(static_cast<uint8_t>(strand));
      }
    } else if (b == '^') {
      ++i;  // skip the mapping-quality char
    } else if (b == '+' || b == '-') {
      if (i + 1 < n && s[i + 1] >= '0' && s[i + 1] <= '9') {
        size_t j = i + 1;
        uint64_t length = 0;
        while (j < n && s[j] >= '0' && s[j] <= '9') {
          length = length * 10 + static_cast<uint64_t>(s[j] - '0');
          if (length > (1ull << 40)) length = (1ull << 40);  // clamp, see below
          ++j;
        }
        // skip the digits and that many inserted/deleted bases
        uint64_t next = static_cast<uint64_t>(j) + length;
        if (next >= n) break;
        i = static_cast<size_t>(next) - 1;  // loop ++i lands on next
      }
      // '+'/'-' not followed by a digit is ignored
    }
    // everything else ('$', '*', 'N', '<', '>', ...) dropped
  }
}

// decode a quality token: (byte-33) mod 256, clamped to >= 1
inline void parse_qualities(const Tok& t, std::vector<uint8_t>& out) {
  out.clear();
  out.reserve(t.n);
  for (size_t i = 0; i < t.n; ++i) {
    uint8_t b = static_cast<uint8_t>(t.p[i]);
    if (b == '\t' || b == '\n') break;  // cannot occur post-tokenize
    uint8_t q = static_cast<uint8_t>(b - 33);
    out.push_back(q < 1 ? 1 : q);
  }
}

void parse_range(const char* data, const char* end, bool want_bq, bool want_mq,
                 bool strict, Shard& out) {
  const bool want_reads = want_bq || want_mq;
  Tok toks[8];
  std::vector<uint8_t> bqv, mqv;
  const char* line = data;
  int64_t line_no = 0;
  while (line < end) {
    const char* nl = static_cast<const char*>(
        memchr(line, '\n', static_cast<size_t>(end - line)));
    const char* line_end = nl ? nl : end;
    ++line_no;
    if (line_end > line) {  // skip empty lines
      int nt = tokenize(line, line_end, toks, 8);
      // chrom pos ref cov bases [bq] [mq]; the bq column is positional even
      // when unparsed (the reference always consumes it)
      int needed = want_mq ? 7 : (want_bq ? 6 : 5);
      bool bad_ref = nt >= 3 && toks[2].n != 1;
      if (nt < needed || bad_ref) {
        out.err_line.push_back(line_no);
        // MALFORMED_OR_MISSING (code 1) whenever the mapping-quality column
        // is the missing one: with want_mq the spec's bq check fires first
        // only when bq itself is parsed (pileup_py.parse_pileup_line)
        bool missing_mq = want_mq && !bad_ref &&
            (nt == 6 || (nt == 5 && !want_bq));
        out.err_code.push_back(missing_mq ? 1 : 0);
        if (strict) return;
      } else {
        int32_t cid = out.chroms.id_of(toks[0].p, toks[0].n);
        out.chrom_id.push_back(cid);
        out.pos.push_back(parse_atoi(toks[1].p, toks[1].n));
        uint8_t ref = static_cast<uint8_t>(toks[2].p[0]);
        out.ref_base.push_back(ref);
        uint16_t counts[4] = {0, 0, 0, 0};
        size_t reads_before = out.read_code.size();
        // the fast path is grammar-exact only when no escape characters can
        // appear after './,' substitution: a reference byte of '^'/'+'/'-'
        // would turn substituted dots into escapes (pileup.cpp:78-83 then
        // :125-147 semantics), so those lines take the scalar path
        bool fast = !want_reads &&
            ref != '^' && ref != '+' && ref != '-' &&
            memchr(toks[4].p, '^', toks[4].n) == nullptr &&
            memchr(toks[4].p, '+', toks[4].n) == nullptr &&
            memchr(toks[4].p, '-', toks[4].n) == nullptr;
        if (fast) {
          count_bases_fast(toks[4].p, toks[4].n, ref, counts);
        } else {
          parse_read_bases(toks[4], ref, counts, want_reads, out);
        }
        for (int k = 0; k < 4; ++k) out.counts.push_back(counts[k]);
        if (want_reads) {
          size_t nb = out.read_code.size() - reads_before;
          out.read_len.push_back(static_cast<int32_t>(nb));
          if (want_bq) parse_qualities(toks[5], bqv); else bqv.clear();
          if (want_mq) parse_qualities(toks[6], mqv); else mqv.clear();
          for (size_t j = 0; j < nb; ++j) {
            out.read_bq.push_back(j < bqv.size() ? bqv[j] : 1);
            out.read_mq.push_back(want_mq && j < mqv.size() ? mqv[j] : 1);
          }
        }
      }
    }
    if (!nl) break;
    line = nl + 1;
  }
  out.lines_seen = line_no;
}

struct Result {
  std::vector<int32_t> chrom_id;
  std::vector<int32_t> pos;
  std::vector<uint8_t> ref_base;
  std::vector<uint16_t> counts;
  std::vector<int64_t> read_offsets;
  std::vector<int8_t> read_code;
  std::vector<uint8_t> read_strand;
  std::vector<uint8_t> read_bq;
  std::vector<uint8_t> read_mq;
  std::vector<int64_t> err_line;
  std::vector<int32_t> err_code;
  std::string chrom_blob;            // '\n'-joined names
  int64_t num_sites = 0;
};

template <typename T>
void concat_into(std::vector<T>& dst, std::vector<std::vector<T>*> srcs) {
  size_t total = 0;
  for (auto* s : srcs) total += s->size();
  dst.reserve(total);
  for (auto* s : srcs) dst.insert(dst.end(), s->begin(), s->end());
}

}  // namespace

extern "C" {

void* sidtpu_parse(const char* data, int64_t len, int want_bq, int want_mq,
                   int strict, int n_threads) {
  auto* res = new Result();
  const char* end = data + len;
  unsigned hw = std::thread::hardware_concurrency();
  int nt = n_threads > 0 ? n_threads : static_cast<int>(hw ? hw : 4);
  if (nt > 64) nt = 64;
  // newline-aligned range boundaries
  std::vector<const char*> bounds;
  bounds.push_back(data);
  for (int t = 1; t < nt; ++t) {
    const char* guess = data + (len * t) / nt;
    if (guess <= bounds.back()) continue;
    const char* nl = static_cast<const char*>(
        memchr(guess, '\n', static_cast<size_t>(end - guess)));
    const char* b = nl ? nl + 1 : end;
    if (b > bounds.back() && b < end) bounds.push_back(b);
  }
  bounds.push_back(end);
  size_t nshard = bounds.size() - 1;

  std::vector<Shard> shards(nshard);
  std::vector<std::thread> threads;
  for (size_t s = 0; s < nshard; ++s) {
    threads.emplace_back([&, s]() {
      parse_range(bounds[s], bounds[s + 1], want_bq != 0, want_mq != 0,
                  strict != 0, shards[s]);
    });
  }
  for (auto& t : threads) t.join();

  // merge: remap chromosome ids to global first-appearance order
  ChromTable global;
  int64_t line_base = 0;
  for (size_t s = 0; s < nshard; ++s) {
    Shard& sh = shards[s];
    std::vector<int32_t> remap(sh.chroms.names.size());
    for (size_t i = 0; i < sh.chroms.names.size(); ++i) {
      remap[i] = global.id_of(sh.chroms.names[i].data(), sh.chroms.names[i].size());
    }
    for (auto& c : sh.chrom_id) c = remap[c];
    for (auto& l : sh.err_line) l += line_base;
    line_base += sh.lines_seen;
  }
  {
    std::vector<std::vector<int32_t>*> v;
    for (auto& s : shards) v.push_back(&s.chrom_id);
    concat_into(res->chrom_id, v);
  }
  {
    std::vector<std::vector<int32_t>*> v;
    for (auto& s : shards) v.push_back(&s.pos);
    concat_into(res->pos, v);
  }
  {
    std::vector<std::vector<uint8_t>*> v;
    for (auto& s : shards) v.push_back(&s.ref_base);
    concat_into(res->ref_base, v);
  }
  {
    std::vector<std::vector<uint16_t>*> v;
    for (auto& s : shards) v.push_back(&s.counts);
    concat_into(res->counts, v);
  }
  if (want_bq || want_mq) {
    res->read_offsets.reserve(res->pos.size() + 1);
    res->read_offsets.push_back(0);
    for (auto& s : shards) {
      for (int32_t l : s.read_len)
        res->read_offsets.push_back(res->read_offsets.back() + l);
    }
    std::vector<std::vector<int8_t>*> vc;
    for (auto& s : shards) vc.push_back(&s.read_code);
    concat_into(res->read_code, vc);
    std::vector<std::vector<uint8_t>*> vs;
    for (auto& s : shards) vs.push_back(&s.read_strand);
    concat_into(res->read_strand, vs);
    std::vector<std::vector<uint8_t>*> vb;
    for (auto& s : shards) vb.push_back(&s.read_bq);
    concat_into(res->read_bq, vb);
    std::vector<std::vector<uint8_t>*> vm;
    for (auto& s : shards) vm.push_back(&s.read_mq);
    concat_into(res->read_mq, vm);
  }
  {
    std::vector<std::vector<int64_t>*> v;
    for (auto& s : shards) v.push_back(&s.err_line);
    concat_into(res->err_line, v);
    std::vector<std::vector<int32_t>*> v2;
    for (auto& s : shards) v2.push_back(&s.err_code);
    concat_into(res->err_code, v2);
  }
  for (const auto& name : global.names) {
    uint32_t len = static_cast<uint32_t>(name.size());
    res->chrom_blob.append(reinterpret_cast<const char*>(&len), 4);
    res->chrom_blob += name;
  }
  res->num_sites = static_cast<int64_t>(res->pos.size());
  return res;
}

void sidtpu_free(void* r) { delete static_cast<Result*>(r); }

int64_t sidtpu_num_sites(void* r) { return static_cast<Result*>(r)->num_sites; }
int64_t sidtpu_num_reads(void* r) {
  return static_cast<int64_t>(static_cast<Result*>(r)->read_code.size());
}
int64_t sidtpu_num_errors(void* r) {
  return static_cast<int64_t>(static_cast<Result*>(r)->err_line.size());
}
const int32_t* sidtpu_chrom_id(void* r) { return static_cast<Result*>(r)->chrom_id.data(); }
const int32_t* sidtpu_pos(void* r) { return static_cast<Result*>(r)->pos.data(); }
const uint8_t* sidtpu_ref_base(void* r) { return static_cast<Result*>(r)->ref_base.data(); }
const uint16_t* sidtpu_counts(void* r) { return static_cast<Result*>(r)->counts.data(); }
const int64_t* sidtpu_read_offsets(void* r) { return static_cast<Result*>(r)->read_offsets.data(); }
const int8_t* sidtpu_read_code(void* r) { return static_cast<Result*>(r)->read_code.data(); }
const uint8_t* sidtpu_read_strand(void* r) { return static_cast<Result*>(r)->read_strand.data(); }
const uint8_t* sidtpu_read_bq(void* r) { return static_cast<Result*>(r)->read_bq.data(); }
const uint8_t* sidtpu_read_mq(void* r) { return static_cast<Result*>(r)->read_mq.data(); }
const int64_t* sidtpu_err_line(void* r) { return static_cast<Result*>(r)->err_line.data(); }
const int32_t* sidtpu_err_code(void* r) { return static_cast<Result*>(r)->err_code.data(); }
const char* sidtpu_chrom_blob(void* r) { return static_cast<Result*>(r)->chrom_blob.data(); }
int64_t sidtpu_chrom_blob_len(void* r) {
  return static_cast<int64_t>(static_cast<Result*>(r)->chrom_blob.size());
}

}  // extern "C"

// ---------------------------------------------------------------------------

namespace {

// length-prefixed chromosome table: [u32 len][bytes]... (names may contain
// any byte, including NUL and newline)
std::vector<std::string> split_chrom_blob(const char* blob, int64_t blob_len) {
  std::vector<std::string> out;
  int64_t i = 0;
  while (i + 4 <= blob_len) {
    uint32_t len;
    memcpy(&len, blob + i, 4);
    i += 4;
    if (i + static_cast<int64_t>(len) > blob_len) break;
    out.emplace_back(blob + i, len);
    i += len;
  }
  return out;
}

}  // namespace

// CSV writer: formats output records exactly like the reference's ostream
// serializer (call.hpp:29-38) — glibc printf "%g" for the two confidence
// doubles (C++ default ostream precision 6), "hom"/"het" labels, genotype
// from the top-2 allele indices. Multithreaded over row ranges.

namespace {

const char kAlleles[] = "ACGT";

void write_rows(const std::vector<std::string>& chroms, const int32_t* chrom_id,
                const int32_t* pos, const uint8_t* is_het, const int32_t* major,
                const int32_t* second, const double* conf_hom,
                const double* conf_het, const char* conf_type, int64_t begin,
                int64_t end, std::string& out) {
  char num[64];
  for (int64_t i = begin; i < end; ++i) {
    out += chroms[static_cast<size_t>(chrom_id[i])];
    out += ',';
    snprintf(num, sizeof num, "%d", pos[i]);
    out += num;
    bool het = is_het[i] != 0;
    out += het ? ",het," : ",hom,";
    char a = kAlleles[major[i] & 3];
    out += a;
    out += het ? kAlleles[second[i] & 3] : a;
    out += ',';
    snprintf(num, sizeof num, "%g", conf_hom[i]);
    out += num;
    out += ',';
    snprintf(num, sizeof num, "%g", conf_het[i]);
    out += num;
    out += ',';
    out += conf_type;
    out += '\n';
  }
}

}  // namespace

extern "C" {

// Returns a malloc'd buffer in *out (caller frees with sidtpu_buffer_free);
// return value is the byte length.
int64_t sidtpu_write_csv(const char* chrom_blob, int64_t chrom_blob_len,
                         const int32_t* chrom_id,
                         const int32_t* pos, const uint8_t* is_het,
                         const int32_t* major, const int32_t* second,
                         const double* conf_hom, const double* conf_het,
                         const char* conf_type, int64_t n, int with_header,
                         int n_threads, char** out) {
  // split the '\n'-joined chromosome table
  std::vector<std::string> chroms = split_chrom_blob(chrom_blob, chrom_blob_len);
  unsigned hw = std::thread::hardware_concurrency();
  int nt = n_threads > 0 ? n_threads : static_cast<int>(hw ? hw : 4);
  if (nt > 64) nt = 64;
  if (static_cast<int64_t>(nt) > n) nt = n > 0 ? static_cast<int>(n) : 1;

  std::vector<std::string> parts(static_cast<size_t>(nt));
  std::vector<std::thread> threads;
  for (int t = 0; t < nt; ++t) {
    int64_t begin = n * t / nt;
    int64_t end = n * (t + 1) / nt;
    threads.emplace_back([&, t, begin, end]() {
      parts[static_cast<size_t>(t)].reserve(
          static_cast<size_t>((end - begin) * 48));
      write_rows(chroms, chrom_id, pos, is_het, major, second, conf_hom,
                 conf_het, conf_type, begin, end, parts[static_cast<size_t>(t)]);
    });
  }
  for (auto& th : threads) th.join();

  static const char kHeader[] = "chrom,pos,label,gt,hom_conf,het_conf,conf_type\n";
  size_t total = with_header ? sizeof(kHeader) - 1 : 0;
  for (auto& p : parts) total += p.size();
  char* buf = static_cast<char*>(malloc(total + 1));
  char* w = buf;
  if (with_header) {
    memcpy(w, kHeader, sizeof(kHeader) - 1);
    w += sizeof(kHeader) - 1;
  }
  for (auto& p : parts) {
    memcpy(w, p.data(), p.size());
    w += p.size();
  }
  *w = '\0';
  *out = buf;
  return static_cast<int64_t>(total);
}

void sidtpu_buffer_free(char* p) { free(p); }

// Batched glibc-libm erfc: the exact_pvalues path computes LRT p-values
// erfc(sqrt(chisq/2)) on the host with the same libm the long-double oracle
// uses (math.erfc), so device/oracle CSV parity is independent of the XLA
// backend's erfc approximation (stats.cpp:33's gsl_cdf_chisq_Q analogue).
void sidtpu_erfc(const double* x, double* out, int64_t n) {
  for (int64_t i = 0; i < n; ++i) out[i] = erfc(x[i]);
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Indexed CSV writer: per-profile classifications joined to sites.
//
// For the profile-deduplicated methods (local/bayes/likelihood_ratio) the
// label/genotype/confidence columns depend only on the site's unique profile,
// so the expensive "%g" formatting runs once per *class* (U ~ 10^3..10^5) and
// each row is assembled as chrom,pos + a memcpy of the class suffix.

extern "C" {

int64_t sidtpu_write_csv_indexed(
    const char* chrom_blob, int64_t chrom_blob_len,
    const int32_t* chrom_id, const int32_t* pos,
    const int32_t* class_idx, int64_t n, const uint8_t* cls_is_het,
    const int32_t* cls_major, const int32_t* cls_second,
    const double* cls_conf_hom, const double* cls_conf_het, int64_t n_cls,
    const char* conf_type, int with_header, int n_threads, char** out) {
  std::vector<std::string> chroms = split_chrom_blob(chrom_blob, chrom_blob_len);
  // pre-format per-class suffix: ",label,gt,hom_conf,het_conf,conf_type\n"
  std::vector<std::string> suffix(static_cast<size_t>(n_cls));
  {
    char num[64];
    for (int64_t c = 0; c < n_cls; ++c) {
      std::string& s = suffix[static_cast<size_t>(c)];
      bool het = cls_is_het[c] != 0;
      s += het ? ",het," : ",hom,";
      char a = kAlleles[cls_major[c] & 3];
      s += a;
      s += het ? kAlleles[cls_second[c] & 3] : a;
      s += ',';
      snprintf(num, sizeof num, "%g", cls_conf_hom[c]);
      s += num;
      s += ',';
      snprintf(num, sizeof num, "%g", cls_conf_het[c]);
      s += num;
      s += ',';
      s += conf_type;
      s += '\n';
    }
  }
  unsigned hw = std::thread::hardware_concurrency();
  int nt = n_threads > 0 ? n_threads : static_cast<int>(hw ? hw : 4);
  if (nt > 64) nt = 64;
  if (static_cast<int64_t>(nt) > n) nt = n > 0 ? static_cast<int>(n) : 1;

  // raw-pointer row assembly: per-thread buffer sized from worst-case row
  size_t max_chrom = 1, max_suffix = 1;
  for (auto& c : chroms) max_chrom = c.size() > max_chrom ? c.size() : max_chrom;
  for (auto& s : suffix) max_suffix = s.size() > max_suffix ? s.size() : max_suffix;
  const size_t row_cap = max_chrom + 1 + 12 + max_suffix;

  std::vector<std::string> parts(static_cast<size_t>(nt));
  std::vector<std::thread> threads;
  for (int t = 0; t < nt; ++t) {
    int64_t begin = n * t / nt;
    int64_t end = n * (t + 1) / nt;
    threads.emplace_back([&, t, begin, end]() {
      std::string& o = parts[static_cast<size_t>(t)];
      o.resize(static_cast<size_t>(end - begin) * row_cap);
      char* base = &o[0];
      char* w = base;
      for (int64_t i = begin; i < end; ++i) {
        const std::string& ch = chroms[static_cast<size_t>(chrom_id[i])];
        memcpy(w, ch.data(), ch.size());
        w += ch.size();
        *w++ = ',';
        // inline unsigned itoa (positions are int32; negatives via sign)
        int32_t v = pos[i];
        if (v < 0) { *w++ = '-'; }
        uint32_t uv = v < 0 ? static_cast<uint32_t>(-(int64_t)v)
                            : static_cast<uint32_t>(v);
        char tmp[12];
        int k = 0;
        do { tmp[k++] = static_cast<char>('0' + uv % 10); uv /= 10; } while (uv);
        while (k) *w++ = tmp[--k];
        const std::string& sf = suffix[static_cast<size_t>(class_idx[i])];
        memcpy(w, sf.data(), sf.size());
        w += sf.size();
      }
      o.resize(static_cast<size_t>(w - base));
    });
  }
  for (auto& th : threads) th.join();

  static const char kHeader2[] = "chrom,pos,label,gt,hom_conf,het_conf,conf_type\n";
  size_t total = with_header ? sizeof(kHeader2) - 1 : 0;
  for (auto& p : parts) total += p.size();
  char* buf = static_cast<char*>(malloc(total + 1));
  char* w = buf;
  if (with_header) {
    memcpy(w, kHeader2, sizeof(kHeader2) - 1);
    w += sizeof(kHeader2) - 1;
  }
  for (auto& p : parts) {
    memcpy(w, p.data(), p.size());
    w += p.size();
  }
  *w = '\0';
  *out = buf;
  return static_cast<int64_t>(total);
}

}  // extern "C"
