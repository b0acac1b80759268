// Reference-equivalent baseline: single-threaded C++ `sid -m local` pipeline.
//
// Purpose: BASELINE.md's CPU anchor. The true reference (EvolBioInf/sid)
// needs GSL, which this environment lacks; this standalone binary implements
// the same observable pipeline with the same algorithmic structure and
// precision (long double likelihoods, per-profile classification, map join,
// default-ostream %g output) using only libm — so benchmarks have an honest
// single-core C++ comparison point and tests have a goldens generator.
//
// Structure mirrors the reference's flow (documented in SURVEY.md §3.1):
// read all lines -> parse -> unique profiles (sort) -> per-profile local
// classification -> per-site join -> CSV. Original code; grammar/semantics
// per SURVEY.md, not copied.
//
// Build: g++ -O2 -o sid_baseline sid_baseline.cpp
// Usage: sid_baseline [-p alpha] [-E err] [-r prior] input.pileup > out.csv

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <string>
#include <vector>

namespace {

struct Site {
  int32_t chrom_id;
  int32_t pos;
  std::array<uint16_t, 4> counts;
};

struct Cls {
  bool het;
  char g0, g1;
  double p1, p2;
};

double g_alpha = 0.05;
double g_err_cap = 0.1;
double g_prior = -1.0;

long double lgamma_int(int x) { return x == 0 ? 0.0L : lgammal((long double)x); }

long double multinomial(const std::array<uint16_t, 4>& p, int cov) {
  long double lg = lgamma_int(cov + 1);
  for (int i = 0; i < 4; ++i) lg -= lgamma_int(p[i] + 1);
  return expl(lg);
}

double chisq_q1(double x) { return erfc(sqrt(x / 2.0)); }

double lrt(long double l0, long double l1) {
  if (l0 == 0) return 0.0;
  long double chisq = -2 * (logl(l0) - logl(fmaxl(l0, l1)));
  return chisq_q1((double)chisq);
}

Cls classify(const std::array<uint16_t, 4>& p) {
  static const char* alleles = "ACGT";
  int cov = p[0] + p[1] + p[2] + p[3];
  // stable ascending index sort; positions 3, 2 are the top-2 alleles
  std::array<int, 4> idx = {0, 1, 2, 3};
  std::stable_sort(idx.begin(), idx.end(),
                   [&p](int a, int b) { return p[a] < p[b]; });
  int major = idx[3], second = idx[2];

  double e1 = (double)(cov - p[major]) / (double)cov;
  if (e1 > g_err_cap) e1 = g_err_cap;
  long double l1 = multinomial(p, cov) * powl((long double)(1.0 - e1), p[major]) *
                   powl((long double)(e1 / 3.0), cov - p[major]);

  int n12 = p[major] + p[second];
  double e2 = 1.5 * (double)(cov - n12) / (double)cov;
  if (e2 > g_err_cap) e2 = g_err_cap;
  long double l2 = multinomial(p, cov) *
                   powl((long double)((1.0 - 2.0 / 3.0 * e2) / 2.0), n12) *
                   powl((long double)(e2 / 3.0), cov - n12);

  if (g_prior > 0) {
    l1 *= (long double)(1.0 - g_prior);
    l2 *= (long double)g_prior;
  }
  Cls c;
  c.p1 = lrt(l2, l1);
  c.p2 = lrt(l1, l2);
  c.het = (l2 > l1) && (c.p2 < g_alpha);
  c.g0 = alleles[major];
  c.g1 = c.het ? alleles[second] : alleles[major];
  return c;
}

}  // namespace

int main(int argc, char** argv) {
  const char* path = nullptr;
  for (int i = 1; i < argc; ++i) {
    if (!strcmp(argv[i], "-p") && i + 1 < argc) g_alpha = atof(argv[++i]);
    else if (!strcmp(argv[i], "-E") && i + 1 < argc) g_err_cap = atof(argv[++i]);
    else if (!strcmp(argv[i], "-r") && i + 1 < argc) g_prior = atof(argv[++i]);
    else path = argv[i];
  }
  if (!path) {
    fprintf(stderr, "No file name given!\n");
    return 1;
  }
  FILE* f = fopen(path, "rb");
  if (!f) {
    fprintf(stderr, "Could not open file: %s\n", path);
    return 1;
  }
  fseek(f, 0, SEEK_END);
  long len = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::string buf(static_cast<size_t>(len), '\0');
  if (fread(&buf[0], 1, static_cast<size_t>(len), f) != static_cast<size_t>(len)) {
    fclose(f);
    return 1;
  }
  fclose(f);

  std::vector<Site> sites;
  std::vector<std::string> chroms;
  const char* p = buf.data();
  const char* end = p + len;
  while (p < end) {
    const char* nl = static_cast<const char*>(memchr(p, '\n', end - p));
    const char* le = nl ? nl : end;
    if (le > p) {
      // tokenize: chrom pos ref cov bases
      const char* toks[5];
      size_t lens[5];
      int ntok = 0;
      const char* q = p;
      while (q < le && ntok < 5) {
        while (q < le && (*q == ' ' || *q == '\t')) ++q;
        const char* s = q;
        while (q < le && *q != ' ' && *q != '\t') ++q;
        if (q > s) {
          toks[ntok] = s;
          lens[ntok] = q - s;
          ++ntok;
        }
      }
      if (ntok == 5 && lens[2] == 1) {
        Site site;
        std::string cname(toks[0], lens[0]);
        int32_t cid = -1;
        for (size_t i = 0; i < chroms.size(); ++i)
          if (chroms[i] == cname) { cid = (int32_t)i; break; }
        if (cid < 0) { cid = (int32_t)chroms.size(); chroms.push_back(cname); }
        site.chrom_id = cid;
        site.pos = atoi(std::string(toks[1], lens[1]).c_str());
        char ref = toks[2][0];
        char ref_up = (char)toupper(ref), ref_lo = (char)tolower(ref);
        site.counts = {0, 0, 0, 0};
        const char* b = toks[4];
        size_t n = lens[4];
        for (size_t i = 0; i < n; ++i) {
          char c = b[i];
          if (c == '.') c = ref_up;
          else if (c == ',') c = ref_lo;
          switch (c) {
            case 'a': case 'A': site.counts[0]++; break;
            case 'c': case 'C': site.counts[1]++; break;
            case 'g': case 'G': site.counts[2]++; break;
            case 't': case 'T': site.counts[3]++; break;
            case '^': ++i; break;
            case '+': case '-': {
              if (i + 1 < n && isdigit((unsigned char)b[i + 1])) {
                size_t j = i + 1;
                unsigned long length = 0;
                while (j < n && isdigit((unsigned char)b[j]))
                  length = length * 10 + (unsigned long)(b[j++] - '0');
                size_t next = j + length;
                if (next >= n) { i = n; break; }
                i = next - 1;
              }
              break;
            }
            default: break;
          }
        }
        sites.push_back(site);
      }
    }
    if (!nl) break;
    p = nl + 1;
  }

  // unique profiles + classification per profile (the reference's dedup)
  std::map<std::array<uint16_t, 4>, Cls> classes;
  for (const Site& s : sites) classes.emplace(s.counts, Cls{});
  for (auto& kv : classes) kv.second = classify(kv.first);

  // output
  std::string out;
  out.reserve(sites.size() * 48);
  out += "chrom,pos,label,gt,hom_conf,het_conf,conf_type\n";
  char num[64];
  for (const Site& s : sites) {
    const Cls& c = classes[s.counts];
    out += chroms[(size_t)s.chrom_id];
    snprintf(num, sizeof num, ",%d,", s.pos);
    out += num;
    out += c.het ? "het," : "hom,";
    out += c.g0;
    out += c.g1;
    snprintf(num, sizeof num, ",%g,%g,p_value\n", c.p1, c.p2);
    out += num;
  }
  fwrite(out.data(), 1, out.size(), stdout);
  return 0;
}
