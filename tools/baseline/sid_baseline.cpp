// Reference-equivalent baseline: C++ sid pipeline, all four calling methods.
// Single-threaded except the quality method's site loop, which is an OpenMP
// parallel-for exactly like the reference's (call.cpp:309-310) so the bench
// ratio is measured against the reference's real shape on this host.
//
// Purpose: BASELINE.md's CPU anchor. The true reference (EvolBioInf/sid)
// needs GSL, which this environment lacks; this standalone binary implements
// the same observable pipeline with the same algorithmic structure and
// precision (long double likelihoods, per-profile classification, map join,
// default-ostream %g output) using only libm — so benchmarks have an honest
// single-core C++ comparison point per method and tests have a goldens
// generator.
//
// Structure mirrors the reference's flow (documented in SURVEY.md §3.1):
// read all lines -> parse -> unique profiles (sort) -> [Lynch fit via a
// GSL-rule nmsimplex2] -> per-profile classification -> per-site join ->
// CSV. Original code; grammar/semantics per SURVEY.md, not copied.
//
// Methods (reference call.cpp:62-372 semantics):
//   -m local              per-profile fixed-allele LRT (default)
//   -m bayes              Lynch fit -> posterior probabilities, cov>=4 only
//   -m likelihood_ratio   Lynch fit -> LRT + Benjamini-Hochberg, cov>=4 only
//   -m quality            per-read min(bq,mq) Phred model, every site
//
// Build: g++ -O2 -fopenmp -o sid_baseline sid_baseline.cpp -lm
// Usage: sid_baseline [-m method] [-p alpha] [-E err] [-r prior] [-R] \
//        input.pileup > out.csv

#include <algorithm>
#include <array>
#include <cfloat>
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
  // quality method only: per surviving read, base code and min(bq, mq)
  uint32_t read_off = 0, read_n = 0;
};

struct Cls {
  bool het;
  char g0, g1;
  double p1, p2;
};

double g_alpha = 0.05;
double g_err_cap = 0.1;
double g_prior = -1.0;
bool g_estimate_prior = false;
const char* g_method = "local";

long double lgamma_int(int x) { return x == 0 ? 0.0L : lgammal((long double)x); }

// exp of the double-precision lgamma combination (lynch.hpp:48-55)
long double multinomial(const std::array<uint16_t, 4>& p, int cov) {
  double lg = (double)lgamma_int(cov + 1);
  for (int i = 0; i < 4; ++i) lg -= (double)lgamma_int(p[i] + 1);
  return expl((long double)lg);
}

double chisq_q1(double x) { return erfc(sqrt(x / 2.0)); }

double lrt(long double l0, long double l1) {
  if (l0 == 0) return 0.0;
  long double chisq = -2 * (logl(l0) - logl(fmaxl(l0, l1)));
  return chisq_q1((double)chisq);
}

void major_second(const std::array<uint16_t, 4>& p, int* major, int* second) {
  // stable ascending index sort; positions 3, 2 are the top-2 alleles
  std::array<int, 4> idx = {0, 1, 2, 3};
  std::stable_sort(idx.begin(), idx.end(),
                   [&p](int a, int b) { return p[a] < p[b]; });
  *major = idx[3];
  *second = idx[2];
}

Cls classify_local(const std::array<uint16_t, 4>& p) {
  static const char* alleles = "ACGT";
  int cov = p[0] + p[1] + p[2] + p[3];
  int major, second;
  major_second(p, &major, &second);

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

// ---- Lynch compound model (lynch.hpp:57-90, lynch.cpp:37-61) ----

// homozygousLikelihood marginalized over the reference base
long double hom_marginal(const std::array<uint16_t, 4>& p, int cov, double e,
                         const double nt[4]) {
  double match = 1.0 - e;
  double err = e / 3.0;
  long double L = 0;
  for (int i = 0; i < 4; ++i)
    L += (long double)nt[i] * powl((long double)match, p[i]) *
         powl((long double)err, cov - p[i]);
  return multinomial(p, cov) * L;
}

// heterozygousLikelihood marginalized over base pairs
long double het_marginal(const std::array<uint16_t, 4>& p, int cov, double e,
                         const double nt[4]) {
  double match = (1.0 - 2.0 / 3.0 * e) / 2.0;
  double err = e / 3.0;
  long double L = 0;
  for (int i = 0; i < 4; ++i)
    for (int j = i + 1; j < 4; ++j) {
      double w = nt[i] * nt[j];
      int nij = p[i] + p[j];
      L += (long double)w * powl((long double)match, nij) *
           powl((long double)err, cov - nij);
    }
  long double s = 0;
  for (int i = 0; i < 4; ++i) s += (long double)(nt[i] * nt[i]);
  L /= (1.0L - s);
  return multinomial(p, cov) * L;
}

struct Hist {
  std::vector<std::array<uint16_t, 4>> profiles;
  std::vector<int64_t> mult;
  std::vector<int> cov;
};

// compoundLikelihood objective: -sum(mult * log L) as double, box penalty
double compound_nll(double pi, double eps, const Hist& h, const double nt[4]) {
  if (pi < 0 || pi > 1 || eps < 0 || eps > 1) return DBL_MAX;
  long double total = 0;
  for (size_t u = 0; u < h.profiles.size(); ++u) {
    long double L =
        (long double)(1.0 - pi) * hom_marginal(h.profiles[u], h.cov[u], eps, nt) +
        (long double)pi * het_marginal(h.profiles[u], h.cov[u], eps, nt);
    if (L > 0) total += logl(L) * (long double)h.mult[u];
  }
  if (isinfl(total)) total = total > 0 ? LDBL_MAX : -LDBL_MAX;
  return -(double)total;
}

// ---- nmsimplex2 (GSL update rule; see sid_tpu/exact/nmsimplex.py, the
// executable spec transcribed from the documented algorithm) ----

struct Simplex {
  // N = 2, P = 3
  double x[3][2];
  double y[3];
  double center[2];
  double S2;

  template <typename F>
  void init(const double x0[2], const double step[2], F f) {
    x[0][0] = x0[0]; x[0][1] = x0[1];
    y[0] = f(x[0]);
    for (int i = 0; i < 2; ++i) {
      x[i + 1][0] = x0[0]; x[i + 1][1] = x0[1];
      x[i + 1][i] += step[i];
      y[i + 1] = f(x[i + 1]);
    }
    compute_center();
    compute_size();
  }

  void compute_center() {
    double c0 = 0, c1 = 0;
    for (int i = 0; i < 3; ++i) { c0 += x[i][0]; c1 += x[i][1]; }
    center[0] = c0 / 3.0; center[1] = c1 / 3.0;
  }

  double compute_size() {
    double ss = 0;
    for (int i = 0; i < 3; ++i) {
      double d0 = x[i][0] - center[0], d1 = x[i][1] - center[1];
      double t = sqrt(d0 * d0 + d1 * d1);
      ss += t * t;
    }
    S2 = ss / 3.0;
    return sqrt(S2);
  }

  void try_move(double coeff, int corner, double out[2]) const {
    // running center of ALL corners: alpha=(1-c)P/(P-1), beta=(cP-1)/(P-1)
    double alpha = (1.0 - coeff) * 3.0 / 2.0;
    double beta = (coeff * 3.0 - 1.0) / 2.0;
    out[0] = alpha * center[0] + beta * x[corner][0];
    out[1] = alpha * center[1] + beta * x[corner][1];
  }

  void update_point(int i, const double xn[2], double val) {
    double d0 = xn[0] - x[i][0], d1 = xn[1] - x[i][1];
    double m0 = x[i][0] - center[0], m1 = x[i][1] - center[1];
    double d = sqrt(d0 * d0 + d1 * d1);
    double xmcd = m0 * d0 + m1 * d1;
    S2 += (2.0 / 3.0) * xmcd + (2.0 / 3.0) * (d * d / 3.0);
    center[0] += (xn[0] - x[i][0]) / 3.0;
    center[1] += (xn[1] - x[i][1]) / 3.0;
    x[i][0] = xn[0]; x[i][1] = xn[1];
    y[i] = val;
  }

  template <typename F>
  void contract_by_best(int best, F f) {
    for (int i = 0; i < 3; ++i)
      if (i != best) {
        x[i][0] = 0.5 * (x[i][0] + x[best][0]);
        x[i][1] = 0.5 * (x[i][1] + x[best][1]);
        y[i] = f(x[i]);
      }
    compute_center();
    compute_size();
  }

  double size() { return S2 > 0 ? sqrt(S2) : compute_size(); }

  template <typename F>
  void iterate(F f) {
    // GSL initialization quirk: dhi/dlo start at y[0], ds_hi at y[1]
    double dhi = y[0], dlo = y[0], ds_hi = y[1];
    int hi = 0, lo = 0, s_hi = 1;
    for (int i = 1; i < 3; ++i) {
      double v = y[i];
      if (v < dlo) { dlo = v; lo = i; }
      else if (v > dhi) { ds_hi = dhi; s_hi = hi; dhi = v; hi = i; }
      else if (v > ds_hi) { ds_hi = v; s_hi = i; }
    }
    double xc[2], xc2[2];
    try_move(-1.0, hi, xc);
    double val = f(xc);
    if (std::isfinite(val) && val < y[lo]) {
      try_move(-2.0, hi, xc2);
      double val2 = f(xc2);
      if (std::isfinite(val2) && val2 < y[lo]) update_point(hi, xc2, val2);
      else update_point(hi, xc, val);
    } else if (!std::isfinite(val) || val > y[s_hi]) {
      if (std::isfinite(val) && val <= y[hi]) update_point(hi, xc, val);
      try_move(0.5, hi, xc2);
      double val2 = f(xc2);
      if (std::isfinite(val2) && val2 <= y[hi]) update_point(hi, xc2, val2);
      else contract_by_best(lo, f);
    } else {
      update_point(hi, xc, val);
    }
  }
};

// The Lynch fit (lynch.cpp:17-35): start (1e-3,1e-3), step 1e-4, tol 1e-5
void fit_lynch(const Hist& h, const double nt[4], double* pi, double* eps) {
  auto f = [&](const double* t) { return compound_nll(t[0], t[1], h, nt); };
  Simplex s;
  double x0[2] = {1e-3, 1e-3}, step[2] = {1e-4, 1e-4};
  s.init(x0, step, f);
  int it = 0;
  bool converged = false;
  while (it < 1000) {
    ++it;
    s.iterate(f);
    if (s.size() < 1e-5) { converged = true; break; }
  }
  if (converged)
    fprintf(stderr, "# GSL function minimization converged in %d iterations.\n", it);
  else
    fprintf(stderr, "# Error: GSL function minimization did not converge in %d iterations!\n", it);
  int lo = 0;
  for (int i = 1; i < 3; ++i)
    if (s.y[i] < s.y[lo]) lo = i;
  *pi = s.x[lo][0];
  *eps = s.x[lo][1];
}

// adjustBenjaminiHochberg (stats.cpp:68-80)
void adjust_bh(std::vector<double>& p) {
  size_t m = p.size();
  if (m == 0) return;
  std::vector<size_t> order(m);
  for (size_t i = 0; i < m; ++i) order[i] = i;
  std::stable_sort(order.begin(), order.end(),
                   [&p](size_t a, size_t b) { return p[a] > p[b]; });
  std::vector<double> adj(m);
  adj[order[0]] = p[order[0]];
  for (size_t i = 1; i < m; ++i)
    adj[order[i]] =
        std::min(adj[order[i - 1]], p[order[i]] * (double)m / (double)(m - i));
  for (size_t i = 0; i < m; ++i) p[i] = std::min(adj[i], 1.0);
}

struct Parsed {
  std::vector<Site> sites;
  std::vector<std::string> chroms;
  // quality method: flat per-read code and min(bq, mq), CSR via Site offsets
  std::vector<uint8_t> rcode;
  std::vector<uint8_t> rq;
};

// parse the whole file (pileup.cpp grammar); wants_quality materializes reads
bool parse_file(const char* path, bool wants_quality, Parsed* out) {
  FILE* f = fopen(path, "rb");
  if (!f) {
    fprintf(stderr, "Could not open file: %s\n", path);
    return false;
  }
  fseek(f, 0, SEEK_END);
  long len = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::string buf(static_cast<size_t>(len), '\0');
  if (fread(&buf[0], 1, static_cast<size_t>(len), f) != static_cast<size_t>(len)) {
    fclose(f);
    return false;
  }
  fclose(f);

  std::vector<uint8_t> codes;  // per-line surviving base codes
  const int ntok_need = wants_quality ? 7 : 5;
  const char* p = buf.data();
  const char* end = p + len;
  while (p < end) {
    const char* nl = static_cast<const char*>(memchr(p, '\n', end - p));
    const char* le = nl ? nl : end;
    if (le > p) {
      const char* toks[7];
      size_t lens[7];
      int ntok = 0;
      const char* q = p;
      while (q < le && ntok < 7) {
        while (q < le && (*q == ' ' || *q == '\t')) ++q;
        const char* s = q;
        while (q < le && *q != ' ' && *q != '\t') ++q;
        if (q > s) {
          toks[ntok] = s;
          lens[ntok] = q - s;
          ++ntok;
        }
      }
      if (ntok >= ntok_need && lens[2] == 1) {
        Site site;
        std::string cname(toks[0], lens[0]);
        int32_t cid = -1;
        for (size_t i = 0; i < out->chroms.size(); ++i)
          if (out->chroms[i] == cname) { cid = (int32_t)i; break; }
        if (cid < 0) {
          cid = (int32_t)out->chroms.size();
          out->chroms.push_back(cname);
        }
        site.chrom_id = cid;
        site.pos = atoi(std::string(toks[1], lens[1]).c_str());
        char ref = toks[2][0];
        char ref_up = (char)toupper(ref), ref_lo = (char)tolower(ref);
        site.counts = {0, 0, 0, 0};
        codes.clear();
        const char* b = toks[4];
        size_t n = lens[4];
        for (size_t i = 0; i < n; ++i) {
          char c = b[i];
          if (c == '.') c = ref_up;
          else if (c == ',') c = ref_lo;
          int code = -1;
          switch (c) {
            case 'a': case 'A': code = 0; break;
            case 'c': case 'C': code = 1; break;
            case 'g': case 'G': code = 2; break;
            case 't': case 'T': code = 3; break;
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
          if (code >= 0) {
            site.counts[code]++;
            if (wants_quality) codes.push_back((uint8_t)code);
          }
        }
        if (wants_quality) {
          // qualities pair positionally with the filtered base list
          // (call.cpp:330-331); Phred+33, uint8 wrap, clamp >= 1
          site.read_off = (uint32_t)out->rcode.size();
          site.read_n = (uint32_t)codes.size();
          for (size_t j = 0; j < codes.size(); ++j) {
            uint8_t bq = j < lens[5] ? (uint8_t)(toks[5][j] - 33) : 1;
            uint8_t mq = j < lens[6] ? (uint8_t)(toks[6][j] - 33) : 1;
            if (bq < 1) bq = 1;
            if (mq < 1) mq = 1;
            out->rcode.push_back(codes[j]);
            out->rq.push_back(bq < mq ? bq : mq);
          }
        }
        out->sites.push_back(site);
      }
    }
    if (!nl) break;
    p = nl + 1;
  }
  return true;
}

Hist build_hist(const std::vector<Site>& sites,
                std::map<std::array<uint16_t, 4>, int64_t>* classes,
                int min_cov) {
  for (const Site& s : sites) (*classes)[s.counts]++;
  Hist h;
  for (auto it = classes->begin(); it != classes->end();) {
    int cov = it->first[0] + it->first[1] + it->first[2] + it->first[3];
    if (cov < min_cov) {
      it = classes->erase(it);
      continue;
    }
    h.profiles.push_back(it->first);
    h.mult.push_back(it->second);
    h.cov.push_back(cov);
    ++it;
  }
  return h;
}

void nucleotide_dist(const Hist& h, double nt[4]) {
  uint64_t acc[4] = {0, 0, 0, 0};
  for (size_t u = 0; u < h.profiles.size(); ++u)
    for (int i = 0; i < 4; ++i)
      acc[i] += (uint64_t)h.profiles[u][i] * (uint64_t)h.mult[u];
  uint64_t total = acc[0] + acc[1] + acc[2] + acc[3];
  for (int i = 0; i < 4; ++i)
    nt[i] = total ? (double)acc[i] / (double)total : 0.25;
}

double estimate_prior(const std::vector<Site>& sites) {
  std::map<std::array<uint16_t, 4>, int64_t> classes;
  Hist h = build_hist(sites, &classes, 4);
  double nt[4];
  nucleotide_dist(h, nt);
  double pi, eps;
  fit_lynch(h, nt, &pi, &eps);
  return pi;
}

void emit(const std::vector<Site>& sites, const std::vector<std::string>& chroms,
          const std::map<std::array<uint16_t, 4>, Cls>& classes,
          const char* conf_type, bool skip_missing) {
  std::string out;
  out.reserve(sites.size() * 48);
  out += "chrom,pos,label,gt,hom_conf,het_conf,conf_type\n";
  char num[96];
  for (const Site& s : sites) {
    auto it = classes.find(s.counts);
    if (it == classes.end()) {
      if (skip_missing) continue;  // cov<4 omitted (call.cpp:96,186)
      continue;
    }
    const Cls& c = it->second;
    out += chroms[(size_t)s.chrom_id];
    snprintf(num, sizeof num, ",%d,", s.pos);
    out += num;
    out += c.het ? "het," : "hom,";
    out += c.g0;
    out += c.g1;
    snprintf(num, sizeof num, ",%g,%g,%s\n", c.p1, c.p2, conf_type);
    out += num;
  }
  fwrite(out.data(), 1, out.size(), stdout);
}

int run_local(const Parsed& parsed) {
  if (g_estimate_prior) g_prior = estimate_prior(parsed.sites);
  std::map<std::array<uint16_t, 4>, Cls> classes;
  for (const Site& s : parsed.sites) classes.emplace(s.counts, Cls{});
  for (auto& kv : classes) kv.second = classify_local(kv.first);
  emit(parsed.sites, parsed.chroms, classes, "p_value", false);
  return 0;
}

int run_fit_method(const Parsed& parsed, bool bayes) {
  static const char* alleles = "ACGT";
  std::map<std::array<uint16_t, 4>, int64_t> counts_map;
  Hist h = build_hist(parsed.sites, &counts_map, 4);
  fprintf(stderr, "# unique profiles: %zu\n", h.profiles.size());
  double nt[4];
  nucleotide_dist(h, nt);
  double pi, eps;
  fit_lynch(h, nt, &pi, &eps);
  fprintf(stderr, "# heterozygosity: %e\n", pi);
  fprintf(stderr, "# error: %e\n", eps);

  size_t U = h.profiles.size();
  std::vector<long double> l_hom(U), l_het(U);
  for (size_t u = 0; u < U; ++u) {
    l_hom[u] = hom_marginal(h.profiles[u], h.cov[u], eps, nt);
    l_het[u] = het_marginal(h.profiles[u], h.cov[u], eps, nt);
  }

  std::map<std::array<uint16_t, 4>, Cls> classes;
  if (bayes) {
    for (size_t u = 0; u < U; ++u) {
      long double ah = l_hom[u] * (long double)(1.0 - pi);
      long double ae = l_het[u] * (long double)pi;
      long double denom = ah + ae;
      Cls c;
      c.p1 = (double)(ah / denom);
      c.p2 = (double)(ae / denom);
      c.het = c.p2 > c.p1;
      int major, second;
      major_second(h.profiles[u], &major, &second);
      c.g0 = alleles[major];
      c.g1 = c.het ? alleles[second] : alleles[major];
      classes.emplace(h.profiles[u], c);
    }
    emit(parsed.sites, parsed.chroms, classes, "probability", true);
  } else {
    if (g_estimate_prior)
      for (size_t u = 0; u < U; ++u) {
        l_het[u] *= (long double)pi;
        l_hom[u] *= (long double)(1.0 - pi);
      }
    std::vector<double> p1(U), p2(U);
    for (size_t u = 0; u < U; ++u) {
      p1[u] = lrt(l_het[u], l_hom[u]);
      p2[u] = lrt(l_hom[u], l_het[u]);
    }
    adjust_bh(p1);
    adjust_bh(p2);
    for (size_t u = 0; u < U; ++u) {
      Cls c;
      c.p1 = p1[u];
      c.p2 = p2[u];
      c.het = p2[u] < g_alpha;
      int major, second;
      major_second(h.profiles[u], &major, &second);
      c.g0 = alleles[major];
      c.g1 = c.het ? alleles[second] : alleles[major];
      classes.emplace(h.profiles[u], c);
    }
    emit(parsed.sites, parsed.chroms, classes, "p_value", true);
  }
  return 0;
}

// one site's quality-method classification (loop body of call.cpp:309-370)
struct QualityCall {
  double p1, p2;
  uint8_t major, second, het;
};

static QualityCall quality_site(const Parsed& parsed, const Site& s) {
  int major, second;
  major_second(s.counts, &major, &second);
  long double log_hom = 0, log_het = 0;
  for (uint32_t j = 0; j < s.read_n; ++j) {
    int code = parsed.rcode[s.read_off + j];
    double err = pow(10.0, (double)parsed.rq[s.read_off + j] / -10.0);
    log_hom += (code == major) ? log(1.0 - err) : log(err);
    bool top2 = code == major || code == second;
    log_het += top2 ? log(1.0 - 2.0 / 3.0 * err) : log(2.0 / 3.0 * err);
  }
  // allele-balance binomial (call.cpp:344-349)
  int64_t nn = (int64_t)s.counts[major] + s.counts[second];
  int64_t kk = s.counts[second];
  double logbinom = lgamma((double)nn + 1) - lgamma((double)(nn - kk) + 1) -
                    lgamma((double)kk + 1);
  log_het += (long double)logbinom - (long double)nn * logl(2.0L);
  long double pp1 = expl(log_hom), pp2 = expl(log_het);
  if (g_prior > 0) {
    pp1 *= (long double)(1.0 - g_prior);
    pp2 *= (long double)g_prior;
  }
  QualityCall c;
  c.p1 = lrt(pp2, pp1);
  c.p2 = lrt(pp1, pp2);
  c.major = (uint8_t)major;
  c.second = (uint8_t)second;
  c.het = c.p2 < g_alpha;
  return c;
}

int run_quality(const Parsed& parsed) {
  static const char* alleles = "ACGT";
  if (g_estimate_prior) g_prior = estimate_prior(parsed.sites);
  // classification is an OpenMP parallel-for over sites, the reference's
  // actual shape (call.cpp:309-310); serialization stays sequential
  const int64_t n = (int64_t)parsed.sites.size();
  std::vector<QualityCall> calls((size_t)n);
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int64_t i = 0; i < n; ++i) {
    calls[(size_t)i] = quality_site(parsed, parsed.sites[(size_t)i]);
  }
  std::string out;
  out.reserve(parsed.sites.size() * 48);
  out += "chrom,pos,label,gt,hom_conf,het_conf,conf_type\n";
  char num[96];
  for (int64_t i = 0; i < n; ++i) {
    const Site& s = parsed.sites[(size_t)i];
    const QualityCall& c = calls[(size_t)i];
    out += parsed.chroms[(size_t)s.chrom_id];
    snprintf(num, sizeof num, ",%d,", s.pos);
    out += num;
    out += c.het ? "het," : "hom,";
    out += alleles[c.major];
    out += c.het ? alleles[c.second] : alleles[c.major];
    snprintf(num, sizeof num, ",%g,%g,p_value\n", c.p1, c.p2);
    out += num;
  }
  fwrite(out.data(), 1, out.size(), stdout);
  return 0;
}

}  // namespace

int main(int argc, char** argv) {
  const char* path = nullptr;
  for (int i = 1; i < argc; ++i) {
    if (!strcmp(argv[i], "-p") && i + 1 < argc) g_alpha = atof(argv[++i]);
    else if (!strcmp(argv[i], "-E") && i + 1 < argc) g_err_cap = atof(argv[++i]);
    else if (!strcmp(argv[i], "-r") && i + 1 < argc) g_prior = atof(argv[++i]);
    else if (!strcmp(argv[i], "-m") && i + 1 < argc) g_method = argv[++i];
    else if (!strcmp(argv[i], "-R")) g_estimate_prior = true;
    else path = argv[i];
  }
  if (!path) {
    fprintf(stderr, "No file name given!\n");
    return 1;
  }
  bool wants_quality = !strcmp(g_method, "quality");
  Parsed parsed;
  if (!parse_file(path, wants_quality, &parsed)) return 1;

  if (!strcmp(g_method, "local")) return run_local(parsed);
  if (!strcmp(g_method, "bayes")) return run_fit_method(parsed, true);
  if (!strcmp(g_method, "likelihood_ratio")) return run_fit_method(parsed, false);
  if (wants_quality) return run_quality(parsed);
  // unknown method: header only, like the reference
  fwrite("chrom,pos,label,gt,hom_conf,het_conf,conf_type\n", 1, 47, stdout);
  return 0;
}
