"""Host-exact reference engine: all four calling methods in long double.

This is the parity oracle — a complete reimplementation of the reference's
observable pipeline (call.cpp) with matched precision (np.longdouble linear
likelihood space, f64 intermediates where the reference uses double). The
device methods in sid_tpu.models must reproduce this engine's CSV output; it
also backs ``fit_backend="exact"``.

Each function takes a parsed PileupBatch + Options and returns a CallResult.
Stderr diagnostics (call.cpp:72-80,155-163 and the minimizer's convergence
lines) go through ``diag`` so the CLI can reproduce them exactly.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np
from scipy.special import gammaln

from sid_tpu.config import Options
from sid_tpu.exact import lynch_ld, stats_ld
from sid_tpu.models import common
from sid_tpu.ops.profiles import (
    filter_min_coverage,
    nucleotide_distribution,
    unique_profiles,
)

LD = np.longdouble


def _fit(
    profiles: np.ndarray,
    mult: np.ndarray,
    diag: Optional[Callable[[str], None]],
) -> Tuple[float, float, np.ndarray, np.ndarray, np.ndarray]:
    """Lynch fit on cov>=4-filtered profiles; returns (pi, eps, L_hom, L_het, nt)."""
    nt = nucleotide_distribution(profiles, mult)
    pi, eps, l_hom, l_het = lynch_ld.estimate_profile_genotype_likelihoods_ld(
        profiles, mult, nt, log=diag
    )
    return pi, eps, l_hom, l_het, nt


def _estimate_prior(batch_counts: np.ndarray, diag) -> float:
    """The -R path shared by local/quality (call.cpp:223-234, 295-306)."""
    profiles, mult, _ = unique_profiles(batch_counts)
    profiles, mult, _ = filter_min_coverage(profiles, mult, 4)
    pi, _, _, _, _ = _fit(profiles, mult, diag)
    return pi


def local_classify_profiles_ld(
    profiles: np.ndarray,
    major: np.ndarray,
    second: np.ndarray,
    error_threshold: float,
    snp_prior: float,
    alpha: float,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-profile ``local`` classification (call.cpp:238-273), long double.

    The numpy-longdouble spec for the native ``sidtpu_local_classify_ld``
    kernel (tests/test_native_local_ld.py asserts bitwise equality).
    Returns (is_het, p1, p2) over the unique-profile axis.
    """
    prof64 = np.asarray(profiles).astype(np.int64)
    cov = prof64.sum(-1).astype(np.float64)
    n1 = np.take_along_axis(prof64, major[:, None].astype(np.int64), 1)[:, 0].astype(
        np.float64
    )
    n2 = np.take_along_axis(prof64, second[:, None].astype(np.int64), 1)[:, 0].astype(
        np.float64
    )

    with np.errstate(invalid="ignore", divide="ignore"):
        error1 = (cov - n1) / cov
        error1 = np.where(error1 > error_threshold, error_threshold, error1)
        l1 = lynch_ld.hom_fixed_ld(profiles, error1, major)
        error2 = 1.5 * (cov - n1 - n2) / cov
        error2 = np.where(error2 > error_threshold, error_threshold, error2)
        l2 = lynch_ld.het_fixed_ld(profiles, error2, major, second)

        if snp_prior > 0:
            l1 = l1 * LD(np.float64(1.0 - snp_prior))
            l2 = l2 * LD(np.float64(snp_prior))

    p1 = stats_ld.lrt_pvalue_ld(l2, l1)
    p2 = stats_ld.lrt_pvalue_ld(l1, l2)
    with np.errstate(invalid="ignore"):
        is_het = (l2 > l1) & (p2 < alpha)
    return is_het, p1, p2


def call_local_exact(batch, options: Options, diag=None) -> common.CallResult:
    """callSiteMLError (call.cpp:213-289) in exact host arithmetic."""
    profiles, mult, inverse = unique_profiles(batch.counts)
    u = profiles.shape[0]
    snp_prior = options.snp_prior
    if options.estimate_prior:
        snp_prior = _estimate_prior(batch.counts, diag)

    if u == 0:
        return _empty_result(batch, "p_value", inverse)

    major, second = common.major_allele_indices_np(profiles)
    is_het, p1, p2 = local_classify_profiles_ld(
        profiles, major, second, options.site_error_threshold, snp_prior,
        options.significance_level,
    )

    return common.gather_result(
        batch, "p_value", inverse, is_het, major, second, p1, p2
    )


def call_bayes_exact(batch, options: Options, diag=None) -> common.CallResult:
    """callBayes (call.cpp:145-211) in exact host arithmetic."""
    profiles, mult, inverse = unique_profiles(batch.counts)
    profiles, mult, keep = filter_min_coverage(profiles, mult, 4)
    if diag:
        diag(f"# unique profiles: {profiles.shape[0]}")
    pi, eps, l_hom, l_het, _ = _fit(profiles, mult, diag)
    if diag:
        diag(f"# heterozygosity: {pi:.6e}")
        diag(f"# error: {eps:.6e}")

    with np.errstate(invalid="ignore", divide="ignore"):
        apost_hom = l_hom * LD(np.float64(1.0 - pi))
        apost_het = l_het * LD(pi)
        denom = apost_hom + apost_het
        prob_hom = (apost_hom / denom).astype(np.float64)
        prob_het = (apost_het / denom).astype(np.float64)
        is_het = prob_het > prob_hom
    major, second = common.major_allele_indices_np(profiles)

    return common.gather_result(
        batch, "probability", inverse, is_het, major, second, prob_hom, prob_het,
        keep_u=keep,
    )


def call_likelihood_ratio_exact(batch, options: Options, diag=None) -> common.CallResult:
    """callLikelihoodRatio (call.cpp:62-143) in exact host arithmetic."""
    profiles, mult, inverse = unique_profiles(batch.counts)
    profiles, mult, keep = filter_min_coverage(profiles, mult, 4)
    if diag:
        diag(f"# unique profiles: {profiles.shape[0]}")
    pi, eps, l_hom, l_het, _ = _fit(profiles, mult, diag)
    if diag:
        diag(f"# heterozygosity: {pi:.6e}")
        diag(f"# error: {eps:.6e}")

    if options.estimate_prior:
        l_het = l_het * LD(pi)
        l_hom = l_hom * LD(np.float64(1.0 - pi))
    p1 = stats_ld.lrt_pvalue_ld(l_het, l_hom)  # confidence against het
    p2 = stats_ld.lrt_pvalue_ld(l_hom, l_het)
    adj_p1 = stats_ld.adjust_benjamini_hochberg_np(p1)
    adj_p2 = stats_ld.adjust_benjamini_hochberg_np(p2)
    is_het = adj_p2 < options.significance_level
    major, second = common.major_allele_indices_np(profiles)

    return common.gather_result(
        batch, "p_value", inverse, is_het, major, second, adj_p1, adj_p2,
        keep_u=keep,
    )


def call_quality_exact(batch, options: Options, diag=None) -> common.CallResult:
    """callQualityBasedSimple (call.cpp:291-372) in exact host arithmetic.

    Per-site, per-read log accumulation of min(bq,mq)-derived error
    probabilities; the only method that outputs *every* site, per-site (not
    per-profile).
    """
    n_sites = batch.num_sites
    snp_prior = options.snp_prior
    if options.estimate_prior:
        snp_prior = _estimate_prior(batch.counts, diag)

    counts = batch.counts.astype(np.int64)
    major, second = common.major_allele_indices_np(counts)

    offsets = batch.read_offsets
    code = batch.read_code.astype(np.int64)
    bq = batch.read_bq.astype(np.float64)
    mq = batch.read_mq.astype(np.float64)

    # per-read error from the smaller Phred value (call.cpp:331)
    err = np.power(10.0, np.minimum(bq, mq) / -10.0)
    site_of_read = np.repeat(np.arange(n_sites), np.diff(offsets))
    is_major = code == major[site_of_read]
    is_top2 = is_major | (code == second[site_of_read])

    hom_terms = np.where(is_major, np.log(1.0 - err), np.log(err))
    het_terms = np.where(
        is_top2, np.log(1.0 - 2.0 / 3.0 * err), np.log(2.0 / 3.0 * err)
    )
    # sequential within-site accumulation in long double (reference loop order)
    log_hom = _segment_sum_ld(hom_terms, offsets)
    log_het = _segment_sum_ld(het_terms, offsets)

    # allele-balance binomial (call.cpp:344-349): n = n1+n2, k = n2
    n = np.take_along_axis(counts, major[:, None].astype(np.int64), 1)[:, 0] + (
        np.take_along_axis(counts, second[:, None].astype(np.int64), 1)[:, 0]
    )
    k = np.take_along_axis(counts, second[:, None].astype(np.int64), 1)[:, 0]
    logbinom = gammaln(n + 1) - gammaln(n - k + 1) - gammaln(k + 1)
    log_het = log_het + (logbinom.astype(LD) - n.astype(LD) * np.log(LD(2)))

    # unqualified exp(long double) resolves to the long-double overload under
    # libstdc++ (<cmath> injects ::exp overloads), so no double narrowing
    pp1 = np.exp(log_hom)
    pp2 = np.exp(log_het)
    if snp_prior > 0:
        pp1 = pp1 * LD(np.float64(1.0 - snp_prior))
        pp2 = pp2 * LD(np.float64(snp_prior))

    p1 = stats_ld.lrt_pvalue_ld(pp2, pp1)
    p2 = stats_ld.lrt_pvalue_ld(pp1, pp2)
    is_het = p2 < options.significance_level

    return common.CallResult(
        chrom_id=batch.chrom_id,
        chrom_table=batch.chrom_table,
        pos=batch.pos,
        is_het=is_het,
        major=major,
        second=second,
        conf_hom=p1,
        conf_het=p2,
        conf_type="p_value",
    )


def _segment_sum_ld(terms: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Sequential per-segment sums in long double (CSR offsets)."""
    terms_ld = terms.astype(LD)
    n = offsets.shape[0] - 1
    out = np.zeros(n, LD)
    nonempty = np.diff(offsets) > 0
    if terms_ld.size:
        sums = np.add.reduceat(terms_ld, offsets[:-1][nonempty])
        out[nonempty] = sums
    return out


def _empty_result(batch, conf_type, inverse):
    return common.gather_result(
        batch,
        conf_type,
        inverse,
        np.zeros(0, bool),
        np.zeros(0, np.int32),
        np.zeros(0, np.int32),
        np.zeros(0, np.float64),
        np.zeros(0, np.float64),
    )
