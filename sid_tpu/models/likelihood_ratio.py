"""Method ``likelihood_ratio``: Lynch fit + LRT + Benjamini-Hochberg.

Reference: callLikelihoodRatio (call.cpp:62-143), the thesis-pipeline
configuration (`sid -R -m likelihood_ratio`). Coverage>=4 profiles; fit;
optional prior weighting (-R); two LRT p-values per profile; BH correction
across *unique profiles* (not sites); het iff adjusted p2 < alpha; filtered
sites omitted from output.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from sid_tpu.config import Options
from sid_tpu.models import common
from sid_tpu.models.lynch import fit_profiles
from sid_tpu.ops import stats
from sid_tpu.ops.profiles import filter_min_coverage, unique_profiles


def classify_profiles_lr(profiles, mult, options: Options, diag=None):
    """Per-class LRT+BH classification on (filtered) profiles."""
    if diag:
        diag(f"# unique profiles: {profiles.shape[0]}")
    pi, eps, log_l_hom, log_l_het, _ = fit_profiles(profiles, mult, options, diag)
    if diag:
        diag(f"# heterozygosity: {pi:.6e}")
        diag(f"# error: {eps:.6e}")

    if options.exact_pvalues:
        # host path (default): clamp, prior (glibc log), native-libm LRT,
        # host BH — zero device round trips after the fit
        with np.errstate(invalid="ignore"):
            lhom = common.clamp_ld_underflow_np(np.asarray(log_l_hom))
            lhet = common.clamp_ld_underflow_np(np.asarray(log_l_het))
            if options.estimate_prior:
                lhet = common.clamp_ld_underflow_np(lhet + np.log(np.float64(pi)))
                lhom = common.clamp_ld_underflow_np(
                    lhom + np.log(np.float64(1.0 - pi))
                )
            p1 = stats.lrt_pvalue_from_logs_np(lhet, lhom)  # confidence vs het
            p2 = stats.lrt_pvalue_from_logs_np(lhom, lhet)
            adj_p1 = stats.adjust_benjamini_hochberg_np(p1)
            adj_p2 = stats.adjust_benjamini_hochberg_np(p2)
            is_het = adj_p2 < options.significance_level
        major, second = common.major_allele_indices_np(profiles)
        return is_het, major, second, adj_p1, adj_p2

    from sid_tpu.utils import profiling

    with profiling.device_stage("classify_lr"):
        log_l_hom = jnp.asarray(log_l_hom)
        log_l_het = jnp.asarray(log_l_het)
        # the reference's long-double likelihoods underflow to exactly 0 below
        # the 80-bit subnormal limit, before AND after the prior multiply
        log_l_hom = common.clamp_ld_underflow(log_l_hom)
        log_l_het = common.clamp_ld_underflow(log_l_het)
        if options.estimate_prior:
            log_l_het = common.clamp_ld_underflow(log_l_het + jnp.log(jnp.float64(pi)))
            log_l_hom = common.clamp_ld_underflow(log_l_hom + jnp.log(jnp.float64(1.0 - pi)))
        p1 = stats.lrt_pvalue_from_logs(log_l_het, log_l_hom)  # confidence vs het
        p2 = stats.lrt_pvalue_from_logs(log_l_hom, log_l_het)
        adj_p1 = stats.adjust_benjamini_hochberg(p1)
        adj_p2 = stats.adjust_benjamini_hochberg(p2)
        is_het = np.asarray(adj_p2) < options.significance_level
        adj_p1, adj_p2 = np.asarray(adj_p1), np.asarray(adj_p2)
    major, second = common.major_allele_indices_np(profiles)
    return is_het, major, second, adj_p1, adj_p2


def call_likelihood_ratio(batch, options: Options, diag=None) -> common.CallResult:
    profiles, mult, inverse = unique_profiles(batch.counts)
    profiles, mult, keep = filter_min_coverage(profiles, mult, 4)
    cls = classify_profiles_lr(profiles, mult, options, diag)
    return common.gather_result(
        batch, "p_value", inverse, *cls, keep_u=keep,
    )
