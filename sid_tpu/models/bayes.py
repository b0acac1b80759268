"""Method ``bayes``: posterior odds under the fitted Lynch model.

Reference: callBayes (call.cpp:145-211). Coverage>=4 profiles only; fit
(pi, epsilon); posterior P(hom) = L_hom(1-pi) / (L_hom(1-pi) + L_het pi);
label het iff P(het) > P(hom); conf_type "probability"; sites whose profile
was filtered out are omitted.
"""

from __future__ import annotations

import numpy as np

from sid_tpu.config import Options
from sid_tpu.models import common
from sid_tpu.models.lynch import fit_profiles
from sid_tpu.ops.profiles import filter_min_coverage, unique_profiles


def classify_profiles_bayes(profiles, mult, options: Options, diag=None):
    """Per-class posterior classification on (filtered) profiles."""
    if diag:
        diag(f"# unique profiles: {profiles.shape[0]}")
    pi, eps, log_l_hom, log_l_het, _ = fit_profiles(profiles, mult, options, diag)
    if diag:
        diag(f"# heterozygosity: {pi:.6e}")
        diag(f"# error: {eps:.6e}")

    # posterior odds in f64 from log space; the reference's long-double
    # linear division (call.cpp:176-181) agrees to well past 6 digits, and
    # the both-underflow case maps to NaN/NaN exactly like its 0/0.
    # Likelihoods (and the prior-weighted products) below the 80-bit
    # subnormal line underflow to exactly 0 in the reference -> -inf here.
    log_l_hom = common.clamp_ld_underflow_np(log_l_hom)
    log_l_het = common.clamp_ld_underflow_np(log_l_het)
    log_apost_hom = log_l_hom + np.log(np.float64(1.0 - pi))
    log_apost_het = log_l_het + np.log(np.float64(pi)) if pi > 0 else np.full_like(log_l_hom, -np.inf)
    log_apost_hom = common.clamp_ld_underflow_np(log_apost_hom)
    log_apost_het = common.clamp_ld_underflow_np(log_apost_het)
    with np.errstate(invalid="ignore", over="ignore"):
        # normalize by the larger to avoid overflow; 0/0 -> NaN preserved
        m = np.maximum(log_apost_hom, log_apost_het)
        wh = np.exp(log_apost_hom - m)
        wt = np.exp(log_apost_het - m)
        denom = wh + wt
        prob_hom = wh / denom
        prob_het = wt / denom
        is_het = prob_het > prob_hom
    major, second = common.major_allele_indices_np(profiles)
    return is_het, major, second, prob_hom, prob_het


def call_bayes(batch, options: Options, diag=None) -> common.CallResult:
    profiles, mult, inverse = unique_profiles(batch.counts)
    profiles, mult, keep = filter_min_coverage(profiles, mult, 4)
    cls = classify_profiles_bayes(profiles, mult, options, diag)
    return common.gather_result(
        batch, "probability", inverse, *cls, keep_u=keep,
    )
