"""Long-double likelihood kernels with reference-exact arithmetic order.

Vectorized ``np.longdouble`` (x86 80-bit extended = the reference's
``long double``) versions of the lynch.hpp:48-96 kernels and the
compoundLikelihood objective (lynch.cpp:37-61). Every multiplication and
accumulation follows the reference's operand order and precision promotions:
double sub-expressions stay double before promoting into the long-double
product, sums accumulate sequentially, log-gamma values are f64
(gsl_sf_lngamma-accurate scipy gammaln).

This is the oracle the device kernels are validated against, and the
``fit_backend="exact"`` compute path.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np
from scipy.special import gammaln

from sid_tpu.exact.nmsimplex import minimize_nmsimplex2

LD = np.longdouble


def multinomial_coefficient_ld(profiles: np.ndarray) -> np.ndarray:
    """expl of the double-precision lgamma combination (lynch.hpp:48-55)."""
    prof = np.asarray(profiles, np.int64)
    cov = prof.sum(axis=-1)
    # log_gamma(x) with x==0 -> 0; arguments here are >= 1 so plain gammaln
    log_c = gammaln(cov + 1).astype(np.float64) - gammaln(prof + 1).astype(
        np.float64
    ).sum(axis=-1)
    return np.exp(LD(1) * log_c.astype(LD))


def het_marginal_ld(profiles: np.ndarray, e: float, nt: np.ndarray) -> np.ndarray:
    """heterozygousLikelihood marginalized over base pairs (lynch.hpp:57-74)."""
    prof = np.asarray(profiles, np.int64)
    cov = prof.sum(axis=-1)
    e = np.float64(e)
    match_base = LD(np.float64((1.0 - 2.0 / 3.0 * e) / 2.0))
    err_base = LD(np.float64(e / 3.0))
    L = np.zeros(prof.shape[:-1], LD)
    for i in range(4):  # reference accumulation order: i-major, j = i+1..3
        for j in range(i + 1, 4):
            w = np.float64(nt[i]) * np.float64(nt[j])  # double product
            nij = prof[..., i] + prof[..., j]
            L = L + LD(w) * np.power(match_base, nij.astype(LD)) * np.power(
                err_base, (cov - nij).astype(LD)
            )
    s = LD(0)
    for i in range(4):
        s = s + LD(np.float64(nt[i]) * np.float64(nt[i]))
    L = L / (LD(1) - s)
    return multinomial_coefficient_ld(prof) * L


def hom_marginal_ld(profiles: np.ndarray, e: float, nt: np.ndarray) -> np.ndarray:
    """homozygousLikelihood marginalized over the reference base (lynch.hpp:82-90)."""
    prof = np.asarray(profiles, np.int64)
    cov = prof.sum(axis=-1)
    e = np.float64(e)
    match_base = LD(np.float64(1.0 - e))
    err_base = LD(np.float64(e / 3.0))
    L = np.zeros(prof.shape[:-1], LD)
    for i in range(4):
        L = L + LD(np.float64(nt[i])) * np.power(
            match_base, prof[..., i].astype(LD)
        ) * np.power(err_base, (cov - prof[..., i]).astype(LD))
    return multinomial_coefficient_ld(prof) * L


def het_fixed_ld(
    profiles: np.ndarray, e: np.ndarray, ref0: np.ndarray, ref1: np.ndarray
) -> np.ndarray:
    """heterozygousLikelihood at fixed alleles (lynch.hpp:76-80); e may be per-profile."""
    prof = np.asarray(profiles, np.int64)
    cov = prof.sum(axis=-1)
    e = np.asarray(e, np.float64)
    match_base = ((1.0 - 2.0 / 3.0 * e) / 2.0).astype(LD)
    err_base = (e / 3.0).astype(LD)
    n01 = np.take_along_axis(prof, ref0[..., None], -1)[..., 0] + np.take_along_axis(
        prof, ref1[..., None], -1
    )[..., 0]
    return (
        multinomial_coefficient_ld(prof)
        * np.power(match_base, n01.astype(LD))
        * np.power(err_base, (cov - n01).astype(LD))
    )


def hom_fixed_ld(profiles: np.ndarray, e: np.ndarray, ref: np.ndarray) -> np.ndarray:
    """homozygousLikelihood at a fixed allele (lynch.hpp:92-96); e may be per-profile."""
    prof = np.asarray(profiles, np.int64)
    cov = prof.sum(axis=-1)
    e = np.asarray(e, np.float64)
    match_base = (1.0 - e).astype(LD)
    err_base = (e / 3.0).astype(LD)
    n0 = np.take_along_axis(prof, ref[..., None], -1)[..., 0]
    return (
        multinomial_coefficient_ld(prof)
        * np.power(match_base, n0.astype(LD))
        * np.power(err_base, (cov - n0).astype(LD))
    )


def _sequential_sum_ld(terms: np.ndarray) -> LD:
    """Strict left-to-right accumulation (the reference's serial loop)."""
    if terms.size == 0:
        return LD(0)
    return np.cumsum(terms)[-1]


def compound_neg_log_likelihood_ld(
    theta: np.ndarray, profiles: np.ndarray, mult: np.ndarray, nt: np.ndarray
) -> float:
    """compoundLikelihood (lynch.cpp:37-61): double-valued objective."""
    pi, eps = np.float64(theta[0]), np.float64(theta[1])
    if pi < 0 or pi > 1 or eps < 0 or eps > 1:
        return np.finfo(np.float64).max
    hom = hom_marginal_ld(profiles, eps, nt)
    het = het_marginal_ld(profiles, eps, nt)
    L = LD(np.float64(1.0 - pi)) * hom + LD(pi) * het
    with np.errstate(divide="ignore", invalid="ignore"):
        logs = np.log(L)
    terms = np.where(L > 0, logs * mult.astype(LD), LD(0))
    total = _sequential_sum_ld(terms)
    if np.isinf(total):
        total = np.finfo(LD).max if total > 0 else -np.finfo(LD).max
    return float(np.float64(-total))


def estimate_profile_genotype_likelihoods_ld(
    profiles: np.ndarray,
    mult: np.ndarray,
    nt: np.ndarray,
    log: Optional[Callable[[str], None]] = None,
) -> Tuple[float, float, np.ndarray, np.ndarray]:
    """The Lynch fit (lynch.cpp:17-35): returns (pi, epsilon, L_hom, L_het).

    Start (1e-3, 1e-3), step 1e-4 (lynch.cpp:8-10); per-profile likelihoods
    evaluated at the fitted epsilon, long double.
    """
    profiles = np.asarray(profiles, np.int64)
    mult = np.asarray(mult, np.int64)

    def objective(x: np.ndarray) -> float:
        return compound_neg_log_likelihood_ld(x, profiles, mult, nt)

    res = minimize_nmsimplex2(objective, [1e-3, 1e-3], [1e-4, 1e-4], log=log)
    pi, eps = float(res.x[0]), float(res.x[1])
    l_hom = hom_marginal_ld(profiles, eps, nt)
    l_het = het_marginal_ld(profiles, eps, nt)
    return pi, eps, l_hom, l_het
