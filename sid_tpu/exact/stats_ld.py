"""Host-exact statistics: libm-based LRT and reference-loop BH.

Mirrors stats.cpp:29-80 with long-double log handling and math.erfc (glibc
libm) for the chi-square survival function.
"""

from __future__ import annotations

import math

import numpy as np

LD = np.longdouble


def lrt_pvalue_ld(l_h0: np.ndarray, l_h1: np.ndarray) -> np.ndarray:
    """likelihoodRatioTest on linear long-double likelihoods (stats.cpp:29-37)."""
    l_h0 = np.asarray(l_h0, LD)
    l_h1 = np.asarray(l_h1, LD)
    out = np.empty(l_h0.shape, np.float64)
    flat0, flat1, flat_out = l_h0.ravel(), l_h1.ravel(), out.ravel()
    for k in range(flat0.size):
        a, b = flat0[k], flat1[k]
        if a != 0:
            chisq = float(-2 * (np.log(a) - np.log(max(a, b))))
            flat_out[k] = math.erfc(math.sqrt(chisq * 0.5))
        else:
            flat_out[k] = 0.0  # gsl_cdf_chisq_Q(DBL_MAX, 1) underflows to 0
    return out


def adjust_benjamini_hochberg_np(p_values: np.ndarray) -> np.ndarray:
    """adjustBenjaminiHochberg (stats.cpp:68-80), literal loop translation."""
    p = np.asarray(p_values, np.float64)
    m = p.size
    if m == 0:
        return p.copy()
    order = np.argsort(-p, kind="stable")
    adj = np.empty_like(p)
    adj[order[0]] = p[order[0]]
    for i in range(1, m):
        adj[order[i]] = min(adj[order[i - 1]], p[order[i]] * float(m) / float(m - i))
    adj[adj > 1] = 1.0
    return adj


def adjust_bonferroni_np(p_values: np.ndarray, n: int = 0) -> np.ndarray:
    p = np.asarray(p_values, np.float64)
    if n <= 0:
        n = p.size
    return p * float(n)
