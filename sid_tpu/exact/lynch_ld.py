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

import ctypes
import os
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


def _mc_log_f64(profiles: np.ndarray) -> np.ndarray:
    """The f64 log multinomial coefficients (shared with the native kernel).

    Identical expression to multinomial_coefficient_ld's log_c so the
    native long-double kernel consumes the oracle's exact lgamma values.
    """
    prof = np.asarray(profiles, np.int64)
    cov = prof.sum(axis=-1)
    return gammaln(cov + 1).astype(np.float64) - gammaln(prof + 1).astype(
        np.float64
    ).sum(axis=-1)


class NativeLynchLD:
    """Native (libsidtpu) long-double Lynch objective + marginals.

    Bitwise-identical to compound_neg_log_likelihood_ld and the
    {hom,het}_marginal_ld pair (differentially tested); ~20-50x faster per
    objective evaluation via threaded per-profile terms and integer-exponent
    powl tables. Falls back to the numpy path when the library is absent.
    """

    def __init__(self, profiles: np.ndarray, mult: np.ndarray, nt: np.ndarray):
        lib = _native_lynch_lib()
        if lib is None:
            raise RuntimeError("libsidtpu is not available")
        self._lib = lib
        self._prof = np.ascontiguousarray(profiles, np.int32)
        self._mult = np.ascontiguousarray(mult, np.int64)
        self._mc_log = np.ascontiguousarray(_mc_log_f64(profiles), np.float64)
        self._nt = np.ascontiguousarray(nt, np.float64)
        self._u = int(self._prof.shape[0])

    def objective(self, theta: np.ndarray) -> float:
        return float(
            self._lib.sidtpu_compound_nll_ld(
                self._prof.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                self._mult.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                self._mc_log.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                self._nt.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                float(theta[0]),
                float(theta[1]),
                self._u,
                0,
            )
        )

    def marginals(self, eps: float) -> Tuple[np.ndarray, np.ndarray]:
        l_hom = np.empty(self._u, LD)
        l_het = np.empty(self._u, LD)
        self._lib.sidtpu_lynch_marginals_ld(
            self._prof.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self._mc_log.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            self._nt.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            float(eps),
            self._u,
            l_hom.ctypes.data_as(ctypes.POINTER(ctypes.c_longdouble)),
            l_het.ctypes.data_as(ctypes.POINTER(ctypes.c_longdouble)),
            0,
        )
        return l_hom, l_het


def _native_lynch_lib():
    if os.environ.get("SIDTPU_NO_NATIVE_LD"):
        return None
    # numpy longdouble and g++ long double must share the x86-64 16-byte
    # extended layout for the marginals buffer handoff
    if np.dtype(LD).itemsize != ctypes.sizeof(ctypes.c_longdouble):
        return None
    from sid_tpu.io.native import _load

    lib = _load()
    if lib is None:
        return None
    if not getattr(lib, "_sidtpu_lynch_ld_configured", False):
        try:
            lib.sidtpu_compound_nll_ld.restype = ctypes.c_double
            lib.sidtpu_compound_nll_ld.argtypes = [
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_double,
                ctypes.c_double,
                ctypes.c_int64,
                ctypes.c_int,
            ]
            lib.sidtpu_lynch_marginals_ld.restype = None
            lib.sidtpu_lynch_marginals_ld.argtypes = [
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_double,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_longdouble),
                ctypes.POINTER(ctypes.c_longdouble),
                ctypes.c_int,
            ]
        except AttributeError:
            return None
        lib._sidtpu_lynch_ld_configured = True
    return lib


def native_local_classify_ld(
    profiles: np.ndarray,
    major: np.ndarray,
    second: np.ndarray,
    error_threshold: float,
    snp_prior: float,
    alpha: float,
):
    """Native oracle-precision ``local`` classification (call.cpp:238-273).

    Threaded long-double kernel, bitwise-identical to
    exact/engine.local_classify_profiles_ld (differentially tested in
    tests/test_native_local_ld.py). Returns (is_het, p1, p2) over the
    unique-profile axis, or None when libsidtpu is unavailable.
    """
    lib = _native_lynch_lib()
    if lib is None:
        return None
    if not getattr(lib, "_sidtpu_local_ld_configured", False):
        try:
            lib.sidtpu_local_classify_ld.restype = None
            lib.sidtpu_local_classify_ld.argtypes = [
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_double,
                ctypes.c_double,
                ctypes.c_double,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int,
            ]
        except AttributeError:
            return None
        lib._sidtpu_local_ld_configured = True

    prof = np.ascontiguousarray(profiles, np.int32)
    u = int(prof.shape[0])
    mc_log = np.ascontiguousarray(_mc_log_f64(prof), np.float64)
    major = np.ascontiguousarray(major, np.int32)
    second = np.ascontiguousarray(second, np.int32)
    p1 = np.empty(u, np.float64)
    p2 = np.empty(u, np.float64)
    is_het = np.empty(u, np.uint8)
    lib.sidtpu_local_classify_ld(
        prof.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        mc_log.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        major.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        second.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        float(error_threshold),
        float(snp_prior),
        float(alpha),
        u,
        p1.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        p2.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        is_het.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        0,
    )
    return is_het.astype(bool), p1, p2


def estimate_profile_genotype_likelihoods_ld(
    profiles: np.ndarray,
    mult: np.ndarray,
    nt: np.ndarray,
    log: Optional[Callable[[str], None]] = None,
) -> Tuple[float, float, np.ndarray, np.ndarray]:
    """The Lynch fit (lynch.cpp:17-35): returns (pi, epsilon, L_hom, L_het).

    Start (1e-3, 1e-3), step 1e-4 (lynch.cpp:8-10); per-profile likelihoods
    evaluated at the fitted epsilon, long double. Uses the native
    long-double kernels when available (bitwise-identical trajectory).
    """
    profiles = np.asarray(profiles, np.int64)
    mult = np.asarray(mult, np.int64)

    native = None
    try:
        native = NativeLynchLD(profiles, mult, nt)
    except RuntimeError:
        pass

    if native is not None:
        objective = native.objective
    else:
        def objective(x: np.ndarray) -> float:
            return compound_neg_log_likelihood_ld(x, profiles, mult, nt)

    res = minimize_nmsimplex2(objective, [1e-3, 1e-3], [1e-4, 1e-4], log=log)
    pi, eps = float(res.x[0]), float(res.x[1])
    if native is not None:
        l_hom, l_het = native.marginals(eps)
    else:
        l_hom = hom_marginal_ld(profiles, eps, nt)
        l_het = het_marginal_ld(profiles, eps, nt)
    return pi, eps, l_hom, l_het
