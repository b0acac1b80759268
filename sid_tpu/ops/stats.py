"""Statistical tests on device: LRT p-values, multiple-testing corrections.

Replaces the reference's GSL calls (stats.cpp:10-80) with closed forms:
``Q_chisq(x, df=1) = erfc(sqrt(x/2))`` (gsl_cdf_chisq_Q at stats.cpp:33) and
a sort + cumulative-min Benjamini-Hochberg (stats.cpp:68-80). The full
stats.hpp API surface is provided, including the members unused by the
reference's main paths (aic/relative likelihoods, Bonferroni).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def chisq_q_df1(chisq: jnp.ndarray) -> jnp.ndarray:
    """Upper-tail chi-square survival, df=1: erfc(sqrt(x/2))."""
    return jax.scipy.special.erfc(jnp.sqrt(chisq * 0.5))


def lrt_pvalue_from_logs(log_l0: jnp.ndarray, log_l1: jnp.ndarray) -> jnp.ndarray:
    """likelihoodRatioTest (stats.cpp:29-37) on log-likelihood inputs.

    chisq = -2 (ln l0 - ln max(l0, l1)) = 2 max(0, ln l1 - ln l0);
    l0 == 0 (log -inf) gives Q(DBL_MAX, 1) == 0.
    """
    chisq = 2.0 * jnp.maximum(0.0, log_l1 - log_l0)
    p = chisq_q_df1(chisq)
    return jnp.where(jnp.isneginf(log_l0), 0.0, p)


def _erfc_host(x: np.ndarray) -> np.ndarray:
    """glibc-libm erfc over an array (native batch call, math.erfc fallback)."""
    try:
        from sid_tpu.io.native import _load

        lib = _load()
        if lib is not None and hasattr(lib, "sidtpu_erfc"):
            from sid_tpu.native.bridge import erfc_libm

            return erfc_libm(lib, x)
    except Exception:
        pass
    flat = np.asarray(x, np.float64).ravel()
    out = np.array([math.erfc(v) for v in flat], np.float64)
    return out.reshape(np.shape(x))


def lrt_pvalue_from_logs_np(log_l0, log_l1) -> np.ndarray:
    """Host-libm LRT p-values (the Options.exact_pvalues path).

    Same contract as lrt_pvalue_from_logs, but erfc runs through glibc libm
    — the function the long-double oracle uses (exact/stats_ld.py math.erfc)
    — so device/oracle CSV parity does not depend on the XLA backend's erfc
    approximation (reference: gsl_cdf_chisq_Q, stats.cpp:33).
    """
    log_l0 = np.asarray(log_l0, np.float64)
    log_l1 = np.asarray(log_l1, np.float64)
    try:
        from sid_tpu.io.native import _load

        lib = _load()
        if lib is not None and hasattr(lib, "sidtpu_lrt_pvalues"):
            from sid_tpu.native.bridge import lrt_pvalues_libm

            return lrt_pvalues_libm(lib, log_l0, log_l1)
    except Exception:
        pass
    with np.errstate(invalid="ignore"):
        chisq = 2.0 * np.maximum(0.0, log_l1 - log_l0)
        p = _erfc_host(np.sqrt(chisq * 0.5))
        return np.where(np.isneginf(log_l0), 0.0, p)


def adjust_benjamini_hochberg(p_values: jnp.ndarray) -> jnp.ndarray:
    """BH step-up adjustment, reference semantics (stats.cpp:68-80).

    Sort descending; adjusted[sorted[i]] = running min of p*m/(m-i) (the
    i = 0 entry is the raw p, exactly); clamp values > 1 to 1. Ties in p are
    output-invariant to sort order (the running min absorbs them), so the
    descending argsort here is faithful to the reference's unstable sort.
    """
    m = p_values.shape[0]
    if m == 0:
        return p_values
    order = jnp.argsort(-p_values)
    sorted_p = p_values[order]
    i = jnp.arange(m, dtype=jnp.float64)
    scaled = sorted_p * jnp.float64(m) / (jnp.float64(m) - i)
    scaled = scaled.at[0].set(sorted_p[0])  # stats.cpp:74 assigns raw p
    adj = jax.lax.associative_scan(jnp.minimum, scaled)
    out = jnp.zeros_like(p_values).at[order].set(adj)
    return jnp.where(out > 1.0, 1.0, out)


def adjust_benjamini_hochberg_np(p_values: np.ndarray) -> np.ndarray:
    """Host BH, arithmetic identical to the device version (elementary IEEE
    ops only: descending sort, p*m/(m-i), running min, clamp). Tie order is
    output-invariant (the running min absorbs it), so argsort flavor does
    not matter."""
    p_values = np.asarray(p_values, np.float64)
    m = p_values.shape[0]
    if m == 0:
        return p_values
    order = np.argsort(-p_values, kind="stable")
    sorted_p = p_values[order]
    i = np.arange(m, dtype=np.float64)
    scaled = sorted_p * np.float64(m) / (np.float64(m) - i)
    scaled[0] = sorted_p[0]  # stats.cpp:74 assigns raw p
    adj = np.minimum.accumulate(scaled)
    out = np.empty_like(p_values)
    out[order] = adj
    return np.where(out > 1.0, 1.0, out)


def adjust_bonferroni(p_values: jnp.ndarray, n: int = 0) -> jnp.ndarray:
    """Bonferroni correction (stats.cpp:48-56; unused by reference main paths)."""
    if n <= 0:
        n = p_values.shape[0]
    return p_values * jnp.float64(n)


def aic(likelihood: jnp.ndarray, num_params: jnp.ndarray) -> jnp.ndarray:
    """Akaike information criterion (stats.cpp:10-12; reference dead code)."""
    return 2.0 * num_params - 2.0 * jnp.log(likelihood)


def relative_likelihoods(likelihood_pairs: jnp.ndarray) -> jnp.ndarray:
    """AIC-based relative likelihoods (stats.cpp:14-27; reference dead code).

    Input (m, 2) likelihood pairs; output (m, 2) with the better model at 1.0.
    """
    a = aic(likelihood_pairs, 2.0)
    first, second = a[..., 0], a[..., 1]
    rel_first = jnp.where(first < second, 1.0, jnp.exp((second - first) / 2.0))
    rel_second = jnp.where(first < second, jnp.exp((first - second) / 2.0), 1.0)
    return jnp.stack([rel_first, rel_second], axis=-1)


def log_binomial_coefficient(n: jnp.ndarray, k: jnp.ndarray, lgamma_tab: jnp.ndarray) -> jnp.ndarray:
    """ln C(n, k) via the integer-lgamma table (call.cpp:344-347)."""
    return lgamma_tab[n + 1] - lgamma_tab[n - k + 1] - lgamma_tab[k + 1]


def binomial_pmf(n, k, p, lgamma_tab) -> jnp.ndarray:
    """Binomial pmf via the lgamma trick (the stale suite's
    binom_probability_gamma spec, test-likelihoods.cpp:22-52)."""
    n = jnp.asarray(n, jnp.int32)
    k = jnp.asarray(k, jnp.int32)
    p = jnp.asarray(p, jnp.float64)
    logc = log_binomial_coefficient(n, k, lgamma_tab)
    logpmf = logc + k * jnp.log(p) + (n - k) * jnp.log1p(-p)
    return jnp.exp(logpmf)
