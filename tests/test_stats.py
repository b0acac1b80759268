"""Statistics ops: LRT p-values and multiple-testing corrections."""

import math

import numpy as np
import pytest
from scipy import stats as scipy_stats

import jax.numpy as jnp

from sid_tpu.exact import stats_ld
from sid_tpu.ops import stats

RNG = np.random.default_rng(7)


class TestChisqQ:
    def test_matches_scipy_sf(self):
        xs = np.array([0.0, 1e-8, 0.5, 1.0, 3.84, 10.0, 50.0, 200.0])
        got = np.asarray(stats.chisq_q_df1(jnp.asarray(xs)))
        want = scipy_stats.chi2.sf(xs, df=1)
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_zero_gives_one(self):
        assert float(stats.chisq_q_df1(jnp.asarray(0.0))) == 1.0


class TestLRT:
    def test_from_logs_vs_oracle(self):
        log_l0 = RNG.normal(-50, 30, 64)
        log_l1 = log_l0 + RNG.normal(0, 5, 64)
        got = np.asarray(
            stats.lrt_pvalue_from_logs(jnp.asarray(log_l0), jnp.asarray(log_l1))
        )
        l0 = np.exp(np.asarray(log_l0, np.longdouble))
        l1 = np.exp(np.asarray(log_l1, np.longdouble))
        want = stats_ld.lrt_pvalue_ld(l0, l1)
        np.testing.assert_allclose(got, want, rtol=1e-9)

    def test_h0_larger_gives_one(self):
        p = float(stats.lrt_pvalue_from_logs(jnp.asarray(-1.0), jnp.asarray(-5.0)))
        assert p == 1.0

    def test_h0_zero_gives_zero(self):
        p = float(stats.lrt_pvalue_from_logs(jnp.asarray(-np.inf), jnp.asarray(-1.0)))
        assert p == 0.0
        # both zero: still the l_H0 == 0 branch (stats.cpp:34-36)
        p = float(stats.lrt_pvalue_from_logs(jnp.asarray(-np.inf), jnp.asarray(-np.inf)))
        assert p == 0.0

    def test_known_value(self):
        # chisq = 3.841458820694124 -> p = 0.05
        chisq = scipy_stats.chi2.isf(0.05, 1)
        p = float(stats.lrt_pvalue_from_logs(jnp.asarray(0.0), jnp.asarray(chisq / 2)))
        assert p == pytest.approx(0.05, rel=1e-12)


class TestBenjaminiHochberg:
    @pytest.mark.parametrize("m", [1, 2, 5, 100, 1000])
    def test_matches_reference_loop(self, m):
        p = RNG.uniform(0, 1, m)
        got = np.asarray(stats.adjust_benjamini_hochberg(jnp.asarray(p)))
        want = stats_ld.adjust_benjamini_hochberg_np(p)
        np.testing.assert_array_equal(got, want)

    def test_with_ties_and_extremes(self):
        p = np.array([0.5, 0.5, 1.0, 0.0, 1e-12, 0.5, 0.9999])
        got = np.asarray(stats.adjust_benjamini_hochberg(jnp.asarray(p)))
        want = stats_ld.adjust_benjamini_hochberg_np(p)
        np.testing.assert_array_equal(got, want)

    def test_empty(self):
        out = stats.adjust_benjamini_hochberg(jnp.zeros(0))
        assert out.shape == (0,)

    def test_clamped_to_one(self):
        p = np.array([0.9, 0.95, 0.99])
        got = np.asarray(stats.adjust_benjamini_hochberg(jnp.asarray(p)))
        assert np.all(got <= 1.0)


class TestBonferroni:
    def test_basic(self):
        p = np.array([0.01, 0.02])
        got = np.asarray(stats.adjust_bonferroni(jnp.asarray(p)))
        np.testing.assert_allclose(got, [0.02, 0.04])
        got = np.asarray(stats.adjust_bonferroni(jnp.asarray(p), n=10))
        np.testing.assert_allclose(got, [0.1, 0.2])


class TestRelativeLikelihoods:
    def test_better_model_is_one(self):
        pairs = jnp.asarray([[0.9, 0.1], [0.1, 0.9]])
        out = np.asarray(stats.relative_likelihoods(pairs))
        assert out[0, 0] == 1.0 and out[0, 1] < 1.0
        assert out[1, 1] == 1.0 and out[1, 0] < 1.0
        # relative likelihood = exp((AIC_min - AIC_other)/2)
        want = math.exp((stats.aic(0.9, 2) - stats.aic(0.1, 2)) / 2.0)
        assert out[0, 1] == pytest.approx(float(want), rel=1e-12)


class TestHostLRT:
    """The exact_pvalues path: glibc-libm erfc from log-likelihoods."""

    def test_matches_math_erfc(self):
        log_l0 = RNG.normal(-50, 30, 256)
        log_l1 = log_l0 + RNG.normal(0, 5, 256)
        got = stats.lrt_pvalue_from_logs_np(log_l0, log_l1)
        for k in range(256):
            chisq = 2.0 * max(0.0, log_l1[k] - log_l0[k])
            assert got[k] == math.erfc(math.sqrt(chisq * 0.5))

    def test_edge_cases_match_device(self):
        cases = [(-1.0, -5.0), (-np.inf, -1.0), (-np.inf, -np.inf),
                 (-5.0, -np.inf), (0.0, 0.0)]
        for l0, l1 in cases:
            host = float(stats.lrt_pvalue_from_logs_np(np.float64(l0), np.float64(l1)))
            dev = float(stats.lrt_pvalue_from_logs(jnp.float64(l0), jnp.float64(l1)))
            assert host == dev, (l0, l1)

    def test_nan_propagates(self):
        out = stats.lrt_pvalue_from_logs_np(np.array([np.nan]), np.array([-1.0]))
        assert np.isnan(out[0])

    def test_native_batch_erfc_matches_libm(self):
        from sid_tpu.io import native

        if not native.available():
            pytest.skip("libsidtpu not built")
        xs = np.concatenate([RNG.uniform(0, 30, 512), [0.0, np.inf]])
        got = stats._erfc_host(xs)
        for x, g in zip(xs, got):
            assert g == math.erfc(x)


class TestNativeFusedLRT:
    def test_fused_native_matches_numpy_fallback(self):
        """The threaded native sidtpu_lrt_pvalues kernel must equal the pure
        numpy+_erfc_host composition bitwise, including NaN/inf edges and a
        batch large enough to engage the threaded split (>= 1<<16)."""
        from sid_tpu.io import native

        if not native.available():
            pytest.skip("libsidtpu not built")
        rng = np.random.default_rng(42)
        n = (1 << 17) + 7
        l0 = rng.normal(-100, 60, n)
        l1 = l0 + rng.normal(0, 8, n)
        # salt with edge cases at scattered positions
        edges = [(-np.inf, -1.0), (-np.inf, -np.inf), (-1.0, -np.inf),
                 (np.nan, -1.0), (-1.0, np.nan), (0.0, 0.0),
                 (-1e308, 1e308), (5e-324, -5e-324)]
        for k, (a, b) in enumerate(edges):
            l0[k * 1000] = a
            l1[k * 1000] = b

        from sid_tpu.native.bridge import lrt_pvalues_libm
        from sid_tpu.io.native import _load

        got = lrt_pvalues_libm(_load(), l0, l1)
        with np.errstate(invalid="ignore"):
            chisq = 2.0 * np.maximum(0.0, l1 - l0)
            want = stats._erfc_host(np.sqrt(chisq * 0.5))
            want = np.where(np.isneginf(l0), 0.0, want)
        np.testing.assert_array_equal(got, want)
