"""Device likelihood kernels vs the long-double oracle and scipy.

Ports the numeric assertions of test-likelihoods.cpp (scipy-precomputed
binomial pmfs, nucleotide distributions) and adds cross-validation of the
f64 log-space device kernels against the reference-exact long-double linear
kernels.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sid_tpu.exact import lynch_ld
from sid_tpu.ops import likelihoods, profiles as prof_ops, stats
from sid_tpu.ops.lgamma import lgamma_int_table

RNG = np.random.default_rng(42)


def random_profiles(n, max_count=40):
    return RNG.integers(0, max_count, size=(n, 4)).astype(np.int32)


@pytest.fixture(scope="module")
def lgamma_tab():
    return jnp.asarray(lgamma_int_table(4 * 40 + 2))


NTDISTS = [
    np.array([0.25, 0.25, 0.25, 0.25]),
    np.array([0.1, 0.2, 0.3, 0.4]),
    np.array([0.7, 0.3, 0.0, 0.0]),  # zero entries must not produce NaN
]
EPSILONS = [1e-3, 0.01, 0.1, 0.5]


class TestKernelsVsOracle:
    @pytest.mark.parametrize("eps", EPSILONS)
    @pytest.mark.parametrize("nt_idx", range(len(NTDISTS)))
    def test_hom_marginal(self, eps, nt_idx, lgamma_tab):
        nt = NTDISTS[nt_idx]
        p = random_profiles(50)
        got = np.exp(
            np.asarray(likelihoods.log_hom_marginal(jnp.asarray(p), eps, nt, lgamma_tab))
        )
        want = lynch_ld.hom_marginal_ld(p, eps, nt).astype(np.float64)
        np.testing.assert_allclose(got, want, rtol=1e-11)

    @pytest.mark.parametrize("eps", EPSILONS)
    @pytest.mark.parametrize("nt_idx", range(len(NTDISTS)))
    def test_het_marginal(self, eps, nt_idx, lgamma_tab):
        nt = NTDISTS[nt_idx]
        p = random_profiles(50)
        got = np.exp(
            np.asarray(likelihoods.log_het_marginal(jnp.asarray(p), eps, nt, lgamma_tab))
        )
        want = lynch_ld.het_marginal_ld(p, eps, nt).astype(np.float64)
        np.testing.assert_allclose(got, want, rtol=1e-11)

    @pytest.mark.parametrize("eps", [1e-3, 0.1])
    def test_fixed_kernels(self, eps, lgamma_tab):
        p = random_profiles(50)
        ref0 = RNG.integers(0, 4, 50).astype(np.int32)
        ref1 = (ref0 + 1 + RNG.integers(0, 3, 50).astype(np.int32)) % 4
        e = np.full(50, eps)
        got_hom = np.exp(
            np.asarray(
                likelihoods.log_hom_fixed(jnp.asarray(p), e, jnp.asarray(ref0), lgamma_tab)
            )
        )
        want_hom = lynch_ld.hom_fixed_ld(p, e, ref0).astype(np.float64)
        np.testing.assert_allclose(got_hom, want_hom, rtol=1e-11)
        got_het = np.exp(
            np.asarray(
                likelihoods.log_het_fixed(
                    jnp.asarray(p), e, jnp.asarray(ref0), jnp.asarray(ref1), lgamma_tab
                )
            )
        )
        want_het = lynch_ld.het_fixed_ld(p, e, ref0, ref1).astype(np.float64)
        np.testing.assert_allclose(got_het, want_het, rtol=1e-11)

    def test_zero_coverage_profile_gives_likelihood_one(self, lgamma_tab):
        # powl(x, 0) == 1 semantics: an all-zero profile has L == 1 for the
        # fixed kernels (cov = 0 -> every exponent 0), the local-method edge
        # case at call.cpp:243-254
        p = jnp.zeros((1, 4), jnp.int32)
        e = jnp.asarray([np.nan])  # reference: 0/0 coverage -> NaN error rate
        got = likelihoods.log_hom_fixed(p, e, jnp.asarray([3]), lgamma_tab)
        assert np.asarray(got)[0] == 0.0  # log 1
        got = likelihoods.log_het_fixed(
            p, e, jnp.asarray([3]), jnp.asarray([2]), lgamma_tab
        )
        assert np.asarray(got)[0] == 0.0

    def test_eps_zero_and_one(self, lgamma_tab):
        # boundary epsilons must stay NaN-free (0*log(0) guards)
        p = jnp.asarray([[5, 0, 0, 0], [3, 2, 0, 0]], jnp.int32)
        nt = np.array([0.25, 0.25, 0.25, 0.25])
        for eps in (0.0, 1.0):
            for fn in (likelihoods.log_hom_marginal, likelihoods.log_het_marginal):
                v = np.asarray(fn(p, eps, nt, lgamma_tab))
                assert not np.any(np.isnan(v)), (eps, fn.__name__, v)

    def test_compound_objective_matches_oracle(self, lgamma_tab):
        p = random_profiles(100)
        mult = RNG.integers(1, 1000, 100).astype(np.int64)
        nt = np.array([0.3, 0.2, 0.24, 0.26])
        for theta in ([1e-3, 1e-3], [0.01, 0.005], [0.5, 0.2]):
            got = float(
                likelihoods.compound_neg_log_likelihood(
                    jnp.asarray(theta), jnp.asarray(p), jnp.asarray(mult), nt, lgamma_tab
                )
            )
            want = lynch_ld.compound_neg_log_likelihood_ld(
                np.asarray(theta), p, mult, nt
            )
            assert got == pytest.approx(want, rel=1e-12)

    def test_compound_objective_box_penalty(self, lgamma_tab):
        p = random_profiles(10)
        mult = np.ones(10, np.int64)
        nt = np.array([0.25, 0.25, 0.25, 0.25])
        dbl_max = np.finfo(np.float64).max
        for theta in ([-0.1, 0.1], [0.1, -0.1], [1.1, 0.5], [0.5, 1.1]):
            got = float(
                likelihoods.compound_neg_log_likelihood(
                    jnp.asarray(theta), jnp.asarray(p), jnp.asarray(mult), nt, lgamma_tab
                )
            )
            assert got == dbl_max

    def test_padded_profiles_contribute_zero(self, lgamma_tab):
        p = random_profiles(30)
        mult = RNG.integers(1, 50, 30).astype(np.int64)
        nt = np.array([0.25, 0.25, 0.25, 0.25])
        theta = jnp.asarray([1e-3, 1e-3])
        base = float(
            likelihoods.compound_neg_log_likelihood(
                theta, jnp.asarray(p), jnp.asarray(mult), nt, lgamma_tab
            )
        )
        p_pad = np.concatenate([p, np.zeros((17, 4), np.int32)])
        m_pad = np.concatenate([mult, np.zeros(17, np.int64)])
        padded = float(
            likelihoods.compound_neg_log_likelihood(
                theta, jnp.asarray(p_pad), jnp.asarray(m_pad), nt, lgamma_tab
            )
        )
        # adding zero-mult rows only changes the reduction tree (ulp-level)
        assert padded == pytest.approx(base, rel=1e-14)
        # the zero-mult guard must make the padded rows' *content* irrelevant
        p_pad2 = np.concatenate([p, np.full((17, 4), 9, np.int32)])
        padded2 = float(
            likelihoods.compound_neg_log_likelihood(
                theta, jnp.asarray(p_pad2), jnp.asarray(m_pad), nt, lgamma_tab
            )
        )
        assert padded2 == padded


class TestBinomialPmf:
    # scipy-precomputed vectors from test-likelihoods.cpp:22-52
    def test_small_numbers(self):
        ns = [19, 26, 22, 16, 11, 29, 19, 16, 8, 20, 18, 5, 27, 19, 7, 5, 7, 17, 14, 20]
        ks = [3, 19, 14, 3, 1, 9, 15, 5, 2, 5, 11, 2, 23, 17, 5, 2, 2, 15, 7, 18]
        ps = [0.465, 0.79, 0.408, 0.246, 0.198, 0.78, 0.141, 0.458, 0.498, 0.726,
              0.371, 0.677, 0.944, 0.856, 0.391, 0.415, 0.53, 0.531, 0.2, 0.781]
        want = [0.0043887732991, 0.134444693935, 0.0170865213655, 0.212236876077,
                0.23977370731, 7.55016097332e-08, 3.65294483313e-10, 0.104376365853,
                0.11113197172, 1.15182183063e-05, 0.0227207304627, 0.154448930158,
                0.0458548310537, 0.252217428847, 0.0711766702131, 0.344797248656,
                0.135288326179, 0.00225062122373, 0.00921270484992, 0.106502656473]
        tab = jnp.asarray(lgamma_int_table(64))
        got = stats.binomial_pmf(np.array(ns), np.array(ks), np.array(ps), tab)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-9)

    def test_large_numbers(self):
        ns = [822, 2743, 2839, 1717, 817, 967, 3453, 508, 847, 3366]
        ks = [536, 2115, 2368, 761, 65, 776, 924, 51, 654, 895]
        ps = [0.319, 0.092, 0.301, 0.088, 0.233, 0.122, 0.267, 0.055, 0.133, 0.237]
        want = [2.81146007965e-85, 0.0, 0.0, 0.0, 3.06463896982e-31, 0.0,
                0.0152864467193, 1.62629093503e-05, 0.0, 8.05206271196e-06]
        tab = jnp.asarray(lgamma_int_table(4096))
        got = np.asarray(
            stats.binomial_pmf(np.array(ns), np.array(ks), np.array(ps), tab)
        )
        for g, w in zip(got, want):
            if w == 0.0:
                assert g < 1e-300
            else:
                assert g == pytest.approx(w, rel=1e-8)


class TestNucleotideDistribution:
    # test-likelihoods.cpp:54-83
    def test_zero_profiles(self):
        d = prof_ops.nucleotide_distribution(np.zeros((0, 4)), np.zeros(0))
        np.testing.assert_allclose(d, [0.25, 0.25, 0.25, 0.25])

    def test_one_base(self):
        d = prof_ops.nucleotide_distribution(np.array([[10, 0, 0, 0]]), np.array([1]))
        np.testing.assert_allclose(d, [1, 0, 0, 0])

    def test_multiple_bases(self):
        profs = np.array([[1, 0, 0, 0], [1, 1, 0, 0], [0, 0, 0, 1]])
        mult = np.array([4, 2, 2])
        d = prof_ops.nucleotide_distribution(profs, mult)
        np.testing.assert_allclose(d, [0.6, 0.2, 0, 0.2])


class TestUniqueProfiles:
    # test-call.cpp:16-35
    def test_general(self):
        counts = np.array([[1, 1, 1, 1], [2, 2, 2, 2], [1, 1, 1, 1]], np.uint16)
        profs, mult, inverse = prof_ops.unique_profiles(counts)
        assert profs.tolist() == [[1, 1, 1, 1], [2, 2, 2, 2]]
        assert mult.tolist() == [2, 1]
        assert inverse.tolist() == [0, 1, 0]

    def test_empty(self):
        profs, mult, inverse = prof_ops.unique_profiles(np.zeros((0, 4), np.uint16))
        assert profs.shape == (0, 4)
        assert mult.shape == (0,)

    def test_lexicographic_order(self):
        counts = np.array([[3, 0, 0, 0], [0, 1, 0, 0], [3, 0, 0, 0], [0, 0, 2, 0]])
        profs, mult, _ = prof_ops.unique_profiles(counts)
        assert profs.tolist() == [[0, 0, 2, 0], [0, 1, 0, 0], [3, 0, 0, 0]]

    def test_coverage_filter(self):
        profs = np.array([[1, 1, 2, 0], [4, 0, 0, 0], [1, 0, 0, 0]])
        mult = np.array([5, 6, 7])
        fp, fm, keep = prof_ops.filter_min_coverage(profs, mult, 4)
        assert fp.tolist() == [[1, 1, 2, 0], [4, 0, 0, 0]]
        assert fm.tolist() == [5, 6]
        assert keep.tolist() == [True, True, False]
