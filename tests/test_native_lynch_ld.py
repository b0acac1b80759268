"""Bitwise differential tests for the native long-double Lynch kernels.

The native kernels (parser.cpp sidtpu_compound_nll_ld /
sidtpu_lynch_marginals_ld) accelerate the exact-fit oracle ~20-50x. They
must be bitwise-identical to the numpy longdouble spec in
sid_tpu/exact/lynch_ld.py (the executable transcription of lynch.hpp:48-96
and lynch.cpp:37-61): both route transcendentals through glibc libm
(numpy's longdouble powl/logl/expl are the glibc calls on this platform),
so the two are independent transcriptions sharing only libm — a
transcription bug in either side fails these tests.

Comparisons use exact value equality (==) on longdouble, never byte views:
the x86-64 80-bit format leaves 6 padding bytes per element undefined.

Note: ctypes cannot witness long double returns (c_longdouble restypes
round through Python float), so libm itself cannot be called scalar-wise
from Python for a third witness; the numpy-vs-C++ pair is the differential.
"""

import os

import numpy as np
import pytest

from sid_tpu.exact import lynch_ld
from sid_tpu.ops.profiles import nucleotide_distribution

LD = np.longdouble


def make_profiles(rng, U, max_cov=60):
    cov = rng.integers(4, max_cov, U)
    maj = rng.integers(0, 4, U)
    prof = np.zeros((U, 4), np.int64)
    idx = np.arange(U)
    n_err = (cov // rng.integers(6, 20, U)).astype(np.int64)
    prof[idx, maj] = cov - n_err
    prof[idx, (maj + 1) % 4] = n_err
    mult = rng.integers(1, 100, U).astype(np.int64)
    return prof, mult


@pytest.fixture(scope="module")
def native_available():
    if lynch_ld._native_lynch_lib() is None:
        pytest.skip("libsidtpu not available")


THETAS = [
    (1e-3, 1e-3),
    (1.1e-3, 0.9e-3),
    (0.5, 0.01),
    (0.0, 0.0),
    (1.0, 1.0),
    (-0.1, 0.5),  # box penalty
    (0.2, 3.85e-11),  # boundary epsilon (the degenerate-fit regime)
]

EPSILONS = [1e-3, 0.05, 3.85e-11, 0.0, 0.5, 1.0]


class TestNativeVsNumpySpec:
    @pytest.mark.parametrize("seed,U", [(0, 1), (1, 23), (2, 100), (3, 4097)])
    def test_objective_bitwise(self, native_available, seed, U):
        rng = np.random.default_rng(seed)
        prof, mult = make_profiles(rng, U)
        nt = nucleotide_distribution(prof, mult)
        nat = lynch_ld.NativeLynchLD(prof, mult, nt)
        for theta in THETAS:
            a = lynch_ld.compound_neg_log_likelihood_ld(
                np.asarray(theta), prof, mult, nt
            )
            b = nat.objective(np.asarray(theta))
            assert a == b, (U, theta, a, b)

    @pytest.mark.parametrize("seed,U", [(0, 1), (3, 23), (4, 311)])
    def test_marginals_bitwise(self, native_available, seed, U):
        rng = np.random.default_rng(seed)
        prof, mult = make_profiles(rng, U)
        nt = nucleotide_distribution(prof, mult)
        nat = lynch_ld.NativeLynchLD(prof, mult, nt)
        for eps in EPSILONS:
            want_hom = lynch_ld.hom_marginal_ld(prof, eps, nt)
            want_het = lynch_ld.het_marginal_ld(prof, eps, nt)
            got_hom, got_het = nat.marginals(eps)
            assert np.array_equal(want_hom, got_hom), (U, eps, "hom")
            assert np.array_equal(want_het, got_het), (U, eps, "het")

    def test_skewed_nt_distribution(self, native_available):
        # zero nt entries (pileup.cpp:198-217 can produce them) must not
        # diverge between the implementations
        prof = np.array([[30, 2, 0, 0], [4, 0, 0, 0], [10, 10, 0, 0]], np.int64)
        mult = np.array([7, 1, 2], np.int64)
        nt = np.array([0.9, 0.1, 0.0, 0.0])
        nat = lynch_ld.NativeLynchLD(prof, mult, nt)
        for eps in EPSILONS:
            assert np.array_equal(
                lynch_ld.hom_marginal_ld(prof, eps, nt), nat.marginals(eps)[0]
            )
        for theta in THETAS:
            a = lynch_ld.compound_neg_log_likelihood_ld(
                np.asarray(theta), prof, mult, nt
            )
            assert a == nat.objective(np.asarray(theta))

    def test_zero_likelihood_rows_skipped(self, native_available):
        # extreme coverage drives L to 0 -> the term is skipped (lynch.cpp:49-51)
        prof = np.array([[20000, 0, 0, 0], [30, 2, 0, 0]], np.int64)
        mult = np.array([1, 5], np.int64)
        nt = nucleotide_distribution(prof, mult)
        nat = lynch_ld.NativeLynchLD(prof, mult, nt)
        theta = np.asarray([1e-3, 0.5])
        a = lynch_ld.compound_neg_log_likelihood_ld(theta, prof, mult, nt)
        b = nat.objective(theta)
        assert a == b

    def test_threaded_sum_deterministic(self, native_available):
        # threads fill disjoint term ranges; the profile sum is sequential on
        # one thread, so results are invariant across repeated runs
        rng = np.random.default_rng(7)
        prof, mult = make_profiles(rng, 8192)
        nt = nucleotide_distribution(prof, mult)
        nat = lynch_ld.NativeLynchLD(prof, mult, nt)
        theta = np.asarray([1e-3, 1e-3])
        vals = {nat.objective(theta) for _ in range(3)}
        assert len(vals) == 1
        # and bitwise equal to the single-threaded numpy spec
        assert vals.pop() == lynch_ld.compound_neg_log_likelihood_ld(
            theta, prof, mult, nt
        )


class TestFitTrajectoryEquality:
    def test_full_fit_identical(self, native_available):
        # the whole nmsimplex trajectory (not just single evaluations) must be
        # identical: same fitted point, same per-profile likelihood arrays
        rng = np.random.default_rng(5)
        prof, mult = make_profiles(rng, 500)
        nt = nucleotide_distribution(prof, mult)
        pi_n, eps_n, hom_n, het_n = lynch_ld.estimate_profile_genotype_likelihoods_ld(
            prof, mult, nt
        )
        os.environ["SIDTPU_NO_NATIVE_LD"] = "1"
        try:
            pi_p, eps_p, hom_p, het_p = (
                lynch_ld.estimate_profile_genotype_likelihoods_ld(prof, mult, nt)
            )
        finally:
            del os.environ["SIDTPU_NO_NATIVE_LD"]
        assert pi_n == pi_p and eps_n == eps_p
        assert np.array_equal(hom_n, hom_p)
        assert np.array_equal(het_n, het_p)

    def test_degenerate_boundary_fit_identical(self, native_available):
        # tiny histogram driving epsilon to the box boundary — the regime
        # where fit-trajectory divergence is most visible
        prof = np.array([[5, 0, 0, 0], [4, 0, 0, 0], [2, 2, 0, 0]], np.int64)
        mult = np.array([2, 2, 1], np.int64)
        nt = nucleotide_distribution(prof, mult)
        r_nat = lynch_ld.estimate_profile_genotype_likelihoods_ld(prof, mult, nt)
        os.environ["SIDTPU_NO_NATIVE_LD"] = "1"
        try:
            r_np = lynch_ld.estimate_profile_genotype_likelihoods_ld(prof, mult, nt)
        finally:
            del os.environ["SIDTPU_NO_NATIVE_LD"]
        assert r_nat[0] == r_np[0] and r_nat[1] == r_np[1]
        assert np.array_equal(r_nat[2], r_np[2])
        assert np.array_equal(r_nat[3], r_np[3])
