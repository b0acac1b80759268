"""Nelder-Mead (GSL nmsimplex2 rule) and the Lynch fit oracle."""

import numpy as np
import pytest

from sid_tpu.exact import lynch_ld
from sid_tpu.exact.nmsimplex import minimize_nmsimplex2


class TestNmsimplex2:
    def test_quadratic(self):
        f = lambda x: float((x[0] - 3.0) ** 2 + 2.0 * (x[1] + 1.0) ** 2)
        res = minimize_nmsimplex2(f, [0.0, 0.0], [0.1, 0.1])
        assert res.converged
        np.testing.assert_allclose(res.x, [3.0, -1.0], atol=1e-4)

    def test_rosenbrock(self):
        f = lambda x: float((1 - x[0]) ** 2 + 100.0 * (x[1] - x[0] ** 2) ** 2)
        res = minimize_nmsimplex2(f, [-1.2, 1.0], [0.1, 0.1])
        assert res.converged
        np.testing.assert_allclose(res.x, [1.0, 1.0], atol=1e-3)

    def test_box_penalty_objective(self):
        # penalty plateaus (DBL_MAX outside a box) must not break the simplex
        dbl_max = np.finfo(np.float64).max

        def f(x):
            if abs(x[0]) > 1 or abs(x[1]) > 1:
                return dbl_max
            return float(x[0] ** 2 + x[1] ** 2 + 1.0)

        res = minimize_nmsimplex2(f, [0.9, 0.9], [0.05, 0.05])
        assert res.converged
        np.testing.assert_allclose(res.x, [0.0, 0.0], atol=1e-4)

    def test_diagnostics_messages(self):
        lines = []
        f = lambda x: float(x[0] ** 2 + x[1] ** 2)
        res = minimize_nmsimplex2(f, [1.0, 1.0], [0.1, 0.1], log=lines.append)
        assert res.converged
        assert len(lines) == 1
        assert lines[0] == (
            f"# GSL function minimization converged in {res.iterations} iterations."
        )

    def test_max_iterations(self):
        lines = []
        # unbounded linear descent: the simplex expands forever
        f = lambda x: float(x[0] + x[1])
        res = minimize_nmsimplex2(f, [0.0, 0.0], [1.0, 1.0], log=lines.append)
        assert not res.converged
        assert res.iterations == 1000
        assert "did not converge in 1000 iterations!" in lines[0]


class TestLynchFitOracle:
    def test_recovers_simulated_parameters(self):
        # simulate ~30x diploid profiles at known (pi, eps), fit, recover
        rng = np.random.default_rng(123)
        n_sites, cov, pi_true, eps_true = 4000, 30, 0.01, 0.005
        is_het = rng.uniform(size=n_sites) < pi_true
        counts = np.zeros((n_sites, 4), np.int64)
        for s in range(n_sites):
            probs = np.full(4, eps_true / 3.0)
            if is_het[s]:
                a, b = rng.choice(4, size=2, replace=False)
                probs[a] = probs[b] = (1 - 2 * eps_true / 3) / 2
            else:
                a = rng.integers(4)
                probs[a] = 1 - eps_true
            counts[s] = rng.multinomial(cov, probs)
        from sid_tpu.ops.profiles import nucleotide_distribution, unique_profiles

        profs, mult, _ = unique_profiles(counts)
        nt = nucleotide_distribution(profs, mult)
        pi, eps, l_hom, l_het = lynch_ld.estimate_profile_genotype_likelihoods_ld(
            profs, mult, nt
        )
        assert pi == pytest.approx(pi_true, rel=0.4)
        assert eps == pytest.approx(eps_true, rel=0.2)
        assert l_hom.shape == (profs.shape[0],)
        assert np.all(l_hom >= 0) and np.all(l_het >= 0)
