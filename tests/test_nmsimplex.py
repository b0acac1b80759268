"""Nelder-Mead (GSL nmsimplex2 rule) and the Lynch fit oracle."""

import jax
import jax.numpy as jnp
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


class TestLeanLoopEquivalence:
    """The lean single-instantiation loop (minimize_nmsimplex2_jax) must be
    bitwise-equal to the classic whole-iteration loop
    (minimize_nmsimplex2_jax_classic) — same evaluation points, same order,
    same update arithmetic (VERDICT r4 next #5). Measured additionally: the
    lean loop is bitwise-stable UNDER VMAP (lane == scalar run), which the
    classic loop is not (XLA batched-branch arithmetic drifts by ulps)."""

    OBJECTIVES = {
        "rosenbrock": lambda th: (1 - th[0]) ** 2
        + 100 * (th[1] - th[0] ** 2) ** 2,
        "quadratic": lambda th: jnp.sum((th - jnp.asarray([0.3, -0.7])) ** 2),
        "abs": lambda th: jnp.sum(jnp.abs(th - 0.12345)),
        "nan_region": lambda th: jnp.where(
            th[1] < -0.001, jnp.float64(jnp.nan), jnp.sum((th - 0.2) ** 2)
        ),
        "inf_penalty": lambda th: jnp.where(
            jnp.abs(th[0]) > 0.05, jnp.inf, jnp.sum(th ** 2)
        ),
    }

    @pytest.mark.parametrize("name", sorted(OBJECTIVES))
    def test_bitwise_equal_to_classic(self, name):
        from sid_tpu.ops.nmsimplex import (
            minimize_nmsimplex2_jax,
            minimize_nmsimplex2_jax_classic,
        )

        f = self.OBJECTIVES[name]
        a = minimize_nmsimplex2_jax_classic(
            f, jnp.asarray([1e-3, 1e-3]), jnp.asarray([1e-4, 1e-4])
        )
        b = minimize_nmsimplex2_jax(
            f, jnp.asarray([1e-3, 1e-3]), jnp.asarray([1e-4, 1e-4])
        )
        np.testing.assert_array_equal(np.asarray(a.x), np.asarray(b.x))
        assert int(a.iterations) == int(b.iterations)
        assert bool(a.converged) == bool(b.converged)
        av, bv = float(a.fval), float(b.fval)
        assert (av == bv) or (np.isnan(av) and np.isnan(bv))

    def test_bitwise_equal_on_lynch_objective(self):
        from sid_tpu.ops import likelihoods as lk
        from sid_tpu.ops.lgamma import lgamma_int_table
        from sid_tpu.ops.nmsimplex import (
            minimize_nmsimplex2_jax,
            minimize_nmsimplex2_jax_classic,
        )
        from sid_tpu.ops.profiles import nucleotide_distribution
        from sid_tpu.utils.padding import pad_axis0

        rng = np.random.default_rng(17)
        profiles = rng.multinomial(
            25, [0.9, 0.05, 0.03, 0.02], (700,)
        ).astype(np.int32)
        mult = rng.integers(1, 200, 700).astype(np.int64)
        nt = nucleotide_distribution(profiles, mult)
        tab = jnp.asarray(lgamma_int_table(1023))
        fp = jnp.asarray(pad_axis0(profiles))
        fm = jnp.asarray(pad_axis0(mult))

        def obj(th):
            return lk.compound_neg_log_likelihood(th, fp, fm, jnp.asarray(nt), tab)

        a = minimize_nmsimplex2_jax_classic(
            obj, jnp.asarray([1e-3, 1e-3]), jnp.asarray([1e-4, 1e-4])
        )
        b = minimize_nmsimplex2_jax(
            obj, jnp.asarray([1e-3, 1e-3]), jnp.asarray([1e-4, 1e-4])
        )
        np.testing.assert_array_equal(np.asarray(a.x), np.asarray(b.x))
        assert int(a.iterations) == int(b.iterations)

    def test_lean_vmap_lane_equals_scalar(self):
        from sid_tpu.ops.nmsimplex import minimize_nmsimplex2_jax

        f = self.OBJECTIVES["quadratic"]
        starts = jnp.asarray(
            np.random.default_rng(0).uniform(-1, 1, (6, 2))
        )
        batched = jax.vmap(
            lambda x0: minimize_nmsimplex2_jax(
                f, x0, jnp.asarray([1e-4, 1e-4])
            )
        )(starts)
        for i in range(6):
            solo = minimize_nmsimplex2_jax(
                f, starts[i], jnp.asarray([1e-4, 1e-4])
            )
            np.testing.assert_array_equal(
                np.asarray(batched.x[i]), np.asarray(solo.x)
            )
            assert int(batched.iterations[i]) == int(solo.iterations)
