"""Bitwise nmsimplex2 trace-equality tool (run in a subprocess).

Run with ``XLA_FLAGS=--xla_backend_optimization_level=0`` so XLA:CPU does
not contract mul+add chains into FMAs (a value-changing excess-precision
optimization LLVM applies by default). With contraction off, the JAX
while-loop minimizer and the NumPy executable spec must produce
bitwise-identical best corners after every iteration count k — i.e. they
are the same algorithm, differing only by backend rounding modes the
hardware applies. Exits non-zero with a diagnostic on the first mismatch.

Shared objective definitions live here so both the subprocess run and the
in-process behavioral tests (test_nmsimplex_adversarial.py) use the same
adversarial suite.
"""

import math
import sys

import numpy as np

DBL_MAX = float(np.finfo(np.float64).max)


def _make_objectives(jnp):
    def quad(x):
        return (x[0] - 3.0) ** 2 + 2.0 * (x[1] + 1.0) ** 2

    def ill_conditioned(x):
        return 1e6 * x[0] ** 2 + 1e-4 * x[1] ** 2

    def rosenbrock(x):
        return (1.0 - x[0]) ** 2 + 100.0 * (x[1] - x[0] ** 2) ** 2

    def mckinnon(x):
        # McKinnon (1998) tau=2, theta=6, phi=60: the classic Nelder-Mead
        # stagnation polynomial (continuous, strictly convex in y)
        return jnp.where(
            x[0] <= 0.0, 360.0 * x[0] ** 2, 6.0 * x[0] ** 2
        ) + x[1] + x[1] ** 2

    def box_penalty(x):
        inside = (jnp.abs(x[0]) <= 1.0) & (jnp.abs(x[1]) <= 1.0)
        return jnp.where(inside, x[0] ** 2 + x[1] ** 2 + 1.0, DBL_MAX)

    def plateau(x):
        # floor-quantized bowl: flat shelves force ties in every branch
        return jnp.floor(4.0 * (x[0] ** 2 + x[1] ** 2))

    def inf_wall(x):
        return jnp.where(x[0] < 0.0, jnp.inf, x[0] + x[1] ** 2)

    def nan_wall(x):
        return jnp.where(x[0] < 0.0, jnp.nan, x[0] + x[1] ** 2)

    def constant(x):
        return 1.0 + 0.0 * x[0]

    return [
        (quad, [0.0, 0.0], [0.1, 0.1]),
        (ill_conditioned, [1.0, 1.0], [0.5, 0.5]),
        (rosenbrock, [-1.2, 1.0], [0.1, 0.1]),
        (mckinnon, [1.0, 1.0], [-1.0, 1.0]),
        (box_penalty, [0.9, 0.9], [0.2, 0.2]),   # reflections land outside
        (plateau, [2.0, 2.0], [0.3, 0.3]),
        (inf_wall, [0.5, 1.0], [1.0, 0.5]),      # reflections cross the wall
        (nan_wall, [0.5, 1.0], [1.0, 0.5]),
        (constant, [0.0, 0.0], [1.0, 1.0]),      # hi == lo == 0 every step
    ]


KS = [1, 2, 3, 5, 8, 13, 21, 34, 55, 89]


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import sid_tpu  # noqa: F401  (enables x64)
    import jax.numpy as jnp

    from sid_tpu.exact.nmsimplex import minimize_nmsimplex2
    from sid_tpu.ops.nmsimplex import minimize_nmsimplex2_jax

    cases = _make_objectives(jnp)

    # the production objective too: compound likelihood on a real histogram
    from sid_tpu.ops.lgamma import lgamma_int_table, table_size
    from sid_tpu.ops.likelihoods import compound_neg_log_likelihood
    from sid_tpu.ops.profiles import nucleotide_distribution, unique_profiles
    from synth import simulate_diploid_counts

    counts = simulate_diploid_counts(800, coverage=20, pi=0.02, eps=0.01, seed=21)
    profs, mult, _ = unique_profiles(counts)
    nt = nucleotide_distribution(profs, mult)
    tab = jnp.asarray(lgamma_int_table(table_size(int(profs.sum(-1).max()))))
    pd = jnp.asarray(profs.astype(np.int32))
    md = jnp.asarray(mult)
    ntd = jnp.asarray(nt)

    def lynch_objective(th):
        return compound_neg_log_likelihood(th, pd, md, ntd, tab)

    cases.append((lynch_objective, [1e-3, 1e-3], [1e-4, 1e-4]))

    failures = 0
    for f, x0, step in cases:
        name = getattr(f, "__name__", "lynch_objective")
        jf = jax.jit(f)
        f_np = lambda x: float(jf(jnp.asarray(x, jnp.float64)))
        x0j = jnp.asarray(x0, jnp.float64)
        stepj = jnp.asarray(step, jnp.float64)
        # k as a dynamic argument: one compile per case covers every k
        runner = jax.jit(
            lambda k, _f=jf, _x=x0j, _s=stepj: minimize_nmsimplex2_jax(
                _f, _x, _s, tol=0.0, max_iterations=k
            )
        )
        for k in KS:
            res_np = minimize_nmsimplex2(f_np, x0, step, tol=0.0, max_iterations=k)
            res_jx = runner(jnp.int32(k))
            jx = np.asarray(res_jx.x)
            jv = float(res_jx.fval)
            same_x = np.array_equal(jx, res_np.x)
            same_f = jv == res_np.fval or (math.isnan(jv) and math.isnan(res_np.fval))
            if not (same_x and same_f):
                failures += 1
                print(
                    f"MISMATCH {name} k={k}: jax x={jx.tolist()} f={jv!r} "
                    f"np x={res_np.x.tolist()} f={res_np.fval!r}",
                )
                break
        else:
            print(f"OK {name}: bitwise-equal best corners for k in {KS}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
