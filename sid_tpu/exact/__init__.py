"""Host exact engine: long-double oracle for parity validation.

GSL is not available in this environment, so the reference binary cannot be
built; this package is the parity standard instead. It re-implements the
reference's observable numerics with matched precision semantics:

- likelihood kernels in ``np.longdouble`` (x86 80-bit extended — the same
  format the reference's ``long double`` uses) with the reference's exact
  accumulation order (lynch.hpp:48-96);
- the GSL nmsimplex2 Nelder-Mead update rule in float64 (optimization.hpp
  wraps gsl_multimin_fminimizer_nmsimplex2), reimplemented from the
  documented algorithm: running-center corner moves, incremental RMS size,
  1e-5 size test, max 1000 iterations;
- chi-square survival via libm erfc (GSL's gsl_cdf_chisq_Q equivalent).

The device engine (sid_tpu.models) must reproduce this oracle's CSV output on
fixtures; the oracle also serves as the ``fit_backend="exact"`` slow path.
"""

from sid_tpu.exact.nmsimplex import minimize_nmsimplex2  # noqa: F401
