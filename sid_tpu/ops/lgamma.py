"""Integer log-gamma lookup table.

The reference memoizes ``gsl_sf_lngamma`` at non-negative integer arguments in
a growable cache (lynch.hpp:11-31) — including the quirk that ``lngamma(0)``
is defined as 0 there. On device this becomes a precomputed f64 table gathered
by integer index; the table covers every value the kernels can request
(arguments up to max_coverage + 1).
"""

from __future__ import annotations

import numpy as np
from scipy.special import gammaln


def lgamma_int_table(max_arg: int) -> np.ndarray:
    """Table ``t`` with ``t[k] = lngamma(k)`` for k in [0, max_arg], t[0] = 0.

    The reference's ``log_gamma(0) == 0`` special case (lynch.hpp:20-21) is
    baked into index 0 (true lngamma(0) = +inf).
    """
    ks = np.arange(max_arg + 1, dtype=np.float64)
    t = gammaln(ks)
    t[0] = 0.0
    return t


def table_size(max_arg: int, minimum: int = 1024) -> int:
    """Stable (power-of-two, floored) table length covering max_arg + 2.

    Keeping the table shape in a small set of buckets means XLA compiles the
    kernels once per bucket, not once per dataset.
    """
    need = max_arg + 2
    b = minimum
    while b < need:
        b *= 2
    return b
