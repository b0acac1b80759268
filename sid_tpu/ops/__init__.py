"""Device ops: vectorized f64 log-space kernels for the genotype model.

Layer L0 of the framework (SURVEY §1): genotype likelihood kernels
(lynch.hpp:48-96 math in log-space), statistics (stats.cpp LRT/BH), the
GSL-nmsimplex2-faithful Nelder-Mead, and host-side profile compaction.
"""

from sid_tpu.ops.lgamma import lgamma_int_table  # noqa: F401
from sid_tpu.ops.profiles import (  # noqa: F401
    nucleotide_distribution,
    unique_profiles,
)
