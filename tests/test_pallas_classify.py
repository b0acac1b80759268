"""The Mosaic slim-classify prototype vs the XLA DS kernel (interpret mode).

On this suite's CPU backend the Pallas kernel runs through the interpreter
(``interpret=True``) — slow but semantically the Mosaic program — and must
reproduce the XLA DS kernel's (l1, l2) values: same -inf sets, same cap
branches, agreement at DS precision. TPU-side performance is measured by
bench.py's microbench (SIDTPU_DEVICE_IMPL=pallas rows).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from sid_tpu.models.common import major_allele_indices_np
from sid_tpu.ops.lgamma import table_size
from sid_tpu.ops.likelihoods_ds import (
    lgamma_table_ds,
    local_fixed_log_likelihoods_ds,
    log_int_table_ds,
)
from sid_tpu.ops.pallas_classify import local_log_likelihoods_pallas


def _profiles(u, seed=5):
    rng = np.random.default_rng(seed)
    cov = rng.poisson(30, u).clip(0)
    cov[0] = 0  # zero-coverage edge case
    out = np.zeros((u, 4), np.int32)
    for i in range(u):
        p = rng.dirichlet([8, 1, 0.5, 0.2])
        out[i] = rng.multinomial(cov[i], p)
    # a guaranteed capped row (huge error rate) and a clean hom row
    out[1] = [2, 20, 20, 20]
    out[2] = [40, 0, 0, 0]
    return out


@pytest.mark.slow
def test_pallas_matches_xla_ds_kernel():
    u = 8192
    profiles = _profiles(u)
    major, second = major_allele_indices_np(profiles.astype(np.int64))
    tsize = table_size(int(profiles.sum(-1).max()))
    thr = jnp.float64(0.1)

    a1, a2 = local_fixed_log_likelihoods_ds(
        jnp.asarray(profiles), jnp.asarray(major), jnp.asarray(second),
        thr, log_int_table_ds(tsize), lgamma_table_ds(tsize),
    )
    b1, b2 = local_log_likelihoods_pallas(
        jnp.asarray(profiles), jnp.asarray(major), jnp.asarray(second),
        thr, lgamma_table_ds(tsize), interpret=True,
    )
    for a, b in ((np.asarray(a1), np.asarray(b1)), (np.asarray(a2), np.asarray(b2))):
        assert np.array_equal(np.isfinite(a), np.isfinite(b))
        fin = np.isfinite(a)
        # both are DS (~2^-48) evaluations of the same math; they differ only
        # through the gather-free ratio-log's division order
        assert np.max(np.abs(a[fin] - b[fin])) < 1e-10, np.max(np.abs(a[fin] - b[fin]))
