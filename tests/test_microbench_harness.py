"""The kernel-timing harness: K-loop identity and dependency discipline.

make_looped_kernel must run the EXACT production kernel K times (the
accumulated sum is exactly K x one call's sum) while perturbing every
integer input plane with a runtime-zero bump — the r5 lesson being that a
dependency that misses an input lets XLA hoist the invariant
subexpressions and the "loop" measures a slice of the kernel
(BASELINE.md's measurement-correction history; pitfalls in CLAUDE.md).
"""

import jax
import numpy as np
import pytest

from sid_tpu.utils.warmup import (
    make_looped_kernel,
    microbench_inputs,
    microbench_kernels,
)


@pytest.mark.parametrize(
    "name", [n for n, _ in microbench_kernels() if not n.endswith("_ds")]
)
def test_loop_accumulates_exactly_k_times(name):
    fn = dict(microbench_kernels())[name]
    args = microbench_inputs(n=2048)
    out1 = jax.block_until_ready(fn(args))
    s1 = sum(
        np.sum(np.asarray(o, np.float64))
        for o in jax.tree_util.tree_leaves(out1)
    )
    for k in (3, 8):
        acc = float(jax.block_until_ready(make_looped_kernel(fn, k)(args)))
        assert np.isclose(acc, k * s1, rtol=1e-12), (name, k, acc, k * s1)


def test_variant_seeds_share_shapes_but_not_content():
    a = microbench_inputs(n=2048, seed=0)
    b = microbench_inputs(n=2048, seed=1)
    pa, pb = np.asarray(a["profiles"]), np.asarray(b["profiles"])
    assert pa.shape == pb.shape and pa.dtype == pb.dtype
    assert not np.array_equal(pa, pb)  # distinct buffers defeat result reuse
    # tables are content-identical across seeds (same executable + constants)
    np.testing.assert_array_equal(
        np.asarray(a["lgamma_tab"]), np.asarray(b["lgamma_tab"])
    )
