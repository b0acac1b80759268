"""Bitwise differential: fused native quality finalize vs the numpy path.

The fused kernel (parser.cpp sidtpu_quality_finalize) must reproduce the
composition finalize_quality_np -> lrt_pvalue_from_logs_np x2 -> threshold
bit for bit: elementary IEEE ops plus glibc erfc on both sides.
"""

import os

import numpy as np
import pytest

from sid_tpu.models import quality
from sid_tpu.ops import stats
from sid_tpu.ops.lgamma import lgamma_int_table, table_size


def _numpy_path(counts, major, second, log_hom, log_het, prior, alpha, tab):
    lpp1, lpp2 = quality.finalize_quality_np(
        counts, major, second, log_hom, log_het, prior, tab
    )
    p1 = stats.lrt_pvalue_from_logs_np(lpp2, lpp1)
    p2 = stats.lrt_pvalue_from_logs_np(lpp1, lpp2)
    with np.errstate(invalid="ignore"):
        is_het = p2 < alpha
    return is_het, p1, p2


def make_case(n, seed, extreme=False):
    rng = np.random.default_rng(seed)
    cov = rng.integers(0, 5000 if extreme else 60, n)
    counts = np.zeros((n, 4), np.uint16)
    maj = rng.integers(0, 4, n).astype(np.int32)
    sec = ((maj + 1 + rng.integers(0, 3, n)) % 4).astype(np.int32)
    idx = np.arange(n)
    counts[idx, maj] = cov - cov // 3
    counts[idx, sec] = cov // 3
    scale = 20000.0 if extreme else 40.0
    log_hom = -rng.uniform(0, scale, n)
    log_het = -rng.uniform(0, scale, n)
    # sprinkle NaN/-inf edge values (zero-coverage sites produce them)
    log_hom[:: max(1, n // 7)] = np.nan
    log_het[:: max(1, n // 11)] = -np.inf
    return counts, maj, sec, log_hom, log_het


@pytest.mark.parametrize("seed,n,extreme", [(0, 257, False), (1, 5000, False),
                                            (2, 1000, True), (3, 8192, True)])
@pytest.mark.parametrize("prior", [-1.0, 0.01])
def test_fused_matches_numpy_bitwise(seed, n, extreme, prior):
    counts, maj, sec, log_hom, log_het = make_case(n, seed, extreme)
    max_cov = int(counts.sum(-1).max())
    tab = lgamma_int_table(table_size(2 * max_cov))
    alpha = 0.05
    fused = quality._quality_finalize_native(
        counts, maj, sec, log_hom, log_het, prior, alpha, tab
    )
    if fused is None:
        pytest.skip("libsidtpu not available")
    want = _numpy_path(counts, maj, sec, log_hom, log_het, prior, alpha, tab)
    for got_a, want_a, name in zip(fused, want, ("is_het", "p1", "p2")):
        np.testing.assert_array_equal(got_a, want_a, err_msg=name)
        # bit-level (catches -0.0 vs 0.0 and NaN payload drift)
        if got_a.dtype == np.float64:
            assert np.array_equal(
                got_a.view(np.uint64), want_a.view(np.uint64)
            ), name


def test_table_bounds_fall_back():
    counts, maj, sec, log_hom, log_het = make_case(64, 9)
    tab = lgamma_int_table(4)  # deliberately too small
    assert (
        quality._quality_finalize_native(
            counts, maj, sec, log_hom, log_het, -1.0, 0.05, tab
        )
        is None
    )


def test_env_kill_switch():
    counts, maj, sec, log_hom, log_het = make_case(16, 5)
    tab = lgamma_int_table(table_size(2 * int(counts.sum(-1).max())))
    os.environ["SIDTPU_NO_NATIVE_FINALIZE"] = "1"
    try:
        assert (
            quality._quality_finalize_native(
                counts, maj, sec, log_hom, log_het, -1.0, 0.05, tab
            )
            is None
        )
    finally:
        del os.environ["SIDTPU_NO_NATIVE_FINALIZE"]


class TestHetOnlyFinalizeDecomposition:
    """The r5 transfer-lean sharded finalize must reproduce the FULL device
    kernel: the het-only kernel + host prior add equals finalize_quality's
    log_pp2 bitwise (same XLA backend, same op order — only the scalar
    prior log moves host-side, an identical f64 add), and the host hom
    side equals the full kernel's log_pp1 at the default prior-log value.
    (The full device kernel and the host numpy finalize were never bitwise
    equal — XLA contracts the n*log2 multiply-subtract into an FMA at the
    ulp level, absorbed by the CSV's %g — so device-vs-device is the
    meaningful contract here; CSV-level parity is covered by the mesh
    equality tests.)"""

    def test_het_kernel_plus_host_equals_full_kernel(self):
        import jax.numpy as jnp

        from sid_tpu.models import common
        from sid_tpu.models.quality import finalize_quality, finalize_quality_het
        from sid_tpu.ops.lgamma import lgamma_int_table, table_size

        rng = np.random.default_rng(13)
        n = 4096
        counts = rng.multinomial(28, [0.7, 0.2, 0.07, 0.03], (n,)).astype(np.uint16)
        major, second = common.major_allele_indices_np(counts.astype(np.int64))
        log_hom = rng.uniform(-120.0, -1.0, n)
        log_het = rng.uniform(-120.0, -1.0, n)
        # rows deep enough to cross the long-double underflow clamp
        log_het[0] = -12000.0
        log_hom[1] = -12000.0
        prior = 0.01
        tab_np = lgamma_int_table(table_size(2 * 40))

        # reference: the full device kernel (pre-r5 sharded path)
        _, _, _, want1, want2 = (
            np.asarray(o)
            for o in finalize_quality(
                jnp.asarray(counts), jnp.asarray(major.astype(np.int8)),
                jnp.asarray(second.astype(np.int8)), jnp.asarray(log_hom),
                jnp.asarray(log_het), jnp.float64(prior),
                jnp.float64(0.05), jnp.asarray(tab_np),
            )
        )

        # transfer-lean composition: device het kernel + host hom/prior
        het_dev = np.asarray(
            finalize_quality_het(
                jnp.asarray(counts), jnp.asarray(major.astype(np.int8)),
                jnp.asarray(second.astype(np.int8)), jnp.asarray(log_het),
                jnp.asarray(tab_np),
            )
        )
        got2 = het_dev + np.log(np.float64(prior))
        got1 = common.clamp_ld_underflow_np(log_hom) + np.log(
            np.float64(1.0 - prior)
        )
        np.testing.assert_array_equal(got1, want1)
        np.testing.assert_array_equal(got2, want2)
