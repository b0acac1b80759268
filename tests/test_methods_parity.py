"""Device-engine vs exact-oracle CSV parity for all four methods.

The oracle (long-double linear space, faithful GSL nmsimplex2) stands in for
the unbuildable reference binary; the device engine must reproduce its CSV
byte-for-byte on these synthetic datasets (the BASELINE.md north-star parity
bar, config 1/2).
"""

import numpy as np
import pytest

from sid_tpu.config import Options
from sid_tpu.engine import call_batch
from sid_tpu.io.pileup import parse_pileup

from synth import make_pileup_text, simulate_diploid_counts


def _both_csv(text: bytes, method: str, **opt_kw):
    needs_reads = method == "quality"
    batch = parse_pileup(text, needs_reads, needs_reads, backend="python")
    device = call_batch(batch, Options(method=method, engine="device", **opt_kw))
    exact = call_batch(batch, Options(method=method, engine="exact", **opt_kw))
    return device.to_csv(), exact.to_csv()


@pytest.fixture(scope="module")
def sim_text():
    counts = simulate_diploid_counts(600, coverage=25, pi=0.02, eps=0.01)
    return make_pileup_text(counts, with_qualities=True)


@pytest.fixture(scope="module")
def edge_text():
    # edge cases: zero coverage, singleton coverage, ties, high coverage
    counts = np.array(
        [
            [0, 0, 0, 0],  # zero coverage: NaN error edge case
            [1, 0, 0, 0],
            [5, 5, 0, 0],  # tie: higher index wins the major slot
            [3, 3, 3, 3],  # full tie
            [200, 3, 0, 1],
            [15, 14, 1, 0],
            [0, 0, 0, 9],
            [2, 2, 2, 0],
            [30, 0, 0, 0],
            [0, 0, 0, 0],  # duplicate zero profile
        ]
    )
    return make_pileup_text(counts, with_qualities=True)


@pytest.fixture(scope="module")
def extreme_text():
    # coverages deep enough that linear long-double likelihoods underflow to
    # exactly 0 in the oracle (log L < -11399): the device engines must clamp
    # to -inf at the same line (round-1 advisor finding for bayes/LR)
    counts = np.array(
        [
            [20, 1, 0, 0],
            [10, 10, 0, 0],
            [3000, 2800, 0, 0],
            [6000, 0, 0, 0],
            [2500, 2500, 100, 0],
            [25, 0, 1, 0],
            [1, 2, 3000, 2900],
        ]
        * 4
    )
    return make_pileup_text(counts)


class TestLocalParity:
    def test_simulated(self, sim_text):
        d, e = _both_csv(sim_text, "local")
        assert d == e

    def test_edge_cases(self, edge_text):
        d, e = _both_csv(edge_text, "local")
        assert d == e

    def test_with_fixed_prior(self, sim_text):
        d, e = _both_csv(sim_text, "local", snp_prior=0.01)
        assert d == e

    def test_with_error_threshold(self, sim_text):
        d, e = _both_csv(sim_text, "local", site_error_threshold=0.02)
        assert d == e

    def test_estimated_prior(self, sim_text):
        d, e = _both_csv(sim_text, "local", estimate_prior=True, fit_backend="exact")
        assert d == e


class TestBayesParity:
    def test_simulated(self, sim_text):
        d, e = _both_csv(sim_text, "bayes", fit_backend="exact")
        assert d == e

    def test_edge_cases(self, edge_text):
        d, e = _both_csv(edge_text, "bayes", fit_backend="exact")
        assert d == e

    def test_extreme_coverage_underflow(self, extreme_text):
        d, e = _both_csv(extreme_text, "bayes", fit_backend="exact")
        assert d == e


class TestLikelihoodRatioParity:
    def test_simulated(self, sim_text):
        d, e = _both_csv(sim_text, "likelihood_ratio", fit_backend="exact")
        assert d == e

    def test_with_prior(self, sim_text):
        d, e = _both_csv(
            sim_text, "likelihood_ratio", estimate_prior=True, fit_backend="exact"
        )
        assert d == e

    def test_extreme_coverage_underflow(self, extreme_text):
        d, e = _both_csv(extreme_text, "likelihood_ratio", fit_backend="exact")
        assert d == e
        d, e = _both_csv(
            extreme_text, "likelihood_ratio", estimate_prior=True,
            fit_backend="exact",
        )
        assert d == e


class TestExactPvaluesKnob:
    def test_device_erfc_path_matches_at_csv_level(self, sim_text):
        # exact_pvalues=False keeps the LRT fused on device; on the CPU
        # backend both paths must serialize identically
        for method in ("local", "likelihood_ratio", "quality"):
            kw = {"fit_backend": "exact"} if method == "likelihood_ratio" else {}
            a, _ = _both_csv(sim_text, method, exact_pvalues=True, **kw)
            b, _ = _both_csv(sim_text, method, exact_pvalues=False, **kw)
            assert a == b, method


class TestQualityParity:
    def test_simulated(self, sim_text):
        d, e = _both_csv(sim_text, "quality")
        assert d == e

    def test_edge_cases(self, edge_text):
        d, e = _both_csv(edge_text, "quality")
        assert d == e

    def test_with_fixed_prior(self, sim_text):
        d, e = _both_csv(sim_text, "quality", snp_prior=0.02)
        assert d == e


@pytest.fixture(scope="module")
def degenerate_text():
    # tiny histogram (U<=4) of error-free profiles: the fitted epsilon lands
    # on the box boundary (~3.85e-11) and the objective is near-flat in pi —
    # the regime where an f64 log-space simplex trajectory diverges from the
    # long-double oracle in the 5th printed %g digit (round-2 verdict repro).
    # Default flags must stay byte-equal: the "auto" fit backend routes these
    # through the exact host fit.
    counts = np.array(
        [
            [5, 0, 0, 0],
            [5, 0, 0, 0],
            [4, 0, 0, 0],
            [2, 2, 0, 0],
            [6, 0, 0, 0],
        ]
    )
    return make_pileup_text(counts, with_qualities=True)


@pytest.fixture(scope="module")
def near_flat_text():
    # half het-looking, half hom-looking at low coverage: pi is pulled toward
    # the interior but the objective is shallow; U=8
    counts = np.array(
        [
            [4, 0, 0, 0],
            [2, 2, 0, 0],
            [5, 0, 0, 0],
            [3, 3, 0, 0],
            [0, 4, 0, 0],
            [0, 2, 2, 0],
            [6, 1, 0, 0],
            [3, 2, 1, 0],
        ]
    )
    return make_pileup_text(counts, with_qualities=True)


class TestDegenerateFitParity:
    """Byte parity on degenerate fits with DEFAULT flags (verdict-r2 #1).

    These run the full default pipeline (fit_backend="auto"): the device
    engine must byte-match the exact oracle on boundary-epsilon and
    near-flat-objective histograms, not just on well-conditioned fixtures.
    """

    @pytest.mark.parametrize("method", ["bayes", "likelihood_ratio"])
    def test_boundary_epsilon_default_flags(self, degenerate_text, method):
        d, e = _both_csv(degenerate_text, method)
        assert d == e

    @pytest.mark.parametrize("method", ["bayes", "likelihood_ratio"])
    def test_near_flat_objective_default_flags(self, near_flat_text, method):
        d, e = _both_csv(near_flat_text, method)
        assert d == e

    def test_lr_estimated_prior_default_flags(self, degenerate_text):
        d, e = _both_csv(degenerate_text, "likelihood_ratio", estimate_prior=True)
        assert d == e

    def test_local_estimated_prior_default_flags(self, degenerate_text):
        d, e = _both_csv(degenerate_text, "local", estimate_prior=True)
        assert d == e

    def test_quality_estimated_prior_default_flags(self, near_flat_text):
        d, e = _both_csv(near_flat_text, "quality", estimate_prior=True)
        assert d == e

    def test_boundary_epsilon_is_exercised(self, degenerate_text):
        # the fixture must actually pin epsilon at the box boundary, else the
        # class tests nothing
        from sid_tpu.models.lynch import fit_profiles
        from sid_tpu.ops.profiles import filter_min_coverage, unique_profiles

        batch = parse_pileup(degenerate_text, backend="python")
        profiles, mult, _ = unique_profiles(batch.counts)
        fprof, fmult, _ = filter_min_coverage(profiles, mult, 4)
        _, eps, _, _, _ = fit_profiles(fprof, fmult, Options(method="bayes"))
        assert eps < 1e-8


class TestDeviceFitParity:
    """Device nmsimplex fit vs the exact host fit on the same data."""

    def test_fit_close_and_csv_equal(self, sim_text):
        batch = parse_pileup(sim_text, backend="python")
        dev = call_batch(batch, Options(method="bayes", fit_backend="device"))
        ex = call_batch(batch, Options(method="bayes", fit_backend="exact"))
        # the device objective is f64 log-space vs the oracle's long-double
        # linear space: trajectories may part at ulp level but the fitted
        # optimum and the emitted CSV must agree
        assert dev.to_csv() == ex.to_csv()


class TestOutputShape:
    def test_header_and_row_format(self, edge_text):
        batch = parse_pileup(edge_text, backend="python")
        res = call_batch(batch, Options(method="local"))
        csv = res.to_csv()
        lines = csv.strip().split("\n")
        assert lines[0] == "chrom,pos,label,gt,hom_conf,het_conf,conf_type"
        assert len(lines) == 1 + batch.num_sites  # local emits every site
        first = lines[1].split(",")
        assert first[0] == "chr1" and first[1] == "1"
        assert first[2] in ("hom", "het")
        assert len(first[3]) == 2
        assert first[6] == "p_value"

    def test_zero_coverage_genotype_is_tt(self, edge_text):
        # all-equal counts ascending-stable sort -> major=T, second=G
        batch = parse_pileup(edge_text, backend="python")
        res = call_batch(batch, Options(method="local"))
        line = res.to_csv().strip().split("\n")[1]
        assert ",hom,TT," in line

    def test_coverage_filter_omits_sites(self, edge_text):
        batch = parse_pileup(edge_text, backend="python")
        res = call_batch(batch, Options(method="bayes", fit_backend="device"))
        # sites with cov<4 are dropped: zero-coverage x2, cov1, cov3... check count
        covs = batch.counts.sum(1)
        assert res.num_records == int((covs >= 4).sum())
