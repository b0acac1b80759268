"""Population-batch fitting and calling (BASELINE config 5)."""

import numpy as np
import pytest

from sid_tpu.config import Options
from sid_tpu.io.pileup import parse_pileup
from sid_tpu.models.population import call_population, fit_population
from sid_tpu.ops.profiles import filter_min_coverage, unique_profiles

from synth import make_pileup_text, simulate_diploid_counts


def make_samples(n_samples, pis, eps=0.01, n_sites=1200, cov=25):
    batches, hists = [], []
    for i in range(n_samples):
        counts = simulate_diploid_counts(
            n_sites, coverage=cov, pi=pis[i], eps=eps, seed=100 + i
        )
        b = parse_pileup(make_pileup_text(counts), backend="python")
        batches.append(b)
        p, m, _ = unique_profiles(b.counts)
        fp, fm, _ = filter_min_coverage(p, m, 4)
        hists.append((fp, fm))
    return batches, hists


class TestFitPopulation:
    def test_independent_recovers_heterozygosity_ordering(self):
        _, hists = make_samples(3, pis=[0.002, 0.02, 0.06])
        fits, pooled = fit_population(hists, mode="independent")
        assert pooled is None
        assert fits[0].pi < fits[1].pi < fits[2].pi
        for f in fits:
            assert f.converged
            assert 0.001 < f.eps < 0.05

    def test_pooled_shares_error_rate(self):
        _, hists = make_samples(3, pis=[0.002, 0.02, 0.06])
        fits, pooled = fit_population(hists, mode="pooled")
        assert pooled is not None and pooled.converged
        for f in fits:
            assert f.eps == pooled.eps
        assert fits[0].pi < fits[2].pi

    def test_pooled_diag_lines(self):
        _, hists = make_samples(2, pis=[0.01, 0.03])
        lines = []
        fit_population(hists, mode="pooled", diag=lines.append)
        assert lines[0].startswith("# pooled heterozygosity: ")
        assert lines[1].startswith("# pooled error: ")


class TestCallPopulation:
    @pytest.mark.parametrize("method", ["local", "bayes"])
    def test_per_sample_calls(self, method):
        batches, _ = make_samples(3, pis=[0.002, 0.02, 0.06])
        results = call_population(batches, Options(method=method), mode="pooled")
        assert len(results) == 3
        het_counts = [int(r.is_het.sum()) for r in results]
        # more heterozygous samples should yield more het calls
        assert het_counts[0] <= het_counts[1] <= het_counts[2]
        for r, b in zip(results, batches):
            if method == "local":
                assert r.num_records == b.num_sites
            csv = r.to_csv()
            assert csv.startswith("chrom,pos,")
