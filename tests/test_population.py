"""Population-batch fitting and calling (BASELINE config 5)."""

import numpy as np
import pytest

from sid_tpu.config import Options
from sid_tpu.io.pileup import parse_pileup
from sid_tpu.models import population
from sid_tpu.models.population import call_population, fit_population
from sid_tpu.ops.profiles import filter_min_coverage, unique_profiles

from synth import make_pileup_text, simulate_diploid_counts


def make_samples(n_samples, pis, eps=0.01, n_sites=1200, cov=25, with_reads=False):
    batches, hists = [], []
    for i in range(n_samples):
        counts = simulate_diploid_counts(
            n_sites, coverage=cov, pi=pis[i], eps=eps, seed=100 + i
        )
        b = parse_pileup(
            make_pileup_text(counts, with_qualities=with_reads),
            with_reads, with_reads, backend="python",
        )
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
    @pytest.mark.parametrize(
        "method", ["local", "bayes", "likelihood_ratio", "quality"]
    )
    def test_per_sample_calls(self, method):
        with_reads = method == "quality"
        batches, _ = make_samples(
            3, pis=[0.002, 0.02, 0.06], with_reads=with_reads
        )
        opts = Options(method=method, estimate_prior=(method == "likelihood_ratio"))
        results = call_population(batches, opts, mode="pooled")
        assert len(results) == 3
        het_counts = [int(r.is_het.sum()) for r in results]
        # more heterozygous samples should yield more het calls
        assert het_counts[0] <= het_counts[1] <= het_counts[2]
        for r, b in zip(results, batches):
            if method in ("local", "quality"):
                assert r.num_records == b.num_sites
            csv = r.to_csv()
            assert csv.startswith("chrom,pos,")

    def test_lr_single_sample_matches_standalone(self):
        # one sample, independent fit: population LR must agree with the
        # standalone likelihood_ratio pipeline (same fit, same BH domain)
        from sid_tpu.engine import call_batch

        counts = simulate_diploid_counts(1500, coverage=20, pi=0.02, eps=0.01, seed=5)
        b = parse_pileup(make_pileup_text(counts), backend="python")
        opts = Options(method="likelihood_ratio", estimate_prior=True)
        standalone = call_batch(b, opts).to_csv()
        pop = call_population([b], opts, mode="independent")[0].to_csv()
        assert pop == standalone

    def test_quality_single_sample_matches_standalone_prior(self):
        # population quality = standalone quality with the fitted pi prior
        from sid_tpu.engine import call_batch

        counts = simulate_diploid_counts(800, coverage=20, pi=0.03, eps=0.01, seed=6)
        b = parse_pileup(
            make_pileup_text(counts, with_qualities=True), True, True,
            backend="python",
        )
        pop = call_population(
            [b], Options(method="quality"), mode="independent"
        )[0].to_csv()
        standalone = call_batch(
            b, Options(method="quality", estimate_prior=True)
        ).to_csv()
        assert pop == standalone


class TestStreamingPopulation:
    @pytest.mark.parametrize(
        "method", ["local", "bayes", "likelihood_ratio", "quality"]
    )
    def test_streamed_matches_in_memory(self, method, tmp_path):
        from sid_tpu.models.population import call_population_streaming

        with_reads = method == "quality"
        batches, _ = make_samples(
            2, pis=[0.01, 0.04], n_sites=600, with_reads=with_reads
        )
        texts = []
        for i, pi in enumerate([0.01, 0.04]):
            counts = simulate_diploid_counts(
                600, coverage=25, pi=pi, eps=0.01, seed=100 + i
            )
            texts.append(
                make_pileup_text(counts, with_qualities=with_reads)
            )
        paths = []
        for i, t in enumerate(texts):
            p = tmp_path / f"s{i}.pileup"
            p.write_bytes(t)
            paths.append(str(p))
        opts = Options(method=method)
        emitted = call_population_streaming(
            paths, opts, mode="pooled", chunk_bytes=1 << 13
        )
        in_memory = call_population(batches, opts, mode="pooled")
        for path, n, res in zip(paths, emitted, in_memory):
            got = open(path + ".calls.csv").read()
            assert got == res.to_csv()
            assert n == res.num_records


class TestSampleAxisSharding:
    """Population fits sharded over the SAMPLE axis of the mesh
    (BASELINE config 5): results must be identical to the unsharded fit,
    including when S does not divide the mesh (inert padding lanes)."""

    @pytest.mark.parametrize("mode", ["independent", "pooled"])
    def test_sharded_fits_identical(self, mode):
        _, hists = make_samples(5, pis=[0.002, 0.01, 0.02, 0.04, 0.06])
        fits_1, pooled_1 = fit_population(hists, mode=mode)
        fits_8, pooled_8 = fit_population(hists, mode=mode, mesh_devices=8)
        assert len(fits_8) == len(fits_1) == 5
        for a, b in zip(fits_1, fits_8):
            # padding the sample axis (5 -> 8 lanes) changes the vmapped
            # batch shape, which can move XLA's reduction layout by ulps —
            # fitted params agree to ~1e-12 relative; the user-visible CSV
            # contract is exact (test below)
            assert np.isclose(a.pi, b.pi, rtol=1e-9, atol=1e-15)
            assert np.isclose(a.eps, b.eps, rtol=1e-9, atol=1e-15)
            assert a.converged == b.converged
        if mode == "pooled":
            assert pooled_1.pi == pooled_8.pi and pooled_1.eps == pooled_8.eps

    def test_sharded_call_population_csv_equal(self):
        batches, _ = make_samples(3, pis=[0.01, 0.03, 0.05])
        opts_1 = Options(method="bayes")
        opts_8 = Options(method="bayes", mesh_devices=8)
        res_1 = call_population(batches, opts_1, mode="pooled")
        res_8 = call_population(batches, opts_8, mode="pooled")
        for a, b in zip(res_1, res_8):
            assert a.to_csv() == b.to_csv()


class TestBatchedDispatchCount:
    """Cohort classification must cost O(1) device dispatches, not O(S)
    (VERDICT r4 next #1: on the real chip the per-sample loop ran ~2S tunnel
    round trips at the ~60 ms dispatch floor — 50k sites/s for 100 samples)."""

    @pytest.mark.parametrize("method", ["bayes", "likelihood_ratio"])
    def test_classify_dispatches_independent_of_cohort_size(self, method):
        from sid_tpu.utils import profiling

        opts = Options(method=method, estimate_prior=(method == "likelihood_ratio"))

        def dispatches(n_samples):
            batches, _ = make_samples(
                n_samples, pis=[0.005 * (i + 1) for i in range(n_samples)],
                n_sites=400,
            )
            prof = profiling.StageProfile()
            profiling.activate(prof)
            try:
                call_population(batches, opts, mode="pooled")
            finally:
                profiling.activate(None)
            classify = [
                name for name, _ in prof.stages
                if name.startswith("device:population")
            ]
            return len(classify)

        d2, d5 = dispatches(2), dispatches(5)
        assert d2 == d5 == 1, (d2, d5)

    def test_local_batched_dispatch_count(self, monkeypatch):
        # force the slim-device local path (the host-LD default dispatches
        # nothing) and count one batched dispatch for the whole cohort
        from sid_tpu.utils import profiling

        monkeypatch.setenv("SIDTPU_EXACT_LOCAL_MAX_U", "0")
        batches, _ = make_samples(4, pis=[0.005, 0.01, 0.02, 0.04], n_sites=400)
        prof = profiling.StageProfile()
        profiling.activate(prof)
        try:
            call_population(batches, Options(method="local"), mode="pooled")
        finally:
            profiling.activate(None)
        classify = [
            name for name, _ in prof.stages
            if name.startswith("device:population_local")
        ]
        assert len(classify) == 1, prof.stages

    def test_batched_matches_per_sample_classify(self):
        # the batched cohort tables must equal S independent single-sample
        # classifications bitwise (vmap lane == standalone call on CPU)
        from sid_tpu.ops.profiles import filter_min_coverage as fmc

        batches, _ = make_samples(3, pis=[0.005, 0.02, 0.05], n_sites=500)
        opts = Options(method="bayes")
        uniq = [unique_profiles(b.counts) for b in batches]
        hists = []
        for p, m, _ in uniq:
            fp, fm, _ = fmc(p, m, 4)
            hists.append((fp, fm))
        fits, _ = population.fit_population(hists, mode="pooled")
        batched, filtered, conf = population.classify_population_profiles(
            [(p, m) for p, m, _ in uniq], fits, opts
        )
        assert filtered and conf == "probability"
        for (p, m, _), fit, got in zip(uniq, fits, batched):
            fp, fm, _ = fmc(p, m, 4)
            want = population._classify_bayes_fixed(fp, fm, fit)
            for a, b in zip(got, want):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestShapeDiscipline:
    """Population device calls must honor the shape-bucket rule
    (verdict-r3 weak #4): every cohort shape pads to a standard bucket so
    the real chip compiles each kernel once per bucket, never per cohort."""

    def test_pad_stack_uses_buckets(self):
        h1 = (np.array([[5, 0, 0, 0], [0, 7, 0, 0]], np.int32),
              np.array([3, 4], np.int64))
        h2 = (np.array([[9, 0, 0, 0]], np.int32), np.array([2], np.int64))
        profs, mults = population._pad_stack([h1, h2])
        assert profs.shape == (2, 8192, 4)  # pow-2 bucket, 8192 floor
        assert mults.shape == (2, 8192)
        # content preserved, padding inert
        assert profs[0, :2].tolist() == h1[0].tolist()
        assert mults[1, 0] == 2 and mults[1, 1:].sum() == 0

    def test_fixed_classify_calls_are_bucket_padded(self, monkeypatch):
        from sid_tpu.ops import likelihoods as lk

        seen = []
        real = lk.log_hom_marginal

        def spy(profiles, *a, **kw):
            seen.append(tuple(profiles.shape))
            return real(profiles, *a, **kw)

        monkeypatch.setattr(lk, "log_hom_marginal", spy)
        profiles = np.array([[8, 0, 0, 0], [4, 4, 0, 0], [0, 0, 9, 1]], np.int32)
        mult = np.array([10, 2, 5], np.int64)
        fit = population.SampleFit(pi=0.01, eps=0.005, converged=True)
        population._classify_bayes_fixed(profiles, mult, fit)
        population._classify_lr_fixed(profiles, mult, fit, Options())
        assert seen and all(s == (8192, 4) for s in seen), seen
