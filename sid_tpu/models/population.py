"""Population batches: joint calling over many samples (BASELINE config 5).

Two estimation modes over S samples' profile histograms:

- ``independent``: S separate Lynch fits, batched on device by vmapping the
  nmsimplex2 while-loop over the sample axis (lax.while_loop batching masks
  converged lanes), so 100 samples cost one compiled program.
- ``pooled`` (default): the sequencing error rate is a property of the
  platform, not the individual — fit (pi, eps) once on the *pooled*
  histogram (sufficient statistics add across samples), then hold eps fixed
  and fit each sample's heterozygosity pi with a batched 1-D nmsimplex.

Per-sample genotype calls then run through the standard per-method
machinery with the sample's (pi, eps) as the model state.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sid_tpu.config import Options
from sid_tpu.models.common import CallResult
from sid_tpu.ops import likelihoods
from sid_tpu.ops.lgamma import lgamma_int_table, table_size
from sid_tpu.ops.nmsimplex import minimize_nmsimplex2_jax
from sid_tpu.ops.profiles import (
    filter_min_coverage,
    nucleotide_distribution,
    unique_profiles,
)
from sid_tpu.parallel.distributed import merge_histograms
from sid_tpu.utils.padding import bucket_size, pad_axis0


@dataclasses.dataclass
class SampleFit:
    pi: float
    eps: float
    converged: bool


def _pad_stack(
    histograms: Sequence[Tuple[np.ndarray, np.ndarray]]
) -> Tuple[np.ndarray, np.ndarray]:
    """Stack per-sample (profiles, mult) into (S, U_pad, 4) / (S, U_pad).

    U_pad is the standard shape bucket (pow-2, 8192 floor — utils.padding),
    NOT the raw cohort maximum: every new cohort shape would otherwise be a
    fresh multi-minute remote compile on the real chip (CLAUDE.md: keep
    shapes in the existing buckets). Zero-mult padding rows are inert in the
    fit objective.
    """
    u_max = max((p.shape[0] for p, _ in histograms), default=1)
    u_pad = bucket_size(max(u_max, 1))
    s = len(histograms)
    profs = np.zeros((s, u_pad, 4), np.int32)
    mults = np.zeros((s, u_pad), np.int64)
    for i, (p, m) in enumerate(histograms):
        profs[i, : p.shape[0]] = p
        mults[i, : m.shape[0]] = m
    return profs, mults


@jax.jit
def _fit_batched(profs, mults, nts, tab):
    """vmapped independent 2-D fits: (S,U,4),(S,U),(S,4) -> per-sample results."""

    def one(profiles, mult, nt):
        def objective(theta):
            return likelihoods.compound_neg_log_likelihood(
                theta, profiles, mult, nt, tab
            )

        return minimize_nmsimplex2_jax(
            objective, jnp.asarray([1e-3, 1e-3]), jnp.asarray([1e-4, 1e-4])
        )

    return jax.vmap(one)(profs, mults, nts)


def _fit_batched_shardmap(mesh, profs, mults, nts, tab):
    """Sample-axis shard_map around the vmapped independent fits.

    Under plain jit+GSPMD a sharded vmapped ``lax.while_loop`` must keep its
    (scalar) loop condition globally consistent, which inserts an all-reduce
    of the any-lane-unconverged predicate on EVERY iteration and locksteps
    all devices to the slowest sample. shard_map gives each device its own
    block of samples to fit with an independent while-loop: zero collectives,
    every device stops at its own block's convergence (the BASELINE config-5
    layout: embarrassingly parallel per-sample fits across a pod slice).
    Per-lane results are bitwise equal to the unsharded vmap (while-loop
    batching masks each lane independently of its batchmates).
    """
    from jax.sharding import PartitionSpec as P

    from sid_tpu.parallel.mesh import SITE_AXIS

    fn = jax.shard_map(
        _fit_batched,
        mesh=mesh,
        in_specs=(P(SITE_AXIS), P(SITE_AXIS), P(SITE_AXIS), P()),
        out_specs=P(SITE_AXIS),
        # the body is purely per-shard (no collectives); the vma check
        # rejects lax.cond branches that mix invariant initial-simplex
        # constants with varying fit state, so it is disabled. TODO: scope
        # the disable to the nmsimplex lax.cond once the vma checker learns
        # that pattern. With the check off, a collective accidentally added
        # inside _fit_batched would NOT be caught at trace time — the guard
        # is tests/test_population.py::test_sharded_fits_identical (bitwise
        # vmap-equality), which must stay in CI as long as check_vma=False.
        check_vma=False,
    )
    return jax.jit(fn)(profs, mults, nts, tab)


def _fit_pi_batched_shardmap(mesh, profs, mults, nts, eps, tab):
    """Sample-axis shard_map around the batched 1-D pi fits (see above)."""
    from jax.sharding import PartitionSpec as P

    from sid_tpu.parallel.mesh import SITE_AXIS

    fn = jax.shard_map(
        _fit_pi_batched,
        mesh=mesh,
        in_specs=(P(SITE_AXIS), P(SITE_AXIS), P(SITE_AXIS), P(), P()),
        out_specs=P(SITE_AXIS),
        check_vma=False,  # per-shard only; guarded by the same bitwise
        # vmap-equality test as _fit_batched_shardmap (see comment there)
    )
    return jax.jit(fn)(profs, mults, nts, eps, tab)


@jax.jit
def _fit_pi_batched(profs, mults, nts, eps, tab):
    """vmapped 1-D heterozygosity fits at a shared fixed error rate."""

    def one(profiles, mult, nt):
        def objective(theta):
            full = jnp.stack([theta[0], eps])
            return likelihoods.compound_neg_log_likelihood(
                full, profiles, mult, nt, tab
            )

        return minimize_nmsimplex2_jax(
            objective, jnp.asarray([1e-3]), jnp.asarray([1e-4])
        )

    return jax.vmap(one)(profs, mults, nts)


def fit_population(
    histograms: Sequence[Tuple[np.ndarray, np.ndarray]],
    mode: str = "pooled",
    diag=None,
    mesh_devices: Optional[int] = None,
) -> Tuple[List[SampleFit], Optional[SampleFit]]:
    """Fit the Lynch model over per-sample (cov>=4-filtered) histograms.

    Returns (per-sample fits, pooled fit or None). ``mode`` is "pooled" or
    "independent". With ``mesh_devices``, the vmapped per-sample fits shard
    over the SAMPLE axis of a device mesh (BASELINE config 5: 100-sample
    batches across a pod slice) — each device runs its samples' while-loops
    independently, zero collectives; the S axis is padded to a multiple of
    the mesh with inert all-zero histograms.
    """
    max_cov = max(
        (int(p.sum(-1).max()) for p, _ in histograms if p.shape[0]), default=0
    )
    tab = jnp.asarray(lgamma_int_table(table_size(max_cov)))
    profs, mults = _pad_stack(histograms)
    nts = np.stack([nucleotide_distribution(p, m) for p, m in histograms])

    s_real = len(histograms)
    mesh = None
    if mesh_devices is not None:
        from sid_tpu.parallel.mesh import make_site_mesh, row_sharding

        mesh = make_site_mesh(mesh_devices)
        n_dev = int(np.prod(mesh.devices.shape))
        s_pad = -(-s_real // n_dev) * n_dev
        if s_pad != s_real:
            profs = np.concatenate(
                [profs, np.zeros((s_pad - s_real,) + profs.shape[1:], profs.dtype)]
            )
            mults = np.concatenate(
                [mults, np.zeros((s_pad - s_real,) + mults.shape[1:], mults.dtype)]
            )
            # uniform nt keeps the inert lanes' objective finite
            nts = np.concatenate(
                [nts, np.full((s_pad - s_real, 4), 0.25, nts.dtype)]
            )
        profs = jax.device_put(profs, row_sharding(mesh, 3))
        mults = jax.device_put(mults, row_sharding(mesh, 2))
        nts = jax.device_put(nts, row_sharding(mesh, 2))

    pooled = None
    if mode == "pooled":
        pp, pm = merge_histograms(list(histograms))
        pnt = nucleotide_distribution(pp, pm)
        pmax = int(pp.sum(-1).max()) if pp.shape[0] else 0
        ptab = jnp.asarray(lgamma_int_table(table_size(pmax)))
        # bucket-pad the pooled histogram too (zero-mult rows are inert)
        pp_pad = pad_axis0(np.asarray(pp, np.int32))
        pm_pad = pad_axis0(np.asarray(pm, np.int64))

        def objective(theta):
            return likelihoods.compound_neg_log_likelihood(
                theta, jnp.asarray(pp_pad), jnp.asarray(pm_pad), pnt, ptab
            )

        res = minimize_nmsimplex2_jax(
            objective, jnp.asarray([1e-3, 1e-3]), jnp.asarray([1e-4, 1e-4])
        )
        pooled = SampleFit(float(res.x[0]), float(res.x[1]), bool(res.converged))
        if diag:
            diag(f"# pooled heterozygosity: {pooled.pi:.6e}")
            diag(f"# pooled error: {pooled.eps:.6e}")
        if mesh is not None:
            r = _fit_pi_batched_shardmap(
                mesh, jnp.asarray(profs), jnp.asarray(mults),
                jnp.asarray(nts), jnp.float64(pooled.eps), tab,
            )
        else:
            r = _fit_pi_batched(
                jnp.asarray(profs), jnp.asarray(mults), jnp.asarray(nts),
                jnp.float64(pooled.eps), tab,
            )
        fits = [
            SampleFit(float(r.x[i, 0]), pooled.eps, bool(r.converged[i]))
            for i in range(s_real)
        ]
    elif mesh is not None:
        r = _fit_batched_shardmap(
            mesh, jnp.asarray(profs), jnp.asarray(mults), jnp.asarray(nts),
            tab,
        )
        fits = [
            SampleFit(float(r.x[i, 0]), float(r.x[i, 1]), bool(r.converged[i]))
            for i in range(s_real)
        ]
    else:
        r = _fit_batched(jnp.asarray(profs), jnp.asarray(mults), jnp.asarray(nts), tab)
        fits = [
            SampleFit(float(r.x[i, 0]), float(r.x[i, 1]), bool(r.converged[i]))
            for i in range(s_real)
        ]
    return fits, pooled


def classify_sample_profiles(
    profiles: np.ndarray,
    mult: np.ndarray,
    fit: SampleFit,
    options: Options,
):
    """Per-class tables for one sample at its fitted (pi, eps).

    Returns (cls 5-tuple over classes, filtered: bool, conf_type). For the
    profile-deduplicated methods only; ``filtered`` says whether the class
    table covers the cov>=4-filtered profiles (bayes/likelihood_ratio omit
    filtered-out sites) or all profiles (local).
    """
    from sid_tpu.models.local import classify_profiles_local

    method = options.method
    if method == "local":
        # local with the fitted per-sample prior (-R semantics)
        cls = classify_profiles_local(profiles, options, fit.pi, options.mesh_devices)
        return cls, False, "p_value"
    fp, fm, _ = filter_min_coverage(profiles, mult, 4)
    if method == "bayes":
        return _classify_bayes_fixed(fp, fm, fit), True, "probability"
    if method == "likelihood_ratio":
        return _classify_lr_fixed(fp, fm, fit, options), True, "p_value"
    raise ValueError(f"population mode does not support method {method!r}")


def call_population(
    batches: Sequence,
    options: Options,
    mode: str = "pooled",
    diag=None,
) -> List[CallResult]:
    """Per-sample genotype calls with population-level model fitting.

    (Starts the device keepalive: population runs interleave long host
    stages with device fits — see utils/keepalive.)

    All four methods: local uses the sample's fitted pi as prior (-R
    semantics), bayes/likelihood_ratio classify at the sample's (pi, eps),
    quality (per-site) uses the fitted pi as its SNP prior.
    """
    from sid_tpu.models import common
    from sid_tpu.utils.keepalive import ensure_device_keepalive

    ensure_device_keepalive()
    histograms = []
    uniques = []
    for b in batches:
        p, m, inv = unique_profiles(b.counts)
        uniques.append((p, m, inv))
        fp, fm, _ = filter_min_coverage(p, m, 4)
        histograms.append((fp, fm))

    fits, pooled = fit_population(
        histograms, mode=mode, diag=diag, mesh_devices=options.mesh_devices
    )

    results = []
    for b, (p, m, inv), fit in zip(batches, uniques, fits):
        if options.method == "quality":
            from sid_tpu.models.quality import call_quality

            opts = dataclasses.replace(
                options, estimate_prior=False, snp_prior=fit.pi
            )
            results.append(call_quality(b, opts))
            continue
        cls, filtered, conf_type = classify_sample_profiles(p, m, fit, options)
        keep = filter_min_coverage(p, m, 4)[2] if filtered else None
        results.append(
            common.gather_result(b, conf_type, inv, *cls, keep_u=keep)
        )
    return results


def call_population_streaming(
    paths: Sequence[str],
    options: Options,
    mode: str = "pooled",
    diag=None,
    chunk_bytes: int = 64 << 20,
) -> List[int]:
    """Streamed population calling: 100 samples without RAM-resident parses.

    Pass 1 folds each sample into its unique-profile histogram
    (accumulate_histogram); the population fit runs on the tiny histograms;
    pass 2 re-parses each sample chunk-by-chunk, classifying through the
    per-class join (or per-site quality calls) and appending to
    ``<path>.calls.csv``. Returns per-sample record counts.
    """
    from sid_tpu.io.pileup import parse_pileup
    from sid_tpu.io.stream import accumulate_histogram, iter_chunks, pack_profiles
    from sid_tpu.models import common

    full_hists = []
    for p in paths:
        profiles, mult, _ = accumulate_histogram(p, chunk_bytes, options.io_backend)
        full_hists.append((profiles, mult))
    filtered_hists = [
        filter_min_coverage(p, m, 4)[:2] for p, m in full_hists
    ]
    fits, pooled = fit_population(
        filtered_hists, mode=mode, diag=diag, mesh_devices=options.mesh_devices
    )

    needs_reads = options.method == "quality"
    counts = []
    for path, (profiles, mult), fit in zip(paths, full_hists, fits):
        out_path = path + ".calls.csv"
        emitted = 0
        if needs_reads:
            from sid_tpu.models.quality import call_quality

            opts = dataclasses.replace(
                options, estimate_prior=False, snp_prior=fit.pi
            )
            cls = keys = conf_type = None
        else:
            cls, filtered, conf_type = classify_sample_profiles(
                profiles, mult, fit, options
            )
            src = filter_min_coverage(profiles, mult, 4)[0] if filtered else profiles
            keys = pack_profiles(src)
        with open(out_path, "wb") as out:
            out.write((common.CSV_HEADER + "\n").encode())
            for chunk in iter_chunks(path, chunk_bytes):
                batch = parse_pileup(
                    chunk, needs_reads, needs_reads, backend=options.io_backend
                )
                if batch.num_sites == 0:
                    continue
                if needs_reads:
                    res = call_quality(batch, opts)
                else:
                    res = common.join_class_table(batch, keys, cls, conf_type)
                out.write(res.to_csv_bytes(include_header=False))
                emitted += res.num_records
        if diag:
            diag(f"# wrote {out_path} ({emitted} records)")
        counts.append(emitted)
    return counts


def _classify_lr_fixed(profiles, mult, fit: SampleFit, options: Options):
    """likelihood_ratio per-class classification at a fixed (pi, eps).

    Reference semantics per sample (call.cpp:62-143): marginal likelihoods
    at the fitted error rate, optional -R prior weighting by the sample's
    pi, two LRT p-values, BH correction across the sample's own unique
    profiles, het iff adjusted p2 < alpha.
    """
    from sid_tpu.models import common
    from sid_tpu.ops import stats

    u = profiles.shape[0]
    nt = nucleotide_distribution(profiles, mult)
    max_cov = int(profiles.sum(-1).max()) if u else 0
    tab = jnp.asarray(lgamma_int_table(table_size(max_cov)))
    # bucket-padded device call (shape discipline: one compile per bucket)
    prof = jnp.asarray(pad_axis0(np.asarray(profiles, np.int32)))
    log_l_hom = np.asarray(
        likelihoods.log_hom_marginal(prof, jnp.float64(fit.eps), nt, tab)
    )[:u]
    log_l_het = np.asarray(
        likelihoods.log_het_marginal(prof, jnp.float64(fit.eps), nt, tab)
    )[:u]
    log_l_hom = common.clamp_ld_underflow_np(log_l_hom)
    log_l_het = common.clamp_ld_underflow_np(log_l_het)
    if options.estimate_prior and fit.pi > 0:
        with np.errstate(divide="ignore"):
            log_l_het = common.clamp_ld_underflow_np(log_l_het + np.log(fit.pi))
            log_l_hom = common.clamp_ld_underflow_np(log_l_hom + np.log(1.0 - fit.pi))
    if options.exact_pvalues:
        # host LRT + host BH (default): like the main LR method, zero device
        # round trips after the likelihood kernels
        p1 = stats.lrt_pvalue_from_logs_np(log_l_het, log_l_hom)
        p2 = stats.lrt_pvalue_from_logs_np(log_l_hom, log_l_het)
        adj_p1 = stats.adjust_benjamini_hochberg_np(p1)
        adj_p2 = stats.adjust_benjamini_hochberg_np(p2)
    else:
        p1 = stats.lrt_pvalue_from_logs(jnp.asarray(log_l_het), jnp.asarray(log_l_hom))
        p2 = stats.lrt_pvalue_from_logs(jnp.asarray(log_l_hom), jnp.asarray(log_l_het))
        adj_p1 = np.asarray(stats.adjust_benjamini_hochberg(p1))
        adj_p2 = np.asarray(stats.adjust_benjamini_hochberg(p2))
    is_het = adj_p2 < options.significance_level
    major, second = common.major_allele_indices_np(profiles)
    return is_het, major, second, adj_p1, adj_p2


def _classify_bayes_fixed(profiles, mult, fit: SampleFit):
    """Bayes per-class classification at a fixed (pi, eps)."""
    from sid_tpu.models import common

    u = profiles.shape[0]
    # nucleotide distribution from the sample's own filtered histogram
    nt = nucleotide_distribution(profiles, mult)
    max_cov = int(profiles.sum(-1).max()) if u else 0
    tab = jnp.asarray(lgamma_int_table(table_size(max_cov)))
    # bucket-padded device call (shape discipline: one compile per bucket)
    prof = jnp.asarray(pad_axis0(np.asarray(profiles, np.int32)))
    log_l_hom = np.asarray(
        likelihoods.log_hom_marginal(prof, jnp.float64(fit.eps), nt, tab)
    )[:u]
    log_l_het = np.asarray(
        likelihoods.log_het_marginal(prof, jnp.float64(fit.eps), nt, tab)
    )[:u]
    pi = fit.pi
    log_apost_hom = log_l_hom + np.log(np.float64(1.0 - pi))
    log_apost_het = (
        log_l_het + np.log(np.float64(pi)) if pi > 0 else np.full_like(log_l_hom, -np.inf)
    )
    with np.errstate(invalid="ignore", over="ignore"):
        mx = np.maximum(log_apost_hom, log_apost_het)
        wh = np.exp(log_apost_hom - mx)
        wt = np.exp(log_apost_het - mx)
        denom = wh + wt
        prob_hom = wh / denom
        prob_het = wt / denom
        is_het = prob_het > prob_hom
    major, second = common.major_allele_indices_np(profiles)
    return is_het, major, second, prob_hom, prob_het
