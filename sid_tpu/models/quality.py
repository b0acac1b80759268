"""Method ``quality``: per-read Phred-quality genotype likelihoods.

Reference: callQualityBasedSimple (call.cpp:291-372) — the only per-site
(not per-profile) method and the reference's only OpenMP-parallel loop. Per
read j: error = 10^(-min(bq_j, mq_j)/10); log P(hom) accumulates
ln(1-e)/ln(e) by major-allele match, log P(het) accumulates ln(1-2e/3) /
ln(2e/3) by top-2 match, plus an allele-balance log-binomial; LRT p-values;
het iff p2 < alpha. Every input site is emitted in order.

Device mapping: the per-read loop becomes a masked segment-sum over a CSR
read->site index (embarrassingly parallel over the read axis, the method's
hot loop at genome scale); per-site finalization is elementwise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sid_tpu.config import Options
from sid_tpu.models import common
from sid_tpu.ops import stats
from sid_tpu.ops.lgamma import lgamma_int_table, table_size
from sid_tpu.ops.profiles import unique_profiles
from sid_tpu.utils.padding import pad_axis0


@jax.jit
def classify_quality(
    counts: jnp.ndarray,  # (N, 4) int32 (padded)
    site_of_read: jnp.ndarray,  # (R,) int32 (padded; pads point anywhere valid)
    read_valid: jnp.ndarray,  # (R,) bool
    code: jnp.ndarray,  # (R,) int32 base code
    minq: jnp.ndarray,  # (R,) float64 min(bq, mq)
    snp_prior: jnp.ndarray,
    significance_level: jnp.ndarray,
    lgamma_tab: jnp.ndarray,
):
    n_sites = counts.shape[0]
    counts = counts.astype(jnp.int32)
    major, second = common.major_allele_indices(counts)

    err = jnp.power(10.0, minq / -10.0)
    is_major = code == major[site_of_read]
    is_top2 = is_major | (code == second[site_of_read])
    hom_terms = jnp.where(is_major, jnp.log(1.0 - err), jnp.log(err))
    het_terms = jnp.where(
        is_top2, jnp.log(1.0 - 2.0 / 3.0 * err), jnp.log(2.0 / 3.0 * err)
    )
    hom_terms = jnp.where(read_valid, hom_terms, 0.0)
    het_terms = jnp.where(read_valid, het_terms, 0.0)
    log_hom = jax.ops.segment_sum(hom_terms, site_of_read, num_segments=n_sites)
    log_het = jax.ops.segment_sum(het_terms, site_of_read, num_segments=n_sites)

    # allele-balance binomial: ln C(n1+n2, n2) - (n1+n2) ln 2 (call.cpp:344-349)
    n = jnp.take_along_axis(counts, major[:, None], 1)[:, 0] + (
        jnp.take_along_axis(counts, second[:, None], 1)[:, 0]
    )
    k = jnp.take_along_axis(counts, second[:, None], 1)[:, 0]
    log_het = log_het + stats.log_binomial_coefficient(n, k, lgamma_tab) - (
        n.astype(jnp.float64) * jnp.log(2.0)
    )

    # the reference exponentiates into linear long double before the LRT;
    # values below the 80-bit underflow line become exactly 0 there
    log_pp1 = common.clamp_ld_underflow(log_hom)
    log_pp2 = common.clamp_ld_underflow(log_het)
    prior_on = snp_prior > 0
    log_pp1 = log_pp1 + jnp.where(prior_on, jnp.log(1.0 - snp_prior), 0.0)
    log_pp2 = log_pp2 + jnp.where(prior_on, jnp.log(snp_prior), 0.0)

    p1 = stats.lrt_pvalue_from_logs(log_pp2, log_pp1)
    p2 = stats.lrt_pvalue_from_logs(log_pp1, log_pp2)
    is_het = p2 < significance_level
    return is_het, major, second, p1, p2


def call_quality(batch, options: Options, diag=None) -> common.CallResult:
    n = batch.num_sites
    snp_prior = options.snp_prior
    if options.estimate_prior:
        from sid_tpu.models.lynch import estimate_prior_heterozygosity

        profiles, mult, _ = unique_profiles(batch.counts)
        snp_prior = estimate_prior_heterozygosity(profiles, mult, options, diag)

    counts = pad_axis0(batch.counts.astype(np.int32))
    offsets = batch.read_offsets
    r = int(offsets[-1])
    site_of_read = np.repeat(np.arange(n, dtype=np.int32), np.diff(offsets))
    minq = np.minimum(batch.read_bq, batch.read_mq).astype(np.float64)
    code = batch.read_code.astype(np.int32)

    site_of_read_p = pad_axis0(site_of_read)
    read_valid = pad_axis0(np.ones(r, bool))
    code_p = pad_axis0(code)
    minq_p = pad_axis0(minq)

    max_cov = int(batch.counts.sum(-1).max()) if n else 0
    tab = jnp.asarray(lgamma_int_table(table_size(2 * max_cov)))

    counts_dev = jnp.asarray(counts)
    reads_dev = [
        jnp.asarray(site_of_read_p),
        jnp.asarray(read_valid),
        jnp.asarray(code_p),
        jnp.asarray(minq_p),
    ]
    if options.mesh_devices is not None:
        from sid_tpu.parallel.mesh import make_site_mesh, row_sharding

        mesh = make_site_mesh(options.mesh_devices)
        n_dev = int(np.prod(mesh.devices.shape))
        # shard the read axis (the hot loop); per-site arrays stay replicated
        # so cross-shard segment sums reduce over the mesh
        if site_of_read_p.shape[0] % n_dev == 0:
            reads_dev = [
                jax.device_put(np.asarray(a), row_sharding(mesh, 1))
                for a in (site_of_read_p, read_valid, code_p, minq_p)
            ]
    is_het, major, second, p1, p2 = classify_quality(
        counts_dev,
        *reads_dev,
        jnp.float64(snp_prior),
        jnp.float64(options.significance_level),
        tab,
    )
    return common.CallResult(
        chrom_id=batch.chrom_id,
        chrom_table=batch.chrom_table,
        pos=batch.pos,
        is_het=np.asarray(is_het)[:n],
        major=np.asarray(major)[:n],
        second=np.asarray(second)[:n],
        conf_hom=np.asarray(p1)[:n],
        conf_het=np.asarray(p2)[:n],
        conf_type="p_value",
    )
