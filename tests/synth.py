"""Synthetic mpileup generation for tests and benchmarks."""

from __future__ import annotations

import numpy as np

_BASES = "ACGT"


def profile_to_bases(profile, ref: str, rng=None) -> str:
    """Render a count profile as a read-bases column (mixed case/strands)."""
    rng = rng or np.random.default_rng(0)
    chars = []
    for i, n in enumerate(profile):
        for k in range(int(n)):
            c = _BASES[i]
            if _BASES.find(ref) == i and rng.uniform() < 0.7:
                chars.append("." if rng.uniform() < 0.5 else ",")
            else:
                chars.append(c if rng.uniform() < 0.5 else c.lower())
    rng.shuffle(chars)
    return "".join(chars) or "*"


def make_pileup_text(
    counts: np.ndarray,
    chrom: str = "chr1",
    start_pos: int = 1,
    with_qualities: bool = False,
    seed: int = 0,
) -> bytes:
    """Build mpileup text whose parsed profiles equal ``counts`` (N, 4)."""
    rng = np.random.default_rng(seed)
    lines = []
    for s, profile in enumerate(np.asarray(counts)):
        cov = int(profile.sum())
        ref = _BASES[rng.integers(4)]
        bases = profile_to_bases(profile, ref, rng)
        fields = [chrom, str(start_pos + s), ref, str(cov), bases]
        if with_qualities:
            qlen = max(cov, 1)
            bq = "".join(chr(33 + int(q)) for q in rng.integers(10, 42, qlen))
            mq = "".join(chr(33 + int(q)) for q in rng.integers(10, 62, qlen))
            fields += [bq, mq]
        lines.append("\t".join(fields))
    return ("\n".join(lines) + "\n").encode()


def simulate_diploid_counts(
    n_sites: int,
    coverage: int = 30,
    pi: float = 0.01,
    eps: float = 0.005,
    seed: int = 42,
) -> np.ndarray:
    """Simulate per-site base-count profiles under the Lynch model."""
    rng = np.random.default_rng(seed)
    is_het = rng.uniform(size=n_sites) < pi
    counts = np.zeros((n_sites, 4), np.int64)
    covs = rng.poisson(coverage, n_sites).clip(1)
    for s in range(n_sites):
        probs = np.full(4, eps / 3.0)
        if is_het[s]:
            a, b = rng.choice(4, size=2, replace=False)
            probs[a] = probs[b] = (1 - 2 * eps / 3) / 2
        else:
            a = rng.integers(4)
            probs[a] = 1 - eps
        counts[s] = rng.multinomial(covs[s], probs)
    return counts


def make_pileup_text_fast(counts: np.ndarray, chrom: str = "chr1") -> bytes:
    """Fast pileup text for benchmarks: plain base letters, constant quals."""
    counts = np.asarray(counts)
    parts = []
    base_strs = ["A", "C", "G", "T"]
    for s in range(counts.shape[0]):
        c = counts[s]
        cov = int(c.sum())
        bases = (
            base_strs[0] * int(c[0]) + base_strs[1] * int(c[1])
            + base_strs[2] * int(c[2]) + base_strs[3] * int(c[3])
        ) or "*"
        q = "I" * max(cov, 1)
        parts.append(f"{chrom}\t{s+1}\tN\t{cov}\t{bases}\t{q}\t{q}")
    return ("\n".join(parts) + "\n").encode()
