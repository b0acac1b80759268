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


def make_bwa_like_pileup(
    n_sites: int,
    n_chroms: int = 3,
    coverage: int = 30,
    pi: float = 1e-3,
    eps: float = 0.01,
    seed: int = 20260818,
) -> bytes:
    """Real-data-shaped mpileup (BASELINE config 3 stand-in).

    Reproduces the artifact mix a BWA + samtools mpileup run emits that the
    clean simulators skip: '.'/',' reference-matching reads (both strands),
    read-start '^X' markers with arbitrary mapping-quality chars, read-end
    '$', '+N'/'-N' indels with inserted base sequences, '*' deletion
    placeholders, N reference bases (whole runs where './,' drop), lowercase
    mixing, per-read Phred variance in both quality columns, and multiple
    chromosomes with jumpy (sorted, gapped) positions.
    """
    rng = np.random.default_rng(seed)
    lines = []
    bases_u = "ACGT"
    chrom_names = [f"chr{c+1}" for c in range(n_chroms)]
    chrom_of_site = np.sort(rng.integers(0, n_chroms, n_sites))
    pos = np.zeros(n_sites, np.int64)
    p = 0
    last_c = -1
    for s in range(n_sites):
        if chrom_of_site[s] != last_c:
            p = int(rng.integers(10_000, 20_000))
            last_c = chrom_of_site[s]
        p += int(rng.integers(1, 120))  # gapped positions
        pos[s] = p

    is_het = rng.uniform(size=n_sites) < pi
    for s in range(n_sites):
        cov = max(1, int(rng.poisson(coverage)))
        # ~3% of sites have an N reference (assembly gaps)
        ref = "N" if rng.uniform() < 0.03 else bases_u[rng.integers(4)]
        major = rng.integers(4)
        second = (major + 1 + rng.integers(3)) % 4
        col = []
        n_emitted = 0
        for _ in range(cov):
            r = rng.uniform()
            if r < eps:
                b = bases_u[rng.integers(4)]
            elif is_het[s] and r < 0.5 + eps / 2:
                b = bases_u[second]
            else:
                b = bases_u[major]
            fwd = rng.uniform() < 0.5
            # reference-matching reads print as '.'/',' like samtools does
            if b == ref:
                ch = "." if fwd else ","
            else:
                ch = b if fwd else b.lower()
            tok = ch
            if rng.uniform() < 0.04:  # read start with mapping quality char
                tok = "^" + chr(33 + int(rng.integers(0, 60))) + tok
            if rng.uniform() < 0.04:  # read end
                tok = tok + "$"
            col.append(tok)
            n_emitted += 1
            if rng.uniform() < 0.015:  # indel after this read base
                ln = int(rng.integers(1, 7))
                ins = "".join(bases_u[i] for i in rng.integers(0, 4, ln))
                col.append(("+" if rng.uniform() < 0.5 else "-") + str(ln) + ins)
            if rng.uniform() < 0.01:  # deletion placeholder (skipped base)
                col.append("*")
                n_emitted += 1
        bases_col = "".join(col) or "*"
        nq = max(n_emitted, 1)
        bq = "".join(chr(33 + int(q)) for q in rng.integers(2, 42, nq))
        mq = "".join(chr(33 + int(q)) for q in rng.integers(0, 61, nq))
        lines.append(
            f"{chrom_names[chrom_of_site[s]]}\t{pos[s]}\t{ref}\t{cov}"
            f"\t{bases_col}\t{bq}\t{mq}"
        )
    return ("\n".join(lines) + "\n").encode()


def make_bwa_like_pileup_scaled(
    n_sites: int,
    pool_sites: int = 8192,
    n_chroms: int = 3,
    seed: int = 20260820,
) -> bytes:
    """Grammar-rich pileup at bench scale: a make_bwa_like_pileup site pool
    (full artifact mix: ^X/$, indels, '*', N refs, Phred variance) sampled
    to n_sites with fresh sorted chrom/pos columns. Byte-level grammar
    richness is identical to the slow generator; profile diversity is capped
    at pool_sites (fine for parse benchmarks). ~50x faster to build."""
    rng = np.random.default_rng(seed)
    pool_raw = make_bwa_like_pileup(pool_sites, n_chroms=1, seed=seed)
    suffixes = [ln.split(b"\t", 2)[2] for ln in pool_raw.splitlines()]
    chrom_names = [f"chr{c+1}".encode() for c in range(n_chroms)]
    chrom_of_site = np.sort(rng.integers(0, n_chroms, n_sites))
    steps = rng.integers(1, 120, n_sites)
    pick = rng.integers(0, len(suffixes), n_sites)
    out = []
    pos = 0
    last_c = -1
    tab = b"\t"
    for s in range(n_sites):
        c = chrom_of_site[s]
        if c != last_c:
            pos = 10_000
            last_c = c
        pos += int(steps[s])
        out.append(
            chrom_names[c] + tab + str(pos).encode() + tab + suffixes[pick[s]]
        )
    return b"\n".join(out) + b"\n"


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
