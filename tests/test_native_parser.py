"""Native C++ parser vs the Python reference-grammar parser.

Property tests: both backends must produce identical PileupBatch tensors on
arbitrary input, including malformed lines and quality pairing shifts.
"""

import numpy as np
import pytest

from sid_tpu.io import native
from sid_tpu.io.pileup import parse_pileup
from sid_tpu.utils.errors import SidParseError

from synth import make_pileup_text, simulate_diploid_counts

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libsidtpu not built"
)


def both(text, bq=False, mq=False, strict=True):
    py = parse_pileup(text, bq, mq, backend="python", strict=strict)
    nat = parse_pileup(text, bq, mq, backend="native", strict=strict)
    return py, nat


def assert_batches_equal(py, nat, with_reads=False):
    assert nat.chrom_table == py.chrom_table
    np.testing.assert_array_equal(nat.chrom_id, py.chrom_id)
    np.testing.assert_array_equal(nat.pos, py.pos)
    np.testing.assert_array_equal(nat.ref_base, py.ref_base)
    np.testing.assert_array_equal(nat.counts, py.counts)
    if with_reads:
        np.testing.assert_array_equal(nat.read_offsets, py.read_offsets)
        np.testing.assert_array_equal(nat.read_code, py.read_code)
        np.testing.assert_array_equal(nat.read_strand, py.read_strand)
        np.testing.assert_array_equal(nat.read_bq, py.read_bq)
        np.testing.assert_array_equal(nat.read_mq, py.read_mq)


class TestNativeParity:
    def test_simulated(self):
        counts = simulate_diploid_counts(400, coverage=25)
        text = make_pileup_text(counts, with_qualities=True)
        py, nat = both(text, True, True)
        assert_batches_equal(py, nat, with_reads=True)

    def test_counts_only(self):
        counts = simulate_diploid_counts(200, coverage=15, seed=3)
        text = make_pileup_text(counts)
        py, nat = both(text)
        assert_batches_equal(py, nat)

    def test_grammar_soup(self):
        text = (
            b"chr1\t1\tA\t6\t..,.^Ig$Tt+3acg-2tt*\tIIIIII\tJJJJJJ\n"
            b"\n"
            b"chr2\t2\tN\t4\t.,Nn<>\tIIII\tJJJJ\n"
            b"chrX  7  g  3  .,-1a  ABC  DEF\n"
            b"chr1\t99\tc\t2\t,+12AC\tII\tJJ\n"
        )
        py, nat = both(text, True, True)
        assert_batches_equal(py, nat, with_reads=True)

    def test_quality_pairing_shift(self):
        # '*' consumes a quality slot but no base: pairing shifts identically
        text = b"c\t1\tA\t4\t.*..\tABCD\tEFGH\n"
        py, nat = both(text, True, True)
        assert_batches_equal(py, nat, with_reads=True)

    def test_multi_chromosome_order(self):
        text = (
            b"beta\t1\tA\t1\t.\n" b"alpha\t2\tC\t1\t.\n" b"beta\t3\tG\t1\t.\n"
        )
        py, nat = both(text)
        assert py.chrom_table == ["beta", "alpha"]
        assert_batches_equal(py, nat)

    def test_many_chromosomes_threading(self):
        # enough lines to exercise multiple threads and chrom-id remapping
        rng = np.random.default_rng(0)
        lines = []
        for i in range(5000):
            chrom = f"chr{rng.integers(1, 23)}"
            lines.append(f"{chrom}\t{i+1}\tA\t2\t.,".encode())
        text = b"\n".join(lines) + b"\n"
        py, nat = both(text)
        assert_batches_equal(py, nat)

    def test_strict_raises(self):
        text = b"chr1\t1\tA\t1\t.\n" b"badline\n"
        with pytest.raises(SidParseError):
            parse_pileup(text, backend="native", strict=True)

    def test_nonstrict_collects(self):
        text = b"chr1\t1\tA\t1\t.\n" b"badline\n" b"chr1\t2\tC\t1\t.\n"
        nat = parse_pileup(text, backend="native", strict=False)
        assert nat.num_sites == 2
        assert len(nat.errors.records) == 1
        assert nat.errors.records[0].line_number == 2

    def test_mq_only_five_tokens_is_missing_code(self):
        # parse_mq without parse_bq on a 5-token line: the spec reports
        # MALFORMED_OR_MISSING (the mq column is the missing one), not
        # MALFORMED (round-1 advisor finding)
        from sid_tpu.utils.errors import MALFORMED_OR_MISSING

        text = b"chr1\t1\tA\t2\t..\n"
        for backend in ("python", "native"):
            b = parse_pileup(text, False, True, backend=backend, strict=False)
            assert b.num_sites == 0
            assert len(b.errors.records) == 1
            assert b.errors.records[0].message == MALFORMED_OR_MISSING, backend

    def test_no_trailing_newline(self):
        text = b"chr1\t1\tA\t1\t."
        py, nat = both(text)
        assert_batches_equal(py, nat)

    def test_empty_input(self):
        py, nat = both(b"")
        assert nat.num_sites == 0
        assert_batches_equal(py, nat)

    def test_auto_backend_prefers_native(self):
        b = parse_pileup(b"c\t1\tA\t1\t.\n", backend="auto")
        assert b.num_sites == 1


class TestFastCountPath:
    def test_fast_and_general_paths_agree(self):
        # counts-only parsing takes a branchless fast path for tokens with
        # no ^/+/- escapes; with_reads parsing always takes the general
        # loop — both must produce identical counts
        counts = simulate_diploid_counts(300, coverage=20, seed=9)
        text = make_pileup_text(counts, with_qualities=True)
        fast = parse_pileup(text, False, False, backend="native")
        slow = parse_pileup(text, True, True, backend="native")
        np.testing.assert_array_equal(fast.counts, slow.counts)

    def test_escape_tokens_fall_back(self):
        text = (
            b"c\t1\tA\t4\t.^I.,+2gg,\tIIII\tJJJJ\n"
            b"c\t2\tA\t4\t..-1a,,\tIIII\tJJJJ\n"
            b"c\t3\tG\t2\t.N*,\tII\tJJ\n"
        )
        fast = parse_pileup(text, False, False, backend="native")
        py = parse_pileup(text, False, False, backend="python")
        np.testing.assert_array_equal(fast.counts, py.counts)

    def test_escape_reference_bases_fall_back(self):
        # a reference byte of '^'/'+'/'-' turns substituted '.'/',' into
        # escapes in the spec; the counts-only fast path must not shortcut
        # those lines (round-1 advisor finding)
        text = (
            b"chr1\t1\t^\t2\t.A\n"
            b"chr1\t2\t+\t3\t.2AC\n"
            b"chr1\t3\t-\t3\t,1TG\n"
            b"chr1\t4\t^\t2\t,C\n"
        )
        py, nat = both(text)
        assert_batches_equal(py, nat)
        # spec: '.' -> '^' eats the next char, so only [0,0,0,0] remains
        np.testing.assert_array_equal(py.counts[0], [0, 0, 0, 0])
        np.testing.assert_array_equal(py.counts[1], [0, 0, 0, 0])


class TestDifferentialFuzz:
    """Random-input differential fuzzing: both backends, identical output."""

    @pytest.mark.parametrize("seed", range(8))
    def test_random_token_soup(self, seed):
        rng = np.random.default_rng(seed)
        alphabet = b"ACGTacgtNn.,*$^+-0123456789<>\t "
        lines = []
        for _ in range(200):
            ntok = rng.integers(0, 9)
            toks = []
            for _ in range(ntok):
                ln = rng.integers(1, 12)
                toks.append(bytes(rng.choice(list(alphabet), ln)))
            lines.append(b"\t".join(toks))
        data = b"\n".join(lines) + (b"\n" if rng.uniform() < 0.5 else b"")
        for bq, mq in ((False, False), (True, True), (False, True)):
            py = parse_pileup(data, bq, mq, backend="python", strict=False)
            nat = parse_pileup(data, bq, mq, backend="native", strict=False)
            assert_batches_equal(py, nat, with_reads=bq or mq)
            assert len(py.errors.records) == len(nat.errors.records)
            assert [(r.line_number, r.message) for r in py.errors.records] == [
                (r.line_number, r.message) for r in nat.errors.records
            ]

    @pytest.mark.parametrize("seed", range(8))
    def test_inline_quality_terms_bitwise(self, seed):
        """The parser's inline per-site term sums must equal the numpy
        accumulate_read_terms path BITWISE (same f64 table, same order)."""
        from sid_tpu.models.common import major_allele_indices_np
        from sid_tpu.models.quality import accumulate_read_terms

        rng = np.random.default_rng(300 + seed)
        if seed < 4:  # realistic pileups with quality columns
            counts = simulate_diploid_counts(150, coverage=18, seed=seed)
            text = make_pileup_text(counts, with_qualities=True, seed=seed)
        else:  # token soup: markers, indels, short/long quality strings
            alphabet = b"ACGTacgtNn.,*$^+-0123456789<>"
            lines = []
            for i in range(150):
                bases = bytes(rng.choice(list(alphabet), rng.integers(1, 25)))
                bq = bytes(rng.integers(33, 90, rng.integers(0, 25), dtype=np.uint8))
                mq = bytes(rng.integers(33, 90, rng.integers(0, 25), dtype=np.uint8))
                lines.append(
                    b"chr1\t%d\tA\t5\t%s\t%s\t%s" % (i + 1, bases, bq, mq)
                )
            text = b"\n".join(lines) + b"\n"
        nat = parse_pileup(text, True, True, backend="native", strict=False)
        assert nat.q_log_hom is not None, "terms missing from native parse"
        major, second = major_allele_indices_np(nat.counts.astype(np.int64))
        np.testing.assert_array_equal(nat.q_major, major)
        np.testing.assert_array_equal(nat.q_second, second)

        # bitwise vs a strictly-sequential f64 sum (the reference's per-read
        # loop order, call.cpp:325-342 — what the parser implements)
        from sid_tpu.models.quality import quality_term_tables

        tab = quality_term_tables()
        offs = nat.read_offsets
        seq_hom = np.zeros(nat.num_sites)
        seq_het = np.zeros(nat.num_sites)
        for s in range(nat.num_sites):
            lh = lhet = 0.0
            for j in range(int(offs[s]), int(offs[s + 1])):
                q = int(min(nat.read_bq[j], nat.read_mq[j]))
                c = int(nat.read_code[j])
                lh += tab[q, 0] if c == major[s] else tab[q, 1]
                lhet += tab[q, 2] if c in (major[s], second[s]) else tab[q, 3]
            seq_hom[s] = lh
            seq_het[s] = lhet
        np.testing.assert_array_equal(nat.q_log_hom, seq_hom)
        np.testing.assert_array_equal(nat.q_log_het, seq_het)

        # the numpy fallback (np.add.reduceat uses pairwise partial sums)
        # may differ in the last ulps, never more: all terms share a sign,
        # so there is no cancellation and relative error is O(n_reads * eps)
        log_hom, log_het = accumulate_read_terms(nat, major, second)
        np.testing.assert_allclose(nat.q_log_hom, log_hom, rtol=1e-12)
        np.testing.assert_allclose(nat.q_log_het, log_het, rtol=1e-12)

    @pytest.mark.parametrize("seed", range(8))
    def test_terms_only_fused_path_bitwise(self, seed):
        """terms_only=True (the quality method's production mode, fused
        decode+min+accumulate without materializing bq/mq) must produce the
        SAME term sums, majors, counts, and coordinates as the general
        with-reads path — bitwise. Token-soup seeds include quality columns
        shorter than the surviving-base count, which must take the general
        path inside the parser and still agree."""
        rng = np.random.default_rng(900 + seed)
        if seed < 4:
            counts = simulate_diploid_counts(200, coverage=22, seed=seed)
            text = make_pileup_text(counts, with_qualities=True, seed=seed)
        else:
            alphabet = b"ACGTacgtNn.,*$^+-0123456789<>"
            lines = []
            for i in range(200):
                bases = bytes(rng.choice(list(alphabet), rng.integers(1, 30)))
                bq = bytes(rng.integers(33, 90, rng.integers(0, 30), dtype=np.uint8))
                mq = bytes(rng.integers(33, 90, rng.integers(0, 30), dtype=np.uint8))
                lines.append(
                    b"chr1\t%d\tA\t5\t%s\t%s\t%s" % (i + 1, bases, bq, mq)
                )
            text = b"\n".join(lines) + b"\n"
        full = parse_pileup(text, True, True, backend="native", strict=False)
        fused = parse_pileup(text, True, True, backend="native", strict=False,
                             quality_terms_only=True)
        assert fused.q_log_hom is not None
        np.testing.assert_array_equal(full.counts, fused.counts)
        np.testing.assert_array_equal(full.pos, fused.pos)
        np.testing.assert_array_equal(full.q_major, fused.q_major)
        np.testing.assert_array_equal(full.q_second, fused.q_second)
        np.testing.assert_array_equal(full.q_log_hom, fused.q_log_hom)
        np.testing.assert_array_equal(full.q_log_het, fused.q_log_het)

    @pytest.mark.parametrize("seed", range(4))
    def test_random_binary_garbage(self, seed):
        rng = np.random.default_rng(100 + seed)
        data = bytes(rng.integers(0, 256, 4096, dtype=np.uint8))
        py = parse_pileup(data, backend="python", strict=False)
        nat = parse_pileup(data, backend="native", strict=False)
        assert_batches_equal(py, nat)
