"""mpileup grammar tests.

Ports every assertion of the reference's (stale) Catch suite
(test/test-pileup_parser.cpp, test/test-profiles.cpp) onto the new parser,
plus edge cases from the grammar in pileup.cpp:70-167.
"""

import pytest

from sid_tpu.io import pileup_py
from sid_tpu.io.pileup import parse_pileup
from sid_tpu.utils.errors import SidParseError


def bases_of(s, ref=b"N"):
    codes, strands, counts = pileup_py.parse_read_bases(s, ref[0])
    return codes, strands, counts


def counts_of(s, ref=b"n"):
    return bases_of(s, ref)[2]


class TestParseQualities:
    # test-pileup_parser.cpp:8-21
    def test_general(self):
        assert pileup_py.parse_qualities(b"+5D") == [10, 20, 35]

    def test_empty(self):
        assert pileup_py.parse_qualities(b"") == []

    def test_clamp_minimum_one(self):
        # pileup.cpp:159-163: q < 1 is clamped to 1 ('!' = 33 -> 0 -> 1)
        assert pileup_py.parse_qualities(b"!\"#") == [1, 1, 2]

    def test_sub33_wraparound(self):
        # bytes below 33 wrap around as uint8 then mostly stay large
        assert pileup_py.parse_qualities(bytes([32])) == [255]


class TestParseReadBases:
    # test-pileup_parser.cpp:23-36
    def test_general(self):
        codes, strands, counts = bases_of(b"AgACgt")
        assert codes == [0, 2, 0, 1, 2, 3]  # A G A C G T
        assert strands == [1, 0, 1, 1, 0, 0]
        assert counts == [2, 1, 2, 1]

    # test-profiles.cpp:16-25
    @pytest.mark.parametrize(
        "s,expected",
        [
            (b"aA", [2, 0, 0, 0]),
            (b"cC", [0, 2, 0, 0]),
            (b"gG", [0, 0, 2, 0]),
            (b"tT", [0, 0, 0, 2]),
        ],
    )
    def test_simple_reads(self, s, expected):
        assert counts_of(s) == expected

    def test_empty_read(self):
        assert counts_of(b"") == [0, 0, 0, 0]

    def test_ignore_read_end(self):
        assert counts_of(b"a$") == [1, 0, 0, 0]

    def test_skip_quality_markers(self):
        assert counts_of(b"a^a") == [1, 0, 0, 0]
        assert counts_of(b"^aa") == [1, 0, 0, 0]

    def test_skip_indels(self):
        for s in (b"a+3act", b"+3acta", b"a-3act", b"-3acta"):
            assert counts_of(s) == [1, 0, 0, 0], s

    def test_reference_bases(self):
        # test-profiles.cpp:45-52: '.'/',' resolve via the reference base
        assert counts_of(b"a.", b"g") == [1, 0, 1, 0]
        assert counts_of(b",g", b"a") == [1, 0, 1, 0]
        assert counts_of(b"ag", b"t") == [1, 0, 1, 0]
        assert counts_of(b"ag", b"n") == [1, 0, 1, 0]

    def test_non_acgt_reference_drops_dots(self):
        # '.' with reference 'N' resolves to 'N' -> dropped (pileup.cpp:78-83)
        assert counts_of(b".,", b"N") == [0, 0, 0, 0]

    def test_malformed_indels(self):
        # test-profiles.cpp:53-56: '-' not followed by a digit is ignored
        assert counts_of(b"--a") == [1, 0, 0, 0]
        assert counts_of(b"--3ggga") == [1, 0, 0, 0]

    def test_indel_skip_past_end(self):
        # indel length larger than remaining chars terminates the scan
        assert counts_of(b"a+9gg") == [1, 0, 0, 0]

    def test_caret_at_end(self):
        assert counts_of(b"a^") == [1, 0, 0, 0]

    def test_indel_strand_in_skipped_bases(self):
        # skipped indel bases must not affect counts or strands
        codes, strands, counts = bases_of(b"A+2ggT")
        assert codes == [0, 3]
        assert strands == [1, 1]
        assert counts == [1, 0, 0, 1]

    def test_other_symbols_dropped(self):
        assert counts_of(b"*Nn<>") == [0, 0, 0, 0]


class TestParsePileupLine:
    # test-pileup_parser.cpp:38-57
    def test_general(self):
        line = b"chr19\t1337\tA\t6\tAgACgt\t++5D5\tDD55D"
        out = pileup_py.parse_pileup_line(line, True, True)
        assert out.chrom == b"chr19"
        assert out.pos == 1337
        assert out.counts == [2, 1, 2, 1]
        assert out.codes == [0, 2, 0, 1, 2, 3]
        assert out.strands == [1, 0, 1, 1, 0, 0]
        assert out.base_qualities == [10, 10, 20, 35, 20]
        assert out.mapping_qualities == [35, 35, 20, 20, 35]

    def test_reference_dot_resolution(self):
        out = pileup_py.parse_pileup_line(b"chr1\t5\tC\t3\t.,.", False, False)
        assert out.counts == [0, 3, 0, 0]
        assert out.strands == [1, 0, 1]

    def test_malformed_short_line(self):
        with pytest.raises(SidParseError):
            pileup_py.parse_pileup_line(b"chr1", False, False)

    def test_malformed_long_ref(self):
        # reference base must be length 1 (pileup.cpp:27-29)
        with pytest.raises(SidParseError):
            pileup_py.parse_pileup_line(b"chr1\t5\tCC\t3\t...", False, False)

    def test_missing_mapping_qualities(self):
        with pytest.raises(SidParseError):
            pileup_py.parse_pileup_line(b"chr1\t5\tC\t3\t...\tIII", True, True)

    def test_nonstrict_reports(self):
        from sid_tpu.utils.errors import ErrorChannel

        ch = ErrorChannel(strict=False)
        out = pileup_py.parse_pileup_line(b"chr1", False, False, ch, 7)
        assert out is None
        assert len(ch.records) == 1
        assert ch.records[0].line_number == 7


class TestParsePileupBatch:
    def test_batch_roundtrip(self):
        text = (
            b"chr1\t1\tA\t3\t..,\tIII\tJJJ\n"
            b"chr1\t2\tC\t2\t.T\tII\tJJ\n"
            b"\n"  # empty lines are skipped (call.cpp:14)
            b"chr2\t1\tG\t1\t,\tI\tJ\n"
        )
        b = parse_pileup(text, True, True, backend="python")
        assert b.num_sites == 3
        assert b.chrom_table == ["chr1", "chr2"]
        assert list(b.chrom_id) == [0, 0, 1]
        assert list(b.pos) == [1, 2, 1]
        assert b.counts.tolist() == [[3, 0, 0, 0], [0, 1, 0, 1], [0, 0, 1, 0]]
        assert list(b.read_offsets) == [0, 3, 5, 6]
        assert list(b.read_bq) == [40, 40, 40, 40, 40, 40]
        assert list(b.read_mq) == [41, 41, 41, 41, 41, 41]

    def test_counts_only_batch(self):
        b = parse_pileup(b"c\t9\tT\t2\t.,\n", backend="python")
        assert b.read_offsets is None
        assert b.counts.tolist() == [[0, 0, 0, 2]]


class TestRobustness:
    def test_uint16_count_wraparound(self):
        # 65537 As wrap to count 1 (profile_t is uint16 in the reference)
        line = b"c\t1\tA\t65537\t" + b"A" * 65537
        out = pileup_py.parse_pileup_line(line, False, False)
        assert out.counts[0] == 1
        from sid_tpu.io.pileup import parse_pileup

        nat = parse_pileup(line + b"\n", backend="native")
        assert nat.counts[0, 0] == 1

    def test_negative_position(self):
        out = pileup_py.parse_pileup_line(b"c\t-5\tA\t1\t.", False, False)
        assert out.pos == -5

    def test_position_with_leading_plus(self):
        out = pileup_py.parse_pileup_line(b"c\t+7\tA\t1\t.", False, False)
        assert out.pos == 7

    def test_huge_indel_length_terminates(self):
        out = pileup_py.parse_pileup_line(
            b"c\t1\tA\t2\t.+999999999999999999g.", False, False
        )
        assert out.counts == [1, 0, 0, 0]
