"""Downstream tools: codon translation, exon lookup, nonsyn pipeline."""

import gzip
import io

import pytest

from sid_tpu.tools import nonsynonymous as ns
from sid_tpu.tools.exons import Exon, ExonTable, annotate_sites, sites_from_snp_csv

# the standard genetic code, written independently as an explicit table
STANDARD_CODE = {
    "TTT": "F", "TTC": "F", "TTA": "L", "TTG": "L",
    "CTT": "L", "CTC": "L", "CTA": "L", "CTG": "L",
    "ATT": "I", "ATC": "I", "ATA": "I", "ATG": "M",
    "GTT": "V", "GTC": "V", "GTA": "V", "GTG": "V",
    "TCT": "S", "TCC": "S", "TCA": "S", "TCG": "S",
    "CCT": "P", "CCC": "P", "CCA": "P", "CCG": "P",
    "ACT": "T", "ACC": "T", "ACA": "T", "ACG": "T",
    "GCT": "A", "GCC": "A", "GCA": "A", "GCG": "A",
    "TAT": "Y", "TAC": "Y", "TAA": "stop", "TAG": "stop",
    "CAT": "H", "CAC": "H", "CAA": "Q", "CAG": "Q",
    "AAT": "N", "AAC": "N", "AAA": "K", "AAG": "K",
    "GAT": "D", "GAC": "D", "GAA": "E", "GAG": "E",
    "TGT": "C", "TGC": "C", "TGA": "stop", "TGG": "W",
    "CGT": "R", "CGC": "R", "CGA": "R", "CGG": "R",
    "AGT": "S", "AGC": "S", "AGA": "R", "AGG": "R",
    "GGT": "G", "GGC": "G", "GGA": "G", "GGG": "G",
}


class TestTranslate:
    def test_all_64_codons(self):
        for codon, aa in STANDARD_CODE.items():
            assert ns.translate(codon) == aa, codon

    def test_invalid_codon(self):
        with pytest.raises(ValueError):
            ns.translate("AXG")
        with pytest.raises(ValueError):
            ns.translate("AC")

    def test_reverse_complement(self):
        # complement each genotype string (order within the string kept),
        # reverse the list — reference semantics
        assert ns.reverse_complement(["AC", "GG", "TT"]) == ["AA", "CC", "TG"]
        assert ns.reverse_complement(["A", "T", "G"]) == ["C", "A", "T"]

    def test_all_combinations(self):
        combos = ns.all_combinations(["AC", "G", "T"])
        assert combos == [("A", "G", "T"), ("C", "G", "T")]


class TestSitePhase:
    def test_forward_with_start_phase(self):
        sp = ns.site_phase_from_exon("1", 105, "g", 100, 200, 1, 1, -1)
        assert sp.phase == (105 - 100 + 1) % 3

    def test_forward_with_end_phase_only(self):
        sp = ns.site_phase_from_exon("1", 105, "g", 100, 200, 1, -1, 2)
        assert sp.phase == (200 - 105 + 2 + 1) % 3

    def test_reverse_strand(self):
        sp = ns.site_phase_from_exon("1", 105, "g", 100, 200, -1, 1, -1)
        assert sp.phase == (200 - 105 + 1) % 3

    def test_strandless_dropped(self):
        assert ns.site_phase_from_exon("1", 105, "g", 100, 200, 0, 1, -1) is None


def make_raw_csv(genotypes, chrom="1", start=100):
    lines = ["chrom,pos,label,gt,hom_conf,het_conf,conf_type"]
    for i, gt in enumerate(genotypes):
        label = "het" if gt[0] != gt[1] else "hom"
        lines.append(f"{chrom},{start+i},{label},{gt},1,0.01,p_value")
    return "\n".join(lines) + "\n"


class TestGenerateSiteCodons:
    def test_phase_selects_codon_window(self):
        # site at pos 102 with phase 0 on + strand: codon = sites 102,103,104
        raw = make_raw_csv(["AA", "CC", "GG", "TT", "AA", "CC"])
        rec = ns.SitePhase("1", 102, "gene1", 0, 1)
        out = list(ns.generate_site_codons(io.StringIO(raw), [rec]))
        assert len(out) == 1
        assert out[0].codons == ["GG", "TT", "AA"]
        # codon from per-site alleles: G,T,A -> GTA -> V (one combo, all hom)
        assert out[0].translations == [ns.translate("GTA")]

    def test_phase_two_offsets_back(self):
        # phase 2 on + strand: the site is the codon's 3rd base
        raw = make_raw_csv(["AA", "CC", "GG", "TT", "AA", "CC"])
        rec = ns.SitePhase("1", 102, "gene1", 2, 1)
        out = list(ns.generate_site_codons(io.StringIO(raw), [rec]))
        assert out[0].codons == ["AA", "CC", "GG"]

    def test_het_site_yields_nonsyn(self):
        # het at middle base: ACT (T) vs AGT (S) -> nonsyn
        raw = make_raw_csv(["AA", "CG", "TT", "AA", "CC"])
        rec = ns.SitePhase("1", 101, "gene1", 1, 1)
        out = list(ns.generate_site_codons(io.StringIO(raw), [rec]))
        assert out[0].codons == ["AA", "CG", "TT"]
        assert out[0].translations == sorted({ns.translate("ACT"), ns.translate("AGT")})
        assert "nonsyn" in ns.format_record(out[0])

    def test_reverse_strand_complements(self):
        raw = make_raw_csv(["AA", "CC", "GG", "TT", "AA"])
        rec = ns.SitePhase("1", 102, "gene1", 0, -1)
        out = list(ns.generate_site_codons(io.StringIO(raw), [rec]))
        # phase 0, strand -1 -> offset 0 -> window sites 100..102 (AA CC GG),
        # reverse-complemented to CC GG TT
        assert out[0].codons == ["CC", "GG", "TT"]

    def test_duplicate_positions_share_codon(self):
        raw = make_raw_csv(["AA", "CC", "GG", "TT", "AA"])
        recs = [
            ns.SitePhase("1", 102, "geneA", 0, 1),
            ns.SitePhase("1", 102, "geneB", 0, 1),
        ]
        out = list(ns.generate_site_codons(io.StringIO(raw), recs))
        assert len(out) == 2
        assert {o.gene_id for o in out} == {"geneA", "geneB"}

    def test_unmatched_record_skipped_in_robust_mode(self):
        raw = make_raw_csv(["AA", "CC", "GG", "TT", "AA"])
        recs = [
            ns.SitePhase("1", 99, "ghost", 0, 1),  # before the stream
            ns.SitePhase("1", 102, "gene1", 0, 1),
        ]
        out = list(ns.generate_site_codons(io.StringIO(raw), recs))
        assert [o.gene_id for o in out] == ["gene1"]


class TestExonTable:
    def table(self):
        return ExonTable([
            Exon("1", 100, 200, 1, 0, -1, "e1", "g1", "protein_coding", 110, 190),
            Exon("1", 300, 400, -1, 1, 2, "e2", "g2", "protein_coding", 300, 400),
            Exon("2", 100, 200, 1, 0, -1, "e3", "g3", "protein_coding", 100, 200),
        ])

    def test_lookup_respects_coding_bounds(self):
        t = self.table()
        assert [e.exon_id for e in t.lookup("1", 150)] == ["e1"]
        assert t.lookup("1", 105) == []  # inside exon but before coding_start
        assert t.lookup("1", 250) == []
        assert [e.exon_id for e in t.lookup("1", 350)] == ["e2"]
        assert t.lookup("3", 150) == []

    def test_annotate_output_format(self):
        t = self.table()
        buf = io.StringIO()
        n = annotate_sites([("1", 150), ("1", 250)], t, buf)
        lines = buf.getvalue().strip().split("\n")
        assert n == 1
        assert lines[0].startswith("site.chrom,site.pos,gene.stable_id")
        assert lines[1].split(",")[:3] == ["1", "150", "g1"]

    def test_sites_from_snp_csv(self):
        data = "chrom,pos,label,gt,hom_conf,het_conf,conf_type\n1,5,het,AC,1,0,p_value\n"
        assert list(sites_from_snp_csv(io.StringIO(data))) == [("1", 5)]


class TestPipeline:
    def test_end_to_end(self, tmp_path):
        import numpy as np

        from sid_tpu.tools.pipeline import run_pipeline
        from synth import make_pileup_text, simulate_diploid_counts

        counts = simulate_diploid_counts(300, coverage=25, pi=0.1, eps=0.005)
        src = tmp_path / "in.plp"
        src.write_bytes(make_pileup_text(counts))
        # exon covering the first 200 sites
        exon_csv = tmp_path / "exons.csv"
        exon_csv.write_text(
            "chrom,start,end,strand,phase,end_phase,exon_id,gene_id,biotype,"
            "coding_start,coding_end\n"
            "chr1,1,200,1,0,-1,e1,g1,protein_coding,1,200\n"
        )
        out = run_pipeline(
            str(src), str(tmp_path / "work"), method="likelihood_ratio",
            estimate_prior=True, exon_table=str(exon_csv),
            diag=lambda s: None,
        )
        assert out["n_sites"] > 0
        assert out["n_snps"] > 0
        assert out["n_exonic"] > 0
        assert out["n_labeled"] >= 0
        head = gzip.open(out["raw"], "rt").readline()
        assert head.startswith("chrom,pos,")
        nonsyn_lines = open(out["nonsyn"]).read().strip().split("\n")
        if out["n_labeled"]:
            assert nonsyn_lines[0].count(",") == 7
