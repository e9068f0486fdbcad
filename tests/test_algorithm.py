"""Het-disambiguation kernel tests.

Case matrix from the reference's AlgorithmTest
(/root/reference/test/groovy/haplorec/test/util/pipeline/AlgorithmTest.groovy):
empty input, single het (trivial A/B split), known-known pairs,
known-novel pairs, multi-combo outputs, invalid input.
"""

from __future__ import annotations

import pytest

from haplorec_spark.algorithm import disambiguate_hets, het_variant_rows
from haplorec_spark.matrix import build_matrices


def matrix(rows, gene="g1"):
    return build_matrices([(gene, h, s, a) for h, s, a in rows])[gene]


FOUR_HAP = matrix([
    ("*1", "rs1", "A"), ("*1", "rs2", "T"),
    ("*2", "rs1", "T"), ("*2", "rs2", "A"),
    ("*3", "rs1", "A"), ("*3", "rs2", "A"),
    ("*4", "rs1", "T"), ("*4", "rs2", "T"),
])


def seqs(combos, key):
    """Extract (strandA alleles, strandB alleles) per combo for brevity."""
    out = []
    for combo in combos[key]:
        a = tuple(r["allele"] for r in combo if r["physical_chromosome"] == "A")
        b = tuple(r["allele"] for r in combo if r["physical_chromosome"] == "B")
        out.append((a, b))
    return out


def test_empty_input():
    combos = disambiguate_hets(FOUR_HAP, [])
    assert combos == {"AKnownBKnown": [], "AKnownBNovel": []}


def test_two_het_snps_all_combos_known():
    # rs1 A/T + rs2 A/T over the 4-haplotype matrix: every strand
    # assignment identifies a known haplotype -> two AKnownBKnown combos,
    # sorted by strand sequences (Algorithm.groovy:244-253).
    combos = disambiguate_hets(
        FOUR_HAP,
        [("rs1", "A"), ("rs1", "T"), ("rs2", "A"), ("rs2", "T")],
    )
    assert seqs(combos, "AKnownBKnown") == [
        (("A", "A"), ("T", "T")),   # *3 / *4
        (("A", "T"), ("T", "A")),   # *1 / *2
    ]
    assert combos["AKnownBNovel"] == []
    # combo rows carry snp ids in het-snp order
    first = combos["AKnownBKnown"][0]
    assert [r["snp_id"] for r in first] == ["rs1", "rs2", "rs1", "rs2"]


def test_single_het_snp_trivial_split():
    # One het SNP: alleles split arbitrarily across chromosomes as long
    # as at least one haplotype contains the allele
    # (Algorithm.groovy:146-158).
    m = matrix([("*1", "rs1", "A"), ("*1", "rs2", "G"),
                ("*3", "rs1", "G"), ("*3", "rs2", "G")])
    combos = disambiguate_hets(m, [("rs1", "A"), ("rs1", "G")])
    assert seqs(combos, "AKnownBKnown") == [(("A",), ("G",))]
    assert combos["AKnownBNovel"] == []


def test_known_novel():
    # rs1 A identifies *1 uniquely; the complementary strand's T exists
    # in no haplotype -> AKnownBNovel.
    m = matrix([("*1", "rs1", "A")])
    combos = disambiguate_hets(m, [("rs1", "A"), ("rs1", "T")])
    assert combos["AKnownBKnown"] == []
    assert seqs(combos, "AKnownBNovel") == [(("A",), ("T",))]


def test_no_unique_haplotype_yields_nothing():
    # Both assignments leave >1 candidate haplotype -> no sequences.
    m = matrix([
        ("*1", "rs1", "A"), ("*1", "rs2", "G"),
        ("*2", "rs1", "A"), ("*2", "rs2", "C"),
        ("*3", "rs1", "T"), ("*3", "rs2", "G"),
        ("*4", "rs1", "T"), ("*4", "rs2", "C"),
    ])
    combos = disambiguate_hets(m, [("rs1", "A"), ("rs1", "T")])
    # single-snp special case still applies: both alleles exist in some
    # haplotype, so both sequences are accepted and pair up
    assert seqs(combos, "AKnownBKnown") == [(("A",), ("T",))]


def test_unknown_snp_rejected():
    with pytest.raises(ValueError, match="has no SNP rs9"):
        disambiguate_hets(FOUR_HAP, [("rs9", "A"), ("rs9", "T")])


def test_non_pair_het_rejected():
    with pytest.raises(ValueError, match="saw rs1 with 1 variants"):
        disambiguate_hets(FOUR_HAP, [("rs1", "A")])


def test_max_het_snps_guard():
    with pytest.raises(ValueError, match="exceeds max_het_snps"):
        disambiguate_hets(
            FOUR_HAP,
            [("rs1", "A"), ("rs1", "T"), ("rs2", "A"), ("rs2", "T")],
            max_het_snps=1,
        )


def test_het_variant_rows_numbering():
    combos = disambiguate_hets(
        FOUR_HAP,
        [("rs1", "A"), ("rs1", "T"), ("rs2", "A"), ("rs2", "T")],
    )
    rows = het_variant_rows(combos)
    # 2 combos x 4 rows, het_combos=2, numbered 1..2 in sorted-combo order
    assert len(rows) == 8
    assert {r["het_combos"] for r in rows} == {2}
    combo1 = [r for r in rows if r["het_combo"] == 1]
    assert [(r["physical_chromosome"], r["snp_id"], r["allele"])
            for r in combo1] == [
        ("A", "rs1", "A"), ("A", "rs2", "A"),
        ("B", "rs1", "T"), ("B", "rs2", "T"),
    ]
