"""Scalar-function and reshape tests (F7/F2/F4/F13 semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from haplorec_spark.functions import (
    normalize_phenotype_name,
    ordered_pair,
    zygosity_from_alleles,
)
from haplorec_spark.operators.reshape import long_to_wide, melt
from tests.conftest import rows


def _one_col(spark, values):
    return spark.createDataFrame([(v,) for v in values], "s string")


def test_normalize_phenotype_name_reference_doctests(spark):
    # process.py doctest cases + trailing-period / whitespace variants
    df = _one_col(spark, [
        "Intermediate metabolizer (~2-11% of patients)",
        "Intermediate Metabolizer (~2-11% of patients)",
        "Poor Metabolizer (~7% of patients).",
        "Ultrarapid metabolizer (~1-2%)",
        "Extensive metabolizer.",
        "Normal",
    ])
    got = [r[0] for r in df.select(
        normalize_phenotype_name("s")
    ).collect()]
    assert got == [
        "intermediate metabolizer",
        "intermediate metabolizer",
        "poor metabolizer",
        "ultrarapid metabolizer",
        "extensive metabolizer",
        "normal",
    ]


def test_zygosity_from_alleles(spark):
    df = _one_col(spark, ["A", "AG", "", "CAT", None])
    got = [r[0] for r in df.select(zygosity_from_alleles("s")).collect()]
    assert got == ["hom", "het", None, "hom", None]


def test_ordered_pair(spark):
    df = spark.createDataFrame(
        [("*2", "*1"), ("*1", "*2"), ("*3", None)], "a string, b string"
    )
    first, second = ordered_pair("a", "b")
    got = [tuple(r) for r in df.select(first, second).collect()]
    assert got == [("*1", "*2"), ("*1", "*2"), ("*3", None)]


def test_melt_and_widen_roundtrip(spark):
    wide = spark.createDataFrame(
        [("*1", "A", "G"), ("*2", "C", "T")],
        "haplotype_name string, rs1 string, rs2 string",
    )
    long = melt(wide, ["haplotype_name"], ["rs1", "rs2"],
                key_name="snp_id", value_name="allele")
    assert rows(long) == [
        ("*1", "rs1", "A"), ("*1", "rs2", "G"),
        ("*2", "rs1", "C"), ("*2", "rs2", "T"),
    ]
    rewide = long_to_wide(
        long, ["haplotype_name"], "snp_id", "allele", values=["rs1", "rs2"]
    )
    assert rows(rewide) == [("*1", "A", "G"), ("*2", "C", "T")]
    assert rewide.columns == ["haplotype_name", "rs1", "rs2"]


# -- F8: phenotype-genotype grammar (parsers/text.py doctest goldens) --------

def test_parse_phenotype_genotype_reference_doctest():
    from haplorec_spark.functions.grammar import parse_phenotype_genotype

    assert parse_phenotype_genotype(
        "An individual carrying two gain-of-function alleles or one "
        "functional allele and one gain-of-function allele"
    ) == [
        ("gain-of-function", "gain-of-function"),
        ("functional", "gain-of-function"),
    ]
    assert parse_phenotype_genotype(
        "An individual carrying only nonfunctional alleles"
    ) == [("nonfunctional", "nonfunctional")]
    assert parse_phenotype_genotype(
        "An individual carrying duplications of functional alleles"
    ) == [("functional", "functional")]


def test_parse_phenotype_genotype_invalid():
    import pytest as _pytest

    from haplorec_spark.functions.grammar import (
        GenotypeParseError,
        parse_phenotype_genotype,
    )

    with _pytest.raises(GenotypeParseError):
        parse_phenotype_genotype("A person with two alleles of unknown kind")


def test_phenotype_genotype_pairs_udf(spark):
    from haplorec_spark.functions.grammar import phenotype_genotype_pairs

    df = spark.createDataFrame(
        [("An individual carrying two functional alleles",),
         ("not parseable",), (None,)],
        "s string",
    )
    got = [r.genotypes for r in phenotype_genotype_pairs(df, "s").collect()]
    assert [tuple(p) for p in got[0]] == [("functional", "functional")]
    assert got[1] is None and got[2] is None
