"""Condensed-report and novel-haplotype-matrix tests.

Drives the full pipeline on the PipelineTest unambiguous fixture, then
checks the phenotype/genotype drug-recommendation reports condense as
the reference's report layer does (noDuplicates + collapse + aliasing)
and the novel matrix stacks known haplotypes above patient chromosomes
(ReportTest.groovy / GeneHaplotypeMatrix.groovy:163-191).
"""

from __future__ import annotations

import pytest

from haplorec_spark import schema as sch
from haplorec_spark.pipeline import Pipeline
from haplorec_spark.report import (
    genotype_drug_recommendation_report,
    novel_haplotype_report,
    phenotype_drug_recommendation_report,
)
from tests.fixtures import GPDR, make_ref


@pytest.fixture(scope="module")
def ref(spark):
    r = make_ref(
        spark,
        ghv=[
            ("g1", "*1", "rs1", "A"), ("g1", "*1", "rs2", "G"),
            ("g1", "*2", "rs3", "C"), ("g1", "*2", "rs4", "T"),
        ],
        genotype_phenotype=[
            ("g1", "*1", "*1", "homozygote normal"),
            ("g1", "*1", "*2", "heterozygote"),
            ("g1", "*2", "*2", "nonfunctional"),
        ],
        gene_phenotype_drug_recommendation=GPDR,
        genotype_drug_recommendation=[("g1", "*1", "*1", 1)],
    )
    r.drug_recommendation = spark.createDataFrame(
        [(1, "drugA", None, "take it easy", None, None),
         (2, "drugA", None, "take less", None, None),
         (3, "drugA", None, "stop", None, None)],
        sch.DRUG_RECOMMENDATION,
    )
    return r


@pytest.fixture(scope="module")
def out(spark, ref):
    pipe = Pipeline(spark, ref)
    return pipe.run_job(variants=[
        ("patient1", "A", "rs1", "A", "hom"),
        ("patient1", "A", "rs2", "G", "hom"),
        ("patient1", "B", "rs1", "A", "hom"),
        ("patient1", "B", "rs2", "G", "hom"),
    ])


def test_phenotype_report_condensed(spark, ref, out):
    rep = phenotype_drug_recommendation_report(out, ref, job_id=1)
    assert rep.columns == [
        "SAMPLE_ID", "DRUG_RECOMMENDATION_ID", "HET_COMBO", "#HET_COMBOS",
        "DRUG", "RECOMMENDATION", "GENE", "PHENOTYPE", "HAPLOTYPE1",
        "HAPLOTYPE2", "HAPLOTYPE", "RS#", "ALLELE",
    ]
    got = [tuple(r) for r in rep.collect()]
    # patient1 *1/*1 -> homozygote normal -> rec 1; two haplotype calls
    # (chromosomes A and B) but HAPLOTYPE deduped to one *1; four causal
    # variant rows dedup to (rs1, A), (rs2, G); everything condenses into
    # a first full row plus one carry-over variant row.
    assert got == [
        ("patient1", 1, 1, 1, "drugA", "take it easy", "g1",
         "homozygote normal", "*1", "*1", "*1", "rs1", "A"),
        (None, None, None, None, None, None, None, None, None, None,
         None, "rs2", "G"),
    ]


def test_genotype_report_condensed(spark, ref, out):
    rep = genotype_drug_recommendation_report(out, ref, job_id=1)
    assert rep.columns == [
        "SAMPLE_ID", "DRUG_RECOMMENDATION_ID", "HET_COMBO", "#HET_COMBOS",
        "DRUG", "RECOMMENDATION", "GENE", "HAPLOTYPE1", "HAPLOTYPE2",
        "HAPLOTYPE", "RS#", "ALLELE",
    ]
    got = [tuple(r) for r in rep.collect()]
    assert got == [
        ("patient1", 1, 1, 1, "drugA", "take it easy", "g1", "*1", "*1",
         "*1", "rs1", "A"),
        (None, None, None, None, None, None, None, None, None, None,
         "rs2", "G"),
    ]


def test_novel_haplotype_report(spark, ref):
    pipe = Pipeline(spark, ref)
    # rs1=T is an allele no known haplotype carries -> novel chromosomes.
    out = pipe.run_job(job_id=7, variants=[
        ("p1", "A", "rs1", "T", "hom"),
        ("p1", "A", "rs2", "G", "hom"),
        ("p1", "B", "rs1", "T", "hom"),
        ("p1", "B", "rs2", "G", "hom"),
    ])
    mat = novel_haplotype_report(out, ref, job_id=7, gene_name="g1")
    assert mat.columns == [
        "row_type", "haplotype_name", "patient_id", "physical_chromosome",
        "het_combo", "het_combos", "rs1", "rs2", "rs3", "rs4",
    ]
    got = [tuple(r) for r in mat.collect()]
    assert got == [
        ("haplotype", "*1", None, None, None, None, "A", "G", None, None),
        ("haplotype", "*2", None, None, None, None, None, None, "C", "T"),
        ("novel", None, "p1", "A", 1, 1, "T", "G", None, None),
        ("novel", None, "p1", "B", 1, 1, "T", "G", None, None),
    ]
