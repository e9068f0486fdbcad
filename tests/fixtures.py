"""Shared sample data builders for pipeline tests.

Fixture values mirror the reference's PipelineTest sample data
(/root/reference/test/groovy/haplorec/test/util/pipeline/PipelineTest.groovy)
so stage outputs can be asserted against the same golden rows.
"""

from __future__ import annotations

from haplorec_spark import schema as sch
from haplorec_spark.pipeline import ReferenceTables


def make_ref(
    spark,
    ghv,
    genotype_phenotype=(),
    gene_phenotype_drug_recommendation=(),
    genotype_drug_recommendation=(),
):
    def df(rows, table):
        return spark.createDataFrame(
            [tuple(r) for r in rows], sch.SCHEMAS[table]
        )

    return ReferenceTables(
        gene_haplotype_variant=df(ghv, "gene_haplotype_variant"),
        genotype_phenotype=df(genotype_phenotype, "genotype_phenotype"),
        gene_phenotype_drug_recommendation=df(
            gene_phenotype_drug_recommendation,
            "gene_phenotype_drug_recommendation",
        ),
        genotype_drug_recommendation=df(
            genotype_drug_recommendation, "genotype_drug_recommendation"
        ),
    )


# The shared PipelineTest sample data (PipelineTest.groovy:84-117): g1 with
# haplotypes over rs1/rs2 covering all combinations of (A/G, A/G/T).
AMBIGUOUS_GHV = [
    ("g1", "*1", "rs1", "A"),
    ("g1", "*1", "rs2", "G"),
    ("g1", "*2", "rs1", "C"),
    ("g1", "*2", "rs2", "T"),
    ("g1", "*3", "rs1", "G"),
    ("g1", "*3", "rs2", "G"),
    ("g1", "*4", "rs1", "G"),
    ("g1", "*4", "rs2", "A"),
    ("g1", "*5", "rs1", "A"),
    ("g1", "*5", "rs2", "A"),
]

GENOTYPE_PHENOTYPE = [
    ("g1", "*1", "*1", "homozygote normal"),
    ("g1", "*1", "*2", "heterozygote"),
    ("g1", "*1", "*3", "heterozygote"),
    ("g1", "*2", "*2", "nonfunctional"),
]

GPDR = [
    ("g1", "homozygote normal", 1),
    ("g1", "heterozygote", 2),
    ("g1", "nonfunctional", 3),
]
