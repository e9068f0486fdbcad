"""Input sources: DSV scan and the genotyping-export variant reader.

Reproduces the reference's ingestion surface
(/root/reference/src/groovy/haplorec/util/Input.groovy:46-140 and
util/pipeline/PipelineInput.groovy:16-123) as Spark readers:

* :func:`dsv_source` — S1: tab-separated scan with optional
  header-detect/require/skip and field projection by name.
* :func:`variant_source` — S2: the 9-column genotyping export
  normalized to job_patient_variant rows: zygosity from allele-string
  length, hom rows duplicated onto physical chromosomes A and B, het
  rows left with a null chromosome (assigned later by het
  disambiguation), empty allele strings becoming all-null no-call rows.
* ``INPUT_HEADERS`` — the seedable stage headers
  (PipelineInput.groovy:15-24); every other stage seeds through
  :func:`dsv_source` with its declared header (the reference's
  defaultReader).

Scale: both readers are pure scan + narrow ops (``explode`` fan-out is
map-side); no shuffle is introduced before the pipeline's first stage.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: PipelineInput.groovy:15-24 — expected first-line headers per stage.
INPUT_HEADERS: dict[str, list[str]] = {
    "variant": ["PLATE", "EXPERIMENT", "CHIP", "WELL_POSITION", "ASSAY_ID",
                "GENOTYPE_ID", "DESCRIPTION", "SAMPLE_ID", "ENTRY_OPERATOR"],
    "genePhenotype": ["SAMPLE_ID", "GENE", "PHENOTYPE"],
    "genotype": ["SAMPLE_ID", "GENE", "HAPLOTYPE1", "HAPLOTYPE2"],
    "geneHaplotype": ["SAMPLE_ID", "GENE", "HAPLOTYPE"],
}


def dsv_source(
    spark: SparkSession,
    path: str,
    header: Sequence[str],
    *,
    separator: str = "\t",
    require_header: bool = False,
    fields: Sequence[str] | None = None,
) -> DataFrame:
    """S1: DSV scan with header-detect and field projection.

    The reference treats a first line equal to the expected header as a
    header and otherwise as data (``requireHeader = false``,
    PipelineInput.groovy:11-13, Input.groovy:95-118). A distributed scan
    has no "first line", so the equivalent contract is: drop any row
    whose every value equals its own column name (only a header echo can
    look like that in real exports). With ``require_header`` the scan
    fails if no such row exists.

    Short rows error out (Input.groovy:82-87): mode=FAILFAST on a fixed
    all-string schema.
    """
    schema = " ".join(
        f"`{name}` STRING{',' if i < len(header) - 1 else ''}"
        for i, name in enumerate(header)
    )
    df = (
        spark.read.option("sep", separator)
        .option("header", False)
        .option("mode", "FAILFAST")
        .schema(schema)
        .csv(path)
    )
    is_header = None
    for name in header:
        cond = F.col(name) == F.lit(name)
        is_header = cond if is_header is None else (is_header & cond)
    if require_header:
        # Count header rows eagerly; a missing header is an input error.
        if df.filter(is_header).limit(1).count() == 0:
            raise ValueError(f"required header {list(header)} not found in {path}")
    out = df.filter(~is_header)
    if fields:
        out = out.select(*fields)
    return out


def variant_source(
    spark: SparkSession,
    path: str,
    *,
    separator: str = "\t",
    skip_empty_alleles: bool = False,
) -> DataFrame:
    """S2: genotyping export -> (patient_id, physical_chromosome, snp_id,
    allele, zygosity) rows (PipelineInput.variants,
    PipelineInput.groovy:71-123).

    Per input line with allele string ``s``:

    * ``len(s) == 2`` — heterozygous: one row per character, physical
      chromosome null (disambiguated downstream).
    * ``len(s) == 1`` — homozygous: the allele duplicated onto
      chromosomes A and B.
    * ``len(s) == 0`` — no-call: a single row with null chromosome,
      allele, and zygosity (or dropped with ``skip_empty_alleles``).
    * ``len(s) > 2``  — multi-char call (e.g. CAT): homozygous, the full
      string duplicated onto chromosomes A and B.
    """
    raw = dsv_source(
        spark, path, INPUT_HEADERS["variant"], separator=separator,
        fields=["ASSAY_ID", "GENOTYPE_ID", "SAMPLE_ID"],
    ).select(
        F.col("SAMPLE_ID").alias("patient_id"),
        F.col("ASSAY_ID").alias("snp_id"),
        F.coalesce(F.col("GENOTYPE_ID"), F.lit("")).alias("alleles"),
    )
    n = F.length("alleles")
    entry = "named_struct('physical_chromosome', {0}, 'allele', {1}, 'zygosity', {2})"
    rows = F.when(
        n == 2,
        F.expr(
            "array("
            + entry.format("cast(null as string)", "substring(alleles, 1, 1)", "'het'")
            + ", "
            + entry.format("cast(null as string)", "substring(alleles, 2, 1)", "'het'")
            + ")"
        ),
    ).when(
        n == 0,
        F.expr(
            "array("
            + entry.format("cast(null as string)", "cast(null as string)",
                           "cast(null as string)")
            + ")"
        ),
    ).otherwise(
        # hom: 1 char or multi-char string, duplicated onto A and B
        F.expr(
            "array("
            + entry.format("'A'", "alleles", "'hom'")
            + ", "
            + entry.format("'B'", "alleles", "'hom'")
            + ")"
        ),
    )
    out = raw.select(
        "patient_id", "snp_id", F.explode(rows).alias("v")
    ).select(
        "patient_id",
        F.col("v.physical_chromosome").alias("physical_chromosome"),
        "snp_id",
        F.col("v.allele").alias("allele"),
        F.col("v.zygosity").alias("zygosity"),
    )
    if skip_empty_alleles:
        out = out.filter(F.col("allele").isNotNull())
    return out


def stage_source(
    spark: SparkSession, stage: str, path: str, *, separator: str = "\t"
) -> DataFrame:
    """Seed-stage reader dispatch (PipelineInput.tableAliasToTableReader,
    PipelineInput.groovy:33-63): ``variant`` uses the normalizing reader,
    every other seedable stage reads its declared header as-is."""
    if stage == "variant":
        return variant_source(spark, path, separator=separator)
    if stage not in INPUT_HEADERS:
        raise KeyError(
            f"no input reader for stage {stage!r}; seedable: "
            f"{sorted(INPUT_HEADERS)}"
        )
    hdr = INPUT_HEADERS[stage]
    df = dsv_source(spark, path, hdr, separator=separator)
    renames = {
        "SAMPLE_ID": "patient_id",
        "GENE": "gene_name",
        "PHENOTYPE": "phenotype_name",
        "HAPLOTYPE": "haplotype_name",
        "HAPLOTYPE1": "haplotype_name1",
        "HAPLOTYPE2": "haplotype_name2",
    }
    return df.withColumnsRenamed({c: renames[c] for c in hdr if c in renames})
