"""Schemas and primary-key metadata for the haplorec data model.

Reproduces the table inventory of the reference DDL
(/root/reference/src/sql/mysql/haplorec.sql.jinja:24-219) as StructType
constants. Spark has no PK concept; the ``PRIMARY_KEYS`` map supplies the
duplicate-key metadata the report layer needs (reference reads it from
information_schema — Sql.groovy:549-610).

Surrogate ``id`` columns (MySQL auto_increment) are dropped from the stage
tables: every consumer joins on natural keys, and ids that exist only to
satisfy InnoDB are noise in a columnar engine. ``drug_recommendation.id``
is kept because fixtures and the drug-recommendation stages key on it.
"""

from __future__ import annotations

from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _schema(*fields: tuple[str, object]) -> StructType:
    return StructType([StructField(n, t, True) for n, t in fields])


S = StringType()
I = IntegerType()
L = LongType()

# ---------------------------------------------------------------- reference
# haplorec.sql.jinja:24-32
DRUG_RECOMMENDATION = _schema(
    ("id", L),
    ("drug_name", S),
    ("implications", S),
    ("recommendation", S),
    ("classification", S),
    ("diplotype_egs", S),
)

# haplorec.sql.jinja:36-43
GENE_PHENOTYPE_DRUG_RECOMMENDATION = _schema(
    ("gene_name", S),
    ("phenotype_name", S),
    ("drug_recommendation_id", L),
)

# haplorec.sql.jinja:47-57 — the gene-haplotype matrix in long form
GENE_HAPLOTYPE_VARIANT = _schema(
    ("gene_name", S),
    ("haplotype_name", S),
    ("snp_id", S),
    ("allele", S),
)

# haplorec.sql.jinja:90-98 — haplotype_name1 <= haplotype_name2 (line 92)
GENOTYPE_PHENOTYPE = _schema(
    ("gene_name", S),
    ("haplotype_name1", S),
    ("haplotype_name2", S),
    ("phenotype_name", S),
)

# haplorec.sql.jinja:109-117
GENOTYPE_DRUG_RECOMMENDATION = _schema(
    ("gene_name", S),
    ("haplotype_name1", S),
    ("haplotype_name2", S),
    ("drug_recommendation_id", L),
)

# haplorec.sql.jinja:119-124
JOB = _schema(("id", L), ("job_name", S))

# ------------------------------------------------------------- stage tables
# haplorec.sql.jinja:197-205
JOB_PATIENT_VARIANT = _schema(
    ("job_id", L),
    ("patient_id", S),
    ("physical_chromosome", S),  # enum('A','B') in reference
    ("snp_id", S),
    ("allele", S),
    ("zygosity", S),  # 'hom' | 'het'
)

# haplorec.sql.jinja:207-213
JOB_PATIENT_HET_VARIANT = _schema(
    ("job_id", L),
    ("patient_id", S),
    ("physical_chromosome", S),
    ("het_combo", I),
    ("het_combos", I),
    ("snp_id", S),
    ("allele", S),
)

# haplorec.sql.jinja:175-180
JOB_PATIENT_GENE_HAPLOTYPE = _schema(
    ("job_id", L),
    ("patient_id", S),
    ("physical_chromosome", S),
    ("het_combo", I),
    ("het_combos", I),
    ("gene_name", S),
    ("haplotype_name", S),
)

# haplorec.sql.jinja:215-219
JOB_PATIENT_NOVEL_HAPLOTYPE = _schema(
    ("job_id", L),
    ("patient_id", S),
    ("physical_chromosome", S),
    ("het_combo", I),
    ("het_combos", I),
    ("gene_name", S),
)

# haplorec.sql.jinja:189-195
JOB_PATIENT_GENOTYPE = _schema(
    ("job_id", L),
    ("patient_id", S),
    ("het_combo", I),
    ("het_combos", I),
    ("gene_name", S),
    ("haplotype_name1", S),
    ("haplotype_name2", S),
)

# haplorec.sql.jinja:182-187
JOB_PATIENT_GENE_PHENOTYPE = _schema(
    ("job_id", L),
    ("patient_id", S),
    ("het_combo", I),
    ("het_combos", I),
    ("gene_name", S),
    ("phenotype_name", S),
)

# haplorec.sql.jinja:161-173
JOB_PATIENT_GENOTYPE_DRUG_RECOMMENDATION = _schema(
    ("job_id", L),
    ("patient_id", S),
    ("het_combo", I),
    ("het_combos", I),
    ("drug_recommendation_id", L),
)
JOB_PATIENT_PHENOTYPE_DRUG_RECOMMENDATION = _schema(
    ("job_id", L),
    ("patient_id", S),
    ("het_combo", I),
    ("het_combos", I),
    ("drug_recommendation_id", L),
)

SCHEMAS: dict[str, StructType] = {
    "drug_recommendation": DRUG_RECOMMENDATION,
    "gene_phenotype_drug_recommendation": GENE_PHENOTYPE_DRUG_RECOMMENDATION,
    "gene_haplotype_variant": GENE_HAPLOTYPE_VARIANT,
    "genotype_phenotype": GENOTYPE_PHENOTYPE,
    "genotype_drug_recommendation": GENOTYPE_DRUG_RECOMMENDATION,
    "job": JOB,
    "job_patient_variant": JOB_PATIENT_VARIANT,
    "job_patient_het_variant": JOB_PATIENT_HET_VARIANT,
    "job_patient_gene_haplotype": JOB_PATIENT_GENE_HAPLOTYPE,
    "job_patient_novel_haplotype": JOB_PATIENT_NOVEL_HAPLOTYPE,
    "job_patient_genotype": JOB_PATIENT_GENOTYPE,
    "job_patient_gene_phenotype": JOB_PATIENT_GENE_PHENOTYPE,
    "job_patient_genotype_drug_recommendation": JOB_PATIENT_GENOTYPE_DRUG_RECOMMENDATION,
    "job_patient_phenotype_drug_recommendation": JOB_PATIENT_PHENOTYPE_DRUG_RECOMMENDATION,
}

# Duplicate-key metadata used by the condensed report (reference introspects
# these from MySQL PKs; haplorec.sql.jinja key clauses).
PRIMARY_KEYS: dict[str, list[str]] = {
    "drug_recommendation": ["id"],
    "gene_phenotype_drug_recommendation": [
        "gene_name", "phenotype_name", "drug_recommendation_id"],
    "gene_haplotype_variant": ["gene_name", "haplotype_name", "snp_id"],
    "genotype_phenotype": ["gene_name", "haplotype_name1", "haplotype_name2"],
    "genotype_drug_recommendation": [
        "gene_name", "haplotype_name1", "haplotype_name2",
        "drug_recommendation_id"],
    "job": ["id"],
    "job_patient_variant": [
        "job_id", "patient_id", "physical_chromosome", "snp_id", "allele"],
    "job_patient_het_variant": [
        "job_id", "patient_id", "physical_chromosome", "het_combo", "snp_id"],
    "job_patient_gene_haplotype": [
        "job_id", "patient_id", "physical_chromosome", "het_combo",
        "gene_name", "haplotype_name"],
    "job_patient_novel_haplotype": [
        "job_id", "patient_id", "physical_chromosome", "het_combo",
        "gene_name"],
    "job_patient_genotype": [
        "job_id", "patient_id", "het_combo", "gene_name",
        "haplotype_name1", "haplotype_name2"],
    "job_patient_gene_phenotype": [
        "job_id", "patient_id", "het_combo", "gene_name", "phenotype_name"],
    "job_patient_genotype_drug_recommendation": [
        "job_id", "patient_id", "het_combo", "drug_recommendation_id"],
    "job_patient_phenotype_drug_recommendation": [
        "job_id", "patient_id", "het_combo", "drug_recommendation_id"],
}

#: Stage tables all carry job_id as their leading, partition-friendly key.
STAGE_TABLES = [t for t in SCHEMAS if t.startswith("job_patient_")]
