"""Scalar column functions from the reference's ingestion/normalization
layer — pure ``pyspark.sql.functions`` compositions (JVM-side,
codegen-friendly; no UDFs).

* :func:`normalize_phenotype_name` — F7: the PharmGKB phenotype-name
  normalizer (/root/reference/src/python/pharmgkb/items/process.py:
  phenotype_name): lower-case, strip trailing periods, remove
  "(~2[-11]% [of patients])" parentheticals, collapse whitespace.
  The reference implements this with a token parser; the token stream
  it accepts is exactly the regex below.
* :func:`zygosity_from_alleles` — F2: allele-string-length
  classification (PipelineInput.groovy:90-110).
* :func:`ordered_pair` — F4: (hap1, hap2) normalization so
  hap1 <= hap2 (Pipeline.groovy:125-127, Gene.py:177).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_PERCENT_OF_PATIENTS = (
    r"\(\s*~\s*\d+\s*(?:-\s*\d+\s*)?%\s*(?:of\s+patients\s*)?\)"
)


def normalize_phenotype_name(col: Column | str) -> Column:
    """'Intermediate Metabolizer (~2-11% of patients).' ->
    'intermediate metabolizer'."""
    c = F.col(col) if isinstance(col, str) else col
    lowered = F.rtrim(F.lower(c))
    no_dots = F.regexp_replace(lowered, r"\.+$", "")
    stripped = F.regexp_replace(no_dots, _PERCENT_OF_PATIENTS, "")
    collapsed = F.regexp_replace(stripped, r"\s+", " ")
    return F.trim(collapsed)


def zygosity_from_alleles(col: Column | str) -> Column:
    """len 2 -> 'het'; len 1 or >2 -> 'hom'; empty/null -> null."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    return (
        F.when(c.isNull() | (n == 0), F.lit(None).cast("string"))
        .when(n == 2, F.lit("het"))
        .otherwise(F.lit("hom"))
    )


def ordered_pair(a: Column | str, b: Column | str) -> tuple[Column, Column]:
    """Normalize an unordered pair so first <= second (null-safe: nulls
    sort last, matching the reference's single-haplotype genotypes)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    first = F.when(cb.isNull(), ca).otherwise(F.least(ca, cb))
    second = F.when(cb.isNull(), F.lit(None).cast("string")).otherwise(
        F.greatest(ca, cb)
    )
    return first, second
