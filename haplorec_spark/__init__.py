"""haplorec_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of innovativemedicine/haplorec.

The reference (read-only at /root/reference) is a MySQL + Groovy
pharmacogenomics pipeline; this package re-expresses every operator it
implements (see SURVEY.md §2) as idiomatic Spark DataFrame compositions,
plus the large-scale training-data operators (dedup, similarity search,
text analysis, multimodal plumbing) such an engine needs at 100 TB.

Layout:
    operators/   engine-level relational compositions Spark lacks as
                 one-liners (relational division, ordered pivot, report
                 dedup/collapse, FK resolution, dedup family, ANN, text)
    sources/     DSV reader/writer, variant-file normalizing scan
    functions/   scalar expression helpers
    plans/       Make-like dependency DAG orchestrator
    streaming/   Structured-Streaming incremental job ingest
    matrix.py    gene-haplotype matrix (broadcastable reference data)
    algorithm.py het-disambiguation kernel (pure Python core)
    pipeline.py  the 8 pipeline stages + job lifecycle
    report.py    condensed report generation
"""

__version__ = "0.1.0"
