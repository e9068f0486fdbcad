"""Sequence packing: lay curated documents end-to-end on a global
token tape and chunk it into fixed-length training sequences.

The final step of a training-data pipeline: after dedup / filtering /
sampling, documents are concatenated (in a deterministic order) and the
concatenation is cut every ``seq_len`` tokens. The operator computes,
for every document, where it lands on that tape — which sequence it
starts in, at what offset, and where it ends — without ever
materializing the tape.

The hard part at 100 TB is the GLOBAL running sum of token counts. A
single ``Window.orderBy`` would funnel the corpus through one
partition, so this uses the same two-phase shape as
``fk.assign_ids``'s large path: RANGE partition by the order key, a
running sum within each partition, per-partition token totals
collected to the driver (one row per partition), and each row's global
start = its partition's offset + its local running sum.

Determinism follows sampling.py's charter: the pack order is
``md5(seed, id)`` — reproducible across reruns, engines, and
partition layouts, and any SQL engine can replay it (the tests replay
it in DuckDB with a plain windowed sum).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: Separator / NULL sentinel inside the hashed pack key, kept in
#: lockstep with sampling._SEP / sampling._NULL (same replica contract).
_SEP = "\x1f"
_NULL = "\x00null"


def _pack_key(seed: str, id_col: str) -> Column:
    return F.md5(
        F.concat_ws(
            _SEP,
            F.lit(seed),
            F.coalesce(F.col(id_col).cast("string"), F.lit(_NULL)),
        )
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    *,
    token_col: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: str = "pack",
    num_partitions: int | None = None,
) -> DataFrame:
    """(id, n_tokens, global_start, seq_id, seq_offset, seq_id_end).

    ``global_start`` is the document's first token position on the
    concatenation tape (0-based); ``seq_id = global_start DIV
    seq_len`` is the training sequence it starts in, at offset
    ``seq_offset`` within that sequence; ``seq_id_end`` is the
    sequence holding its last token (> seq_id when the document
    crosses sequence boundaries — the consumer slices, GPT-style,
    rather than padding).

    ``token_col`` names a precomputed token-count column; when None,
    whitespace token counts are computed from ``text_col``.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    spark = docs.sparkSession
    n_tokens = (
        F.col(token_col)
        if token_col
        else F.size(F.split(F.lower(F.col(text_col)), " "))
    ).cast("long")
    base = docs.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        _pack_key(seed, id_col).alias("__key"),
    )
    n_parts = num_partitions or spark.sparkContext.defaultParallelism
    ranged = (
        base.repartitionByRange(n_parts, "__key")
        .withColumn("__part", F.spark_partition_id())
        .persist()
    )
    # Phase 1: one token-total row per partition (cluster-sized).
    totals = dict(
        (r["__part"], r["t"])
        for r in ranged.groupBy("__part")
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    )
    acc = 0
    offset_pairs: list[Column] = []
    for p in sorted(totals):
        offset_pairs.extend([F.lit(p), F.lit(acc)])
        acc += totals[p]
    offset_map = F.create_map(*offset_pairs) if offset_pairs else F.lit(None)
    # Phase 2: running sum inside each range partition; rows are
    # already co-located so the window's exchange hashes __part only.
    w = (
        Window.partitionBy("__part")
        .orderBy("__key")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local_end = F.sum("n_tokens").over(w)
    out = ranged.select(
        F.col(id_col),
        "n_tokens",
        (
            offset_map[F.col("__part")] + local_end - F.col("n_tokens")
        ).alias("global_start"),
    )
    # integer DIV, not floor(x / L): double division loses exactness
    # past 2^53 tokens — a regime a 100 TB corpus actually reaches.
    return out.select(
        id_col,
        "n_tokens",
        "global_start",
        F.expr(f"global_start DIV {seq_len}").alias("seq_id"),
        (F.col("global_start") % seq_len).alias("seq_offset"),
        F.expr(
            f"(global_start + greatest(n_tokens, 1) - 1) DIV {seq_len}"
        ).alias("seq_id_end"),
    )
