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


def write_training_shards(
    docs: DataFrame,
    path: str,
    *,
    shard_tokens: int | None = None,
    n_shards: int | None = None,
    token_col: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: str = "shards",
    fmt: str = "parquet",
) -> DataFrame:
    """Export the curated corpus as deterministic training shards and
    return the shard manifest.

    The last step after curation/packing: the corpus is laid out in
    the reproducible ``md5(seed, id)`` order and cut into shards, one
    output directory per shard (``shard_id=N/``), one file per shard.
    Exactly one of:

    * ``shard_tokens`` — token-budget shards: the corpus rides the
      same global token tape as :func:`pack_sequences` and a shard is
      ``shard_tokens`` consecutive tape tokens; a document belongs to
      the shard its FIRST token lands in (documents are never split,
      so a shard may overrun by less than one document).
    * ``n_shards`` — fixed shard count: uniform md5-band assignment
      (``band % n_shards``), size-balanced in expectation, embarrass-
      ingly map-side (no tape, no global state).

    The manifest (shard_id, n_docs, n_tokens, content_hash) is also
    written inside the output as ``_manifest`` (underscore-prefixed,
    so table reads of ``path`` skip it); ``content_hash`` is an
    order-insensitive per-shard sum of row crc32s, so a re-export can
    be diffed against the manifest without reading row data.

    Scale shape: assignment is the packing two-phase tape
    (``shard_tokens``) or a pure map-side band (``n_shards``); the
    write is ONE exchange — hash repartition on shard_id, rows sorted
    by tape order within each task so every shard file is written in
    its deterministic order — and the manifest is one aggregate over
    the written files (reading back what was written, so the manifest
    doubles as a write-back check).
    """
    if (shard_tokens is None) == (n_shards is None):
        raise ValueError("pass exactly one of shard_tokens / n_shards")
    if fmt not in ("parquet", "json"):
        raise ValueError(f"fmt must be parquet or json, got {fmt}")
    key = _pack_key(seed, id_col)
    if shard_tokens is not None:
        if shard_tokens <= 0:
            raise ValueError(
                f"shard_tokens must be positive, got {shard_tokens}"
            )
        assign = pack_sequences(
            docs,
            shard_tokens,
            token_col=token_col,
            text_col=text_col,
            id_col=id_col,
            seed=seed,
        ).select(id_col, F.col("seq_id").alias("shard_id"))
        out = docs.join(assign, on=id_col)
        width = None
    else:
        if n_shards <= 0:
            raise ValueError(f"n_shards must be positive, got {n_shards}")
        from haplorec_spark.operators.sampling import _hash_band

        out = docs.select(
            "*",
            F.pmod(_hash_band(seed, [id_col]), F.lit(n_shards)).alias(
                "shard_id"
            ),
        )
        width = n_shards
    spark = docs.sparkSession
    n_parts = width or spark.sparkContext.defaultParallelism
    (
        out.withColumn("__key", key)
        .repartition(n_parts, "shard_id")
        .sortWithinPartitions("shard_id", "__key")
        .drop("__key")
        .write.partitionBy("shard_id")
        .mode("overwrite")
        .format(fmt)
        .save(path)
    )
    written = spark.read.format(fmt).load(path)
    n_tokens = (
        F.col(token_col)
        if token_col
        else F.size(F.split(F.lower(F.col(text_col)), " "))
    ).cast("long")
    manifest = (
        written.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(n_tokens).alias("n_tokens"),
            F.sum(
                F.crc32(
                    F.concat_ws(
                        _SEP,
                        F.col(id_col).cast("string"),
                        F.col(text_col),
                    )
                )
            ).alias("content_hash"),
        )
        .orderBy("shard_id")
    )
    manifest.write.mode("overwrite").parquet(f"{path}/_manifest")
    return manifest
