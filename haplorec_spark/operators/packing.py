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
    segmentation: str = "whitespace",
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
    whitespace token counts are computed from ``text_col`` —
    ``segmentation="script"`` (round 9) counts the script-segmented
    words instead, because under the whitespace split a zh/ja/th
    document is ONE token and the tape budget under-counts it by the
    document's whole length (ignored when ``token_col`` is given —
    precomputed counts carry their own definition).
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    spark = docs.sparkSession
    from haplorec_spark.operators.text import token_count_expr

    n_tokens = token_count_expr(token_col, text_col, segmentation)
    base = docs.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        _pack_key(seed, id_col).alias("__key"),
    )
    n_parts = num_partitions or spark.sparkContext.defaultParallelism
    ranged = (
        base.repartitionByRange(n_parts, "__key")
        .withColumn("__part", F.spark_partition_id())
        # localCheckpoint, not persist (round 13): frozen blocks give
        # the totals collect and the caller's read one materialization
        # with a GC release path (the assign_ids rationale)
        .localCheckpoint()
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
    shuffle_salt: str | None = None,
    segmentation: str = "whitespace",
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

    ``shuffle_salt`` (round 9) re-keys the DETERMINISTIC SEEDED
    SHUFFLE a training consumer reads in: intra-shard row order
    becomes ``md5(shuffle_salt, id)`` instead of the packing key, and
    in ``n_shards`` mode the shard-assignment band is salted too —
    so each epoch's re-export permutes both which shard a document
    lands in and the order inside it, while ``shard_tokens`` mode
    keeps its token-budget boundaries (the tape stays seeded by
    ``seed``) and permutes only the within-shard order. Same hash-band
    machinery, same single exchange — no new shuffle shape. The
    manifest records the salt (NULL when unsalted).
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
            segmentation=segmentation,
        ).select(id_col, F.col("seq_id").alias("shard_id"))
        out = docs.join(assign, on=id_col)
        width = None
    else:
        if n_shards <= 0:
            raise ValueError(f"n_shards must be positive, got {n_shards}")
        from haplorec_spark.operators.sampling import _hash_band

        out = docs.select(
            "*",
            F.pmod(
                _hash_band(shuffle_salt or seed, [id_col]),
                F.lit(n_shards),
            ).alias("shard_id"),
        )
        width = n_shards
    if shuffle_salt is not None:
        key = _pack_key(shuffle_salt, id_col)
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
    from haplorec_spark.operators.text import token_count_expr

    n_tokens = token_count_expr(token_col, text_col, segmentation)
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
        .withColumn(
            "shuffle_salt", F.lit(shuffle_salt).cast("string")
        )
        .orderBy("shard_id")
    )
    manifest.write.mode("overwrite").parquet(f"{path}/_manifest")
    return manifest


def pack_token_ids(
    docs_ids: DataFrame,
    seq_len: int,
    *,
    ids_col: str = "token_ids",
    id_col: str = "doc_id",
    seed: str = "pack",
    bos_id: int | None = None,
    eos_id: int | None = None,
    pad_id: int | None = None,
    num_partitions: int | None = None,
    provenance_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(seq_id, input_ids, n_real [, provenance]): the corpus as
    FIXED-LENGTH training sequences in token-ID space — the
    materialized form of the :func:`pack_sequences` tape, so a
    training consumer reads id arrays cut at exactly ``seq_len`` ids
    instead of re-tokenizing text against the tape arithmetic.

    ``provenance_cols`` (round 10, the crawl-audit thread): when set,
    each sequence also carries ``provenance`` — the seq_offset-sorted
    array of ``struct(seq_offset, n_ids, doc: struct(<id_col>,
    <provenance_cols...>))`` for every document fragment in the
    sequence, so any exported sequence maps back to its source
    records (e.g. ``warc_source``'s (source_file, record_offset)).
    The columns ride the EXISTING tape join and the EXISTING
    seq_id-keyed aggregate (the fragment structs gain fields, the
    plan gains zero exchanges — test-pinned).

    ``docs_ids`` carries one id array per document (the
    ``bpe.bpe_encode_ids`` output shape). Documents are laid
    end-to-end in the deterministic ``md5(seed, id)`` pack order —
    the same order, same tape — after per-document decoration:
    ``bos_id`` prepended / ``eos_id`` appended when given (the GPT
    document-separator convention). Every sequence holds exactly
    ``seq_len`` ids; the final partial sequence is padded with
    ``pad_id`` (``n_real`` still counts only real tokens) or DROPPED
    when ``pad_id`` is None.

    Scale shape: the tape positions come from :func:`pack_sequences`'
    two-phase global running sum (never a single-partition window);
    each document then explodes into AT MOST one fragment per training
    sequence it touches — fragments PARTITION the document's ids
    (``slice``), so the corpus crosses exactly ONE seq_id-keyed
    shuffle at its original size, and the per-sequence reassembly is
    the same map-side ``array_sort`` + ``flatten`` as
    ``bpe_encode_ids`` (no window). seq_ids are dense integers —
    uniform shuffle keys by construction, no skew at any corpus size.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    decorated = F.col(ids_col)
    if bos_id is not None:
        decorated = F.concat(F.array(F.lit(int(bos_id))), decorated)
    if eos_id is not None:
        decorated = F.concat(decorated, F.array(F.lit(int(eos_id))))
    base = docs_ids.select(
        F.col(id_col), decorated.alias("__ids"), *provenance_cols
    ).withColumn("__n", F.size("__ids").cast("long"))
    tape = pack_sequences(
        base.filter(F.col("__n") > 0),
        seq_len,
        token_col="__n",
        id_col=id_col,
        seed=seed,
        num_partitions=num_partitions,
    ).select(id_col, "global_start", "seq_id", "seq_id_end")
    prov_struct = (
        [
            F.struct(F.col(id_col), *[F.col(c) for c in provenance_cols])
            .alias("__prov")
        ]
        if provenance_cols
        else []
    )
    frags = (
        base.join(tape, on=id_col)
        .select(
            "__ids",
            "__n",
            "global_start",
            F.explode(
                F.sequence(F.col("seq_id"), F.col("seq_id_end"))
            ).alias("seq_id"),
            *([F.col(id_col)] + [F.col(c) for c in provenance_cols]
              if provenance_cols else []),
        )
        .select(
            "seq_id",
            # this fragment's slice of the document: tape positions
            # [max(gs, s*L), min(gs+n, (s+1)*L)) — 1-based slice()
            F.expr(
                f"slice(__ids,"
                f" greatest(seq_id * {seq_len} - global_start, 0) + 1,"
                f" least(global_start + __n, (seq_id + 1) * {seq_len})"
                f" - greatest(seq_id * {seq_len}, global_start))"
            ).alias("frag_ids"),
            F.expr(
                f"greatest(global_start - seq_id * {seq_len}, 0)"
            ).alias("frag_offset"),
            *prov_struct,
        )
    )
    if provenance_cols:
        collected = frags.groupBy("seq_id").agg(
            F.expr(
                "array_sort(collect_list("
                "struct(frag_offset, frag_ids, __prov)))"
            ).alias("__fr")
        )
        seqs = collected.select(
            "seq_id",
            F.expr("flatten(transform(__fr, x -> x.frag_ids))").alias(
                "input_ids"
            ),
            F.expr(
                "transform(__fr, x -> named_struct("
                "'seq_offset', x.frag_offset,"
                " 'n_ids', size(x.frag_ids),"
                " 'doc', x.__prov))"
            ).alias("provenance"),
        )
    else:
        seqs = frags.groupBy("seq_id").agg(
            F.expr(
                "flatten(transform("
                " array_sort(collect_list(struct(frag_offset, frag_ids))),"
                " x -> x.frag_ids))"
            ).alias("input_ids")
        )
    seqs = seqs.withColumn("n_real", F.size("input_ids"))
    if pad_id is None:
        return seqs.filter(F.col("n_real") == seq_len)
    # array_repeat, NOT transform(sequence(1, k)): Spark's sequence()
    # DESCENDS when the bound is below the start, so k = 0 would mint
    # [1, 0] and pad two ids onto every already-full sequence
    return seqs.withColumn(
        "input_ids",
        F.expr(
            f"concat(input_ids,"
            f" array_repeat({int(pad_id)}, {seq_len} - n_real))"
        ),
    )


def write_id_sequence_shards(
    docs: DataFrame,
    path: str,
    *,
    merges: DataFrame,
    vocab: DataFrame,
    seq_len: int,
    seqs_per_shard: int,
    bos_token: str | None = "<bos>",
    eos_token: str | None = "<eos>",
    pad_token: str | None = "<pad>",
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: str = "pack",
    byte_level: bool = False,
    pretokenize: str = "whitespace",
    fmt: str = "parquet",
    shuffle_salt: str | None = None,
    provenance_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Export the corpus as fixed-length TOKEN-ID training shards and
    return the shard manifest — the id-space composition of
    ``bpe_encode_ids`` → :func:`pack_token_ids` → sharded write, so a
    training consumer streams ready-to-batch ``input_ids`` arrays
    with no tokenization or tape arithmetic of its own.

    ``bos_token``/``eos_token`` wrap each document on the tape (None
    skips); the final partial sequence is padded with ``pad_token``
    (None drops it). Token names resolve through ``vocab`` (the
    ``bpe_vocab`` artifact — its specials carry the ids). Shards are
    CONTIGUOUS sequence ranges (``shard_id = seq_id DIV
    seqs_per_shard``) so shard N's sequences are exactly tape order —
    one hash exchange on shard_id, rows sorted by seq_id within each
    shard file. The manifest (shard_id, n_seqs, n_real_tokens,
    content_hash) is written as ``<path>/_manifest`` (the
    :func:`write_training_shards` convention, crc32 content sums).

    ``pretokenize`` must match how ``merges``/``vocab`` were trained
    (it travels in the ``bpe.save_bpe_tokenizer`` artifact):
    ``"gpt2"`` is what makes the "consumer never re-tokenizes"
    promise hold on punctuation-glued web text, not just
    whitespace-clean corpora.

    ``shuffle_salt`` (round 9) decorrelates what a training consumer
    READS from the tape layout: sequences of one long document occupy
    ADJACENT tape positions, so contiguous shards stream them
    back-to-back. With a salt, sequence→shard becomes the salted
    hash band mod ``ceil(n_seqs / seqs_per_shard)`` and intra-shard
    order the salted md5 of ``seq_id`` — a deterministic seeded
    permutation of the whole corpus at sequence granularity (shard
    sizes are multinomial around ``seqs_per_shard``, no longer
    exact). Costs ONE extra count job over the persisted sequence
    frame (the shard count must be known before assignment); the
    unsalted path stays single-pass. Re-exporting with a new salt =
    a new epoch order; the manifest records the salt (NULL when
    unsalted).

    ``provenance_cols`` (round 10): carried per sequence as the
    ``provenance`` array (:func:`pack_token_ids`) and written into
    the shard rows, so any shard row maps back to its crawl records —
    e.g. ``warc_source``'s (source_file, record_offset). The columns
    ride the encoder's existing wordless-document join and the
    packer's existing seq_id aggregate: zero additional exchanges
    (test-pinned); the manifest hash stays over (seq_id, input_ids),
    so a provenance re-export diffs clean against an old manifest."""
    if seqs_per_shard <= 0:
        raise ValueError(
            f"seqs_per_shard must be positive, got {seqs_per_shard}"
        )
    from haplorec_spark.operators.bpe import bpe_encode_ids

    names = [t for t in (bos_token, eos_token, pad_token) if t is not None]
    tok_ids = {
        r["token"]: int(r["token_id"])
        for r in vocab.filter(F.col("token").isin(names or [""]))
        .select("token", "token_id")
        .collect()
    }
    missing = [t for t in names if t not in tok_ids]
    if missing:
        raise ValueError(f"vocab has no rows for special tokens {missing}")
    ids = bpe_encode_ids(
        docs,
        merges,
        vocab,
        text_col=text_col,
        id_col=id_col,
        byte_level=byte_level,
        pretokenize=pretokenize,
        keep=tuple(provenance_cols),
    )
    seqs = pack_token_ids(
        ids,
        seq_len,
        id_col=id_col,
        seed=seed,
        bos_id=tok_ids.get(bos_token) if bos_token else None,
        eos_id=tok_ids.get(eos_token) if eos_token else None,
        pad_id=tok_ids.get(pad_token) if pad_token else None,
        provenance_cols=tuple(provenance_cols),
    )
    spark = docs.sparkSession
    if shuffle_salt is None:
        seqs = seqs.withColumn(
            "shard_id", F.expr(f"seq_id DIV {seqs_per_shard}")
        )
        order = [F.col("seq_id")]
    else:
        from haplorec_spark.operators.sampling import _hash_band

        # the salted assignment needs the shard COUNT up front: one
        # persisted pass + count, then the same single write exchange
        seqs = seqs.persist()
        n_seqs = seqs.count()
        n_out_shards = max(1, -(-n_seqs // seqs_per_shard))
        seqs = seqs.withColumn(
            "shard_id",
            F.pmod(
                _hash_band(shuffle_salt, ["seq_id"]),
                F.lit(n_out_shards),
            ),
        )
        order = [_pack_key(shuffle_salt, "seq_id")]
    (
        seqs.repartition(
            spark.sparkContext.defaultParallelism, "shard_id"
        )
        .sortWithinPartitions(F.col("shard_id"), *order)
        .write.partitionBy("shard_id")
        .mode("overwrite")
        .format(fmt)
        .save(path)
    )
    if shuffle_salt is not None:
        seqs.unpersist()
    written = spark.read.format(fmt).load(path)
    manifest = (
        written.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_seqs"),
            F.sum("n_real").alias("n_real_tokens"),
            F.sum(
                F.crc32(
                    F.concat_ws(
                        _SEP,
                        F.col("seq_id").cast("string"),
                        F.col("input_ids").cast("string"),
                    )
                )
            ).alias("content_hash"),
        )
        .withColumn(
            "shuffle_salt", F.lit(shuffle_salt).cast("string")
        )
        .orderBy("shard_id")
    )
    manifest.write.mode("overwrite").parquet(f"{path}/_manifest")
    return manifest
