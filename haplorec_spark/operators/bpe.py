"""Byte-pair-encoding tokenizer training and encoding, Spark-first.

The classic BPE trainer (Sennrich, Haddow & Birch 2016, "Neural Machine
Translation of Rare Words with Subword Units") never touches the corpus
after the first pass: it learns merges from the WORD-FREQUENCY table.
That is exactly the shape that scales on Spark:

* ONE corpus scan builds ``(word, count)`` — the same explode +
  token-keyed count as :func:`haplorec_spark.operators.text.build_vocab`
  (map-side combined, one shuffle). At 100 TB the corpus is read once.
* Every merge iteration then runs over the DISTINCT-WORD table
  (vocabulary-sized, many orders of magnitude smaller than the corpus):
  adjacent symbol pairs are zipped map-side, pair counts are one
  partial-aggregated shuffle of the (pair -> weighted count) table, and
  the winning pair is a single-row driver round-trip — bounded like the
  k-means codebook collect in ``similarity.kmeans_centroids``. The
  merge itself is a map-side array fold (no shuffle, no Python).
* Encoding inverts the same trick: the greedy merge-order loop is
  genuinely procedural (rank-ordered pair replacement — the documented
  pandas-UDF case, like U2/A13), but it runs per DISTINCT word, and the
  corpus gets its tokens back through a word-keyed join. The Python
  cost is vocabulary-sized; the corpus-sized work stays JVM-side.

Lineage across iterations is truncated with periodic eager
``localCheckpoint()`` (the ``dedup_clusters`` pattern) so ``n_merges``
chained folds never build an O(n_merges)-deep plan for Catalyst to
re-analyze each round.

Determinism: ties in pair counts break by (left, right) lexicographic
order, so the learned merge table is reproducible across engines — the
pure-Python replica in ``tests/test_bpe.py`` must (and does) produce
bit-identical merges and encodings from the same word counts.
"""

from __future__ import annotations

import pandas as pd  # module-level so the pandas-UDF type hints resolve
from pyspark.sql import DataFrame, functions as F

__all__ = [
    "bpe_word_counts",
    "train_bpe",
    "bpe_encode_words",
    "bpe_tokenize",
]

#: End-of-word sentinel appended as its own symbol (the Sennrich setup):
#: it lets the learned subwords distinguish word-final from word-internal
#: occurrences without reserving any real character.
END_OF_WORD = "</w>"


def bpe_word_counts(
    docs: DataFrame, *, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """(word, count): the whitespace word-frequency table the trainer
    consumes — one corpus scan, one map-side-combined shuffle.

    ``min_count`` drops hapax-legomena-style noise before training
    (standard practice: a pair occurring only inside singleton words
    can never be a useful merge). Empty-string artifacts of repeated
    whitespace are dropped, as in ``build_vocab``.
    """
    counts = (
        docs.select(
            F.explode(F.expr(f"split(lower({text_col}), ' ')")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    if min_count > 1:
        counts = counts.filter(F.col("count") >= min_count)
    return counts


def _adjacent_pairs(syms_col: str = "syms"):
    """array<struct<l,r>> of adjacent symbol pairs — map-side zip of
    the array against its own tail, no explode-then-self-join."""
    n1 = f"greatest(size({syms_col}) - 1, 0)"
    return F.expr(
        f"zip_with(slice({syms_col}, 1, {n1}),"
        f" slice({syms_col}, 2, {n1}), (a, b) -> struct(a as l, b as r))"
    )


def _apply_merge(syms, left: str, right: str):
    """One BPE merge pass over a symbol array: greedy left-to-right,
    non-overlapping (``[a,a,a]`` under merge (a,a) becomes
    ``[aa, a]``) — a single map-side fold, built with Column lambdas
    so arbitrary corpus characters need no SQL-string escaping.

    ``F.get`` (0-based, null-on-out-of-bounds) keeps the empty-
    accumulator probe legal under ANSI mode, where ``element_at``
    would raise on the first element.
    """
    merged = left + right

    def step(acc, s):
        last = F.get(acc, F.size(acc) - 1)
        return F.when(
            last.eqNullSafe(F.lit(left)) & (s == F.lit(right)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.lit(merged)),
            ),
        ).otherwise(F.concat(acc, F.array(s)))

    return F.aggregate(
        syms, F.expr("cast(array() as array<string>)"), step
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int = 50,
    *,
    text_col: str = "text",
    min_word_count: int = 1,
    min_pair_count: int = 1,
    max_word_chars: int | None = None,
    checkpoint_interval: int = 8,
) -> DataFrame:
    """(merge_rank, left, right, merged, pair_count): the learned BPE
    merge table, in training order.

    Each word is seeded as its character sequence plus the
    :data:`END_OF_WORD` symbol; every iteration counts weighted
    adjacent pairs across the distinct-word table, merges the most
    frequent pair (ties: lexicographic (left, right) — deterministic
    across engines), and rewrites the symbol arrays map-side. Stops
    early when no pair reaches ``min_pair_count`` (or none is left).

    Scale shape: the corpus is scanned ONCE (``bpe_word_counts``);
    every one of the ``n_merges`` iterations touches only the
    vocabulary-sized symbol table — one small shuffle (pair counts)
    plus a one-row driver collect. Character splitting is per Java
    code unit (``split(word, '')``), the documented behavior for the
    ASCII-dominant test corpora; byte-level BPE would swap the seed
    expression only.

    ``max_word_chars`` drops longer "words" from TRAINING (web corpora
    carry unbroken URLs/base64/DNA runs; the merge fold's accumulator
    copy is O(len²) per word, so a single 10k-char token costs more
    than the rest of the vocabulary — and its interior pairs are noise
    to the merge statistics anyway, the reason real BPE trainers cap
    word length). Encoding is unaffected: long words still tokenize
    under the learned merges.
    """
    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    spark = docs.sparkSession
    counts = bpe_word_counts(
        docs, text_col=text_col, min_count=min_word_count
    )
    if max_word_chars is not None:
        counts = counts.filter(F.length("word") <= max_word_chars)
    syms = (
        counts
        .select(
            "count",
            F.expr(
                f"concat(split(word, ''), array('{END_OF_WORD}'))"
            ).alias("syms"),
        )
        .localCheckpoint(eager=True)  # pin the corpus-derived seed:
        # iterations must never re-trigger the corpus scan
    )
    merges: list[tuple[str, str, int]] = []
    for it in range(n_merges):
        best = (
            syms.select(
                "count", F.explode(_adjacent_pairs("syms")).alias("p")
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("count").alias("c"))
            .orderBy(F.col("c").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not best or best[0]["c"] < min_pair_count:
            break
        left, right, cnt = best[0]["l"], best[0]["r"], int(best[0]["c"])
        merges.append((left, right, cnt))
        syms = syms.select(
            "count", _apply_merge(F.col("syms"), left, right).alias("syms")
        )
        if (it + 1) % checkpoint_interval == 0:
            # truncate the fold chain so plan analysis stays O(interval)
            syms = syms.localCheckpoint(eager=True)
    return spark.createDataFrame(
        [
            (i, l, r, l + r, c)
            for i, (l, r, c) in enumerate(merges)
        ],
        "merge_rank int, left string, right string, "
        "merged string, pair_count bigint",
    )


def _merge_ranks(merges: DataFrame) -> dict[tuple[str, str], int]:
    """The merge table as a driver-side rank dict — bounded at
    ``n_merges`` rows by construction, like the k-means codebook."""
    return {
        (r["left"], r["right"]): r["merge_rank"]
        for r in merges.select("merge_rank", "left", "right").collect()
    }


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy rank-order BPE encoding of one word (training-order
    replay): repeatedly merge the present pair with the LOWEST merge
    rank, left-to-right non-overlapping, until no learned pair
    remains. (Rank-order greedy, not sequential replay: a low-rank
    pair whose symbols only APPEAR after a later merge still gets
    merged — the subword-nmt encoding semantics.) The pure-Python
    replica in ``tests/test_bpe.py`` re-implements this spec
    independently."""
    syms = list(word) + [END_OF_WORD]
    while len(syms) > 1:
        pairs = {(syms[i], syms[i + 1]) for i in range(len(syms) - 1)}
        ranked = [(ranks[p], p) for p in pairs if p in ranks]
        if not ranked:
            break
        _, (left, right) = min(ranked)
        out: list[str] = []
        i = 0
        while i < len(syms):
            if (
                i + 1 < len(syms)
                and syms[i] == left
                and syms[i + 1] == right
            ):
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode_words(
    words: DataFrame, merges: DataFrame, *, word_col: str = "word"
) -> DataFrame:
    """(word, bpe_tokens, n_bpe_tokens): each distinct word encoded
    with the learned merge table.

    The greedy rank-order loop is procedural (SURVEY §2.9's documented
    pandas-UDF case); it runs as an Arrow-batched pandas UDF over the
    (deduplicated) word table, with the merge table collected to a
    rank dict — bounded at ``n_merges`` rows.
    """
    from pyspark.sql.functions import pandas_udf

    ranks = _merge_ranks(merges)

    @pandas_udf("array<string>")
    def encode(col: pd.Series) -> pd.Series:
        return col.map(lambda w: _encode_word(w, ranks))

    return (
        words.select(F.col(word_col).alias("word"))
        .distinct()
        .withColumn("bpe_tokens", encode(F.col("word")))
        .withColumn("n_bpe_tokens", F.size("bpe_tokens"))
    )


def bpe_tokenize(
    docs: DataFrame,
    merges: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_words, n_bpe_tokens): per-document BPE token accounting
    — the fertility measurement (BPE tokens per word) that sizes a
    training run's token budget under a candidate vocabulary.

    Scale shape: the Python encoder runs once per DISTINCT word
    (vocabulary-sized), never per occurrence; the corpus-sized half is
    an explode + word-keyed join + per-doc sum, all JVM-side. The
    word-keyed join shuffles both sides on ``word`` — the encoded
    vocabulary is NOT force-broadcast (a web-scale distinct-word table
    is unbounded; AQE may still choose broadcast when it measures
    small, which is the adaptive pattern this repo uses for hot sets).
    """
    toks = docs.select(
        F.col(id_col),
        F.explode(F.expr(f"split(lower({text_col}), ' ')")).alias("word"),
    ).filter(F.col("word") != "")
    encoded = bpe_encode_words(toks, merges).select("word", "n_bpe_tokens")
    return (
        toks.join(encoded, on="word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_bpe_tokens").alias("n_bpe_tokens"),
        )
    )
