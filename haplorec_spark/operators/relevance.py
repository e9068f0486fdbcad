"""Term-weighting relevance operators: TF-IDF and BM25.

Training-data curation uses these two classical weights for
query-driven corpus selection (pull documents relevant to a target
domain), quality weighting (upweight information-dense documents), and
near-duplicate triage (TF-IDF cosine as a cheap rerank after LSH
candidate generation).

Scale shape (100 TB corpus):

* ``term_frequencies`` — explode words, one shuffle on (doc, term)
  with map-side partial counts.
* ``document_frequencies`` — one shuffle on term; output is
  vocabulary-sized (≪ corpus), so downstream joins broadcast it.
* ``tfidf`` — tf ⋈ df on term. Stopwords are the hot keys; the join is
  BROADCAST (df is vocabulary-sized) so skew never materializes a
  shuffle-side hot partition. ``min_df``/``max_df_fraction`` prune the
  vocabulary tails (hapax noise / boilerplate stopwords) before the
  join, the same lever as dedup's ``max_doc_freq``.
* ``bm25_rank`` — query terms are a literal list (broadcast by
  construction); per-doc term frequency is a map-side array scan, and
  only the corpus statistics (N, avgdl, per-term df) are computed
  relationally — each a vocabulary- or scalar-sized aggregate joined
  back by broadcast.

All arithmetic is double + round(6) for cross-engine stability; word
tokenization matches text.py (single-space split of lower(text)).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _words(text_col: str):
    return F.split(F.lower(F.col(text_col)), " ")


def term_frequencies(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, term, tf): raw count of each term within each document."""
    return (
        docs.select(F.col(id_col), F.explode(_words(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def document_frequencies(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(term, df): number of documents containing each term.

    array_distinct before the explode means a document counts once per
    term it contains, with no DISTINCT re-shuffle after the explode.
    """
    return (
        docs.select(
            F.explode(F.array_distinct(_words(text_col))).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )


def tfidf(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
    max_df_fraction: float = 1.0,
) -> DataFrame:
    """(id, term, tf, df, tfidf): smoothed TF-IDF per (document, term).

    tfidf = tf × (ln((1 + N) / (1 + df)) + 1) — the smoothed idf used
    by scikit-learn's TfidfTransformer, safe for terms present in every
    document. Vocabulary pruning: terms with df < ``min_df`` or
    df > ``max_df_fraction`` × N are dropped before the join.
    """
    tf = term_frequencies(docs, text_col=text_col, id_col=id_col)
    df = document_frequencies(docs, text_col=text_col, id_col=id_col)
    n_docs = docs.select(
        F.count(F.lit(1)).cast("double").alias("n_docs")
    )
    df = (
        df.crossJoin(F.broadcast(n_docs))
        .filter(
            (F.col("df") >= F.lit(min_df))
            & (F.col("df") <= F.col("n_docs") * F.lit(max_df_fraction))
        )
        .withColumn(
            "idf",
            F.log((F.lit(1.0) + F.col("n_docs")) / (F.lit(1.0) + F.col("df")))
            + F.lit(1.0),
        )
    )
    return tf.join(F.broadcast(df), "term").select(
        F.col(id_col),
        "term",
        "tf",
        "df",
        F.round(F.col("tf") * F.col("idf"), 6).alias("tfidf"),
    )


def bm25_rank(
    docs: DataFrame,
    query_terms: Sequence[str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(id, bm25): Okapi BM25 score of each document for ``query_terms``.

    idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5)) (Robertson-Sparck
    Jones with the +1 smoothing that keeps it positive); the score sums
    idf × tf × (k1 + 1) / (tf + k1 × (1 - b + b × dl / avgdl)) over the
    query terms. Documents matching no term score 0 (kept, so the
    result is a total ranking — filter > 0 for a hit list).

    Per-term document frequency and tf are map-side array scans against
    the literal query terms; only N and avgdl are relational aggregates
    (one scalar row, broadcast back).
    """
    # dedupe (first occurrence wins) so a repeated query term isn't
    # scored twice; an empty query has no defined ranking — refuse it
    terms = list(dict.fromkeys(t.lower() for t in query_terms))
    if not terms:
        raise ValueError("query_terms must not be empty")
    dl = F.size(_words(text_col)).cast("double")
    stats = docs.select(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg(F.size(_words(text_col))).alias("avgdl"),
        *[
            F.sum(
                F.array_contains(_words(text_col), t).cast("int")
            )
            .cast("double")
            .alias(f"_df_{i}")
            for i, t in enumerate(terms)
        ],
    )
    def _tf_of(term: str):
        # NB: a two-parameter lambda would make F.filter pass the array
        # index as the second argument — close over the literal instead.
        lit = F.lit(term)
        return F.size(F.filter(_words(text_col), lambda x: x == lit)).cast(
            "double"
        )

    per_term = [(f"_tf_{i}", _tf_of(t)) for i, t in enumerate(terms)]
    scored = docs.select(
        F.col(id_col),
        dl.alias("_dl"),
        *[e.alias(a) for a, e in per_term],
    ).crossJoin(F.broadcast(stats))
    contrib = []
    for i in range(len(terms)):
        tf = F.col(f"_tf_{i}")
        df = F.col(f"_df_{i}")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - df + F.lit(0.5)) / (df + F.lit(0.5))
        )
        denom = tf + F.lit(k1) * (
            F.lit(1.0)
            - F.lit(b)
            + F.lit(b) * F.col("_dl") / F.col("avgdl")
        )
        contrib.append(idf * tf * F.lit(k1 + 1.0) / denom)
    total = contrib[0]
    for c in contrib[1:]:
        total = total + c
    return scored.select(
        F.col(id_col), F.round(total, 6).alias("bm25")
    )
