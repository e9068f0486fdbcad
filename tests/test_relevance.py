"""TF-IDF and BM25 tests: hand-computed goldens on a tiny corpus plus
DuckDB cross-checks on real testdata documents.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from haplorec_spark.operators.relevance import (
    bm25_rank,
    document_frequencies,
    term_frequencies,
    tfidf,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "spark shuffles data fast"),
            (2, "spark joins data"),
            (3, "duck walks slowly"),
        ],
        ["doc_id", "text"],
    )


def test_term_and_document_frequencies(docs):
    tf = {
        (r["doc_id"], r["term"]): r["tf"]
        for r in term_frequencies(docs).collect()
    }
    assert tf[(1, "spark")] == 1
    assert len(tf) == 10  # 4 + 3 + 3 all-distinct words
    df = {r["term"]: r["df"] for r in document_frequencies(docs).collect()}
    assert df["spark"] == 2
    assert df["data"] == 2
    assert df["duck"] == 1


def test_tfidf_golden(docs):
    got = {
        (r["doc_id"], r["term"]): r["tfidf"] for r in tfidf(docs).collect()
    }
    # smoothed idf: ln((1+3)/(1+df)) + 1
    assert got[(1, "spark")] == round(math.log(4 / 3) + 1, 6)
    assert got[(3, "duck")] == round(math.log(4 / 2) + 1, 6)


def test_tfidf_vocabulary_pruning(docs):
    pruned = tfidf(docs, min_df=2)
    terms = {r["term"] for r in pruned.collect()}
    assert terms == {"spark", "data"}
    capped = tfidf(docs, max_df_fraction=0.5)
    assert "spark" not in {r["term"] for r in capped.collect()}


def test_bm25_golden(docs):
    got = {r["doc_id"]: r["bm25"] for r in bm25_rank(docs, ["spark"]).collect()}
    # N=3, df=2, idf = ln(1 + (3-2+0.5)/(2+0.5)) = ln(1.6)
    idf = math.log(1.6)
    avgdl = 10 / 3
    k1, b = 1.2, 0.75

    def score(tf, dl):
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert got[1] == round(score(1, 4), 6)
    assert got[2] == round(score(1, 3), 6)
    assert got[3] == 0.0  # no hit -> total ranking keeps the row at 0


def test_bm25_multi_term_is_sum(docs):
    one = {r["doc_id"]: r["bm25"] for r in bm25_rank(docs, ["spark"]).collect()}
    two = {r["doc_id"]: r["bm25"] for r in bm25_rank(docs, ["data"]).collect()}
    both = {
        r["doc_id"]: r["bm25"]
        for r in bm25_rank(docs, ["spark", "data"]).collect()
    }
    for d in (1, 2, 3):
        assert both[d] == pytest.approx(one[d] + two[d], abs=2e-6)


def test_tfidf_vs_duckdb(spark):
    sdf = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = sorted(
        (r["doc_id"], r["term"], r["tf"], r["df"], r["tfidf"])
        for r in tfidf(sdf).collect()
    )
    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    want = sorted(
        tuple(t)
        for t in con.execute(
            """
            WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws
                       FROM documents),
                 tf AS (SELECT doc_id, unnest(ws) AS term FROM w),
                 tfc AS (SELECT doc_id, term, count(*) AS tf
                         FROM tf GROUP BY doc_id, term),
                 dfc AS (SELECT term, count(*) AS df FROM (
                             SELECT doc_id, unnest(list_distinct(ws)) AS term
                             FROM w) GROUP BY term),
                 n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents)
            SELECT doc_id, term, tf, df,
                   round(tf * (ln((1 + n_docs) / (1 + df)) + 1), 6) AS tfidf
            FROM tfc JOIN dfc USING (term), n
            """
        ).fetchall()
    )
    assert got == want


def test_bm25_vs_duckdb(spark):
    sdf = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = sorted(
        (r["doc_id"], r["bm25"])
        for r in bm25_rank(sdf, ["data", "query"]).collect()
    )
    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    want = sorted(
        tuple(t)
        for t in con.execute(
            """
            WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws
                       FROM documents),
                 s AS (SELECT count(*)::DOUBLE AS n_docs,
                              avg(len(ws))::DOUBLE AS avgdl,
                              sum(list_contains(ws, 'data')::INT)::DOUBLE AS df0,
                              sum(list_contains(ws, 'query')::INT)::DOUBLE AS df1
                       FROM w)
            SELECT doc_id,
                   round(  ln(1 + (n_docs - df0 + 0.5) / (df0 + 0.5))
                         * tf0 * 2.2 / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
                         + ln(1 + (n_docs - df1 + 0.5) / (df1 + 0.5))
                         * tf1 * 2.2 / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl)),
                       6) AS bm25
            FROM (SELECT doc_id, len(ws)::DOUBLE AS dl,
                         len(list_filter(ws, x -> x = 'data'))::DOUBLE AS tf0,
                         len(list_filter(ws, x -> x = 'query'))::DOUBLE AS tf1
                  FROM w), s
            """
        ).fetchall()
    )
    assert got == want


def test_tfidf_join_is_broadcast(spark):
    sdf = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = tfidf(sdf)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bm25_empty_query_raises(docs):
    with pytest.raises(ValueError, match="query_terms"):
        bm25_rank(docs, [])


def test_bm25_duplicate_terms_scored_once(docs):
    """A repeated query term must not double its contribution."""
    once = {
        r["doc_id"]: r["bm25"] for r in bm25_rank(docs, ["spark"]).collect()
    }
    twice = {
        r["doc_id"]: r["bm25"]
        for r in bm25_rank(docs, ["spark", "Spark"]).collect()
    }
    assert once == twice
