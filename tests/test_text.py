"""Text-analysis operator tests: hand-computed goldens on crafted docs
plus a DuckDB cross-check of the repetition metrics on real testdata.
"""

from __future__ import annotations

import duckdb
import pytest

from haplorec_spark.operators.text import (
    language_id,
    quality_score,
    repetition_metrics,
    token_counts,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            # all-distinct words: dup fractions 0, top fraction 1/4
            (1, "alpha beta gamma delta"),
            # "spam spam spam spam": dup_word 3/4, dup_bigram 2/3, top 1
            (2, "spam spam spam spam"),
            # repeated bigram "a b a b a": words a*3 b*2 -> dup_word 3/5,
            # bigrams [a b, b a, a b, b a] -> distinct 2 -> dup 2/4, top 3/5
            (3, "a b a b a"),
            # single word: no bigrams
            (4, "solo"),
            # the-heavy English text for language-id / stopword ratio
            (5, "the cat and the dog in the house is the best"),
        ],
        ["doc_id", "text"],
    )


def test_repetition_metrics_golden(docs):
    got = {
        r["doc_id"]: (
            r["dup_word_fraction"],
            r["dup_bigram_fraction"],
            r["top_word_fraction"],
        )
        for r in repetition_metrics(docs).collect()
    }
    assert got[1] == (0.0, 0.0, 0.25)
    assert got[2] == (0.75, round(2 / 3, 6), 1.0)
    assert got[3] == (round(3 / 5, 6), 0.5, 0.6)
    assert got[4] == (0.0, 0.0, 1.0)


def test_quality_score_includes_repetition(docs):
    base = quality_score(docs)
    assert "dup_word_fraction" not in base.columns
    full = quality_score(docs, include_repetition=True)
    assert full.columns == base.columns + [
        "dup_word_fraction",
        "dup_bigram_fraction",
        "top_word_fraction",
    ]
    rep = {
        r["doc_id"]: r["dup_word_fraction"]
        for r in full.collect()
    }
    assert rep[2] == 0.75


def test_language_id_golden(docs):
    got = {
        r["doc_id"]: r["predicted_lang"] for r in language_id(docs).collect()
    }
    assert got[5] == "en"


def test_token_counts_golden(docs):
    got = {
        r["doc_id"]: (r["n_ws_tokens"], r["n_regex_tokens"])
        for r in token_counts(docs).collect()
    }
    assert got[1] == (4, 4)
    assert got[4] == (1, 1)


def test_repetition_metrics_vs_duckdb(spark):
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = sorted(
        (
            r["doc_id"],
            r["dup_word_fraction"],
            r["dup_bigram_fraction"],
            r["top_word_fraction"],
        )
        for r in repetition_metrics(df).collect()
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
            WITH w AS (SELECT doc_id,
                              string_split(lower(text), ' ') AS ws
                       FROM documents)
            SELECT doc_id,
                   round(1.0 - len(list_distinct(ws)) / len(ws)::DOUBLE, 6),
                   round(CASE WHEN len(ws) >= 2 THEN
                         1.0 - len(list_distinct(list_transform(
                                   generate_series(1, len(ws) - 1),
                                   i -> ws[i] || ' ' || ws[i + 1])))
                             / (len(ws) - 1)::DOUBLE
                         ELSE 0.0 END, 6),
                   round(list_max(list_transform(list_distinct(ws),
                             w -> len(list_filter(ws, x -> x = w))))
                         / len(ws)::DOUBLE, 6)
            FROM w
            """
        ).fetchall()
    )
    assert got == want
