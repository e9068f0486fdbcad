"""Text-analysis operator tests: hand-computed goldens on crafted docs
plus a DuckDB cross-check of the repetition metrics on real testdata.
"""

from __future__ import annotations

import duckdb
import pytest

from haplorec_spark.operators.text import (
    PII_PATTERNS,
    language_id,
    quality_score,
    redact_pii,
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


PII_ROWS = [
    (1, "mail bob.smith+x@example.co.uk and carol@test.io today"),
    (2, "server 10.0.255.3 pinged 192.168.1.1 at dawn"),
    (3, "ssn 123-45-6789 phone 555-123-4567 also 555.123.4567"),
    (4, "clean text with no identifiers at all"),
    (5, "v1.2.3 is not an ip and a@b is not an email"),
]


def test_redact_pii_golden(spark):
    df = spark.createDataFrame(PII_ROWS, ["doc_id", "text"])
    got = {r["doc_id"]: r.asDict() for r in redact_pii(df).collect()}
    assert got[1]["text_redacted"] == "mail <EMAIL> and <EMAIL> today"
    assert got[1]["n_email"] == 2
    assert got[2]["text_redacted"] == "server <IPV4> pinged <IPV4> at dawn"
    assert got[2]["n_ipv4"] == 2
    # 3-2-4 SSN grouping does not fit the 3-3-4 phone pattern, so the
    # two counters partition cleanly here.
    assert got[3]["text_redacted"] == "ssn <SSN> phone <PHONE> also <PHONE>"
    assert got[3]["n_ssn"] == 1
    assert got[3]["n_phone"] == 2
    assert got[4]["text_redacted"] == PII_ROWS[3][1]
    assert all(v == 0 for k, v in got[4].items() if k.startswith("n_"))
    # version strings and handle-less @ must not match
    assert got[5]["text_redacted"] == PII_ROWS[4][1]


def test_redact_pii_vs_duckdb(spark):
    df = spark.createDataFrame(PII_ROWS, ["doc_id", "text"])
    got = sorted(tuple(r) for r in redact_pii(df).collect())
    con = duckdb.connect()
    con.execute(
        "create table d as select * from (values "
        + ", ".join("(?, ?)" for _ in PII_ROWS)
        + ") t(doc_id, text)",
        [x for row in PII_ROWS for x in row],
    )
    redacted = "text"
    count_exprs = []
    for name, pat in PII_PATTERNS:
        count_exprs.append(
            f"len(regexp_extract_all(text, '{pat}')) AS n_{name}"
        )
        redacted = (
            f"regexp_replace({redacted}, '{pat}',"
            f" '<{name.upper()}>', 'g')"
        )
    want = sorted(
        tuple(t)
        for t in con.execute(
            f"SELECT doc_id, {redacted} AS text_redacted,"
            f" {', '.join(count_exprs)} FROM d"
        ).fetchall()
    )
    assert got == want


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


@pytest.mark.parametrize("max_bc", [200_000, 0])
def test_strip_boilerplate_lines_golden(spark, max_bc):
    """max_bc=0 forces the measured-bound shuffle (explode-and-regroup)
    fallback; both paths must return identical rows."""
    from haplorec_spark.operators.text import strip_boilerplate_lines

    docs = spark.createDataFrame(
        [
            (1, "COOKIE BANNER\nunique alpha content\nCopyright 2024"),
            (2, "COOKIE BANNER\nother beta content\nCopyright 2024"),
            (3, "standalone gamma page"),
            (4, "COOKIE BANNER\nCopyright 2024"),  # all boilerplate
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["text_clean"], r["n_lines"], r["n_removed"])
        for r in strip_boilerplate_lines(
            docs, max_broadcast_lines=max_bc
        ).collect()
    }
    assert got[1] == ("unique alpha content", 3, 2)
    assert got[2] == ("other beta content", 3, 2)
    assert got[3] == ("standalone gamma page", 1, 0)
    assert got[4] == ("", 2, 2)  # empty string, never null


@pytest.mark.parametrize("max_bc", [200_000, 0])
def test_strip_boilerplate_preserves_line_order(spark, max_bc):
    from haplorec_spark.operators.text import strip_boilerplate_lines

    docs = spark.createDataFrame(
        [
            (1, "keep one\nSHARED\nkeep two\nkeep three"),
            (2, "SHARED\nzz other"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r["text_clean"]
        for r in strip_boilerplate_lines(
            docs, max_broadcast_lines=max_bc
        ).collect()
    }
    assert got[1] == "keep one\nkeep two\nkeep three"
    assert got[2] == "zz other"


def test_strip_boilerplate_lines_vs_duckdb(spark):
    """Seed multi-line docs from the real corpus (testdata text is
    single-line) and cross-check the full output against DuckDB."""
    from pyspark.sql import functions as F

    from haplorec_spark.operators.text import strip_boilerplate_lines

    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # every 3rd doc shares a header line; every 5th a footer line
    docs = base.select(
        "doc_id",
        F.expr(
            "concat(CASE WHEN doc_id % 3 = 0 THEN 'HEADER\n' ELSE '' END,"
            " text,"
            " CASE WHEN doc_id % 5 = 0 THEN '\nFOOTER' ELSE '' END)"
        ).alias("text"),
    )
    got = sorted(
        tuple(r)
        for r in strip_boilerplate_lines(docs, min_doc_freq=2).collect()
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
            WITH d AS (SELECT doc_id,
                              concat(CASE WHEN doc_id % 3 = 0
                                     THEN 'HEADER' || chr(10) ELSE '' END,
                                     text,
                                     CASE WHEN doc_id % 5 = 0
                                     THEN chr(10) || 'FOOTER' ELSE '' END)
                                  AS text
                       FROM documents),
                 s AS (SELECT doc_id,
                              unnest(list_apply(
                                  range(1, len(string_split(text, chr(10))) + 1),
                                  i -> {'pos': i,
                                        'line': string_split(text, chr(10))[i]}))
                                  AS u
                       FROM d),
                 l AS (SELECT doc_id, u.pos AS pos, u.line AS line FROM s),
                 hot AS (SELECT line FROM (
                             SELECT line, count(DISTINCT doc_id) AS df
                             FROM l GROUP BY line)
                         WHERE df >= 2),
                 kept AS (SELECT * FROM l
                          WHERE line NOT IN (SELECT line FROM hot))
            SELECT d.doc_id,
                   coalesce(k.clean, '') AS text_clean,
                   n.n_lines,
                   n.n_lines - coalesce(k.n_kept, 0) AS n_removed
            FROM d
            JOIN (SELECT doc_id, count(*) AS n_lines FROM l
                  GROUP BY doc_id) n USING (doc_id)
            LEFT JOIN (SELECT doc_id,
                              string_agg(line, chr(10) ORDER BY pos)
                                  AS clean,
                              count(*) AS n_kept
                       FROM kept GROUP BY doc_id) k USING (doc_id)
            """
        ).fetchall()
    )
    assert got == want
    # the seeded boilerplate really was stripped
    assert all("HEADER" not in t for _, t, _, _ in got)


@pytest.mark.parametrize("max_bc", [2_000_000, 0])
def test_unigram_logprob_vs_duckdb(spark, max_bc):
    """Self-trained unigram LM scores match a DuckDB replica of the
    same add-alpha formula on the real corpus. max_bc=0 forces the
    measured-bound shuffle-join fallback; both paths must agree."""
    from haplorec_spark.operators.text import unigram_logprob_score

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = sorted(
        tuple(r)
        for r in unigram_logprob_score(
            docs, max_broadcast_vocab=max_bc
        ).collect()
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
    WITH toks AS (SELECT doc_id,
                         unnest(string_split(lower(text), ' ')) AS word
                  FROM documents),
         vocab AS (SELECT word, count(*) AS c FROM toks GROUP BY word),
         tot AS (SELECT sum(c) AS n, count(*) AS v FROM vocab)
    SELECT doc_id, count(*) AS n_tokens,
           round(avg(log10((coalesce(c, 0) + 0.5)
                           / (tot.n + 0.5 * (tot.v + 1)))), 6)
               AS avg_logprob
    FROM toks LEFT JOIN vocab USING (word) CROSS JOIN tot
    GROUP BY doc_id
    """
        ).fetchall()
    )
    assert got == want


def test_unigram_logprob_reference_vocab_flags_gibberish(spark):
    """Against a reference vocabulary, an OOV-heavy document scores
    far below a document written in the vocabulary."""
    from haplorec_spark.operators.text import unigram_logprob_score

    ref = spark.createDataFrame(
        [("the", 100), ("cat", 50), ("sat", 50), ("mat", 30)],
        "word string, count long",
    )
    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "zxqv jkwp qqrr")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["avg_logprob"]
        for r in unigram_logprob_score(docs, vocab=ref).collect()
    }
    assert got[1] > got[2] + 1.0  # >1 order of magnitude apart


def test_unigram_logprob_min_count_prunes_to_oov(spark):
    """min_count prunes the scoring vocabulary: words below it score as
    OOV (count 0) while N and V keep the full LM's values, so the
    smoothed probabilities of kept words are unchanged."""
    import math

    from haplorec_spark.operators.text import unigram_logprob_score

    ref = spark.createDataFrame(
        [("the", 100), ("cat", 50), ("sat", 50), ("mat", 1)],
        "word string, count long",
    )
    docs = spark.createDataFrame(
        [(1, "the cat"), (2, "mat mat")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["avg_logprob"])
        for r in unigram_logprob_score(
            docs, vocab=ref, min_count=2
        ).collect()
    }
    denom = 201 + 0.5 * (4 + 1)  # full N and V, before the prune
    lp = lambda c: math.log10((c + 0.5) / denom)
    assert got[1] == (2, round((lp(100) + lp(50)) / 2, 6))
    # "mat" (count 1 < min_count) scores as OOV, not with its count
    assert got[2] == (2, round(lp(0), 6))


def test_chunk_documents_golden(spark):
    """Sliding windows with overlap, clamped tail, min_words filter."""
    from haplorec_spark.operators.text import chunk_documents

    docs = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x"), (3, "")],
        "doc_id long, text string",
    )
    got = sorted(
        tuple(r)
        for r in chunk_documents(docs, chunk_size=3, stride=2).collect()
    )
    assert got == [
        (1, 0, 0, 3, "a b c"),
        (1, 1, 2, 3, "c d e"),
        (1, 2, 4, 3, "e f g"),
        (1, 3, 6, 1, "g"),
        (2, 0, 0, 1, "x"),
        # split('') == [''] on both engines: one empty-word chunk
        (3, 0, 0, 1, ""),
    ]
    filtered = sorted(
        tuple(r)
        for r in chunk_documents(
            docs, chunk_size=3, stride=2, min_words=2
        ).collect()
    )
    assert filtered == [
        (1, 0, 0, 3, "a b c"),
        (1, 1, 2, 3, "c d e"),
        (1, 2, 4, 3, "e f g"),
    ]


def test_chunk_documents_vs_duckdb(spark):
    """Non-overlapping tiling on the real corpus matches a DuckDB
    replica (the overlapping shape is the q_text_chunks driver gate)."""
    from haplorec_spark.operators.text import chunk_documents

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = sorted(
        tuple(r)
        for r in chunk_documents(docs, chunk_size=10).collect()
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
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         s AS (SELECT doc_id, ws,
                      unnest(range(0, greatest(len(ws), 1), 10)) AS st
               FROM w)
    SELECT doc_id, (st // 10)::INT AS chunk_ix, st::INT AS chunk_start,
           len(ws[st + 1 : st + 10])::INT AS n_words,
           array_to_string(ws[st + 1 : st + 10], ' ') AS chunk_text
    FROM s
    """
        ).fetchall()
    )
    assert got == want


def test_perplexity_buckets_golden(spark):
    """Cleanest (highest avg_logprob) documents land in bucket 0."""
    from haplorec_spark.operators.text import perplexity_buckets

    ref = spark.createDataFrame(
        [("the", 100), ("cat", 60), ("sat", 40)],
        "word string, count long",
    )
    docs = spark.createDataFrame(
        [
            (1, "the cat sat"),      # all in-vocab: head
            (2, "the cat zz"),       # one OOV: middle
            (3, "qq zz vv"),         # all OOV: tail
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["ppl_bucket"]
        for r in perplexity_buckets(docs, n_buckets=3, vocab=ref).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2}


def test_perplexity_buckets_vs_duckdb(spark):
    """Head/middle/tail assignment on the real corpus matches a DuckDB
    replica (quantile_cont == Spark percentile, both linear)."""
    from haplorec_spark.operators.text import perplexity_buckets

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = sorted(
        tuple(r) for r in perplexity_buckets(docs, n_buckets=3).collect()
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
    WITH toks AS (SELECT doc_id,
                         unnest(string_split(lower(text), ' ')) AS word
                  FROM documents),
         vocab AS (SELECT word, count(*) AS c FROM toks GROUP BY word),
         tot AS (SELECT sum(c) AS n, count(*) AS v FROM vocab),
         scored AS (
             SELECT doc_id, count(*) AS n_tokens,
                    round(avg(log10((coalesce(c, 0) + 0.5)
                                    / (tot.n + 0.5 * (tot.v + 1)))), 6)
                        AS avg_logprob
             FROM toks LEFT JOIN vocab USING (word) CROSS JOIN tot
             GROUP BY doc_id),
         cuts AS (SELECT quantile_cont(avg_logprob, 2.0/3.0) AS c0,
                         quantile_cont(avg_logprob, 1.0/3.0) AS c1
                  FROM scored)
    SELECT doc_id, n_tokens, avg_logprob,
           (CASE WHEN avg_logprob >= c0 THEN 0
                 WHEN avg_logprob >= c1 THEN 1
                 ELSE 2 END)::INT AS ppl_bucket
    FROM scored CROSS JOIN cuts
    """
        ).fetchall()
    )
    assert got == want


def test_linear_text_score_paths_agree_and_match_duckdb(spark):
    """The literal-map path, the join path, and a DuckDB replica all
    produce the same scores on the real corpus."""
    from haplorec_spark.operators.text import linear_text_score

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    weights = {"the": 0.8, "and": 0.3, "data": -0.5, "of": 0.1}
    lit_path = sorted(
        tuple(r) for r in linear_text_score(docs, weights, bias=0.2).collect()
    )
    join_path = sorted(
        tuple(r)
        for r in linear_text_score(
            docs, weights, bias=0.2, max_literal_vocab=0
        ).collect()
    )
    shuffle_path = sorted(
        tuple(r)
        for r in linear_text_score(
            docs, weights, bias=0.2, max_literal_vocab=0,
            max_broadcast_vocab=0,
        ).collect()
    )
    assert lit_path == join_path == shuffle_path
    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    want = sorted(
        tuple(t)
        for t in con.execute(
            """
    WITH toks AS (SELECT doc_id,
                         unnest(string_split(lower(text), ' ')) AS word
                  FROM documents),
         w(word, wt) AS (VALUES ('the', 0.8), ('and', 0.3),
                                ('data', -0.5), ('of', 0.1))
    SELECT doc_id, count(*) AS n_tokens,
           round(0.2 + sum(coalesce(wt, 0.0)) / count(*), 6) AS score,
           round(1.0 / (1.0 + exp(-round(0.2 + sum(coalesce(wt, 0.0))
                                          / count(*), 6))), 6) AS prob
    FROM toks LEFT JOIN w USING (word)
    GROUP BY doc_id
    """
        ).fetchall()
    )
    assert lit_path == want


def test_linear_text_score_golden(spark):
    """Hand-computed: sum mode, bias, OOV contributes 0 but counts."""
    import math

    from haplorec_spark.operators.text import linear_text_score

    docs = spark.createDataFrame(
        [(1, "good good bad"), (2, "zzz zzz")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["score"], r["prob"])
        for r in linear_text_score(
            docs, {"good": 1.0, "bad": -2.0}, bias=0.5, average=False
        ).collect()
    }
    assert got[1] == (3, 0.5, round(1 / (1 + math.exp(-0.5)), 6))
    assert got[2] == (2, 0.5, round(1 / (1 + math.exp(-0.5)), 6))


@pytest.mark.parametrize("max_bc", [2_000_000, 0])
def test_bigram_logprob_vs_duckdb(spark, max_bc):
    """Self-trained bigram LM scores match a DuckDB replica of the
    conditional add-alpha formula on the real corpus; max_bc=0 forces
    both count joins onto the shuffle path and must agree."""
    from haplorec_spark.operators.text import bigram_logprob_score

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = sorted(
        tuple(r)
        for r in bigram_logprob_score(
            docs, max_broadcast_vocab=max_bc
        ).collect()
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
         bg AS (SELECT doc_id, u.w1, u.w2 FROM (
                    SELECT doc_id,
                           unnest(list_transform(range(1, len(ws)),
                               i -> {'w1': ws[i], 'w2': ws[i + 1]})) AS u
                    FROM w)),
         uni AS (SELECT w1, count(*) AS c1 FROM (
                     SELECT unnest(ws) AS w1 FROM w) GROUP BY w1),
         bic AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
         tot AS (SELECT count(*) AS v FROM uni),
         per AS (SELECT doc_id, count(*) AS n_bigrams,
                        round(avg(log10((coalesce(c12, 0) + 0.5)
                            / (coalesce(c1, 0) + 0.5 * (tot.v + 1)))), 6)
                            AS avg_logprob
                 FROM bg LEFT JOIN bic USING (w1, w2)
                         LEFT JOIN uni USING (w1)
                         CROSS JOIN tot
                 GROUP BY doc_id)
    SELECT d.doc_id, coalesce(per.n_bigrams, 0) AS n_bigrams,
           per.avg_logprob
    FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
    """
        ).fetchall()
    )
    assert got == want


def test_bigram_logprob_scores_word_order(spark):
    """The bigram rung separates natural word order from a shuffled
    bag of the same words — the signal the unigram rung cannot see."""
    from haplorec_spark.operators.text import (
        bigram_logprob_score,
        unigram_logprob_score,
    )

    base = "the cat sat on the mat and the dog sat on the rug"
    shuffled = "mat the on dog sat the and rug cat the on sat the"
    docs = spark.createDataFrame(
        [(i, base) for i in range(10)] + [(99, shuffled)],
        "doc_id int, text string",
    )
    bi = {
        r["doc_id"]: r["avg_logprob"]
        for r in bigram_logprob_score(docs).collect()
    }
    assert bi[99] < bi[0]
    uni = {
        r["doc_id"]: r["avg_logprob"]
        for r in unigram_logprob_score(docs).collect()
    }
    assert uni[99] == uni[0]  # same bag, same unigram score


def test_bigram_logprob_short_and_empty_docs(spark):
    from haplorec_spark.operators.text import bigram_logprob_score

    docs = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, "two words")],
        "doc_id int, text string",
    )
    rows = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
        for r in bigram_logprob_score(docs).collect()
    }
    assert rows[1] == (0, None)
    assert rows[2] == (0, None)  # '' splits to one token -> no bigrams
    assert rows[3][0] == 1 and rows[3][1] is not None


def test_bigram_min_count_prunes_bigrams_only(spark):
    """min_count drops rare bigrams to unseen (count 0 + alpha) but
    keeps V and the unigram denominators exact."""
    from haplorec_spark.operators.text import bigram_logprob_score

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c")],
        "doc_id int, text string",
    )
    import math

    rows = {
        r["doc_id"]: r["avg_logprob"]
        for r in bigram_logprob_score(docs, min_count=2).collect()
    }
    # V = 3 (a, b, c); c1(a) = 3. "a b" kept (c12=2); "a c" pruned.
    denom = 3 + 0.5 * 4
    assert rows[1] == pytest.approx(
        round(math.log10((2 + 0.5) / denom), 6), abs=1e-9
    )
    assert rows[3] == pytest.approx(
        round(math.log10(0.5 / denom), 6), abs=1e-9
    )


def test_normalize_text_vs_duckdb(spark):
    """Full-knob normalization matches a DuckDB replica of the same
    literal rules on the real corpus — the cross-engine determinism
    every downstream dedup hash depends on."""
    from haplorec_spark.operators.text import (
        _ACCENT_DST,
        _ACCENT_SRC,
        normalize_text,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = sorted(
        tuple(r)
        for r in normalize_text(
            docs,
            fold_accents=True,
            strip_punctuation=True,
            fold_digits=True,
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    want = sorted(
        tuple(t)
        for t in con.execute(
            r"""
            SELECT doc_id,
                   trim(regexp_replace(regexp_replace(regexp_replace(
                       translate(lower(text), $$SRC$$, $$DST$$),
                       '[!-/:-@\[-`{-~]', ' ', 'g'),
                       '[0-9]', '0', 'g'),
                       '[ ' || chr(9) || chr(10) || chr(13) || ']+',
                       ' ', 'g')) AS text_norm
            FROM documents
            """.replace("$$SRC$$", f"'{_ACCENT_SRC}'")
            .replace("$$DST$$", f"'{_ACCENT_DST}'")
        ).fetchall()
    )
    assert got == want


def test_normalize_text_goldens_and_dedup_composition(spark):
    from haplorec_spark.operators.dedup import exact_duplicates
    from haplorec_spark.operators.text import normalize_text

    docs = spark.createDataFrame(
        [
            (1, "The  QUICK brown\tfox!"),
            (2, "the quick brown fox"),
            (3, "Café déjà-vu costs $12.50, naïvely."),
            (4, "unrelated"),
        ],
        "doc_id int, text string",
    )
    norm = {
        r["doc_id"]: r["text_norm"]
        for r in normalize_text(
            docs,
            fold_accents=True,
            strip_punctuation=True,
            fold_digits=True,
        ).collect()
    }
    assert norm[1] == "the quick brown fox"
    assert norm[3] == "cafe deja vu costs 00 00 naively"
    # case/punct variants of the same content hash together after
    # normalization (the published compose-before-hash pattern)
    renamed = normalize_text(
        docs, strip_punctuation=True
    ).withColumnRenamed("text_norm", "text")
    dups = exact_duplicates(renamed).collect()
    assert {(r["doc_id"], r["canonical_id"]) for r in dups} == {(2, 1)}
    # defaults leave punctuation/digits/accents alone
    soft = {
        r["doc_id"]: r["text_norm"]
        for r in normalize_text(docs).collect()
    }
    assert soft[3] == "café déjà-vu costs $12.50, naïvely."


def test_build_vocab_vs_duckdb(spark):
    from haplorec_spark.operators.text import build_vocab

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = sorted(
        tuple(r) for r in build_vocab(docs, size=25).collect()
    )
    assert len(got) == 25
    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    want = sorted(
        tuple(t)
        for t in con.execute(
            """
    WITH c AS (SELECT t AS token, count(*) AS cnt FROM (
                   SELECT unnest(string_split(lower(text), ' ')) AS t
                   FROM documents) WHERE t <> '' GROUP BY t),
         tot AS (SELECT sum(cnt) AS total FROM c),
         r AS (SELECT token, cnt,
                      row_number() OVER (ORDER BY cnt DESC, token) AS rank,
                      sum(cnt) OVER (ORDER BY cnt DESC, token
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                          AS cum
               FROM c)
    SELECT rank, token, cnt, round(cnt / tot.total, 6),
           round(cum / tot.total, 6)
    FROM r CROSS JOIN tot WHERE rank <= 25
    """
        ).fetchall()
    )
    assert got == want
    # coverage is monotone and the top token covers the most
    by_rank = sorted(got)
    assert by_rank[0][4] == by_rank[0][3]
    cums = [t[4] for t in by_rank]
    assert cums == sorted(cums)


def test_build_vocab_min_count_cuts_tail_not_coverage(spark):
    from haplorec_spark.operators.text import build_vocab

    docs = spark.createDataFrame(
        [(1, "a a a b b c")], "doc_id int, text string"
    )
    rows = {r["token"]: r for r in build_vocab(docs, min_count=2).collect()}
    assert set(rows) == {"a", "b"}
    # fractions are of ALL 6 tokens, so pruning c does not inflate them
    assert rows["a"]["fraction"] == 0.5
    assert rows["b"]["cum_fraction"] == pytest.approx(5 / 6, abs=1e-6)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="size"):
        build_vocab(docs, size=0)


def test_build_vocab_ignores_whitespace_artifact_tokens(spark):
    from haplorec_spark.operators.text import build_vocab

    docs = spark.createDataFrame(
        [(1, "  a  a b  ")], "doc_id int, text string"
    )
    rows = {r["token"]: r for r in build_vocab(docs).collect()}
    assert set(rows) == {"a", "b"}  # no '' token
    # coverage denominators count only real tokens (3)
    assert rows["a"]["fraction"] == pytest.approx(2 / 3, abs=1e-6)
    assert rows["b"]["cum_fraction"] == 1.0


def test_language_id_ngram_disagreement_case(spark):
    """Inflected French with none of the lexicon's exact words: the
    whole-word rung misses (falls back to 'en' by declaration-order
    tiebreak on all-zero scores) while the trigram-profile rung reads
    the boundary trigrams and answers 'fr'."""
    from haplorec_spark.operators.text import language_id_ngram

    rows = [(1, "les chats noirs dormaient tranquillement"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "der hund und die katze sind im garten")]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    lex = {
        r["doc_id"]: r["predicted_lang"]
        for r in language_id(docs).collect()
    }
    tri = {
        r["doc_id"]: r["predicted_lang"]
        for r in language_id_ngram(docs).collect()
    }
    assert lex[1] != "fr"      # the lexicon rung gets doc 1 wrong
    assert tri[1] == "fr"      # the trigram rung gets it right
    assert tri[2] == "en" and tri[3] == "de"


def test_language_id_ngram_deterministic_tiebreak_and_empty(spark):
    from haplorec_spark.operators.text import language_id_ngram

    docs = spark.createDataFrame(
        [(1, ""), (2, "zzz qqq xxx")], "doc_id int, text string"
    )
    got = {r["doc_id"]: (r["predicted_lang"], r["lang_score"])
           for r in language_id_ngram(docs).collect()}
    # all-zero scores fall back to the first declared language with
    # score 0 — never null, never nondeterministic
    assert got[1] == ("en", 0.0)
    assert got[2][1] is not None


def test_with_language_attaches_in_place(spark):
    from haplorec_spark.operators.text import language_id_ngram, with_language

    rows = [(1, "les chats noirs dormaient tranquillement", "xx"),
            (2, "the quick brown fox jumps over the lazy dog", "xx")]
    docs = spark.createDataFrame(rows, "doc_id int, text string, lang string")
    out = with_language(docs)
    assert out.columns == ["doc_id", "text", "lang"]
    got = {r["doc_id"]: r["lang"] for r in out.collect()}
    want = {
        r["doc_id"]: r["predicted_lang"]
        for r in language_id_ngram(docs).collect()
    }
    assert got == want  # the untrusted input column was overwritten
    # map-side: no Exchange in the attach plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # lexicon rung + unknown method guard
    lex = with_language(docs, method="lexicon")
    assert lex.columns == ["doc_id", "text", "lang"]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="method"):
        with_language(docs, method="fasttext")


#: Short inflected sentences (content words outside the function-word
#: lists) — the regime the TRAINED rung exists for. Shared by the
#: accuracy comparison below and crafted honestly: four per language,
#: no sentence appears in the pinned model's training corpus.
LANGID_EVAL = [
    ("en", "the children were playing in the gardens"),
    ("en", "she was reading an interesting book at home"),
    ("en", "many houses were built near the river"),
    ("en", "they walked slowly through the old streets"),
    ("fr", "les chats dormaient dans la cuisine"),
    ("fr", "nous parlons avec les enfants dans le jardin"),
    ("fr", "elles chantaient pendant la soiree"),
    ("fr", "il regardait les oiseaux depuis la fenetre"),
    ("es", "los gatos dormian en la cocina"),
    ("es", "hablamos con los ninos en el jardin"),
    ("es", "ellas cantaban durante la noche"),
    ("es", "miraba los pajaros desde la ventana"),
    ("de", "die katzen schliefen in der kueche"),
    ("de", "wir sprechen mit den kindern im garten"),
    ("de", "sie sangen waehrend des abends"),
    ("de", "er schaute die voegel vom fenster aus"),
    ("it", "i gatti dormivano nella cucina"),
    ("it", "parliamo con i bambini nel giardino"),
    ("it", "loro cantavano durante la serata"),
    ("it", "guardava gli uccelli dalla finestra"),
    ("pt", "os gatos dormiam na cozinha"),
    ("pt", "falamos com as criancas no jardim"),
    ("pt", "elas cantavam durante a noite"),
    ("pt", "olhava os passaros pela janela"),
    ("nl", "de katten sliepen in de keuken"),
    ("nl", "wij spreken met de kinderen in de tuin"),
    ("nl", "zij zongen tijdens de avond"),
    ("nl", "hij keek naar de vogels vanuit het raam"),
    # round 8: the four new inventory languages (sv/da/pl/tr)
    ("sv", "katterna sov i köket"),
    ("sv", "vi pratar med barnen i trädgården"),
    ("sv", "de sjöng under kvällen"),
    ("sv", "han tittade på fåglarna från fönstret"),
    ("da", "kattene sov i køkkenet"),
    ("da", "vi taler med børnene i haven"),
    ("da", "de sang i løbet af aftenen"),
    ("da", "han kiggede på fuglene fra vinduet"),
    ("pl", "koty spały w kuchni"),
    ("pl", "rozmawiamy z dziećmi w ogrodzie"),
    ("pl", "śpiewały podczas wieczoru"),
    ("pl", "patrzył na ptaki z okna"),
    ("tr", "kediler mutfakta uyuyordu"),
    ("tr", "bahçede çocuklarla konuşuyoruz"),
    ("tr", "gece boyunca şarkı söylediler"),
    ("tr", "pencereden kuşlara bakıyordu"),
    # round 9: the space-free-script inventory (zh/ja continuous Han/
    # kana, th continuous Thai, ko spaced Hangul) — the regime the
    # script-segmented trigram/gram streams exist for
    ("zh", "猫在厨房里睡觉了"),
    ("zh", "我们和孩子们在花园里说话"),
    ("zh", "她们晚上一起唱歌"),
    ("zh", "他从窗户看那些鸟"),
    ("ja", "ねこはだいどころでねむっていました"),
    ("ja", "にわでこどもたちとはなしています"),
    ("ja", "かれらはよるにうたをうたいました"),
    ("ja", "まどからとりをみていました"),
    ("ko", "그 고양이는 부엌에서 잤다 지금 여기 있다"),
    ("ko", "우리 아이들과 정원에서 이야기한다 모든 사람 함께"),
    ("ko", "그들은 저녁에 노래를 불렀다 오늘 정말 좋은 밤"),
    ("ko", "그는 창문에서 새를 보았다 어떤 새 하나"),
    ("th", "แมวนอนหลับอยู่ในครัว"),
    ("th", "เราคุยกับเด็กๆในสวน"),
    ("th", "พวกเขาร้องเพลงตอนกลางคืน"),
    ("th", "เขามองนกจากหน้าต่าง"),
]


def test_language_id_model_beats_ngram_on_inflected(spark):
    """The trained rung's reason to exist: on short inflected
    documents the LEARNED weights separate the Romance languages
    where unweighted trigram-profile membership ties toward the
    bigger profile (it/pt scored as es/fr). Strictly more correct on
    the shared eval set."""
    from haplorec_spark.operators.text import (
        PINNED_LANGID_MODEL,
        language_id_model,
        language_id_ngram,
    )

    docs = spark.createDataFrame(
        [(i, lang, t) for i, (lang, t) in enumerate(LANGID_EVAL)],
        "doc_id long, want string, text string",
    )
    model_pred = {
        r["doc_id"]: r["predicted_lang"]
        for r in language_id_model(docs, PINNED_LANGID_MODEL).collect()
    }
    ngram_pred = {
        r["doc_id"]: r["predicted_lang"]
        for r in language_id_ngram(docs).collect()
    }
    model_acc = sum(
        model_pred[i] == lang for i, (lang, _) in enumerate(LANGID_EVAL)
    )
    ngram_acc = sum(
        ngram_pred[i] == lang for i, (lang, _) in enumerate(LANGID_EVAL)
    )
    assert model_acc > ngram_acc, (model_acc, ngram_acc)
    # and not by luck on a weak baseline: both rungs are well above
    # chance (chance = 4/60); round-9 pinned points on the extended
    # 60-item 15-language eval (zh/ja/ko/th added): model 50, ngram 49
    # (the latin-160/cjk-32 allocation sweep in
    # scripts/make_pinned_langid.py — the space-free scripts are
    # categorically separable, so both rungs go 16/16 there and the
    # margin lives in the confusable Latin block)
    assert ngram_acc >= 47
    assert model_acc >= 49


def test_language_id_model_literal_matches_join_path(spark):
    """Both physical paths — the literal map-side program and the
    explode → weight join → pivot — produce bit-identical
    (predicted_lang, lang_score)."""
    from haplorec_spark.operators.text import (
        PINNED_LANGID_MODEL,
        language_id_model,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, (_, t) in enumerate(LANGID_EVAL[:8])]
        + [(100, ""), (101, "zzz qqq")],
        "doc_id long, text string",
    )
    lit = sorted(
        tuple(r)
        for r in language_id_model(docs, PINNED_LANGID_MODEL).collect()
    )
    joined = sorted(
        tuple(r)
        for r in language_id_model(
            docs, PINNED_LANGID_MODEL, max_literal_vocab=0
        ).collect()
    )
    assert lit == joined


def test_language_id_model_literal_plan_is_map_side(spark):
    from haplorec_spark.operators.text import (
        PINNED_LANGID_MODEL,
        language_id_model,
    )

    docs = spark.createDataFrame([(1, "hola")], "doc_id long, text string")
    plan = (
        language_id_model(docs, PINNED_LANGID_MODEL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_with_language_model_method(spark):
    from haplorec_spark.operators.text import (
        PINNED_LANGID_MODEL,
        language_id_model,
        with_language,
    )

    docs = spark.createDataFrame(
        [(i, t, "xx") for i, (_, t) in enumerate(LANGID_EVAL[:6])],
        "doc_id long, text string, lang string",
    )
    out = with_language(docs, method="model", model=PINNED_LANGID_MODEL)
    assert out.columns == ["doc_id", "text", "lang"]
    got = {r["doc_id"]: r["lang"] for r in out.collect()}
    want = {
        r["doc_id"]: r["predicted_lang"]
        for r in language_id_model(docs, PINNED_LANGID_MODEL).collect()
    }
    assert got == want
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    with pytest.raises(ValueError, match="literal mapping"):
        with_language(docs, method="model")  # no model given
    big = {"en": (0.0, {f"t{i:04d}": 0.1 for i in range(2500)})}
    with pytest.raises(ValueError, match="literal bound"):
        with_language(docs, method="model", model=big)
    with pytest.raises(ValueError, match="only meaningful"):
        with_language(docs, method="ngram", model=PINNED_LANGID_MODEL)


def test_mapping_ngram_inference():
    """The literal mapping form's n-gram size is the LONGEST feature
    key: full grams carry n; shorter keys are the boundary grams a
    sub-n-length document legitimately emits in the same space (so a
    model trained on a corpus with tiny documents still distills and
    scores — max, not uniformity)."""
    from haplorec_spark.operators.text import _mapping_ngram

    assert _mapping_ngram({"en": (0.1, {"abc": 1.0, "de▁": 0.5})}) == 3
    assert _mapping_ngram({"en": (0.1, {"abcd": 1.0})}) == 4
    assert _mapping_ngram({"en": (0.1, {})}) == 3  # empty -> default
    # mixed lengths = full grams + boundary grams of the same space
    assert _mapping_ngram({"en": (0.0, {"ab": 1.0, "abcd": 1.0})}) == 4


def test_strip_boilerplate_bucketed_set_matches_shuffle_path(spark):
    """The broadcast hot set is hash-bucketed (~n_hot/64 power-of-two
    buckets) so each probe is one xxhash64 + an O(64) in-bucket scan;
    with a hot set wide enough to spread over several buckets, the
    bucketed broadcast path must equal the forced shuffle path row
    for row (exactness of the bucketing, including lines that hash
    into empty buckets)."""
    from pyspark.sql import functions as F

    from haplorec_spark.operators.text import strip_boilerplate_lines

    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            "\n",
            F.concat(F.lit("only-"), F.col("id")),
            F.concat(F.lit("boiler-"), F.pmod(F.col("id"), F.lit(100))),
            F.concat(F.lit("boiler-"), F.pmod(F.col("id") + 7, F.lit(100))),
            F.concat(F.lit("also-unique-"), F.col("id")),
        ).alias("text"),
    )
    fast = {
        tuple(r)
        for r in strip_boilerplate_lines(docs, min_doc_freq=2).collect()
    }
    slow = {
        tuple(r)
        for r in strip_boilerplate_lines(
            docs, min_doc_freq=2, max_broadcast_lines=0
        ).collect()
    }
    assert fast == slow
    assert any(r[3] == 2 for r in fast)  # the boiler- lines got cut


def test_strip_boilerplate_empty_bucket_lines_survive(spark):
    """Deterministic cover for the empty-bucket branch: the hot set is
    chosen (by computing xxhash64 in-session) to land ENTIRELY in
    bucket 0 of nb=2, so every unique line hashing to bucket 1 probes
    an empty bucket — if the coalesce-to-empty-array guard broke,
    array_contains(NULL, l) would silently drop those lines."""
    from pyspark.sql import functions as F

    from haplorec_spark.operators.text import strip_boilerplate_lines

    cand = spark.range(2000).select(
        F.concat(F.lit("cand-"), F.col("id")).alias("l"),
        F.pmod(F.xxhash64(F.concat(F.lit("cand-"), F.col("id"))),
               F.lit(2)).alias("b"),
    ).collect()
    bucket0 = [r["l"] for r in cand if r["b"] == 0][:70]  # hot set
    bucket1 = [r["l"] for r in cand if r["b"] == 1][:5]   # probes
    assert len(bucket0) == 70 and len(bucket1) == 5
    rows = []
    # every bucket0 line appears in 2 docs -> hot (n_hot=70 -> nb=2);
    # bucket1 lines appear once each -> must survive the empty bucket
    for i, hl in enumerate(bucket0):
        rows.append((2 * i, hl + "\nunique-a-" + str(i)))
        rows.append((2 * i + 1, hl + "\nunique-b-" + str(i)))
    for j, ul in enumerate(bucket1):
        rows.append((1000 + j, ul + "\nunique-c-" + str(j)))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r
        for r in strip_boilerplate_lines(docs, min_doc_freq=2).collect()
    }
    for j, ul in enumerate(bucket1):
        r = got[1000 + j]
        assert r["text_clean"] == ul + "\nunique-c-" + str(j)
        assert r["n_removed"] == 0
    assert got[0]["n_removed"] == 1  # hot line stripped


def test_language_id_model_dotted_language_keys(spark):
    """Model language keys are user data and may contain dots (e.g.
    'zh.hant'); the materialized __p_<lang> references must be
    backtick-quoted or Spark parses them as nested-field access."""
    from haplorec_spark.operators.text import language_id_model

    docs = spark.createDataFrame(
        [(1, "aaa bbb"), (2, "ccc ddd")], ["doc_id", "text"]
    )
    model = {
        "zh.hant": (0.0, {"aaa": 5.0}),
        "en": (0.0, {"ccc": 5.0}),
    }
    got = {
        r["doc_id"]: r["predicted_lang"]
        for r in language_id_model(docs, model).collect()
    }
    assert got[1] == "zh.hant" and got[2] == "en"


def test_unknown_language_floor_all_rungs(spark):
    """Round-8 'und' floor: gibberish / code / out-of-inventory text —
    which a forced argmax files under whichever language scores least
    badly — flips to UNKNOWN_LANG on every rung, while clear
    in-inventory prose keeps its label at the same threshold.
    lang_score still reports the (low) best score either way."""
    from haplorec_spark.operators.text import (
        PINNED_LANGID_MODEL,
        UNKNOWN_LANG,
        language_id,
        language_id_model,
        language_id_ngram,
    )

    rows = [
        (0, "the cat is in the house and the dog is with us today"),
        (1, "le chat est dans la maison et le chien est avec nous"),
        (2, "qzx wvv kkjq zzt bbrm plok vrrt"),           # gibberish
        (3, "0x1f2e deadbeef ff00aa 7f3a9c b00c"),        # code/hex
        (4, ";;; ### @@@ %%% &&& *** $$$"),               # symbols
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    oov = {2, 3, 4}

    for df, floor in [
        (language_id(docs, min_score=0.1), 0.1),
        (language_id_ngram(docs, min_score=0.2), 0.2),
        # the 15-way one-vs-rest sigmoids sit near sigmoid(bias)
        # ~0.068, so the floor is tight but real and deterministic
        # (pinned model, fixed fixtures): in-inventory prose 0.0718+,
        # out-of-inventory text = the bare-bias argmax at 0.067985 —
        # which, floorless, files gibberish under whichever language
        # has the least-negative bias (ko here), the exact failure
        # min_score exists to stop
        (
            language_id_model(
                docs, PINNED_LANGID_MODEL, min_score=0.070
            ),
            0.070,
        ),
    ]:
        got = {r["doc_id"]: r for r in df.collect()}
        for d in oov:
            assert got[d]["predicted_lang"] == UNKNOWN_LANG, (floor, d)
            assert got[d]["lang_score"] < floor
        assert got[0]["predicted_lang"] == "en"
        assert got[1]["predicted_lang"] == "fr"

    # None disables: bit-identical to the pre-floor argmax
    base = {
        r["doc_id"]: tuple(r)
        for r in language_id_ngram(docs).collect()
    }
    for d, r in base.items():
        assert r[1] != UNKNOWN_LANG  # argmax always forces a label


def test_with_language_floor_matches_batch_rung(spark):
    """with_language(min_score=...) must agree with the batch scorer's
    floored predictions on every method (the attach-in-place face and
    the (id, pred, score) face share _floor_pred by construction —
    this pins it)."""
    from haplorec_spark.operators.text import (
        PINNED_LANGID_MODEL,
        language_id,
        language_id_model,
        language_id_ngram,
        with_language,
    )

    docs = spark.createDataFrame(
        [
            (0, "the cat is in the house and the dog is here"),
            (1, "qzx wvv kkjq zzt bbrm"),
            (2, "der hund und die katze sind im haus bei uns"),
        ],
        "doc_id long, text string",
    )
    cases = [
        ("lexicon", None, language_id(docs, min_score=0.1), 0.1),
        ("ngram", None, language_id_ngram(docs, min_score=0.2), 0.2),
        (
            "model",
            PINNED_LANGID_MODEL,
            language_id_model(docs, PINNED_LANGID_MODEL, min_score=0.095),
            0.095,
        ),
    ]
    for method, model, batch, floor in cases:
        want = {r["doc_id"]: r["predicted_lang"] for r in batch.collect()}
        got = {
            r["doc_id"]: r["lang"]
            for r in with_language(
                docs, method=method, model=model, min_score=floor
            ).collect()
        }
        assert got == want, method
        assert "und" in set(got.values()), method


def test_language_scorer_survives_downstream_rewrites(spark):
    """Round-8 regression: the language scorers must be SINGLE
    self-contained expressions, because downstream rewrites (pushed
    filters, stage-count aggregate extraction) substitute through
    projections and previously multiplied the stacked helper levels —
    the curation chain's split-count plan held 529 copies of the
    trigram construction (236 s for a 50k audit vs 23 s after the
    fix). Pin: a detect -> keep-list -> quality chain's final plan
    contains at most a handful of scorer copies."""
    from haplorec_spark.curation import CurationConfig, curate_documents

    docs = spark.createDataFrame(
        [(i, "the cat is in the house and the dog is here") for i in
         range(30)],
        "doc_id long, text string",
    )
    cfg = CurationConfig(
        detect_language="ngram",
        languages=["en", "de"],
        language_min_score=0.09,
        min_quality=0.3,
        redact=False,
        dedup=None,
    )
    out, _ = curate_documents(docs, config=cfg, count_stages=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # 'slice(' appears once per trigram-construction copy; the ngram
    # scorer may legitimately be copied once per downstream REFERENCE
    # (lang output + pushed language filter) but never per
    # reference x per language x per level. Round 9: with_language
    # binds the scorer struct once (_floor_lang_col), so the floor's
    # .l/.s double-access no longer doubles every copy — measured 3
    # copies in this chain (was 5 under the two-projection form).
    n = plan.count("slice(")
    assert n <= 4, f"scorer inlined {n} times — expression blowup"


def test_null_text_yields_null_prediction_on_every_rung(spark):
    """Review-caught (round 8): the struct argmax over all-NULL scores
    tiebreaks to the first declared language, so NULL text must be
    guarded. Pinned contract — unified across rungs (they used to
    disagree): NULL text -> NULL prediction + NULL score; with the
    floor set, NULL falls to 'und' (NULL >= floor is NULL)."""
    from haplorec_spark.operators.text import (
        PINNED_LANGID_MODEL,
        language_id,
        language_id_model,
        language_id_ngram,
        with_language,
    )

    docs = spark.createDataFrame(
        [(0, "the cat is in the house"), (1, None)],
        "doc_id long, text string",
    )
    for df in (
        language_id(docs),
        language_id_ngram(docs),
        language_id_model(docs, PINNED_LANGID_MODEL),
    ):
        got = {r["doc_id"]: tuple(r)[1:] for r in df.collect()}
        assert got[1] == (None, None)
        assert got[0][0] == "en"
    floored = {
        r["doc_id"]: r["predicted_lang"]
        for r in language_id_ngram(docs, min_score=0.1).collect()
    }
    assert floored[1] == "und"
    wl = {r["doc_id"]: r["lang"] for r in with_language(docs).collect()}
    assert wl == {0: "en", 1: None}


# ------------------------------------------- space-free scripts (round 9)

#: Mixed-script fixture: good zh/ja/ko/th prose, Latin controls, junk.
CJK_DOCS = [
    (0, "en", "the house is big and the water is cold in the winter"),
    (1, "fr", "la maison est grande et le chat dort dans le jardin"),
    (2, "zh", "我们的房子很大冬天的水很冷孩子们在学校读书我们一起去看朋友"),
    (3, "ja", "わたしたちのいえはおおきいですふゆのみずはつめたいこどもはほんをよみます"),
    (4, "ko", "우리 집은 크다 겨울 물은 차갑다 아이들은 학교에서 책을 읽는다 그 사람은 지금 여기 있다"),
    (5, "th", "บ้านของเราใหญ่มากน้ำในฤดูหนาวเย็นมากเด็กอ่านหนังสือที่โรงเรียนเราไปหาเพื่อนด้วยกัน"),
    (6, "und", "qqq zzz xxx vvv kkk jjj www yyy hhh ggg fff ddd"),
]


def _cjk_duck():
    """DuckDB connection with the fixture registered as `documents` —
    so the SHARED oracle builders replay on CJK content, not just the
    all-Latin sf tables."""
    import duckdb
    import pandas as pd

    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": [i for i, _, _ in CJK_DOCS],
                "text": [t for _, _, t in CJK_DOCS],
            }
        ),
    )
    return con


@pytest.fixture(scope="module")
def cjk_docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, _, t in CJK_DOCS], "doc_id long, text string"
    )


def test_cjk_langid_rungs_label_all_scripts(spark, cjk_docs):
    """All three rungs label zh/ja/ko/th on continuous (space-free)
    text — the round-9 correctness fix: before script segmentation a
    CJK document was ONE token and every rung scored it zero."""
    from haplorec_spark.operators.text import (
        PINNED_LANGID_MODEL,
        language_id,
        language_id_model,
        language_id_ngram,
    )

    want = {i: lang for i, lang, _ in CJK_DOCS if lang != "und"}
    for fn in (
        language_id,
        language_id_ngram,
        lambda d: language_id_model(d, PINNED_LANGID_MODEL),
    ):
        pred = {
            r["doc_id"]: r["predicted_lang"] for r in fn(cjk_docs).collect()
        }
        for i, lang in want.items():
            assert pred[i] == lang, (fn, i, lang, pred[i])


def test_cjk_langid_oracles_replay_on_fixture(spark, cjk_docs):
    """The driver-gate oracle SQL (lexicon scores and the shared
    ngram/model oracle builders) reproduces the Spark rungs on CJK
    content bit-for-bit — the same lockstep the sf gates check on
    Latin text."""
    from haplorec_spark.operators.text import (
        _duck_lang_scores,
        language_id,
        language_id_model,
        language_id_ngram,
        PINNED_LANGID_MODEL,
    )
    from haplorec_spark.queries import _language_ngram_oracle_sql
    from tests.test_registry import _language_model_oracle

    con = _cjk_duck()
    # lexicon rung
    scores = _duck_lang_scores()
    best = "greatest(" + ", ".join(s for _, s in scores) + ")"
    pred = "CASE " + " ".join(
        f"WHEN {s} = {best} THEN '{lang}'" for lang, s in scores
    ) + " END"
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            f"SELECT doc_id, {pred}, {best} FROM documents"
        ).fetchall()
    }
    got = {
        r["doc_id"]: (r["predicted_lang"], r["lang_score"])
        for r in language_id(cjk_docs).collect()
    }
    assert got == want
    # ngram rung
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(_language_ngram_oracle_sql()).fetchall()
    }
    got = {
        r["doc_id"]: (r["predicted_lang"], r["lang_score"])
        for r in language_id_ngram(cjk_docs).collect()
    }
    assert got == want
    # trained rung (pinned model)
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(_language_model_oracle()).fetchall()
    }
    got = {
        r["doc_id"]: (r["predicted_lang"], r["lang_score"])
        for r in language_id_model(cjk_docs, PINNED_LANGID_MODEL).collect()
    }
    assert got == want


def _duck_script_words(t: str = "text") -> str:
    from haplorec_spark.operators.text import SPACEFREE_CLASS

    seg = (
        f"regexp_replace(lower({t}), '({SPACEFREE_CLASS})', ' \\1 ', 'g')"
    )
    can = f"trim(regexp_replace({seg}, '  +', ' ', 'g'))"
    return f"list_filter(string_split({can}, ' '), w -> w != '')"


def test_quality_script_mode_vs_duckdb(spark, cjk_docs):
    """Script-mode quality features replay in DuckDB from the shared
    constants: segmented word stream, merged stopword lexicon,
    dense-script word-length waiver, spacefree fraction."""
    from haplorec_spark.operators.text import (
        LANG_LEXICON,
        SPACEFREE_CLASS,
        SPACEFREE_WLEN_WAIVER,
        _WLEN_WAIVER_CLASS,
        quality_score,
    )

    ws = _duck_script_words()
    n = f"len({ws})"
    stop_lex = (
        LANG_LEXICON["en"] + LANG_LEXICON["zh"] + LANG_LEXICON["ja"]
        + LANG_LEXICON["ko"] + LANG_LEXICON["th"]
    )
    arr = ", ".join(f"'{w}'" for w in stop_lex)
    hits = f"len(list_filter({ws}, w -> list_contains([{arr}], w)))"
    nonspace = "length(replace(text, ' ', ''))"
    mean = f"{nonspace} / {n}::DOUBLE"
    sf_frac = (
        f"CASE WHEN {nonspace} > 0 THEN"
        f" len(regexp_extract_all(text, '{SPACEFREE_CLASS}'))"
        f" / {nonspace}::DOUBLE ELSE 0.0 END"
    )
    waiver_frac = (
        f"CASE WHEN {nonspace} > 0 THEN"
        f" len(regexp_extract_all(text, '{_WLEN_WAIVER_CLASS}'))"
        f" / {nonspace}::DOUBLE ELSE 0.0 END"
    )
    len_ok = f"CASE WHEN {n} BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END"
    wlen_ok = (
        f"CASE WHEN {waiver_frac} >= {SPACEFREE_WLEN_WAIVER} THEN 1.0"
        f" WHEN {mean} BETWEEN 2 AND 12 THEN 1.0 ELSE 0.0 END"
    )
    stop_ok = f"CASE WHEN {hits} / {n}::DOUBLE >= 0.01 THEN 1.0 ELSE 0.0 END"
    con = _cjk_duck()
    want = {
        r[0]: tuple(r[1:])
        for r in con.execute(
            f"""
            SELECT doc_id, {n}::INT,
                   round({mean}, 6),
                   round({hits} / {n}::DOUBLE, 6),
                   round((0.4 * {len_ok} + 0.3 * {wlen_ok}
                         + 0.3 * {stop_ok})::DOUBLE, 6),
                   round({sf_frac}, 6)
            FROM documents
            """
        ).fetchall()
    }
    got = {
        r["doc_id"]: (
            r["n_words"],
            r["mean_word_len"],
            r["stopword_ratio"],
            r["quality"],
            r["spacefree_fraction"],
        )
        for r in quality_score(
            cjk_docs, segmentation="script"
        ).collect()
    }
    assert got == want
    # non-vacuity: every good CJK doc passes, whitespace mode fails them
    good = {i for i, lang, _ in CJK_DOCS if lang in ("zh", "ja", "ko", "th")}
    for i in good:
        assert got[i][3] >= 0.7, (i, got[i])
    ws_quality = {
        r["doc_id"]: r["quality"]
        for r in quality_score(cjk_docs).collect()
    }
    for i in good - {4}:  # ko is spaced; the others are one giant "word"
        assert ws_quality[i] < 0.7, (i, ws_quality[i])


def test_script_mode_is_noop_on_spaced_text(spark, cjk_docs):
    """The self-selecting property: on single-spaced Latin text every
    script-mode word metric equals the whitespace-mode value."""
    from haplorec_spark.operators.text import (
        chunk_documents,
        quality_score,
        repetition_metrics,
        token_counts,
    )

    latin = cjk_docs.filter("doc_id in (0, 1, 6)")
    for a, b in [
        (
            quality_score(latin, include_repetition=True),
            quality_score(
                latin, include_repetition=True, segmentation="script"
            ).drop("spacefree_fraction"),
        ),
        (token_counts(latin), token_counts(latin, segmentation="script")),
        (
            repetition_metrics(latin),
            repetition_metrics(latin, segmentation="script"),
        ),
        (
            chunk_documents(latin, chunk_size=5),
            chunk_documents(latin, chunk_size=5, segmentation="script"),
        ),
    ]:
        assert sorted(map(tuple, a.collect())) == sorted(
            map(tuple, b.collect())
        )


def test_script_fractions_fixture_golden(spark, cjk_docs):
    from haplorec_spark.operators.text import script_fractions

    got = {
        r["doc_id"]: r for r in script_fractions(cjk_docs).collect()
    }
    assert got[0]["latin_fraction"] == 1.0
    assert got[2]["han_fraction"] == 1.0
    assert got[2]["spacefree_fraction"] == 1.0
    assert got[3]["kana_fraction"] == 1.0
    assert got[4]["hangul_fraction"] == 1.0
    assert got[4]["spacefree_fraction"] == 0.0  # Korean is spaced
    assert got[5]["thai_fraction"] == 1.0
    # fractions partition: the six script columns sum to 1 per doc
    for i, r in got.items():
        s = sum(
            r[c]
            for c in (
                "latin_fraction", "han_fraction", "kana_fraction",
                "hangul_fraction", "thai_fraction", "other_fraction",
            )
        )
        assert abs(s - 1.0) < 1e-5, (i, s)


def test_token_and_chunk_script_mode_on_cjk(spark, cjk_docs):
    from haplorec_spark.operators.text import chunk_documents, token_counts

    zh_text = CJK_DOCS[2][2]
    tc = {
        r["doc_id"]: r
        for r in token_counts(cjk_docs, segmentation="script").collect()
    }
    assert tc[2]["n_ws_tokens"] == len(zh_text)  # one token per char
    assert tc[2]["chars_per_token"] == 1.0
    ch = chunk_documents(
        cjk_docs.filter("doc_id = 2"), chunk_size=10, segmentation="script"
    ).collect()
    assert len(ch) == -(-len(zh_text) // 10)
    assert all(r["n_words"] <= 10 for r in ch)
    # chunks cover the document in order: re-joining recovers the text
    rebuilt = "".join(
        r["chunk_text"].replace(" ", "")
        for r in sorted(ch, key=lambda r: r["chunk_ix"])
    )
    assert rebuilt == zh_text


def test_curation_script_mode_rescues_cjk(spark, cjk_docs):
    """The headline non-vacuity check: with segmentation="script" and
    the und floor, curation KEEPS good zh/ja/ko/th text and drops the
    junk; the identical config under whitespace segmentation silently
    drops every space-free-script document."""
    from haplorec_spark.curation import CurationConfig, map_side_curation

    base = dict(
        detect_language="ngram",
        languages=["en", "zh", "ja", "ko", "th"],
        language_min_score=0.05,
        redact=False,
    )
    kept_script = {
        r["doc_id"]
        for r in map_side_curation(
            cjk_docs, CurationConfig(segmentation="script", **base)
        ).collect()
    }
    assert kept_script == {0, 2, 3, 4, 5}  # en + all four scripts; junk out
    kept_ws = {
        r["doc_id"]
        for r in map_side_curation(
            cjk_docs, CurationConfig(**base)
        ).collect()
    }
    assert kept_ws == {0, 4}  # spaced scripts only — the round-9 hole


def test_script_mode_word_metrics_survive_empty_text(spark):
    """Review-caught (round 9): the filtered segmented word array is
    EMPTY for empty/whitespace-only text (the unfiltered historical
    split never was), which divided by zero under ANSI mode in the
    lexicon rung and every script-mode word metric. Pinned: such rows
    get deterministic zeros (NULL text stays NULL)."""
    from haplorec_spark.operators.text import (
        language_id,
        quality_score,
        repetition_metrics,
        token_counts,
    )

    docs = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, None),
         (3, "the house is big and the water is cold in it today")],
        "doc_id long, text string",
    )
    lex = {r["doc_id"]: r for r in language_id(docs).collect()}
    assert lex[0]["lang_score"] == 0.0
    assert lex[1]["lang_score"] == 0.0
    assert lex[2]["predicted_lang"] is None
    assert lex[3]["predicted_lang"] == "en"
    q = {
        r["doc_id"]: r
        for r in quality_score(
            docs, include_repetition=True, segmentation="script"
        ).collect()
    }
    for d in (0, 1):
        assert q[d]["n_words"] == 0
        assert q[d]["mean_word_len"] == 0.0
        assert q[d]["stopword_ratio"] == 0.0
        assert q[d]["dup_word_fraction"] == 0.0
        assert q[d]["top_word_fraction"] == 0.0
        assert q[d]["quality"] is not None
    t = {
        r["doc_id"]: r
        for r in token_counts(docs, segmentation="script").collect()
    }
    assert t[1]["n_ws_tokens"] == 0 and t[1]["chars_per_token"] == 3.0
    r = {
        r["doc_id"]: r
        for r in repetition_metrics(
            docs, segmentation="script"
        ).collect()
    }
    assert r[0]["dup_bigram_fraction"] == 0.0


def test_lm_and_fingerprints_script_mode_on_cjk(spark, cjk_docs):
    """Round-9 review follow-up: the unigram-LM scorer and the
    bottom-k fingerprints were still whitespace-tokenized — a zh doc
    was ONE OOV token (maximal 'gibberish' to the CCNet cut) and had
    NO fingerprint row. Script mode fixes both; whitespace's holes
    are pinned."""
    from haplorec_spark.operators.text import (
        doc_fingerprints,
        unigram_logprob_score,
    )

    ws = {
        r["doc_id"]: r
        for r in unigram_logprob_score(cjk_docs).collect()
    }
    assert ws[2]["n_tokens"] == 1  # the hole: one giant token
    sc = {
        r["doc_id"]: r
        for r in unigram_logprob_score(
            cjk_docs, segmentation="script"
        ).collect()
    }
    zh_text = CJK_DOCS[2][2]
    assert sc[2]["n_tokens"] == len(zh_text)
    # the score is now a per-character distribution, not one
    # whole-document token probability (self-scoring a tiny fixture
    # makes the giant token "seen", so direction is corpus-dependent
    # — the signal is the token BASIS, pinned by n_tokens above)
    assert sc[2]["avg_logprob"] != ws[2]["avg_logprob"]
    # and a zh doc scored under a REFERENCE vocab of zh characters is
    # no longer one OOV blob: its mean logprob beats the whitespace
    # mode's single unseen-token probability
    from collections import Counter

    zh_vocab = spark.createDataFrame(
        list(Counter(zh_text * 3).items()), "word string, count long"
    )
    ref_ws = {
        r["doc_id"]: r["avg_logprob"]
        for r in unigram_logprob_score(cjk_docs, vocab=zh_vocab).collect()
    }
    ref_sc = {
        r["doc_id"]: r["avg_logprob"]
        for r in unigram_logprob_score(
            cjk_docs, vocab=zh_vocab, segmentation="script"
        ).collect()
    }
    assert ref_sc[2] > ref_ws[2]
    fp_ws = {r["doc_id"] for r in doc_fingerprints(cjk_docs).collect()}
    assert 2 not in fp_ws  # no shingles -> no row
    fp = {
        r["doc_id"]: r["fingerprint"]
        for r in doc_fingerprints(
            cjk_docs, segmentation="script"
        ).collect()
    }
    assert fp[2] and len(fp[2].split(",")) == 4


# ------------------------------------------- stupid-backoff trigram LM

def test_trigram_lm_seen_trigram_golden(spark):
    import math

    from haplorec_spark.operators.text import trigram_logprob_score

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d"), (3, "x y")],
        "doc_id INT, text STRING",
    )
    out = {
        r["doc_id"]: (r["n_trigrams"], r["avg_logprob"])
        for r in trigram_logprob_score(docs).collect()
    }
    # c(a b c) = 1, c(a b) = 2 -> S = 1/2 on both three-word docs
    exp = round(math.log10(0.5), 6)
    assert out[1] == (1, exp)
    assert out[2] == (1, exp)
    # fewer than three tokens: no trigrams, null score (restored row)
    assert out[3] == (0, None)


def test_trigram_lm_min_count_backs_off_to_bigram(spark):
    import math

    from haplorec_spark.operators.text import trigram_logprob_score

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "a b d")],
        "doc_id INT, text STRING",
    )
    out = {
        r["doc_id"]: r["avg_logprob"]
        for r in trigram_logprob_score(docs, min_count=2).collect()
    }
    # (a b c) count 2 survives the prune: S = 2 / c(a b) = 2/3
    assert out[1] == round(math.log10(2.0 / 3.0), 6)
    # (a b d) count 1 is pruned -> backoff: 0.4 * c(b d)/c(b) = 0.4/3
    assert out[3] == round(math.log10(0.4 * (1.0 / 3.0)), 6)


def test_trigram_lm_orders_shuffled_text_below_natural(spark):
    """The ladder's point: word-ORDER damage that unigram scoring
    cannot see must score lower here."""
    from haplorec_spark.operators.text import trigram_logprob_score

    base = "the cat sat on the mat and the dog sat on the rug"
    shuffled = "mat the on dog sat the rug and cat the on sat the"
    docs = spark.createDataFrame(
        [(i, base) for i in range(10)] + [(99, shuffled)],
        "doc_id INT, text STRING",
    )
    out = {
        r["doc_id"]: r["avg_logprob"]
        for r in trigram_logprob_score(docs).collect()
    }
    assert out[99] < out[0]


# -------------------------------------------------- blocked-terms gate

def test_blocked_term_fraction_whole_word_golden(spark):
    from haplorec_spark.operators.text import blocked_term_fraction

    docs = spark.createDataFrame(
        [
            (1, "the GRASS is green"),   # whole-word hit (case-folded)
            (2, "classy glassware"),     # substrings only -> no hit
            (3, "grass grass and grass"),
            (4, ""),
        ],
        "doc_id INT, text STRING",
    )
    out = {
        r["doc_id"]: (r["n_words"], r["n_blocked"], r["blocked_fraction"])
        for r in blocked_term_fraction(docs, ["grass", "ass"]).collect()
    }
    assert out[1] == (4, 1, 0.25)
    assert out[2] == (2, 0, 0.0)   # 'classy' must NOT match 'ass'
    assert out[3] == (4, 3, 0.75)
    assert out[4] == (0, 0, 0.0)   # empty text: defined, not NULL/NaN


def test_blocked_term_list_validation(spark):
    import pytest as _pytest

    from haplorec_spark.operators.text import (
        MAX_LITERAL_FEATURES,
        blocked_term_exprs,
    )

    with _pytest.raises(ValueError, match="empty"):
        blocked_term_exprs("text", [])
    with _pytest.raises(ValueError, match="literal bound"):
        blocked_term_exprs(
            "text", [f"t{i}" for i in range(MAX_LITERAL_FEATURES + 1)]
        )


# ------------------------------- union prefilter scorers (round 10)

from tests.conftest import rows  # noqa: E402


def test_language_id_prefilter_matches_naive_scorer(spark, cjk_docs):
    """The union-prefilter lexicon rung (probe only tokens surviving a
    one-pass filter against the union of all lexicons) must be
    bit-identical to the naive per-language full-stream probe — on the
    mixed-script fixture including the und junk row. The naive scorer
    is reimplemented inline from the same LANG_LEXICON so a future
    edit to the operator cannot silently drift both sides."""
    from pyspark.sql import functions as F

    from haplorec_spark.operators.text import (
        LANG_LEXICON,
        _argmax_struct_sql,
        _hit_count,
        _words_sql,
        language_id,
    )

    scores = [
        (
            lang,
            f"round({_hit_count('ws', lex)}"
            f" / cast(greatest(size(ws), 1) as double), 6)",
        )
        for lang, lex in LANG_LEXICON.items()
    ]
    inner = _argmax_struct_sql(scores)
    x = F.expr(
        f"transform(array({_words_sql('text', 'script')}),"
        f" ws -> {inner})[0]"
    )
    naive = cjk_docs.select(
        "doc_id",
        x.getField("l").alias("predicted_lang"),
        x.getField("s").alias("lang_score"),
    )
    assert rows(language_id(cjk_docs)) == rows(naive)


def test_language_id_ngram_prefilter_matches_naive_scorer(spark, cjk_docs):
    """Same A/B for the trigram rung: survivors-only profile probes
    with the unfiltered-stream denominator must reproduce the naive
    full-stream scorer exactly."""
    from pyspark.sql import functions as F

    from haplorec_spark.operators.text import (
        LANG_TRIGRAM_PROFILES,
        _argmax_struct_sql,
        language_id_ngram,
        segmented_text_sql,
    )

    s_ = f"concat(' ', {segmented_text_sql('lower(text)')}, ' ')"
    tris = (
        f"flatten(transform(array(split({s_}, '')),"
        f" cs -> transform(sequence(1, greatest(size(cs) - 2, 1)),"
        f" i -> concat_ws('', slice(cs, i, 3)))))"
    )
    scores = []
    for lang, prof in LANG_TRIGRAM_PROFILES.items():
        arr = ", ".join("'" + t + "'" for t in prof)
        scores.append(
            (
                lang,
                f"round(size(filter(t3, t -> t in ({arr})))"
                f" / cast(size(t3) as double), 6)",
            )
        )
    inner = _argmax_struct_sql(scores)
    x = F.expr(f"transform(array({tris}), t3 -> {inner})[0]")
    naive = cjk_docs.select(
        "doc_id",
        x.getField("l").alias("predicted_lang"),
        x.getField("s").alias("lang_score"),
    )
    assert rows(language_id_ngram(cjk_docs)) == rows(naive)


def test_language_id_ngram_kernel_matches_expression_twin(spark):
    """The round-12 vectorized mapInArrow kernel must reproduce the
    expression twin (the with_language Column face) value-for-value on
    every edge the two spellings could diverge on: NULL text (NULL row
    — or 'und' under a floor, the _floor_pred NULL-comparison
    fall-through), empty/whitespace-only text (score 0.0, 'en'
    declaration-order tiebreak), sub-3-char documents (the short
    boundary gram), space-free-script segmentation (zh/ja/th), Turkish
    dotted-I lowercasing, and tabs/newlines (Spark trim strips ASCII
    spaces only). Plan shape: one column-pruned scan feeding
    MapInArrow, zero Exchange."""
    from pyspark.sql import functions as F

    from haplorec_spark.operators.text import (
        _floor_pred,
        _ngram_lang_struct,
        _null_text_guard,
        language_id_ngram,
    )

    rows_in = [
        (0, None),
        (1, ""),
        (2, " "),
        (3, "   \t  "),
        (4, "ab"),
        (5, "x"),
        (6, "the cat sat on the mat with the dog and the bird"),
        (7, "le chat et le chien sont dans la maison avec les enfants"),
        (8, "这是一个中文句子用来测试语言识别"),
        (9, "これは日本語のテストですとても楽しい"),
        (10, "ภาษาไทยทดสอบการตรวจจับภาษา"),
        (11, "한국어 문장 테스트 입니다 언어 감지"),
        (12, "İstanbul ve Ankara STRASSE ß un et le"),
        (13, "mixed 中文 and english text le la"),
        (14, "a\tb\nc d"),
        (15, "'quoted' text with the and of"),
    ]
    docs = spark.createDataFrame(rows_in, "doc_id long, text string")

    def expr_twin(min_score):
        x = _null_text_guard(_ngram_lang_struct("text"), "text")
        return docs.select(
            F.col("doc_id"),
            _floor_pred(
                x.getField("l"), x.getField("s"), min_score
            ).alias("predicted_lang"),
            x.getField("s").alias("lang_score"),
        )

    for ms in (None, 0.2):
        got = {
            r[0]: (r[1], r[2])
            for r in language_id_ngram(docs, min_score=ms).collect()
        }
        want = {
            r[0]: (r[1], r[2]) for r in expr_twin(ms).collect()
        }
        assert got == want, f"min_score={ms}"
    plan = (
        language_id_ngram(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInArrow" in plan
    assert "Exchange" not in plan


def test_quality_score_kernel_matches_expression_twin(spark):
    """The round-12 vectorized whitespace-mode quality kernel must
    reproduce the _quality_exprs expression program value-for-value,
    including the NULL-text CASE fall-throughs (quality and
    dup_bigram_fraction are 0.0 for NULL text while the other
    features stay NULL), the empty-string single-token split, multi-
    space empties-kept tokenization, and the repetition features'
    exact ratios. Plan: MapInArrow over a pruned scan, zero
    Exchange."""
    from pyspark.sql import functions as F

    from haplorec_spark.operators.text import _quality_exprs, quality_score

    rows_in = [
        (0, None),
        (1, ""),
        (2, " "),
        (3, "a"),
        (4, "the the the the the the the the the the the the"),
        (5, "the cat sat on the mat with a dog and a bird in it"),
        (6, "word " * 60),
        (7, "x  y   z double  spaces trailing "),
        (8, "completely unique tokens without any stopwords here"),
        (9, "ab " * 5 + "cd " * 5 + "ab cd"),
        (10, "\tthe\tof and  to\n in"),
    ]
    docs = spark.createDataFrame(rows_in, "doc_id long, text string")
    for rep in (False, True):
        got = {
            r[0]: tuple(r)[1:]
            for r in quality_score(
                docs, include_repetition=rep
            ).collect()
        }
        exprs = _quality_exprs("text", rep)
        want = {
            r[0]: tuple(r)[1:]
            for r in docs.select(
                F.col("doc_id"),
                *[F.expr(e).alias(a) for a, e in exprs],
            ).collect()
        }
        assert got == want, f"include_repetition={rep}"
    plan = (
        quality_score(docs, include_repetition=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInArrow" in plan
    assert "Exchange" not in plan


def test_language_id_prefilter_identical_on_real_corpus(spark):
    """Prefilter vs naive on the real (pure-Latin) sf0.001 corpus —
    the branch where most tokens are filtered out before probing."""
    from haplorec_spark.operators.text import language_id, language_id_ngram

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    got = {r[0]: (r[1], r[2]) for r in rows(language_id(docs))}
    ng = {r[0]: (r[1], r[2]) for r in rows(language_id_ngram(docs))}
    assert len(got) == docs.count() and len(ng) == len(got)
    # every score is a valid rounded ratio and labels are in-inventory
    from haplorec_spark.operators.text import (
        LANG_LEXICON,
        LANG_TRIGRAM_PROFILES,
    )

    assert {v[0] for v in got.values()} <= set(LANG_LEXICON)
    assert {v[0] for v in ng.values()} <= set(LANG_TRIGRAM_PROFILES)


def test_language_id_model_prefilter_matches_naive_scorer(spark, cjk_docs):
    """The trained rung's union prefilter (sum over survivors, average
    over the full stream) must be bit-identical to the naive
    full-stream fold — every filtered-out gram contributed an exact
    +0.0 (no pinned weight is -0.0), an IEEE identity."""
    from pyspark.sql import functions as F

    from haplorec_spark.operators.text import (
        PINNED_LANGID_MODEL,
        _argmax_struct_sql,
        _literal_prob_var_sql,
        _mapping_ngram,
        char_ngram_text_sql,
        language_id_model,
    )

    ftext = char_ngram_text_sql("text", _mapping_ngram(PINNED_LANGID_MODEL))
    scores = [
        (lang, _literal_prob_var_sql(ws, bias, "gs"))
        for lang, (bias, ws) in PINNED_LANGID_MODEL.items()
    ]
    inner = _argmax_struct_sql(scores)
    x = F.expr(f"transform(array(split({ftext}, ' ')), gs -> {inner})[0]")
    naive = cjk_docs.select(
        "doc_id",
        x.getField("l").alias("predicted_lang"),
        x.getField("s").alias("lang_score"),
    )
    got = rows(language_id_model(cjk_docs, PINNED_LANGID_MODEL))
    assert got == rows(naive)


def test_encoding_quality_detects_damage_not_legit_latin(spark):
    """Replacement chars, stray controls, and UTF-8-as-Latin-1
    digrams register; legitimate accented Latin ('São', 'café') and
    tab/newline whitespace do not."""
    from haplorec_spark.operators.text import encoding_quality

    docs = spark.createDataFrame(
        [
            (1, "clean ascii text"),
            (2, "lost � char"),
            (3, "mojibake Ã© and â€™ and Â«"),
            (4, "bin\x00ary\x07spill"),
            (5, "São Paulo nações café naïve fiancée"),
            (6, "tabs\tand\nnewlines\rare fine"),
            (7, None),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (
            r["replacement_fraction"],
            r["control_fraction"],
            r["mojibake_fraction"],
        )
        for r in encoding_quality(docs).collect()
    }
    assert got[1] == (0.0, 0.0, 0.0)
    assert got[2][0] > 0 and got[2][1] == 0 and got[2][2] == 0
    assert got[3][2] > 0 and got[3][0] == 0
    assert got[4][1] > 0
    assert got[5] == (0.0, 0.0, 0.0)  # no false positives on real Latin
    assert got[6] == (0.0, 0.0, 0.0)  # whitespace is not damage
    assert got[7] == (None, None, None)  # NULL text stays NULL


def test_fix_encoding_repairs_mojibake_keeps_legit(spark):
    """Round-trip goldens for the repair table: one level of
    UTF-8-read-as-cp1252 damage reverses exactly; legitimate accented
    Latin and pure-U+FFFD loss pass through bit-identical (the
    strictly-reduces guard); NULL stays NULL."""
    from haplorec_spark.operators.text import fix_encoding

    docs = spark.createDataFrame(
        [
            (1, "CafÃ© au lait â€” dÃ©jÃ  vu"),
            (2, "donâ€™t worry â€œquotedâ€\x9d â‚¬99"),
            (3, "São Paulo nações café naïve fiancée"),
            (4, "lost � char only"),
            (5, "clean ascii"),
            (6, "naÃ¯ve faÃ§ade Ã± Ã¼ Â« quoted Â»"),
            (7, None),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["text_fixed"], r["was_repaired"])
        for r in fix_encoding(docs).collect()
    }
    assert got[1] == ("Café au lait — déjà vu", True)
    assert got[2] == ("don’t worry “quoted” €99", True)
    assert got[3] == ("São Paulo nações café naïve fiancée", False)
    assert got[4] == ("lost � char only", False)  # table cannot help
    assert got[5] == ("clean ascii", False)
    assert got[6] == ("naïve façade ñ ü « quoted »", True)
    assert got[7] == (None, None)


def test_fix_encoding_guard_never_worsens(spark):
    """A document where substitution would NOT reduce damage keeps its
    original text: the acceptance guard re-measures encoding_damage on
    the repaired candidate, so the operator can only improve or
    pass through."""
    from haplorec_spark.operators.text import encoding_quality, fix_encoding

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate([
            "mixed Ã© damage with � loss and \x01 spill",
            "â€™" * 40,
            "Ã" * 30,  # bare lead chars: no digram, no rule fires
        ])],
        "doc_id long, text string",
    )
    fixed = fix_encoding(docs).withColumnRenamed("text_fixed", "text")
    before = {
        r["doc_id"]: r["encoding_damage"]
        for r in encoding_quality(docs).collect()
    }
    after = {
        r["doc_id"]: r["encoding_damage"]
        for r in encoding_quality(fixed).collect()
    }
    for d in before:
        assert after[d] <= before[d], d
