"""profile_table tests: exact-mode DuckDB cross-check on real testdata
and behavior on non-orderable / null-bearing columns.
"""

from __future__ import annotations

import duckdb

from haplorec_spark.operators.profiling import (
    frequent_values,
    numeric_quantiles,
    profile_table,
)

SF_DIR = "/root/testdata/sf0.001"


def test_profile_exact_vs_duckdb_orders(spark):
    df = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    got = {
        r["column"]: (
            r["n_rows"],
            r["n_nulls"],
            r["n_distinct"],
            r["min_value"],
            r["max_value"],
        )
        for r in profile_table(df, exact=True).collect()
    }
    con = duckdb.connect()
    con.execute(
        "create view orders as select * from "
        f"read_parquet('{SF_DIR}/orders.parquet')"
    )
    for c in df.columns:
        n, nulls, nd, mn, mx = con.execute(
            f'SELECT count(*), sum(("{c}" IS NULL)::INT),'
            f' count(DISTINCT "{c}"),'
            f' min("{c}")::VARCHAR, max("{c}")::VARCHAR FROM orders'
        ).fetchone()
        want = (n, nulls or 0, nd, mn, mx)
        assert got[c][:3] == want[:3], c
        # min/max string casts agree except engine formatting of
        # timestamps/decimals; compare raw where both are plain
        if got[c][3] is not None and "date" not in c and c != "o_totalprice":
            assert (got[c][3], got[c][4]) == (mn, mx), c


def test_profile_null_and_complex_columns(spark):
    df = spark.createDataFrame(
        [
            (1, None, [1, 2]),
            (2, "b", [3]),
            (None, "c", None),
        ],
        "id bigint, s string, arr array<bigint>",
    )
    got = {r["column"]: r.asDict() for r in profile_table(df, exact=True).collect()}
    assert got["id"]["n_rows"] == 3
    assert got["id"]["n_nulls"] == 1
    assert got["id"]["null_fraction"] == round(1 / 3, 6)
    assert got["id"]["n_distinct"] == 2
    assert (got["id"]["min_value"], got["id"]["max_value"]) == ("1", "2")
    # string column gets avg_length; others don't
    assert got["s"]["avg_length"] == 1.0
    assert got["id"]["avg_length"] is None
    # arrays are not orderable: null min/max, but nulls/distinct count
    assert got["arr"]["min_value"] is None
    assert got["arr"]["n_nulls"] == 1
    assert got["arr"]["n_distinct"] == 2


def test_profile_is_single_pass(spark):
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = (
        profile_table(df)  # approx mode: no Expand of the scan
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" not in plan
    assert plan.count("FileScan") == 1


def test_frequent_values_vs_duckdb(spark):
    df = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderstatus", "o_orderpriority"
    )
    got = sorted(
        tuple(r)
        for r in frequent_values(df, k=3).collect()
    )
    con = duckdb.connect()
    con.execute(
        "create view orders as select * from "
        f"read_parquet('{SF_DIR}/orders.parquet')"
    )
    want = sorted(
        tuple(t)
        for t in con.execute(
            """
            SELECT * FROM (
                SELECT 'o_orderstatus' AS column, o_orderstatus AS value,
                       count(*) AS n_rows,
                       row_number() OVER (ORDER BY count(*) DESC,
                                          o_orderstatus) AS rank
                FROM orders GROUP BY o_orderstatus
                UNION ALL
                SELECT 'o_orderpriority', o_orderpriority, count(*),
                       row_number() OVER (ORDER BY count(*) DESC,
                                          o_orderpriority)
                FROM orders GROUP BY o_orderpriority)
            WHERE rank <= 3
            """
        ).fetchall()
    )
    assert got == want


def test_frequent_values_counts_nulls(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None), (4, "b")], ["id", "s"]
    )
    got = {
        (r["value"]): (r["n_rows"], r["rank"])
        for r in frequent_values(df, ["s"], k=10).collect()
    }
    assert got[None] == (2, 1)  # nulls counted and ranked first


def test_numeric_quantiles_exact_vs_duckdb(spark):
    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    got = sorted(
        (r["column"], r["prob"], round(r["value"], 6))
        for r in numeric_quantiles(
            df, ["l_quantity", "l_extendedprice"], (0.5, 0.95), exact=True
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "create view lineitem as select * from "
        f"read_parquet('{SF_DIR}/lineitem.parquet')"
    )
    want = sorted(
        tuple(t)
        for t in con.execute(
            """
            SELECT 'l_quantity', 0.5::DOUBLE,
                   round(quantile_cont(l_quantity::DOUBLE, 0.5), 6)
            FROM lineitem
            UNION ALL SELECT 'l_quantity', 0.95::DOUBLE,
                   round(quantile_cont(l_quantity::DOUBLE, 0.95), 6)
            FROM lineitem
            UNION ALL SELECT 'l_extendedprice', 0.5::DOUBLE,
                   round(quantile_cont(l_extendedprice::DOUBLE, 0.5), 6)
            FROM lineitem
            UNION ALL SELECT 'l_extendedprice', 0.95::DOUBLE,
                   round(quantile_cont(l_extendedprice::DOUBLE, 0.95), 6)
            FROM lineitem
            """
        ).fetchall()
    )
    assert got == want


def test_numeric_quantiles_approx_is_bracketed(spark):
    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    exact = {
        (r["column"], r["prob"]): r["value"]
        for r in numeric_quantiles(
            df, ["l_extendedprice"], (0.5,), exact=True
        ).collect()
    }
    approx = {
        (r["column"], r["prob"]): r["value"]
        for r in numeric_quantiles(
            df, ["l_extendedprice"], (0.5,)
        ).collect()
    }
    for key, v in approx.items():
        assert abs(v - exact[key]) / exact[key] < 0.05


def test_profile_map_column_reports_null_distinct(spark):
    """Spark cannot hash or compare map columns — a distinct aggregate
    over one raises AnalysisException, so profile_table must report a
    null n_distinct (like min/max) instead of failing the whole table."""
    df = spark.createDataFrame(
        [(1, {"a": 1}), (2, None)],
        "id long, m map<string,int>",
    )
    for exact in (False, True):
        got = {
            r["column"]: r for r in profile_table(df, exact=exact).collect()
        }
        m = got["m"]
        assert m["n_distinct"] is None
        assert m["min_value"] is None and m["max_value"] is None
        assert m["n_nulls"] == 1 and m["n_rows"] == 2
        assert got["id"]["n_distinct"] == 2


def test_text_corpus_profile_vs_duckdb(spark):
    """The one-pass corpus dashboard matches a DuckDB replica of every
    metric (quality/repetition/language defs shared with text.py)."""
    import duckdb

    from haplorec_spark.operators.profiling import text_corpus_profile

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    got = {r["metric"]: r["value"] for r in text_corpus_profile(docs).collect()}
    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"read_parquet('{sf}/documents.parquet')"
    )
    en = "['the', 'a', 'of', 'and', 'to', 'in', 'is']"
    want = con.execute(
        f"""
    WITH f AS (SELECT doc_id,
                      len(string_split(lower(text), ' ')) AS n_words,
                      len(list_filter(string_split(lower(text), ' '),
                          w -> list_contains({en}, w)))
                          / len(string_split(lower(text), ' '))::DOUBLE
                          AS stop_ratio
               FROM documents)
    SELECT count(*)::DOUBLE AS n_docs,
           sum(n_words)::DOUBLE AS total_words,
           round(avg(n_words), 6) AS avg_words,
           quantile_cont(n_words, 0.5) AS p50,
           quantile_cont(n_words, 0.9) AS p90,
           quantile_cont(n_words, 0.99) AS p99
    FROM f
    """
    ).fetchone()
    assert got["n_docs"] == want[0]
    assert got["total_words"] == want[1]
    assert got["avg_words"] == want[2]
    assert got["words_p50"] == want[3]
    assert got["words_p90"] == want[4]
    assert got["words_p99"] == want[5]
    # language fractions sum to <= 1 and en dominates the synthetic corpus
    langs = [v for k, v in got.items() if k.startswith("lang_")]
    assert sum(langs) <= 1.000001
    assert got["lang_en_fraction"] == max(langs)
    # quality/repetition means are present and bounded
    assert 0.0 <= got["avg_quality"] <= 1.0
    assert 0.0 <= got["avg_dup_word_fraction"] <= 1.0


def test_text_corpus_profile_null_text_ignored_in_word_stats(spark):
    """A null-text document counts toward n_docs but must not shift a
    word-count quantile or the avg_words denominator — the
    percentile()/avg() null convention the histogram rewrite has to
    preserve (a null histogram row once inflated the cumulative ranks:
    p50 of [10, 13, 14, 17] + one null read 12.5 instead of 13.5)."""
    from haplorec_spark.operators.profiling import text_corpus_profile

    texts = [
        " ".join(f"w{i}" for i in range(n)) for n in (10, 13, 14, 17)
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)] + [(99, None)],
        "doc_id long, text string",
    )
    got = {
        r["metric"]: r["value"] for r in text_corpus_profile(docs).collect()
    }
    assert got["n_docs"] == 5.0
    assert got["total_words"] == 54.0
    assert got["avg_words"] == 13.5  # 54 / 4 non-null, never / 5
    assert got["words_p50"] == 13.5  # quantile_cont over 4 values
    # the raw (unrounded) interpolated double, same IEEE arithmetic
    # order as the operator / DuckDB quantile_cont
    rn = 3 * 0.9
    assert got["words_p90"] == (3 - rn) * 14 + (rn - 2) * 17


def test_text_corpus_profile_empty_corpus_zero_docs(spark):
    """An empty drop reports n_docs 0.0 (the count() convention), not
    a null that would poison downstream drift arithmetic; value-less
    metrics (quantiles, means) are null as before."""
    from haplorec_spark.operators.profiling import text_corpus_profile

    empty = spark.createDataFrame([], "doc_id long, text string")
    got = {
        r["metric"]: r["value"]
        for r in text_corpus_profile(empty).collect()
    }
    assert got["n_docs"] == 0.0
    assert got["words_p50"] is None
    assert got["avg_words"] is None


# ------------------------------------------------------------ drift faces


def test_profile_drift_deltas_and_schema_drift(spark):
    from pyspark.sql import functions as F

    from haplorec_spark.operators.profiling import (
        profile_drift,
        profile_table,
    )

    a = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, None)], "id int, s string"
    )
    b = spark.createDataFrame(
        [(1, "x"), (2, None), (3, None), (4, None)],
        "id int, s string",
    ).withColumn("extra", F.lit(1))
    d = profile_drift(
        profile_table(a, exact=True), profile_table(b, exact=True)
    )
    rows = {(r["column"], r["metric"]): r for r in d.collect()}
    nf = rows[("s", "null_fraction")]
    assert float(nf["before"]) == 1 / 3 or abs(
        float(nf["before"]) - round(1 / 3, 6)
    ) < 1e-9
    assert float(nf["after"]) == 0.75
    assert abs(nf["delta"] - round(0.75 - round(1 / 3, 6), 6)) < 1e-9
    nr = rows[("id", "n_rows")]
    assert (float(nr["before"]), float(nr["after"])) == (3.0, 4.0)
    assert nr["delta"] == 1.0 and abs(nr["rel_change"] - 0.333333) < 1e-6
    # column only in the after profile: before side null (schema drift)
    ex = rows[("extra", "n_rows")]
    assert ex["before"] is None and float(ex["after"]) == 4.0
    # min/max compared as strings, numeric deltas null
    mm = rows[("s", "max_value")]
    assert (mm["before"], mm["after"]) == ("y", "x")
    assert mm["delta"] is None
    # identical profiles -> all numeric deltas zero
    z = profile_drift(profile_table(a), profile_table(a))
    assert all(
        r["delta"] == 0.0
        for r in z.collect()
        if r["delta"] is not None
    )


def test_value_histogram_psi_hand_computed(spark):
    import math

    from haplorec_spark.operators.profiling import (
        frequent_values,
        value_histogram_psi,
    )

    a = spark.createDataFrame(
        [("u",)] * 8 + [("v",)] * 2, "c string"
    )
    b = spark.createDataFrame(
        [("u",)] * 2 + [("v",)] * 8, "c string"
    )
    fa, fb = frequent_values(a, ["c"]), frequent_values(b, ["c"])
    got = value_histogram_psi(fa, fb).collect()[0]
    # hand replica: buckets {u, v}, alpha=0.5, totals 10/10
    def p(n, tot, k=2, al=0.5):
        return (n + al) / (tot + al * k)

    want = sum(
        (p(nb, 10) - p(na, 10)) * math.log(p(nb, 10) / p(na, 10))
        for na, nb in [(8, 2), (2, 8)]
    )
    assert abs(got["psi"] - round(want, 6)) < 1e-9
    assert got["n_buckets"] == 2
    # identical histograms -> psi 0; disjoint values -> psi large
    same = value_histogram_psi(fa, fa).collect()[0]
    assert same["psi"] == 0.0
    c = spark.createDataFrame([("w",)] * 10, "c string")
    disj = value_histogram_psi(fa, frequent_values(c, ["c"])).collect()[0]
    assert disj["psi"] > 1.0


def test_psi_null_buckets_are_null_safe(spark):
    """A column with the SAME null rate in both snapshots must score
    ~0 PSI — NULL is one bucket, not two one-sided phantoms."""
    from haplorec_spark.operators.profiling import (
        frequent_values,
        value_histogram_psi,
    )

    a = spark.createDataFrame(
        [("u",)] * 5 + [(None,)] * 5, "c string"
    )
    b = spark.createDataFrame(
        [("u",)] * 5 + [(None,)] * 5, "c string"
    )
    r = value_histogram_psi(
        frequent_values(a, ["c"]), frequent_values(b, ["c"])
    ).collect()[0]
    assert r["psi"] == 0.0
    assert r["n_buckets"] == 2
    # a real null-rate shift still registers
    c = spark.createDataFrame([("u",)] * 9 + [(None,)], "c string")
    shifted = value_histogram_psi(
        frequent_values(a, ["c"]), frequent_values(c, ["c"])
    ).collect()[0]
    assert shifted["psi"] > 0.1


def test_embedding_profile_flags_corruption(spark):
    """Null vectors, NaN components, zero norms, and ragged dims each
    land in their own metric; healthy rows drive the norm stats."""
    import math

    from haplorec_spark.operators.profiling import embedding_profile

    rows = [
        (1, [3.0, 4.0]),            # norm 5
        (2, [0.0, 0.0]),            # zero norm
        (3, None),                  # null vector
        (4, [float("nan"), 1.0]),   # NaN component
        (5, [1.0, 0.0, 0.0]),       # ragged: dim 3
        (6, [float("inf"), 1.0]),   # infinite component
        (7, [None, 1.0]),           # null ELEMENT
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["metric"]: r["value"] for r in embedding_profile(df).collect()}
    assert got["n_vectors"] == 7.0
    assert got["n_null_vectors"] == 1.0
    assert got["n_nan_vectors"] == 1.0
    assert got["n_inf_vectors"] == 1.0
    assert got["n_null_element_vectors"] == 1.0
    assert got["n_zero_norm"] == 1.0
    assert got["n_distinct_dims"] == 2.0
    assert (got["min_dim"], got["max_dim"]) == (2.0, 3.0)
    assert got["max_norm"] == 5.0 and got["min_norm"] == 0.0
    # norm stats cover only the clean rows (ids 1, 2, 5)
    assert math.isclose(got["avg_norm"], round((5.0 + 0.0 + 1.0) / 3, 6))


def test_embedding_profile_healthy_table(spark):
    from haplorec_spark.operators.profiling import embedding_profile

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = {r["metric"]: r["value"] for r in embedding_profile(emb).collect()}
    assert got["n_null_vectors"] == 0.0
    assert got["n_nan_vectors"] == 0.0
    assert got["n_inf_vectors"] == 0.0
    assert got["n_null_element_vectors"] == 0.0
    assert got["n_distinct_dims"] == 1.0
    assert got["min_norm"] > 0
