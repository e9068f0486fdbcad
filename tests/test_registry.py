"""Registry hygiene — no Spark session needed.

The driver's correctness gate depends on invariants that are easy to
break silently when adding a query: every entry documented, every
oracle referencing only the pre-registered tables, and rows-only
entries kept to the genuinely non-SQL-expressible few.
"""

from __future__ import annotations

import re

from haplorec_spark.queries import TABLES, registry

#: Every registered gate now carries a DuckDB oracle (the md5-derived
#: FAKE payloads made the multimodal kernels SQL-recomputable).
KNOWN_ROWS_ONLY: set[str] = set()


def test_every_query_documented():
    for name, q in registry().items():
        assert q.doc, f"{name} has no doc string"
        assert q.fn.__doc__ or q.doc  # at least the registry doc


def test_oracles_bind_in_duckdb():
    """Every oracle must parse AND bind (tables, columns, functions)
    against the driver's pre-registered views — DuckDB's binder is the
    authority, not a regex."""
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{t}.parquet')"
        )
    for name, q in registry().items():
        if q.sql is None:
            continue
        try:
            con.execute(f"EXPLAIN {q.sql}")
        except Exception as e:  # pragma: no cover - assertion payload
            raise AssertionError(f"{name} oracle fails to bind: {e}") from e


def test_rows_only_set_is_closed():
    rows_only = {n for n, q in registry().items() if q.sql is None}
    assert rows_only == KNOWN_ROWS_ONLY, (
        "rows-only entries changed; every new query should carry a DuckDB "
        f"oracle unless genuinely non-SQL-expressible: {rows_only}"
    )


def test_registry_fits_driver_correctness_budget():
    """The driver's correctness harness checks at most 50 queries (in
    registration order); round 1 registered 52 and the last two got no
    CORRECTNESS row at all. Every registered gate must be checkable."""
    assert len(registry()) <= 50, (
        "registry exceeds the driver's 50-query correctness budget; "
        "fold the new gate into an existing one or retire a subsumed gate"
    )


def test_names_are_snake_case_and_unique():
    names = list(registry())
    assert len(names) == len(set(names))
    for n in names:
        assert re.fullmatch(r"q[0-9]*[a-z0-9_]*", n), n


#: DuckDB oracles for queries rotated OUT of the 50-entry driver budget
#: (round 5: their slots went to the round-4 operator families). They
#: stay correct via this test even though the driver no longer gates them.
ROTATED_OUT_ORACLES = {
    "q_union_distinct": """
        SELECT c_custkey FROM customer
        WHERE c_mktsegment = 'MACHINERY' AND c_acctbal > 3000
        UNION
        SELECT o_custkey AS c_custkey FROM orders
        WHERE o_totalprice > 150000
    """,
    "q_distinct_projection": "SELECT DISTINCT p_brand, p_type FROM part",
    "q_semi_join": """
        SELECT s_suppkey, s_name FROM supplier s
        WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s.s_suppkey)
    """,
    "q_large_orders": """
        SELECT o_orderkey, o_custkey, round(sum(l_quantity), 2) AS total_qty
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderkey, o_custkey
        HAVING sum(l_quantity) > 150
    """,
    "q_anti_join": """
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c.c_custkey
                            AND o_orderdate >= TIMESTAMP '1998-01-01')
    """,
    "q_first_order_per_customer": """
        SELECT o_custkey, o_orderkey, o_orderdate
        FROM (SELECT o_custkey, o_orderkey, o_orderdate,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey)
                         AS rn
              FROM orders)
        WHERE rn = 1
    """,
    "q_phenotype_normalize":
        "SELECT p_partkey, lower(p_type) AS phenotype_name FROM part",
    "q_melt_part": """
        SELECT p_partkey, key, value FROM (
            SELECT p_partkey, 'retailprice' AS key,
                   p_retailprice::DOUBLE AS value FROM part
            UNION ALL
            SELECT p_partkey, 'size' AS key, p_size::DOUBLE AS value
            FROM part)
    """,
    "q_running_revenue": """
        SELECT CAST(month AS TIMESTAMP) AS month,
               round(CAST(sum(month_rev) OVER (ORDER BY month
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                          AS DOUBLE), 2) AS running_rev
        FROM (SELECT date_trunc('month', o_orderdate) AS month,
                     sum(CAST(o_totalprice AS DECIMAL(18,2))) AS month_rev
              FROM orders GROUP BY 1)
    """,
    "q_top_supplier": """
        WITH revenue AS (
            SELECT l_suppkey,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS total_revenue
            FROM lineitem GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = l_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
}


def test_rotated_out_queries_still_match_duckdb(spark):
    import duckdb

    import haplorec_spark.queries as q

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("customer", "orders", "part", "supplier", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet')"
        )
    def norm(t):
        # float aggregates can differ in the last bits between engines
        # (sum association order); compare at oracle precision
        return tuple(
            round(x, 4) if isinstance(x, float) else x for x in t
        )

    for name, sql in ROTATED_OUT_ORACLES.items():
        got = sorted(norm(tuple(r)) for r in getattr(q, name)(spark, sf).collect())
        want = sorted(norm(tuple(t)) for t in con.execute(sql).fetchall())
        assert got == want, name
