"""URL / domain curation operator tests (operators/web.py).

Parsing and canonicalization are cross-checked against DuckDB string
SQL (engine-independent oracles); the per-domain cap against a
single-window replica, plus its two-phase invariance and determinism
contracts.
"""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F

from haplorec_spark.operators.web import (
    canonicalize_urls,
    cap_per_domain,
    filter_blocked_domains,
    parse_urls,
)

SF = "/root/testdata/sf0.001"

EDGE_URLS = [
    # (url, scheme, host, registered_domain, path, query)
    ("https://www.Example.COM:443/A/b?x=1&y=2",
     "https", "www.example.com", "example.com", "/A/b", "x=1&y=2"),
    ("http://user:pw@news.BBC.co.uk:8080/story?id=9#frag",
     "http", "news.bbc.co.uk", "bbc.co.uk", "/story", "id=9"),
    ("ftp://files.example.org/pub/",
     "ftp", "files.example.org", "example.org", "/pub/", ""),
    ("https://localhost/x", "https", "localhost", "localhost", "/x", ""),
    ("not a url at all", "", "", "", "", ""),
]


@pytest.fixture(scope="module")
def edge_df(spark):
    return spark.createDataFrame(
        [(i, u[0]) for i, u in enumerate(EDGE_URLS)], ["id", "url"]
    )


def test_parse_urls_edges(spark, edge_df):
    got = {
        r["id"]: (r["scheme"], r["host"], r["registered_domain"],
                  r["path"], r["query"])
        for r in parse_urls(edge_df).collect()
    }
    for i, (_, *want) in enumerate(EDGE_URLS):
        assert got[i] == tuple(want), (i, got[i], want)


CANON_CASES = [
    # fragment + case + default port + tracking params
    ("HTTPS://WWW.Example.COM:443/Path?utm_source=a&q=1&utm_medium=b#top",
     "https://www.example.com/Path?q=1"),
    # default port only strips for the matching scheme
    ("http://a.com:443/x", "http://a.com:443/x"),
    ("http://a.com:80/x", "http://a.com/x"),
    # tracking-only query drops the '?'
    ("https://a.com/x?gclid=z123", "https://a.com/x"),
    # param order is preserved, non-tracking 'refresh' stays
    ("https://a.com/x?b=2&a=1&refresh=0", "https://a.com/x?b=2&a=1&refresh=0"),
    # no scheme: only the fragment rule applies
    ("www.a.com/x?utm_source=1#f", "www.a.com/x?utm_source=1"),
]


def test_canonicalize_rules(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(CANON_CASES)], ["id", "url"]
    )
    got = {
        r["id"]: r["url"] for r in canonicalize_urls(df, "url").collect()
    }
    for i, (_, want) in enumerate(CANON_CASES):
        assert got[i] == want, (i, got[i], want)


def test_canonicalize_matches_duckdb_on_corpus(spark):
    """Full chain vs an independent DuckDB replica on synthetic URLs
    derived from the documents table (the gate's construction)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    urls = docs.select(
        "doc_id",
        F.concat(
            F.lit("HTTP://"), F.upper("source"),
            F.lit(".Example.co.uk:80/d/"), F.col("doc_id").cast("string"),
            F.lit("?utm_source=s&keep="), F.col("doc_id").cast("string"),
            F.lit("&fbclid=f#x"),
        ).alias("url"),
    )
    out = parse_urls(canonicalize_urls(urls, "url"), "url")
    got = sorted(
        (r["doc_id"], r["url"], r["host"], r["registered_domain"])
        for r in out.collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    want = sorted(
        tuple(t)
        for t in con.execute(
            """
            SELECT doc_id,
                   'http://' || lower(source) || '.example.co.uk/d/'
                       || doc_id::VARCHAR || '?keep=' || doc_id::VARCHAR,
                   lower(source) || '.example.co.uk',
                   'example.co.uk'
            FROM documents
            """
        ).fetchall()
    )
    assert got == want


def _priority(seed: str, *vals) -> str:
    key = "\x1f".join([seed] + [str(v) for v in vals])
    return hashlib.md5(key.encode()).hexdigest()


@pytest.fixture(scope="module")
def domain_docs(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return docs.select(
        "doc_id", F.col("source").alias("registered_domain")
    )


def test_cap_matches_single_window_replica(domain_docs):
    got = sorted(
        r["doc_id"] for r in cap_per_domain(domain_docs, 3, ["doc_id"]).collect()
    )
    by_dom: dict[str, list] = {}
    for r in domain_docs.collect():
        by_dom.setdefault(r["registered_domain"], []).append(r["doc_id"])
    want = sorted(
        d
        for ids in by_dom.values()
        for d in sorted(ids, key=lambda d: (_priority("domain_cap", d), d))[:3]
    )
    assert got == want and len(got) > 0


def test_cap_invariant_to_salt_buckets(domain_docs):
    a = sorted(
        r["doc_id"]
        for r in cap_per_domain(
            domain_docs, 4, ["doc_id"], salt_buckets=1
        ).collect()
    )
    b = sorted(
        r["doc_id"]
        for r in cap_per_domain(
            domain_docs, 4, ["doc_id"], salt_buckets=64
        ).collect()
    )
    assert a == b


def test_cap_stable_under_unrelated_appends(spark, domain_docs):
    before = {
        r["doc_id"]
        for r in cap_per_domain(domain_docs, 3, ["doc_id"]).collect()
        if r["registered_domain"] != "newdomain"
    }
    extra = spark.createDataFrame(
        [(10_000 + i, "newdomain") for i in range(10)],
        ["doc_id", "registered_domain"],
    )
    after = {
        r["doc_id"]
        for r in cap_per_domain(
            domain_docs.unionByName(extra), 3, ["doc_id"]
        ).collect()
        if r["registered_domain"] != "newdomain"
    }
    assert before == after


def test_blocklist_list_and_frame_forms_agree(spark, domain_docs):
    doms = [r["registered_domain"]
            for r in domain_docs.select("registered_domain")
            .distinct().limit(2).collect()]
    via_list = sorted(
        r["doc_id"]
        for r in filter_blocked_domains(domain_docs, doms).collect()
    )
    bl = spark.createDataFrame([(d,) for d in doms], ["domain"])
    via_frame = sorted(
        r["doc_id"]
        for r in filter_blocked_domains(domain_docs, bl).collect()
    )
    assert via_list == via_frame
    assert 0 < len(via_list) < domain_docs.count()
