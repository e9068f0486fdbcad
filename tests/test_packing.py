"""Sequence-packing tests: invariants on real testdata, a DuckDB
replay of the two-phase global running sum, and boundary goldens.
"""

from __future__ import annotations

import duckdb
import pytest

from haplorec_spark.operators.packing import pack_sequences

SF_DIR = "/root/testdata/sf0.001"


def test_pack_tape_invariants(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    packed = pack_sequences(docs, 512).collect()
    assert len(packed) == docs.count()
    total = sum(r["n_tokens"] for r in packed)
    # starts are a permutation-free exact cover of the tape: sorted
    # starts chain head-to-tail with no gaps or overlaps
    rows = sorted(packed, key=lambda r: r["global_start"])
    pos = 0
    for r in rows:
        assert r["global_start"] == pos
        assert r["seq_id"] == pos // 512
        assert r["seq_offset"] == pos % 512
        assert r["seq_id_end"] == (pos + max(r["n_tokens"], 1) - 1) // 512
        pos += r["n_tokens"]
    assert pos == total


def test_pack_deterministic_across_partitionings(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = sorted(tuple(r) for r in pack_sequences(docs, 128).collect())
    b = sorted(
        tuple(r)
        for r in pack_sequences(
            docs.repartition(7), 128, num_partitions=3
        ).collect()
    )
    assert a == b


def test_pack_vs_duckdb(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = sorted(
        (r["doc_id"], r["n_tokens"], r["global_start"], r["seq_id"])
        for r in pack_sequences(docs, 256).collect()
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
            WITH t AS (SELECT doc_id,
                              len(string_split(lower(text), ' '))::BIGINT
                                  AS n_tokens,
                              md5('pack' || chr(31) || doc_id::VARCHAR)
                                  AS key
                       FROM documents)
            SELECT doc_id, n_tokens,
                   sum(n_tokens) OVER (ORDER BY key
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - n_tokens AS global_start,
                   (sum(n_tokens) OVER (ORDER BY key
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - n_tokens) // 256 AS seq_id
            FROM t
            """
        ).fetchall()
    )
    assert got == want


def test_pack_precomputed_token_column(spark):
    df = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 100)], ["doc_id", "tok"]
    )
    packed = {
        r["doc_id"]: r
        for r in pack_sequences(df, 128, token_col="tok").collect()
    }
    starts = sorted(r["global_start"] for r in packed.values())
    assert starts == [0, 100, 200]
    # the doc starting at 100 crosses the 128-token boundary
    crossing = [
        r for r in packed.values() if r["global_start"] == 100
    ][0]
    assert (crossing["seq_id"], crossing["seq_id_end"]) == (0, 1)


def test_pack_rejects_bad_seq_len(spark):
    df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        pack_sequences(df, 0)
