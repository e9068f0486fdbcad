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


# ---------------------------------------------------- training-shard export


def _manifest_rows(m):
    return sorted(
        (r["shard_id"], r["n_docs"], r["n_tokens"], r["content_hash"])
        for r in m.collect()
    )


def test_shards_token_budget_vs_duckdb(spark, tmp_path):
    from haplorec_spark.operators.packing import write_training_shards

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = str(tmp_path / "shards")
    manifest = write_training_shards(docs, out, shard_tokens=4096)
    written = spark.read.parquet(out)
    assert written.count() == docs.count()
    got = sorted(
        (r["doc_id"], r["shard_id"]) for r in written.collect()
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
                              md5('shards' || chr(31) || doc_id::VARCHAR)
                                  AS key
                       FROM documents)
            SELECT doc_id,
                   ((sum(n_tokens) OVER (ORDER BY key
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - n_tokens) // 4096)::INT AS shard_id
            FROM t
            """
        ).fetchall()
    )
    assert got == want
    # manifest agrees with an independent aggregate of the export
    agg = sorted(
        tuple(r)
        for r in written.groupBy("shard_id").count().collect()
    )
    assert agg == sorted(
        (r["shard_id"], r["n_docs"]) for r in manifest.collect()
    )
    # tape cover: shard token sums hit the budget except the last shard,
    # modulo the one never-split straddling document per boundary
    by_shard = {
        r["shard_id"]: r["n_tokens"] for r in manifest.collect()
    }
    max_doc = max(
        r["n_tokens"]
        for r in spark.read.parquet(out)
        .selectExpr(
            "shard_id",
            "size(split(lower(text), ' ')) as n_tokens",
        )
        .collect()
    )
    for sid, toks in by_shard.items():
        assert toks < 4096 + max_doc


def test_shards_fixed_count_and_manifest_roundtrip(spark, tmp_path):
    from haplorec_spark.operators.packing import write_training_shards

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = str(tmp_path / "banded")
    m1 = _manifest_rows(
        write_training_shards(docs, out, n_shards=4, seed="s1")
    )
    assert {r[0] for r in m1} <= {0, 1, 2, 3}
    assert sum(r[1] for r in m1) == docs.count()
    # band assignment replays in DuckDB
    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    from haplorec_spark.operators.sampling import DUCK_BAND

    band = DUCK_BAND.format(key="'s1' || chr(31) || doc_id::VARCHAR")
    want = dict(
        con.execute(
            f"""
            SELECT ({band} % 4)::INT AS shard_id, count(*) AS n
            FROM documents GROUP BY 1
            """
        ).fetchall()
    )
    assert want == {r[0]: r[1] for r in m1}
    # determinism: re-export matches manifest exactly, incl. hashes
    m2 = _manifest_rows(
        write_training_shards(docs, out, n_shards=4, seed="s1")
    )
    assert m1 == m2
    # persisted manifest matches the returned one
    m3 = _manifest_rows(spark.read.parquet(f"{out}/_manifest"))
    assert m1 == m3


def test_shards_json_format_and_validation(spark, tmp_path):
    from haplorec_spark.operators.packing import write_training_shards

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "d e"), (3, "f")], ["doc_id", "text"]
    )
    out = str(tmp_path / "j")
    m = write_training_shards(docs, out, n_shards=2, fmt="json")
    back = spark.read.json(out)
    assert back.count() == 3
    assert sum(r["n_tokens"] for r in m.collect()) == 6
    with pytest.raises(ValueError, match="exactly one"):
        write_training_shards(docs, out)
    with pytest.raises(ValueError, match="exactly one"):
        write_training_shards(docs, out, shard_tokens=10, n_shards=2)
    with pytest.raises(ValueError, match="fmt"):
        write_training_shards(docs, out, n_shards=2, fmt="csv")
    with pytest.raises(ValueError, match="positive"):
        write_training_shards(docs, out, n_shards=0)


def _small_tokenizer(spark, docs):
    from haplorec_spark.operators.bpe import bpe_vocab, train_bpe

    merges = train_bpe(docs, n_merges=12)
    vocab = bpe_vocab(docs, merges)
    return merges, vocab


def test_pack_token_ids_vs_duckdb_tape_replay(spark):
    """The id-space tape must be the byte-exact materialization of the
    pack_sequences arithmetic: DuckDB replays md5 order -> running sum
    -> global token positions -> position//L grouping over the SAME
    per-document id arrays and must reproduce every sequence."""
    from haplorec_spark.operators.bpe import bpe_encode_ids
    from haplorec_spark.operators.packing import pack_token_ids

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(60)
    merges, vocab = _small_tokenizer(spark, docs)
    ids = bpe_encode_ids(docs, merges, vocab)
    L = 128
    got = sorted(
        (r["seq_id"], tuple(r["input_ids"]), r["n_real"])
        for r in pack_token_ids(ids, L, pad_id=None).collect()
    )
    con = duckdb.connect()
    con.register("ids_tbl", ids.toPandas())
    want = sorted(
        (int(s), tuple(v), len(v))
        for s, v in con.execute(
            f"""
            WITH t AS (SELECT doc_id, token_ids AS ids,
                              len(token_ids)::BIGINT AS n,
                              md5('pack' || chr(31) || doc_id::VARCHAR)
                                  AS key
                       FROM ids_tbl WHERE len(token_ids) > 0),
                 o AS (SELECT *,
                              sum(n) OVER (ORDER BY key
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) - n AS gs
                       FROM t),
                 flat AS (SELECT gs + i - 1 AS pos, ids[i] AS tok
                          FROM o, unnest(generate_series(1, n)) AS u(i))
            SELECT pos // {L} AS seq_id,
                   list(tok ORDER BY pos) AS input_ids
            FROM flat GROUP BY 1
            """
        ).fetchall()
        if len(v) == L  # replica keeps the partial; operator drops it
    )
    assert got == want
    assert got and all(len(v) == L for _, v, _ in got)


def test_pack_token_ids_bos_eos_pad_and_roundtrip_decode(spark):
    """bos/eos wrap every document on the tape; the padded tail keeps
    n_real honest; and decoding the concatenated sequences through the
    vocabulary reconstructs the corpus text in pack order — the proof
    a training consumer needs no re-tokenization."""
    from haplorec_spark.operators.bpe import (
        END_OF_WORD,
        bpe_encode_ids,
    )
    from haplorec_spark.operators.packing import _pack_key, pack_token_ids

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(25)
    merges, vocab = _small_tokenizer(spark, docs)
    ids = bpe_encode_ids(docs, merges, vocab)
    tok = {r["token_id"]: r["token"] for r in vocab.collect()}
    name_id = {v: k for k, v in tok.items()}
    bos, eos, pad = name_id["<bos>"], name_id["<eos>"], name_id["<pad>"]
    L = 64
    seqs = pack_token_ids(
        ids, L, bos_id=bos, eos_id=eos, pad_id=pad
    ).orderBy("seq_id")
    rows = seqs.collect()
    assert all(len(r["input_ids"]) == L for r in rows)
    # only the final sequence may carry padding, pad ids only after
    # n_real, and n_real counts exactly the non-pad prefix
    for i, r in enumerate(rows):
        body, tail = r["input_ids"][: r["n_real"]], r["input_ids"][r["n_real"]:]
        assert pad not in body
        assert all(t == pad for t in tail)
        if i < len(rows) - 1:
            assert r["n_real"] == L
    # decode: strip pad, split documents on eos, map ids -> tokens,
    # join and strip END_OF_WORD markers
    stream = [t for r in rows for t in r["input_ids"][: r["n_real"]]]
    docs_out, cur = [], []
    for t in stream:
        if t == bos:
            cur = []
        elif t == eos:
            docs_out.append("".join(tok[i] for i in cur))
        else:
            cur.append(t)
    decoded = [
        s.replace(END_OF_WORD, " ").strip() for s in docs_out
    ]
    ordered = (
        docs.withColumn("__k", _pack_key("pack", "doc_id"))
        .orderBy("__k")
        .collect()
    )
    want = [
        " ".join(w for w in r["text"].lower().split(" ") if w)
        for r in ordered
    ]
    assert decoded == want


def test_write_id_sequence_shards_manifest_and_layout(spark, tmp_path):
    from haplorec_spark.operators.packing import write_id_sequence_shards

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(40)
    merges, vocab = _small_tokenizer(spark, docs)
    path = str(tmp_path / "idshards")
    manifest = write_id_sequence_shards(
        docs,
        path,
        merges=merges,
        vocab=vocab,
        seq_len=64,
        seqs_per_shard=8,
    )
    m = manifest.collect()
    assert m
    written = spark.read.parquet(path)
    rows = written.collect()
    assert all(len(r["input_ids"]) == 64 for r in rows)
    # contiguous shard ranges: every sequence's shard is seq_id DIV 8
    assert all(r["shard_id"] == r["seq_id"] // 8 for r in rows)
    # manifest totals match what was written
    got = {r["shard_id"]: (r["n_seqs"], r["n_real_tokens"]) for r in m}
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0])
    for r in rows:
        agg[r["shard_id"]][0] += 1
        agg[r["shard_id"]][1] += r["n_real"]
    assert got == {k: tuple(v) for k, v in agg.items()}
    # persisted manifest round-trips
    saved = spark.read.parquet(f"{path}/_manifest").collect()
    assert sorted(tuple(r) for r in saved) == sorted(tuple(r) for r in m)
    # unknown special name fails fast
    import pytest as _pytest

    with _pytest.raises(ValueError, match="special"):
        write_id_sequence_shards(
            docs, path, merges=merges, vocab=vocab, seq_len=64,
            seqs_per_shard=8, bos_token="<nope>",
        )


# ------------------------------------------------- seeded shard shuffle


def test_training_shards_shuffle_salt_banded(spark, tmp_path):
    """n_shards mode under a shuffle salt: assignment is the SALTED
    band (DuckDB-replayed), deterministic per salt, different across
    salts, and the manifest records the salt."""
    from haplorec_spark.operators.packing import write_training_shards
    from haplorec_spark.operators.sampling import DUCK_BAND

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = str(tmp_path / "salted")
    m1 = write_training_shards(
        docs, out, n_shards=4, seed="s1", shuffle_salt="epoch1"
    ).collect()
    assert all(r["shuffle_salt"] == "epoch1" for r in m1)
    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    band = DUCK_BAND.format(key="'epoch1' || chr(31) || doc_id::VARCHAR")
    want = dict(
        con.execute(
            f"SELECT ({band} % 4)::INT, count(*) FROM documents GROUP BY 1"
        ).fetchall()
    )
    assert want == {r["shard_id"]: r["n_docs"] for r in m1}
    # determinism: same salt reproduces the content hashes exactly
    m2 = write_training_shards(
        docs, out, n_shards=4, seed="s1", shuffle_salt="epoch1"
    ).collect()
    assert sorted(map(tuple, m1)) == sorted(map(tuple, m2))
    # a different salt produces a different assignment
    m3 = write_training_shards(
        docs, out, n_shards=4, seed="s1", shuffle_salt="epoch2"
    ).collect()
    assert {r["shard_id"]: r["n_docs"] for r in m3} != {
        r["shard_id"]: r["n_docs"] for r in m1
    }


def test_training_shards_shuffle_salt_keeps_token_budget(spark, tmp_path):
    """shard_tokens mode: the salt permutes intra-shard ORDER only —
    shard membership (the token-budget tape cut, seeded by ``seed``)
    is identical with and without the salt."""
    from haplorec_spark.operators.packing import write_training_shards

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(60)
    base, salted = str(tmp_path / "b"), str(tmp_path / "s")
    write_training_shards(docs, base, shard_tokens=2048)
    write_training_shards(
        docs, salted, shard_tokens=2048, shuffle_salt="e1"
    )
    b = {
        r["doc_id"]: r["shard_id"]
        for r in spark.read.parquet(base).collect()
    }
    s = {
        r["doc_id"]: r["shard_id"]
        for r in spark.read.parquet(salted).collect()
    }
    assert b == s  # same membership
    # but a different on-disk row order inside at least one shard
    from haplorec_spark.operators.packing import _pack_key

    sal = spark.read.parquet(salted)
    per_file = (
        sal.selectExpr(
            "shard_id", "doc_id",
            "monotonically_increasing_id() as rid",
        )
        .orderBy("rid")
        .collect()
    )
    by_shard = {}
    for r in per_file:
        by_shard.setdefault(r["shard_id"], []).append(r["doc_id"])
    import hashlib

    def key(salt, d):
        return hashlib.md5(
            f"{salt}\x1f{d}".encode()
        ).hexdigest()

    for sid, ids in by_shard.items():
        assert ids == sorted(ids, key=lambda d: key("e1", d))


def test_id_sequence_shards_shuffle_salt(spark, tmp_path):
    """Sequence-granularity seeded shuffle: salted assignment is the
    DuckDB-replayed band over seq_id, intra-shard order the salted
    md5, content identical to the unsalted export (same sequences,
    permuted placement), deterministic per salt."""
    from haplorec_spark.operators.packing import write_id_sequence_shards
    from haplorec_spark.operators.sampling import DUCK_BAND

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(40)
    merges, vocab = _small_tokenizer(spark, docs)
    plain, salted = str(tmp_path / "p"), str(tmp_path / "s")
    write_id_sequence_shards(
        docs, plain, merges=merges, vocab=vocab, seq_len=64,
        seqs_per_shard=8,
    )
    m1 = write_id_sequence_shards(
        docs, salted, merges=merges, vocab=vocab, seq_len=64,
        seqs_per_shard=8, shuffle_salt="epoch1",
    ).collect()
    assert all(r["shuffle_salt"] == "epoch1" for r in m1)
    p_rows = spark.read.parquet(plain).collect()
    s_rows = spark.read.parquet(salted).collect()
    # same sequences, same content — only placement differs
    assert sorted(
        (r["seq_id"], tuple(r["input_ids"])) for r in p_rows
    ) == sorted((r["seq_id"], tuple(r["input_ids"])) for r in s_rows)
    n_seqs = len(p_rows)
    n_shards = -(-n_seqs // 8)
    con = duckdb.connect()
    con.register(
        "seqs",
        __import__("pandas").DataFrame(
            {"seq_id": [r["seq_id"] for r in p_rows]}
        ),
    )
    band = DUCK_BAND.format(key="'epoch1' || chr(31) || seq_id::VARCHAR")
    want = dict(
        con.execute(
            f"SELECT ({band} % {n_shards})::INT, count(*) "
            "FROM seqs GROUP BY 1"
        ).fetchall()
    )
    got = {}
    for r in s_rows:
        got[r["shard_id"]] = got.get(r["shard_id"], 0) + 1
    assert got == want
    # determinism: re-export reproduces the manifest content hashes
    m2 = write_id_sequence_shards(
        docs, salted, merges=merges, vocab=vocab, seq_len=64,
        seqs_per_shard=8, shuffle_salt="epoch1",
    ).collect()
    assert sorted(map(tuple, m1)) == sorted(map(tuple, m2))


def test_pack_sequences_script_accounting_cjk(spark):
    """Round 9: under whitespace accounting a zh document is ONE tape
    token (a 30-char doc budgeted as 1); script accounting counts its
    segmented words. DuckDB-replayed via the shared segmentation
    twin."""
    import duckdb
    import pandas as pd

    from haplorec_spark.operators.packing import pack_sequences
    from haplorec_spark.operators.text import _duck_words_sql

    rows = [
        (0, "我们的房子很大冬天的水很冷"),
        (1, "the house is big"),
        (2, "บ้านของเราใหญ่"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ws_counts = {
        r["doc_id"]: r["n_tokens"]
        for r in pack_sequences(docs, 64).collect()
    }
    assert ws_counts == {0: 1, 1: 4, 2: 1}  # the hole
    got = sorted(
        (r["doc_id"], r["n_tokens"], r["global_start"])
        for r in pack_sequences(
            docs, 64, segmentation="script"
        ).collect()
    )
    assert {d: n for d, n, _ in got} == {0: 13, 1: 4, 2: len("บ้านของเราใหญ่")}
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(
        {"doc_id": [i for i, _ in rows], "text": [t for _, t in rows]}
    ))
    ws = _duck_words_sql("text")
    want = sorted(
        tuple(r)
        for r in con.execute(
            f"""
            WITH t AS (SELECT doc_id, len({ws})::BIGINT AS n_tokens,
                              md5('pack' || chr(31) || doc_id::VARCHAR)
                                  AS key
                       FROM documents)
            SELECT doc_id, n_tokens,
                   (sum(n_tokens) OVER (ORDER BY key
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        - n_tokens)::BIGINT AS global_start
            FROM t
            """
        ).fetchall()
    )
    assert got == want


# --------------------------------------- crawl provenance (round 10)

from pyspark.sql import functions as F  # noqa: E402


def test_training_shards_carry_warc_provenance(spark, tmp_path):
    """The audit round-trip (r9 verdict #5): WARC fixture ->
    curate_documents -> write_training_shards -> every exported row
    recovers its (source_file, record_offset) crawl record."""
    from haplorec_spark.curation import CurationConfig, curate_documents
    from haplorec_spark.operators.packing import write_training_shards
    from haplorec_spark.sources import warc_source
    from tests.test_warc import WET_BYTES

    wdir = tmp_path / "w"
    wdir.mkdir()
    (wdir / "crawl.warc").write_bytes(WET_BYTES * 1)
    recs = warc_source(spark, str(wdir / "crawl.warc")).filter(
        "_corrupt_record IS NULL"
    )
    docs = recs.select(
        F.concat_ws(
            ":", F.col("source_file"), F.col("record_offset")
        ).alias("doc_id"),
        "source_file",
        "record_offset",
        "text",
    )
    curated, _ = curate_documents(
        docs, config=CurationConfig(dedup=None, languages=None)
    )
    out = str(tmp_path / "shards")
    write_training_shards(curated, out, n_shards=2)
    back = spark.read.parquet(out)
    orig = {
        (r["source_file"], r["record_offset"]): r["text"]
        for r in recs.collect()
    }
    rows = back.select("source_file", "record_offset", "text").collect()
    assert rows  # the fixture survives the default gates
    for r in rows:
        assert orig[(r["source_file"], r["record_offset"])] == r["text"]


def test_id_sequence_shards_provenance_round_trip(spark, tmp_path):
    """Token-id shards with provenance: every sequence's provenance
    array is seq_offset-sorted, its n_ids sum equals n_real, and each
    entry maps back to the source (file, offset)."""
    from haplorec_spark.operators.packing import write_id_sequence_shards

    docs = spark.createDataFrame(
        [
            (i, f"crawl-{i % 2}.warc", 100 * i,
             "the quick brown fox jumps over the lazy dog " * (1 + i % 3))
            for i in range(12)
        ],
        "doc_id long, source_file string, record_offset long, text string",
    )
    merges, vocab = _small_tokenizer(spark, docs)
    out = str(tmp_path / "seq_shards")
    write_id_sequence_shards(
        docs, out, merges=merges, vocab=vocab, seq_len=32,
        seqs_per_shard=4,
        provenance_cols=("source_file", "record_offset"),
    )
    back = spark.read.parquet(out)
    orig = {
        r["doc_id"]: (r["source_file"], r["record_offset"])
        for r in docs.collect()
    }
    n_frag_ids = 0
    for r in back.collect():
        prov = r["provenance"]
        offs = [p["seq_offset"] for p in prov]
        assert offs == sorted(offs)
        # real (unpadded) ids are exactly the fragments' ids
        assert sum(p["n_ids"] for p in prov) == r["n_real"]
        n_frag_ids += sum(p["n_ids"] for p in prov)
        for p in prov:
            d = p["doc"]
            assert orig[d["doc_id"]] == (
                d["source_file"], d["record_offset"]
            )
    # every document's every token is attributed exactly once
    from haplorec_spark.operators.bpe import bpe_encode_ids

    total = (
        bpe_encode_ids(docs, merges, vocab)
        .agg(F.sum("n_tokens"))
        .first()[0]
    )
    assert n_frag_ids == total + 2 * 12  # + bos/eos per document


def test_provenance_adds_zero_exchanges(spark):
    """The provenance columns must ride the existing tape join and
    seq aggregate — identical Exchange count with and without."""
    from haplorec_spark.operators.packing import pack_token_ids

    docs_ids = spark.createDataFrame(
        [(i, list(range(5)), f"f{i}.warc", i * 10) for i in range(8)],
        "doc_id long, token_ids array<int>, source_file string, "
        "record_offset long",
    )

    def n_exchanges(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count("Exchange")

    plain = pack_token_ids(docs_ids, 8, pad_id=0)
    prov = pack_token_ids(
        docs_ids, 8, pad_id=0,
        provenance_cols=("source_file", "record_offset"),
    )
    assert n_exchanges(prov) == n_exchanges(plain)
    assert "provenance" in prov.columns and "provenance" not in plain.columns
