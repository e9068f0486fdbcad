"""Dedup operator unit tests beyond the oracle gate: the
document-frequency cut and banding recall guarantees."""

from __future__ import annotations

import pytest

from haplorec_spark.operators.dedup import (
    lsh_candidate_pairs,
    ngram_jaccard_pairs,
    simhash_near_duplicates,
    word_shingles,
)
from tests.conftest import rows


@pytest.fixture(scope="module")
def docs(spark):
    boiler = "terms of service apply here"
    return spark.createDataFrame(
        [
            (1, f"the quick brown fox jumps {boiler}"),
            (2, f"the quick brown fox leaps {boiler}"),
            (3, f"completely unrelated text body {boiler}"),
            (4, "the quick brown fox jumps today"),
        ],
        "doc_id long, text string",
    )


def test_doc_freq_cut_drops_boilerplate_shingles(spark, docs):
    full = word_shingles(docs).count()
    # boilerplate appears in 3/4 docs; cut at 50% document frequency
    pruned = ngram_jaccard_pairs(
        docs, threshold=0.0, max_doc_freq=0.5
    )
    # shingles in >2 of 4 docs are cut: the boilerplate tail (docs
    # 1,2,3) and the shared "the quick brown ..." prefix (docs 1,2,4)
    # both vanish, leaving only the jumps-specific 1-4 overlap
    got = rows(pruned, "doc_id_a", "doc_id_b")
    assert got == [(1, 4)]
    assert full > 0


def test_jaccard_without_cut_keeps_boilerplate_pairs(spark, docs):
    got = ngram_jaccard_pairs(docs, threshold=0.0)
    ids = {i for r in got.collect() for i in (r.doc_id_a, r.doc_id_b)}
    assert 3 in ids


def test_lsh_candidates_include_exact_duplicates(spark):
    text = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame(
        [(1, text), (2, text), (3, "other words entirely different here ok")],
        "doc_id long, text string",
    )
    got = rows(lsh_candidate_pairs(df))
    assert (1, 2) in got  # identical docs always share every band


def test_simhash_identical_docs_distance_zero(spark):
    text = "alpha beta gamma delta"
    df = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id long, text string"
    )
    got = rows(simhash_near_duplicates(df))
    assert got == [(1, 2, 0)]


def test_dedup_clusters_connected_components(spark):
    from haplorec_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        # chain 1-2-3-4, pair 10-11, singleton via self-contained pair 20-21
        [(1, 2), (2, 3), (3, 4), (10, 11), (21, 20)],
        "doc_id_a long, doc_id_b long",
    )
    got = rows(dedup_clusters(pairs))
    assert got == [
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20),
    ]


def test_dedup_clusters_long_chain_converges(spark):
    from pyspark.sql import functions as F

    from haplorec_spark.operators.dedup import dedup_clusters

    n = 40  # longest chain: 0-1-2-...-39
    pairs = spark.range(n - 1).select(
        F.col("id").alias("doc_id_a"), (F.col("id") + 1).alias("doc_id_b")
    )
    got = rows(dedup_clusters(pairs))
    assert got == [(i, 0) for i in range(n)]


def test_dedup_clusters_paths_agree(spark):
    """The driver union-find (small graphs) and the iterative
    distributed path must label identically — force the distributed
    path with small_edge_limit=0 and compare on a branchy graph."""
    from haplorec_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (21, 20),
         (5, 9), (9, 7), (7, 6), (6, 5),      # cycle 5-9-7-6
         (100, 3)],                            # merges into chain
        "doc_id_a long, doc_id_b long",
    )
    small = rows(dedup_clusters(pairs))
    dist = rows(dedup_clusters(pairs, small_edge_limit=0))
    assert small == dist
    # component minima are the canonical ids
    assert (100, 1) in small and (9, 5) in small


def test_incremental_lsh_store_roundtrip(spark, tmp_path):
    """Drop 1 seeds the store; drop 2 contains an exact copy of a
    stored doc, a new near-dup pair, and a novel doc — the incremental
    join must find exactly the right matches without the old corpus."""
    from haplorec_spark.operators.dedup import (
        incremental_candidate_pairs,
        lsh_candidate_pairs,
        write_lsh_store,
    )

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    drop1 = spark.createDataFrame(
        [(1, base), (2, "totally unrelated words about completely other "
                        "topics nothing shared with anything here at all "
                        "whatsoever in any shingle")],
        "doc_id long, text string",
    )
    store = str(tmp_path / "lsh_store")
    write_lsh_store(drop1, store, mode="overwrite")

    drop2 = spark.createDataFrame(
        [
            (10, base),                      # exact copy of stored doc 1
            (11, base + " extra tail"),      # near-dup of 1 and of 10
            (12, "fresh novel content with entirely distinct vocabulary "
                 "spanning many unique tokens never seen before anywhere "
                 "in any previous drop of this corpus"),
        ],
        "doc_id long, text string",
    )
    got = sorted(
        (r["doc_id_new"], r["doc_id_matched"], r["source"])
        for r in incremental_candidate_pairs(drop2, store).collect()
    )
    assert (10, 1, "history") in got
    assert (11, 1, "history") in got
    assert (11, 10, "batch") in got
    assert all(t[0] != 12 for t in got)  # the novel doc matches nothing

    # parity: history matches == what a full-corpus self-join would
    # pair across the drops
    full = lsh_candidate_pairs(drop1.unionByName(drop2))
    cross = sorted(
        (r["doc_id_b"], r["doc_id_a"])
        for r in full.collect()
        if r["doc_id_a"] <= 2 and r["doc_id_b"] >= 10
    )
    hist = sorted((a, b) for a, b, s in got if s == "history")
    assert hist == cross


def test_incremental_hash_store_roundtrip(spark, tmp_path):
    """Exact-dedup twin of the LSH store: drop 2 carries a copy of a
    stored doc and an in-batch duplicate pair; near-dups must NOT match
    (exact means exact)."""
    from haplorec_spark.operators.dedup import (
        incremental_exact_duplicates,
        write_hash_store,
    )

    drop1 = spark.createDataFrame(
        [(1, "stored content one"), (2, "stored content two")],
        "doc_id long, text string",
    )
    store = str(tmp_path / "hash_store")
    write_hash_store(drop1, store, mode="overwrite")

    drop2 = spark.createDataFrame(
        [
            (10, "stored content one"),    # exact copy of stored doc 1
            (11, "stored content one x"),  # near-dup only -> no match
            (12, "batch local twin"),
            (13, "batch local twin"),      # in-batch exact duplicate
        ],
        "doc_id long, text string",
    )
    got = sorted(
        (r["doc_id_new"], r["doc_id_matched"], r["source"])
        for r in incremental_exact_duplicates(drop2, store).collect()
    )
    assert got == [(10, 1, "history"), (13, 12, "batch")]


@pytest.mark.parametrize("max_bc", [2_000_000, 0])
def test_duplicate_ngram_spans_golden(spark, max_bc):
    """Two docs share an 8-word passage at different offsets; the span
    detector must report exactly the covered word ranges, merging the
    overlapping duplicated 4-grams into one island per doc.
    max_bc=0 forces the measured-bound shuffle-join fallback; both
    paths must return identical rows."""
    from haplorec_spark.operators.dedup import duplicate_ngram_spans

    shared = "one two three four five six seven eight"
    docs = spark.createDataFrame(
        [
            (1, f"intro words here {shared} tail a"),
            (2, f"{shared} completely different ending text"),
            (3, "no duplicated passage in this document at all"),
        ],
        "doc_id long, text string",
    )
    got = rows(
        duplicate_ngram_spans(docs, n=4, min_df=2, max_broadcast_grams=max_bc)
    )
    # doc 1: shared passage occupies word indices 3..10
    # doc 2: indices 0..7
    assert got == [(1, 3, 10), (2, 0, 7)]


@pytest.mark.parametrize("max_bc", [2_000_000, 0])
def test_strip_duplicate_ngram_spans_golden(spark, max_bc):
    from haplorec_spark.operators.dedup import strip_duplicate_ngram_spans

    shared = "one two three four five six seven eight"
    docs = spark.createDataFrame(
        [
            (1, f"intro words here {shared} tail a"),
            (2, f"{shared} completely different ending text"),
            (3, "no duplicated passage in this document at all"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["text_clean"], r["n_words"], r["n_removed"])
        for r in strip_duplicate_ngram_spans(
            docs, n=4, min_df=2, max_broadcast_grams=max_bc
        ).collect()
    }
    assert got[1] == ("intro words here tail a", 13, 8)
    assert got[2] == ("completely different ending text", 12, 8)
    assert got[3] == ("no duplicated passage in this document at all", 8, 0)


def test_duplicate_ngram_spans_vs_duckdb(spark):
    """Cross-check span detection on the real corpus with seeded shared
    passages (testdata docs share few natural 10-grams)."""
    import duckdb

    from pyspark.sql import functions as F

    from haplorec_spark.operators.dedup import duplicate_ngram_spans

    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # every 4th doc gets the same 12-word passage appended
    docs = base.select(
        "doc_id",
        F.expr(
            "CASE WHEN doc_id % 4 = 0 THEN concat(text,"
            " ' shared passage alpha beta gamma delta epsilon zeta eta"
            " theta iota kappa') ELSE text END"
        ).alias("text"),
    )
    got = rows(duplicate_ngram_spans(docs, n=10, min_df=2))
    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    want = sorted(
        tuple(t)
        for t in con.execute(
            """
    WITH d AS (SELECT doc_id,
                      CASE WHEN doc_id % 4 = 0 THEN text ||
                           ' shared passage alpha beta gamma delta epsilon'
                           || ' zeta eta theta iota kappa'
                      ELSE text END AS text
               FROM documents),
         w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM d),
         g AS (SELECT doc_id, u.pos, u.h FROM (
                   SELECT doc_id,
                          unnest(list_apply(
                              range(0, greatest(len(ws) - 10, -1) + 1),
                              i -> {'pos': i,
                                    'h': md5(array_to_string(
                                             ws[i + 1: i + 10], ' '))}))
                              AS u
                   FROM w)),
         hot AS (SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS df
                                FROM g GROUP BY h) WHERE df >= 2),
         s AS (SELECT doc_id, pos FROM g WHERE h IN (SELECT h FROM hot)),
         isl AS (SELECT doc_id, pos,
                        sum(CASE WHEN prev_end IS NULL
                                  OR pos > prev_end + 1 THEN 1 ELSE 0 END)
                            OVER (PARTITION BY doc_id ORDER BY pos)
                            AS island
                 FROM (SELECT doc_id, pos,
                              max(pos + 9) OVER (PARTITION BY doc_id
                                  ORDER BY pos ROWS BETWEEN UNBOUNDED
                                  PRECEDING AND 1 PRECEDING) AS prev_end
                       FROM s))
    SELECT doc_id, min(pos) AS span_start, max(pos + 9) AS span_end
    FROM isl GROUP BY doc_id, island
    """
        ).fetchall()
    )
    assert got == want
    assert len(got) > 0  # the seeded passages were detected


def test_duplicate_ngram_spans_short_docs(spark):
    """Documents shorter than n words contribute no n-grams and pass
    through removal untouched — regression: sequence(0, size-n)
    auto-reverses for short docs and crashed slice() under ANSI."""
    from haplorec_spark.operators.dedup import (
        duplicate_ngram_spans,
        strip_duplicate_ngram_spans,
    )

    docs = spark.createDataFrame(
        [(1, "tiny doc"), (2, "also quite short"), (3, "x")],
        "doc_id long, text string",
    )
    assert duplicate_ngram_spans(docs, n=5, min_df=2).count() == 0
    got = {
        r["doc_id"]: (r["text_clean"], r["n_removed"])
        for r in strip_duplicate_ngram_spans(docs, n=5, min_df=2).collect()
    }
    assert got == {
        1: ("tiny doc", 0), 2: ("also quite short", 0), 3: ("x", 0)
    }


def test_verify_jaccard_pairs_kills_false_positive_candidates(spark):
    """A band-colliding pair with true Jaccard 0.5 (deterministic md5
    construction: 20 shared words + 18-word tail) must be dropped by
    the verification pass at threshold 0.8 and kept at 0.4."""
    from pyspark.sql import functions as F

    from haplorec_spark.operators.dedup import (
        lsh_candidate_pairs,
        verify_jaccard_pairs,
    )

    a = " ".join(f"alpha{i}" for i in range(20))
    b = a + " " + " ".join(f"tail6x{j}" for j in range(18))
    docs = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id long, text string"
    )
    cands = lsh_candidate_pairs(docs).select(
        F.col("doc_id_b").alias("doc_id_new"),
        F.col("doc_id_a").alias("doc_id_matched"),
    )
    assert cands.count() == 1  # the construction does band-collide

    kept_hi = verify_jaccard_pairs(
        cands, docs, docs, threshold=0.8
    ).collect()
    assert kept_hi == []  # false positive killed

    kept_lo = verify_jaccard_pairs(cands, docs, docs, threshold=0.4).collect()
    assert [(r["doc_id_new"], r["doc_id_matched"], r["jaccard"])
            for r in kept_lo] == [(2, 1, 0.5)]


def test_cluster_size_profile_vs_duckdb(spark):
    """The size histogram over real LSH clusters matches a DuckDB
    two-level aggregate on the same (doc, canonical) labels."""
    import duckdb

    from haplorec_spark.operators.dedup import (
        cluster_size_profile,
        dedup_clusters,
        lsh_candidate_pairs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    labels = dedup_clusters(lsh_candidate_pairs(docs)).collect()
    prof = sorted(
        tuple(r)
        for r in cluster_size_profile(
            spark.createDataFrame(labels)
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE labels (doc_id BIGINT, canonical_id BIGINT)")
    con.executemany(
        "INSERT INTO labels VALUES (?, ?)",
        [(r["doc_id"], r["canonical_id"]) for r in labels],
    )
    want = sorted(
        tuple(t)
        for t in con.execute(
            """
        SELECT cluster_size, count(*) AS n_clusters,
               cluster_size * count(*) AS n_docs,
               (cluster_size - 1) * count(*) AS n_dropped
        FROM (SELECT canonical_id, count(*) AS cluster_size
              FROM labels GROUP BY canonical_id)
        GROUP BY cluster_size
        """
        ).fetchall()
    )
    assert prof == want
    # every label row is accounted for exactly once
    assert sum(r[2] for r in prof) == len(labels)


# ------------------------------------------- space-free scripts (round 9)


def test_cjk_near_dup_needs_script_segmentation(spark):
    """Review of round-9 scope: under the whitespace split a
    space-free-script document is ONE word — zero n>=2 shingles, zero
    band keys — so MinHash-LSH and n-gram Jaccard were BLIND to CJK
    near-copies. segmentation="script" shingles the per-character
    stream and finds them; the whitespace mode's miss is pinned as
    the non-vacuity arm."""
    from haplorec_spark.operators.dedup import (
        lsh_candidate_pairs,
        ngram_jaccard_pairs,
        word_shingles,
    )

    a = "我们的房子很大冬天的水很冷孩子们在学校读书我们一起去看朋友"
    b = a + "他说今天天气很好"          # near-copy: shared long prefix
    c = "แมวนอนหลับอยู่ในครัวและเด็กอ่านหนังสือ"  # unrelated thai
    docs = spark.createDataFrame(
        [(0, a), (1, b), (2, c)], "doc_id long, text string"
    )
    # whitespace mode: no shingles at all for any of these docs
    assert word_shingles(docs, 3).count() == 0
    assert lsh_candidate_pairs(docs).count() == 0
    # script mode: the zh pair is found, the thai doc stays unpaired
    pairs = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in lsh_candidate_pairs(
            docs, segmentation="script"
        ).collect()
    }
    assert pairs == {(0, 1)}
    jac = {
        (r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            docs, threshold=0.5, segmentation="script"
        ).collect()
    }
    assert set(jac) == {(0, 1)} and jac[(0, 1)] >= 0.5


def test_cjk_script_shingles_match_duckdb(spark):
    """Script-mode shingles replay in DuckDB from the shared
    segmentation twin (_duck_words_sql) — the word_shingles oracle
    convention extended to the segmented stream."""
    import duckdb
    import pandas as pd

    from haplorec_spark.operators.dedup import word_shingles
    from haplorec_spark.operators.text import _duck_words_sql

    rows = [
        (0, "我们的房子很大"),
        (1, "the house is big and warm today"),
        (2, "  double  spaced   latin text here  "),
        (3, "บ้านของเรา"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["shingle"])
        for r in word_shingles(
            docs, 3, segmentation="script"
        ).collect()
    )
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {"doc_id": [i for i, _ in rows], "text": [t for _, t in rows]}
        ),
    )
    ws = _duck_words_sql("text")
    want = sorted(
        tuple(r)
        for r in con.execute(
            f"""
            SELECT DISTINCT doc_id, shingle FROM (
                SELECT doc_id,
                       unnest(CASE WHEN len({ws}) >= 3
                              THEN list_transform(
                                  generate_series(1, len({ws}) - 2),
                                  i -> {ws}[i] || ' ' || {ws}[i+1]
                                       || ' ' || {ws}[i+2])
                              ELSE []::VARCHAR[] END) AS shingle
                FROM documents)
            """
        ).fetchall()
    )
    assert got == want


def test_curation_near_dedup_script_mode_drops_cjk_copy(spark):
    """Composition: curate_documents(dedup='near',
    segmentation='script') keeps one of two zh near-copies — the same
    config under whitespace keeps both (the hole this closes)."""
    from haplorec_spark.curation import CurationConfig, curate_documents

    zh = "我们的房子很大冬天的水很冷孩子们在学校读书我们一起去看朋友"
    rows = [(0, zh), (1, zh + "他说今天天气很好"),
            (2, "the house is big and the water is cold in the winter")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    base = dict(
        languages=None, min_quality=0.0, redact=False, dedup="near",
        max_dup_word_fraction=1.1, max_top_word_fraction=1.1,
    )
    kept_script, _ = curate_documents(
        docs, config=CurationConfig(segmentation="script", **base)
    )
    assert {r["doc_id"] for r in kept_script.collect()} == {0, 2}
    kept_ws, _ = curate_documents(docs, config=CurationConfig(**base))
    assert {r["doc_id"] for r in kept_ws.collect()} == {0, 1, 2}


def test_lsh_store_segmentation_marker(spark, tmp_path):
    """Round-9 review follow-up: a store's band keys hash the
    shingles of ONE segmentation mode; cross-mode queries silently
    match nothing. The store now carries a _segmentation marker:
    same-mode round trips work, cross-mode reads/writes raise, and a
    legacy (marker-less) store rejects script-mode queries."""
    import shutil

    from haplorec_spark.operators.dedup import (
        incremental_candidate_pairs,
        write_lsh_store,
    )

    zh = "我们的房子很大冬天的水很冷孩子们在学校读书我们一起去看朋友"
    docs = spark.createDataFrame(
        [(0, zh), (1, "the house is big and the water is cold today")],
        "doc_id long, text string",
    )
    newer = spark.createDataFrame(
        [(10, zh + "他说今天天气很好")], "doc_id long, text string"
    )
    path = str(tmp_path / "store")
    write_lsh_store(docs, path, segmentation="script")
    # same mode: the zh near-copy matches history
    got = incremental_candidate_pairs(
        newer, path, segmentation="script"
    ).collect()
    assert {(r["doc_id_new"], r["doc_id_matched"]) for r in got} == {
        (10, 0)
    }
    # cross-mode query raises instead of silently matching nothing
    with pytest.raises(ValueError, match="segmentation"):
        incremental_candidate_pairs(newer, path)
    # cross-mode append raises too
    with pytest.raises(ValueError, match="segmentation"):
        write_lsh_store(newer, path)
    # legacy store (no marker): whitespace queries keep working,
    # script-mode queries raise
    shutil.rmtree(f"{path}/_segmentation")
    assert (
        incremental_candidate_pairs(newer, path).count() == 0
    )  # whitespace mode: zh docs have no band keys — and no crash
    with pytest.raises(ValueError, match="predates"):
        incremental_candidate_pairs(newer, path, segmentation="script")


# ------------------------------------------------------ dedup_survivors

def _survivor_fixture(spark):
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, 5.0), (2, 9.0), (3, 7.0), (4, 1.0), (5, None)],
        "doc_id BIGINT, score DOUBLE",
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (5, 5)],
        "doc_id BIGINT, canonical_id BIGINT",
    )
    return docs, clusters


def test_survivors_keep_best_by_score(spark):
    from haplorec_spark.operators.dedup import dedup_survivors

    docs, clusters = _survivor_fixture(spark)
    kept = {
        r["doc_id"]
        for r in dedup_survivors(docs, clusters, score_col="score").collect()
    }
    # cluster {1,2,3}: doc 2 has the best score; doc 4 is in no
    # cluster (passes through); doc 5 is its own singleton cluster
    assert kept == {2, 4, 5}


def test_survivors_default_min_id_policy(spark):
    from haplorec_spark.operators.dedup import dedup_survivors

    docs, clusters = _survivor_fixture(spark)
    kept = {r["doc_id"] for r in dedup_survivors(docs, clusters).collect()}
    assert kept == {1, 4, 5}  # the canonical (min id) survives


def test_survivors_tie_breaks_to_min_id_and_null_loses(spark):
    from haplorec_spark.operators.dedup import dedup_survivors

    docs = spark.createDataFrame(
        [(1, 7.0), (2, 7.0), (3, None)], "doc_id BIGINT, score DOUBLE"
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "doc_id BIGINT, canonical_id BIGINT"
    )
    kept = {
        r["doc_id"]
        for r in dedup_survivors(docs, clusters, score_col="score").collect()
    }
    assert kept == {1}
    # all-NULL cluster still keeps exactly one (the min id)
    docs2 = spark.createDataFrame(
        [(7, None), (8, None)], "doc_id BIGINT, score DOUBLE"
    )
    clusters2 = spark.createDataFrame(
        [(7, 7), (8, 7)], "doc_id BIGINT, canonical_id BIGINT"
    )
    kept2 = {
        r["doc_id"]
        for r in dedup_survivors(docs2, clusters2, score_col="score").collect()
    }
    assert kept2 == {7}


def test_survivors_schema_and_window_group_limit(spark):
    from haplorec_spark.operators.dedup import dedup_survivors

    docs, clusters = _survivor_fixture(spark)
    out = dedup_survivors(docs, clusters, score_col="score")
    assert out.columns == ["doc_id", "score"]  # no helper columns leak
    # the rank-1 filter must reach WindowGroupLimit so each cluster
    # keeps one row map-side BEFORE the ranking shuffle
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


# ------------------------------------------------------- lsh_parameters

def test_lsh_parameters_tracks_threshold():
    from haplorec_spark.operators.dedup import lsh_parameters

    import pytest as _pytest

    # the (1/b)^(1/r) inflection must move WITH the threshold: lower
    # thresholds want more bands (easier collisions), higher want fewer
    b_lo, r_lo = lsh_parameters(0.2, 24)
    b_hi, r_hi = lsh_parameters(0.9, 24)
    assert b_lo * r_lo == 24 and b_hi * r_hi == 24
    assert b_lo > b_hi
    infl_lo = (1 / b_lo) ** (1 / r_lo)
    infl_hi = (1 / b_hi) ** (1 / r_hi)
    assert abs(infl_lo - 0.2) < 0.25 and abs(infl_hi - 0.9) < 0.25
    # weighting false negatives pushes toward easier collisions
    b_fn, _ = lsh_parameters(0.5, 24, fn_weight=5.0)
    b_bal, _ = lsh_parameters(0.5, 24)
    assert b_fn >= b_bal
    with _pytest.raises(ValueError):
        lsh_parameters(1.5, 12)
    with _pytest.raises(ValueError):
        lsh_parameters(0.5, 1)


def test_lsh_parameters_feed_candidate_pairs(spark):
    """The solver's output plugs straight into the LSH family."""
    from haplorec_spark.operators.dedup import (
        lsh_candidate_pairs,
        lsh_parameters,
    )

    b, r = lsh_parameters(0.5, 12)
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta iota"),
            (3, "completely different words entirely other content here now"),
        ],
        "doc_id BIGINT, text STRING",
    )
    pairs = lsh_candidate_pairs(docs, num_hashes=12, bands=b).collect()
    found = {(p["doc_id_a"], p["doc_id_b"]) for p in pairs}
    assert (1, 2) in found
    assert all(3 not in p for p in found)


# ------------------------------------------------ hot-bucket skew guards


def test_lsh_hot_bucket_cap_emits_star_edges(spark):
    """A mega-family of m identical documents must emit O(m) edges
    under the cap (the hub star: min id -> each member, identical
    across bands so distinct leaves exactly m-1 rows), not the
    ~bands*m^2/2 the all-pairs self-join produces — the round-9
    verdict's 100 TB scale-killer."""
    from pyspark.sql import functions as F

    m = 500
    family = spark.range(m).select(
        F.col("id").alias("doc_id"),
        F.lit("boilerplate terms of service apply to this page now").alias(
            "text"
        ),
    )
    pairs = lsh_candidate_pairs(family, hot_bucket_cap=16).collect()
    got = {(p["doc_id_a"], p["doc_id_b"]) for p in pairs}
    assert got == {(0, i) for i in range(1, m)}  # exactly the star, m-1 edges


def test_lsh_cap_below_threshold_matches_exact_join(spark):
    """Buckets at or below the cap must reproduce the exact self-join
    pair set — the grouped map-side pair generation is a plan change,
    not a semantics change, until a bucket overflows."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    exact = set(rows(lsh_candidate_pairs(docs, hot_bucket_cap=None)))
    capped = set(rows(lsh_candidate_pairs(docs, hot_bucket_cap=1024)))
    assert capped == exact


def test_lsh_cap_preserves_cluster_labels(spark):
    """Star edges and cliques span the same components: dedup_clusters
    over an aggressively capped pair set must produce IDENTICAL labels
    to the uncapped path on the real corpus (the verdict's done
    criterion)."""
    from haplorec_spark.operators.dedup import dedup_clusters

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    uncapped = rows(dedup_clusters(lsh_candidate_pairs(docs, hot_bucket_cap=None)))
    capped = rows(dedup_clusters(lsh_candidate_pairs(docs, hot_bucket_cap=2)))
    assert capped == uncapped


def test_lsh_cap_validation():
    import pytest as _pytest

    from haplorec_spark.operators.dedup import lsh_candidate_pairs as lcp

    with _pytest.raises(ValueError):
        lcp(None, hot_bucket_cap=1)


def test_simhash_collapse_star_edges_for_identical_family(spark):
    """m identical docs share one fingerprint: collapsed output is the
    m-1 hamming-0 star, not the m(m-1)/2 clique."""
    from pyspark.sql import functions as F

    m = 200
    family = spark.range(m).select(
        F.col("id").alias("doc_id"),
        F.lit("alpha beta gamma delta epsilon zeta").alias("text"),
    )
    got = rows(simhash_near_duplicates(family))
    assert got == [(0, i, 0) for i in range(1, m)]


def test_simhash_collapse_preserves_components(spark):
    """Collapsed vs literal all-pairs output must have identical
    connected components on the real corpus (identical fingerprints
    connect through the rep; cross-group pairs qualify iff their reps
    do, hamming being a function of the fingerprints alone)."""
    from haplorec_spark.operators.dedup import dedup_clusters

    docs = spark.read.parquet(
        "/root/testdata/sf0.01/documents.parquet"
    ).select("doc_id", "text")
    literal = simhash_near_duplicates(docs, collapse_identical=False)
    collapsed = simhash_near_duplicates(docs, collapse_identical=True)
    assert rows(dedup_clusters(collapsed)) == rows(dedup_clusters(literal))


def test_simhash_collapse_edges_are_true_pairs(spark):
    """Every collapsed edge must also exist in the literal pair set
    with the same hamming distance (the collapse only REMOVES
    redundant rows, it never invents or mislabels a pair)."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    literal = set(rows(simhash_near_duplicates(docs, collapse_identical=False)))
    collapsed = set(rows(simhash_near_duplicates(docs)))
    assert collapsed <= literal


def test_compact_lsh_store_parity_marker_and_files(spark, tmp_path):
    """A twice-appended batch duplicates store rows; compaction
    distincts them, leaves one file per band, preserves the
    _segmentation marker, and candidate sets are unchanged."""
    from haplorec_spark.operators.dedup import (
        compact_lsh_store,
        incremental_candidate_pairs,
        write_lsh_store,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta iota"),
        ],
        "doc_id long, text string",
    )
    store = str(tmp_path / "lsh")
    write_lsh_store(docs, store, segmentation="script")
    write_lsh_store(docs, store, segmentation="script")  # replayed batch
    n_dup = spark.read.parquet(store).count()
    newdocs = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    before = sorted(
        map(
            tuple,
            incremental_candidate_pairs(
                newdocs, store, segmentation="script"
            ).collect(),
        )
    )
    compact_lsh_store(spark, store)
    st = spark.read.parquet(store)
    assert st.count() == n_dup // 2  # exact duplicates removed
    # one file per band partition
    from collections import Counter

    per_band = Counter(f.split("band=")[1].split("/")[0]
                       for f in st.inputFiles())
    assert all(v == 1 for v in per_band.values())
    after = sorted(
        map(
            tuple,
            incremental_candidate_pairs(
                newdocs, store, segmentation="script"
            ).collect(),
        )
    )
    assert after == before  # marker survived AND candidates identical
    # cross-mode read still raises (marker really preserved)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="segmentation"):
        incremental_candidate_pairs(newdocs, store, segmentation="whitespace")


def test_compact_lsh_store_representatives_only(spark, tmp_path):
    """Store-side mega-family guard: a duplicate family collapses to
    one row per (band, band_key); an incoming copy still matches
    (drop/keep decision lossless, matched id = the representative)."""
    from pyspark.sql import functions as F

    from haplorec_spark.operators.dedup import (
        compact_lsh_store,
        incremental_candidate_pairs,
        write_lsh_store,
    )

    family = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.lit("boilerplate terms of service apply to this page").alias(
            "text"
        ),
    )
    unique = spark.createDataFrame(
        [(900, "entirely different words appear in this other document")],
        "doc_id long, text string",
    )
    store = str(tmp_path / "lsh")
    write_lsh_store(family.unionByName(unique), store)
    n_full = spark.read.parquet(store).count()
    compact_lsh_store(spark, store, representatives_only=True)
    n_rep = spark.read.parquet(store).count()
    # 4 bands x (1 family bucket + 1 unique bucket) = 8 rows
    assert n_rep == 8 and n_full == 4 * 51
    newdocs = spark.createDataFrame(
        [(1000, "boilerplate terms of service apply to this page"),
         (1001, "no overlap with anything stored here at all today")],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id_new"], r["doc_id_matched"], r["source"])
        for r in incremental_candidate_pairs(newdocs, store).collect()
    }
    assert got == {(1000, 0, "history")}  # rep id 0; 1001 matches nothing


def test_simhash_collapse_reuses_signature_exchange(spark):
    """The collapsed path's three consumers (star edges + both banded
    join sides) share the grouped-signature subtree WITHOUT a
    checkpoint: AQE exchange reuse must materialize the corpus-wide
    signature shuffle once — ReusedExchange nodes present in the final
    adaptive plan (the bloom-probe contract)."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    df = simhash_near_duplicates(docs)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ReusedExchange") >= 2, plan.count("ReusedExchange")


def test_simhash32_kernel_matches_expression_twin(spark):
    """The round-13 vectorized mapInArrow kernel must reproduce the
    expression twin bit-for-bit on every edge the two spellings could
    diverge on: NULL text (doc emits NO row — explode(split(NULL))
    drops it), empty text (one empty token, md5('')), consecutive /
    leading / trailing spaces (split(' ') keeps empty tokens on both
    sides), tabs/newlines (NOT token separators), case folding done in
    the JVM (Turkish dotted-I, Greek final sigma, German sharp s stay
    whatever Spark's lower() says — the kernel receives lowered text),
    CJK, and heavy token repetition (the per-batch distinct-md5 path).
    Plan shape: kernel is map-side (no Exchange); twin groupBy(doc)
    pays one."""
    from haplorec_spark.operators.dedup import _simhash32_expr, simhash32

    rows_in = [
        (0, None),
        (1, ""),
        (2, " "),
        (3, "a  b"),
        (4, " leading and trailing "),
        (5, "a\tb\nc d"),
        (6, "İstanbul ΑΣ STRASSE ß ẞ"),
        (7, "这是中文 测试 文本"),
        (8, "the the the the cat cat sat"),
        (9, "one-token"),
        (10, "The QUICK brown FOX jumps over the lazy dog"),
    ]
    docs = spark.createDataFrame(rows_in, "doc_id long, text string")
    got = rows(simhash32(docs))
    want = rows(_simhash32_expr(docs))
    assert got == want
    plan = (
        simhash32(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "MapInArrow" in plan
    assert "Exchange" not in plan


# -------------------------------------- bounded star-verification path


@pytest.fixture(scope="module")
def escalation_family(spark):
    """Six docs engineered so X (id 2) is near-threshold to the bucket
    hub but above-threshold to Y (id 1), and X,Y NEVER share a bucket
    without the hub (searched against the fixed minhash family): the
    ONLY route to dropping X under the bounded path is margin-band
    escalation against the bucket sample. 1-word shingles make the
    Jaccards exact by construction: J(hub, X) = J(hub, Y) = 17/23 ≈
    0.739, J(X, Y) = 19/21 ≈ 0.905."""
    w = [f"w{i}" for i in range(1, 18)]
    hub = " ".join(w + ["h0a", "h0b", "h0c"])
    return spark.createDataFrame(
        [
            (0, hub),
            (1, " ".join(w + ["x0a", "q0z", "x0c"])),
            (2, " ".join(w + ["x0a", "x0b", "x0c"])),
            (3, hub),
            (4, hub),
            (5, hub),
        ],
        "doc_id long, text string",
    )


_ESC_KW = dict(
    num_hashes=6, bands=6, shingle_n=1, hot_bucket_cap=4,
    escalate_sample=4,
)


def test_verified_pairs_escalation_drops_margin_member(
    spark, escalation_family
):
    """Margin-band escalation: X's hub similarity (0.739) misses the
    0.8 threshold but clears the floor (margin 0.15), so X escalates
    against the bucket sample, finds Y at 0.905, and is dropped with
    the SAME decision set as the exact all-pairs path."""
    from haplorec_spark.operators.dedup import lsh_verified_pairs

    got = rows(
        lsh_verified_pairs(
            escalation_family, threshold=0.8, margin=0.15, **_ESC_KW
        )
    )
    assert (1, 2, 0.904762) in got  # the escalated witness pair
    assert {r[1] for r in got} == {2, 3, 4, 5}  # drops == exact path
    exact = rows(
        lsh_verified_pairs(
            escalation_family, threshold=0.8, num_hashes=6, bands=6,
            shingle_n=1, hot_bucket_cap=None,
        )
    )
    assert {r[1] for r in got} == {r[1] for r in exact}


def test_verified_pairs_false_keep_below_margin(spark, escalation_family):
    """The DOCUMENTED tradeoff: with margin 0.01 the floor (0.79) sits
    above X's hub similarity (0.739), no escalation fires, and X is
    kept although the exact path drops it via Y. Paired with the
    escalation test (same family, wider margin drops X), this pins
    that escalation — not a direct small-bucket pair — is the only
    route to X."""
    from haplorec_spark.operators.dedup import lsh_verified_pairs

    got = rows(
        lsh_verified_pairs(
            escalation_family, threshold=0.8, margin=0.01, **_ESC_KW
        )
    )
    assert {r[1] for r in got} == {3, 4, 5}  # X (id 2) falsely kept
    assert all(r[2] == 1.0 for r in got)  # only the identical clones


def test_verified_pairs_mega_family_bounded(spark, monkeypatch):
    """The round-10 verdict's done criterion: a 10^4-copy family with
    verification on completes with O(m·bands) verification rows — the
    first verify pass sees at most bands·(m−1) candidate rows (the
    star edges; the exact path would feed it m(m−1)/2 ≈ 5·10^7), the
    escalation pass sees ZERO (hub similarity is 1.0 ≥ threshold, so
    no member is ambiguous), and the drop set is exactly the m−1
    non-hub members."""
    import haplorec_spark.operators.dedup as dedup_mod
    from pyspark.sql import functions as F

    m = 10_000
    family = spark.range(m).select(
        F.col("id").alias("doc_id"),
        F.lit(
            "boilerplate terms of service apply to this page right now"
        ).alias("text"),
    )
    seen = []
    original = dedup_mod._jaccard_pairs_join

    def counting(pairs, *args, **kwargs):
        seen.append(pairs.count())
        return original(pairs, *args, **kwargs)

    monkeypatch.setattr(dedup_mod, "_jaccard_pairs_join", counting)
    got = dedup_mod.lsh_verified_pairs(
        family, threshold=0.8, hot_bucket_cap=64
    ).collect()
    assert len(seen) == 2
    assert seen[0] <= 4 * (m - 1)  # bands * star edges, not m^2/2
    assert seen[1] == 0  # identical family: nothing ambiguous
    assert {r["doc_id_b"] for r in got} == set(range(1, m))
    assert all(r["doc_id_a"] == 0 and r["jaccard"] == 1.0 for r in got)


def test_verified_pairs_match_exact_on_corpus(spark):
    """Drop decisions on the real sf0.01 corpus: the bounded path with
    an aggressive cap (4 — every duplicate family overflows it) and a
    0.2 margin reproduces the exact path's drop set EXACTLY (the
    verdict's pinned tolerance: zero misses on this corpus — every
    over-cap member's hub similarity either clears the threshold or
    escalates within the margin)."""
    from haplorec_spark.operators.dedup import lsh_verified_pairs

    docs = spark.read.parquet(
        "/root/testdata/sf0.01/documents.parquet"
    ).select("doc_id", "text")
    exact = {
        r["doc_id_b"]
        for r in lsh_verified_pairs(
            docs, threshold=0.7, hot_bucket_cap=None
        ).collect()
    }
    bounded = {
        r["doc_id_b"]
        for r in lsh_verified_pairs(
            docs, threshold=0.7, margin=0.2, hot_bucket_cap=4
        ).collect()
    }
    assert bounded <= exact  # escalation verifies exactly: no false drop
    assert bounded == exact  # measured: zero false keeps on this corpus


def test_verified_pairs_validation():
    from haplorec_spark.operators.dedup import lsh_verified_pairs

    with pytest.raises(ValueError):
        lsh_verified_pairs(None, threshold=0.0)
    with pytest.raises(ValueError):
        lsh_verified_pairs(None, threshold=0.8, margin=-0.1)
    with pytest.raises(ValueError):
        lsh_verified_pairs(None, threshold=0.8, escalate_sample=0)
    with pytest.raises(ValueError):
        lsh_verified_pairs(None, threshold=0.8, hot_bucket_cap=1)


def test_history_probe_cap_bounds_false_collision_fanout(
    spark, tmp_path
):
    """The survivors-only store invariant bounds DUPLICATE families
    (each family holds one representative), but many DISTINCT
    survivors can share a band key through false collisions — and an
    uncapped history probe then fans out by the full collision count.
    Seed that exactly: a store whose rows share one of the probe
    document's REAL band keys under 500 distinct ids. Uncapped, the
    candidate list is collision-sized; with store_probe_cap it is
    cap-sized and deterministic (the smallest stored ids — the hub
    convention), while a key the probe doesn't touch costs nothing."""
    from pyspark.sql import functions as F

    from haplorec_spark.operators.dedup import (
        history_candidate_pairs,
        lsh_band_keys,
    )

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    probe = spark.createDataFrame(
        [(1, base)], "doc_id long, text string"
    )
    keys = lsh_band_keys(probe).select("band", "band_key").collect()
    hot = keys[0]
    # 500 DISTINCT ids on one real probe key (the seeded false
    # collision), plus 50 rows on a key the probe never touches
    store_rows = spark.range(500).select(
        (F.col("id") + 1000).alias("doc_id"),
        F.lit(hot["band"]).alias("band"),
        F.lit(hot["band_key"]).alias("band_key"),
    ).unionByName(
        spark.range(50).select(
            (F.col("id") + 9000).alias("doc_id"),
            F.lit(hot["band"]).alias("band"),
            F.lit("never-probed-key").alias("band_key"),
        )
    )
    store = str(tmp_path / "seeded_store")
    store_rows.write.partitionBy("band").parquet(store)

    uncapped = history_candidate_pairs(probe, store).collect()
    assert len(uncapped) == 500  # the fan-out is real

    capped = sorted(
        r["doc_id_matched"]
        for r in history_candidate_pairs(
            probe, store, store_probe_cap=8
        ).collect()
    )
    assert capped == list(range(1000, 1008))

    # Append-duplicated store rows (the documented pre-compaction
    # state) must not consume cap slots: after appending id 1000's row
    # 8 more times, the cap still admits the 8 smallest DISTINCT ids.
    spark.range(8).select(
        F.lit(1000).cast("long").alias("doc_id"),
        F.lit(hot["band"]).alias("band"),
        F.lit(hot["band_key"]).alias("band_key"),
    ).write.mode("append").partitionBy("band").parquet(store)
    capped_dup = sorted(
        r["doc_id_matched"]
        for r in history_candidate_pairs(
            probe, store, store_probe_cap=8
        ).collect()
    )
    assert capped_dup == list(range(1000, 1008))

    with pytest.raises(ValueError, match="store_probe_cap"):
        history_candidate_pairs(probe, store, store_probe_cap=0)
