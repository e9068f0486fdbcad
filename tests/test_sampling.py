"""Deterministic sampling/split/decontamination operator tests.

The md5 hash-band selection is replicated in pure Python per test —
proving the selection is a pure function of (seed, key) that any engine
can recompute, which is the operators' core contract.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from haplorec_spark.operators.sampling import (
    decontaminate,
    hash_fraction_sample,
    hash_split,
    mixture_sample,
    stratified_hash_sample,
    top_k_by_hash,
)

SF = "/root/testdata/sf0.001"


def band(seed: str, *vals) -> int:
    key = "\x1f".join(
        [seed] + ["\x00null" if v is None else str(v) for v in vals]
    )
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_fraction_sample_matches_python_replica(spark, docs):
    got = {r.doc_id for r in
           hash_fraction_sample(docs, 0.3, ["doc_id"]).collect()}
    cutoff = int(0.3 * (1 << 32))
    want = {
        r.doc_id for r in docs.select("doc_id").collect()
        if band("sample", r.doc_id) < cutoff
    }
    assert got == want
    assert 0 < len(got) < docs.count()


def test_fraction_samples_are_nested(spark, docs):
    """Hash cutoffs nest: the 20% sample is a subset of the 50% sample —
    growing a sample never swaps rows out (stable backfills)."""
    s20 = {r.doc_id for r in
           hash_fraction_sample(docs, 0.2, ["doc_id"]).collect()}
    s50 = {r.doc_id for r in
           hash_fraction_sample(docs, 0.5, ["doc_id"]).collect()}
    assert s20 <= s50


def test_fraction_sample_is_map_side(spark, docs):
    plan = (
        hash_fraction_sample(docs, 0.5, ["doc_id"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_hash_split_partitions_and_is_stable(spark, docs):
    out = hash_split(
        docs, {"train": 0.8, "valid": 0.1, "test": 0.1}, ["doc_id"]
    )
    counts = {r["split"]: r["count"]
              for r in out.groupBy("split").count().collect()}
    assert sum(counts.values()) == docs.count()
    assert set(counts) == {"train", "valid", "test"}
    assert counts["train"] > counts["valid"]
    # stability: a row's split is a pure function of its key — computing
    # the split on a SUBSET assigns the same labels
    sub = hash_split(
        docs.filter(F.col("doc_id") < 100),
        {"train": 0.8, "valid": 0.1, "test": 0.1},
        ["doc_id"],
    )
    full = {r.doc_id: r["split"] for r in out.collect()}
    for r in sub.collect():
        assert full[r.doc_id] == r["split"]


def test_null_key_components_do_not_collide(spark):
    """concat_ws silently drops NULL arguments, so without a sentinel
    ('a', NULL) and (NULL, 'a') would share a band and all NULL-keyed
    rows would be kept/dropped as one block. The sentinel keeps the
    position information, and the Python replica mirrors it."""
    df = spark.createDataFrame(
        [("a", None), (None, "a"), (None, None), ("a", "b")],
        "k1 string, k2 string",
    )
    out = hash_split(
        df, {"x": 0.5, "y": 0.5}, ["k1", "k2"], split_col="s"
    )
    got = {(r["k1"], r["k2"]): r["s"] for r in out.collect()}
    cutoff = int(0.5 * (1 << 32))
    for (k1, k2), label in got.items():
        want = "x" if band("split", k1, k2) < cutoff else "y"
        assert label == want, (k1, k2)
    # the two asymmetric NULL keys hash to DIFFERENT bands
    assert band("split", "a", None) != band("split", None, "a")


def test_hash_split_rejects_bad_weights(spark, docs):
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(docs, {"a": 0.5, "b": 0.4}, ["doc_id"])


def test_stratified_sample_per_stratum(spark, docs):
    banded = docs.withColumn(
        "stratum",
        F.when(F.col("doc_id") % 2 == 0, "even").otherwise("odd"),
    )
    out = stratified_hash_sample(
        banded, {"even": 1.0, "odd": 0.0}, "stratum", ["doc_id"]
    )
    got = [r.doc_id for r in out.collect()]
    assert got and all(d % 2 == 0 for d in got)
    n_even = banded.filter(F.col("stratum") == "even").count()
    assert len(got) == n_even  # fraction 1.0 keeps the whole stratum


def test_top_k_by_hash_exact_and_deterministic(spark, docs):
    got = [r.doc_id for r in top_k_by_hash(docs, 7, ["doc_id"]).collect()]
    assert len(got) == 7
    pri = {
        r.doc_id: hashlib.md5(f"topk\x1f{r.doc_id}".encode()).hexdigest()
        for r in docs.select("doc_id").collect()
    }
    want = sorted(pri, key=lambda d: pri[d])[:7]
    assert sorted(got) == sorted(want)
    again = [r.doc_id for r in top_k_by_hash(docs, 7, ["doc_id"]).collect()]
    assert sorted(again) == sorted(got)


def test_decontaminate_drops_overlapping_docs(spark):
    bench = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # contains the benchmark's 8-gram verbatim -> contaminated
            (10, "intro words the quick brown fox jumps over the lazy "
                 "dog and more trailing text"),
            # same words, different order -> clean
            (11, "dog lazy the over jumps fox brown quick the plus many "
                 "other words to pad this document out"),
            # too short to form an 8-shingle -> clean
            (12, "short doc"),
        ],
        "doc_id long, text string",
    )
    kept = {r.doc_id for r in decontaminate(corpus, bench, n=8).collect()}
    assert kept == {11, 12}
    plan = (
        decontaminate(corpus, bench, n=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_mixture_sample_hits_target_shares(spark, docs):
    """lang is the domain column of the documents table; rebalancing to
    an even two-way mix must (a) keep the binding domain whole, (b) land
    token shares near the targets, (c) replicate the pure-Python bands."""
    langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
    assert len(langs) >= 2
    a, b = sorted(langs)[:2]
    two = docs.filter(F.col("lang").isin([a, b]))
    out = mixture_sample(two, {a: 0.5, b: 0.5}, "lang", ["doc_id"])

    def tokens(df):
        return (
            df.select(
                F.sum(F.size(F.split(F.lower(F.col("text")), " "))).alias("t")
            ).collect()[0]["t"]
        )

    in_a, in_b = (
        tokens(two.filter(F.col("lang") == v)) for v in (a, b)
    )
    out_a, out_b = (
        tokens(out.filter(F.col("lang") == v)) for v in (a, b)
    )
    binding = a if in_a <= in_b else b
    kept_binding = out_a if binding == a else out_b
    in_binding = in_a if binding == a else in_b
    assert kept_binding == in_binding  # binding domain keeps fraction 1.0
    share = out_a / (out_a + out_b)
    assert 0.4 < share < 0.6  # doc-level granularity around the target

    # determinism + replica: recompute the expected keep set in Python
    s_out = min(in_a / 0.5, in_b / 0.5)
    fr = {a: min(1.0, 0.5 * s_out / in_a), b: min(1.0, 0.5 * s_out / in_b)}
    rows = two.select("doc_id", "lang").collect()
    want = sorted(
        r["doc_id"] for r in rows
        if band("mixture", r["doc_id"]) < int(fr[r["lang"]] * (1 << 32))
    )
    assert sorted(r["doc_id"] for r in out.collect()) == want


def test_mixture_sample_rejects_bad_targets(spark, docs):
    with pytest.raises(ValueError):
        mixture_sample(docs, {}, "lang", ["doc_id"])
    with pytest.raises(ValueError):
        mixture_sample(docs, {"en": 0.0}, "lang", ["doc_id"])
    with pytest.raises(ValueError):
        mixture_sample(docs, {"not_a_lang": 1.0}, "lang", ["doc_id"])


def test_contamination_report_pairs_and_counts(spark):
    from haplorec_spark.operators.sampling import contamination_report

    bench = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "a completely different benchmark question entirely "
                "unrelated to anything else here"),
        ],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # shares two consecutive 8-grams with benchmark item 1
            (10, "intro the quick brown fox jumps over the lazy dog "
                 "tonight outro"),
            (11, "clean document with none of those words arranged "
                 "in any matching order whatsoever today"),
        ],
        "doc_id long, text string",
    )
    got = sorted(
        tuple(r)
        for r in contamination_report(corpus, bench, n=8).collect()
    )
    # "the quick ... dog tonight" is 10 words -> benchmark item 1 has
    # three 8-shingles; corpus doc 10 contains all three.
    assert got == [(10, 1, 3)]

    # the report names exactly what decontaminate drops
    from haplorec_spark.operators.sampling import decontaminate

    kept = {r["doc_id"] for r in decontaminate(corpus, bench, n=8).collect()}
    flagged = {t[0] for t in got}
    assert flagged == {10} and kept == {11}


def test_weighted_sample_matches_python_replica(spark, docs):
    """Acceptance probability = the row's own quality score; the keep
    set is the pure function band(seed, id) < weight * 2^32."""
    from haplorec_spark.operators.sampling import weighted_sample
    from haplorec_spark.operators.text import quality_score

    scored = docs.join(quality_score(docs).select("doc_id", "quality"),
                       "doc_id")
    got = {r.doc_id for r in
           weighted_sample(scored, "quality", ["doc_id"]).collect()}
    want = {
        r.doc_id
        for r in scored.select("doc_id", "quality").collect()
        if band("weighted", r.doc_id)
        < min(max(r.quality, 0.0), 1.0) * (1 << 32)
    }
    assert got == want
    # weight-1 rows always survive, weight-0 rows never do
    import pyspark.sql.functions as SF_

    pinned = scored.withColumn(
        "quality",
        SF_.when(SF_.col("doc_id") % 2 == 0, 1.0).otherwise(0.0),
    )
    kept = {r.doc_id for r in
            weighted_sample(pinned, "quality", ["doc_id"]).collect()}
    evens = {r.doc_id for r in scored.collect() if r.doc_id % 2 == 0}
    assert kept == evens


def test_top_fraction_by_score(spark, docs):
    """Exact mode keeps the top fraction by rank (ties inclusive) and
    matches a pure-Python quantile cut."""
    import numpy as np

    from haplorec_spark.operators.sampling import top_fraction_by_score
    from haplorec_spark.operators.text import token_counts

    scored = token_counts(docs).select("doc_id", "n_ws_tokens")
    vals = [r.n_ws_tokens for r in scored.collect()]
    got = {r.doc_id for r in
           top_fraction_by_score(scored, "n_ws_tokens", 0.3,
                                 exact=True).collect()}
    cut = float(np.quantile(vals, 0.7, method="linear"))
    want = {r.doc_id for r in scored.collect() if r.n_ws_tokens >= cut}
    assert got == want
    assert 0 < len(got) < len(vals)
    # fraction=1 keeps everything; empty input stays empty
    assert top_fraction_by_score(scored, "n_ws_tokens", 1.0).count() == len(vals)
    empty = scored.limit(0)
    assert top_fraction_by_score(empty, "n_ws_tokens", 0.5).count() == 0


# --------------------------------------------- DuckDB oracle cross-checks
# The pure-Python replicas above prove engine-independence of the hash
# contract; these prove it against an actual second SQL engine (the same
# oracle style every other operator family gets). DUCK_BAND is the
# md5-hex-prefix band parse shared with the q_sample_weighted driver gate.


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    return con


def _duck_band(seed: str) -> str:
    from haplorec_spark.operators.sampling import DUCK_BAND

    return DUCK_BAND.format(
        key=f"'{seed}' || chr(31) || doc_id::VARCHAR"
    )


def test_fraction_sample_vs_duckdb(spark, docs, duck):
    got = sorted(
        r.doc_id
        for r in hash_fraction_sample(docs, 0.3, ["doc_id"]).collect()
    )
    want = sorted(
        t[0]
        for t in duck.execute(
            f"""SELECT doc_id FROM documents
                WHERE {_duck_band('sample')} < {int(0.3 * (1 << 32))}"""
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_weighted_sample_vs_duckdb(spark, docs, duck):
    from haplorec_spark.operators.sampling import weighted_sample

    weighted = docs.select(
        "doc_id", ((F.col("doc_id") % 10) / 10.0).alias("w")
    )
    got = sorted(
        r.doc_id
        for r in weighted_sample(weighted, "w", ["doc_id"],
                                 seed="weighted").collect()
    )
    want = sorted(
        t[0]
        for t in duck.execute(
            f"""SELECT doc_id FROM (
                    SELECT doc_id, (doc_id % 10) / 10.0 AS w,
                           {_duck_band('weighted')} AS band
                    FROM documents)
                WHERE band < least(greatest(w, 0.0), 1.0) * 4294967296.0"""
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_hash_split_vs_duckdb(spark, docs, duck):
    got = sorted(
        (r.doc_id, r.split)
        for r in hash_split(
            docs, {"train": 0.8, "valid": 0.1, "test": 0.1}, ["doc_id"]
        ).select("doc_id", "split").collect()
    )
    c80 = int(0.8 * (1 << 32))
    c90 = int(0.9 * (1 << 32))
    want = sorted(
        tuple(t)
        for t in duck.execute(
            f"""SELECT doc_id,
                       CASE WHEN {_duck_band('split')} < {c80} THEN 'train'
                            WHEN {_duck_band('split')} < {c90} THEN 'valid'
                            ELSE 'test' END AS split
                FROM documents"""
        ).fetchall()
    )
    assert got == want


def test_top_fraction_by_score_vs_duckdb(spark, docs, duck):
    """exact=True uses Spark's exact interpolated percentile — the same
    cut DuckDB's quantile_cont computes, so kept sets match exactly."""
    from haplorec_spark.operators.sampling import top_fraction_by_score

    scored = docs.select(
        "doc_id", ((F.col("doc_id") % 97) / 97.0).alias("score")
    )
    got = sorted(
        r.doc_id
        for r in top_fraction_by_score(
            scored, "score", 0.3, exact=True
        ).collect()
    )
    want = sorted(
        t[0]
        for t in duck.execute(
            """SELECT doc_id FROM (
                   SELECT doc_id, (doc_id % 97) / 97.0 AS score
                   FROM documents)
               WHERE score >= (SELECT quantile_cont(
                                   (doc_id % 97) / 97.0, 0.7)
                               FROM documents)"""
        ).fetchall()
    )
    assert got == want and 0 < len(got) < docs.count()


# ------------------------------------------------------- leakage-safe split


def test_leakage_safe_split_clusters_stay_whole(spark, docs):
    from haplorec_spark.operators.sampling import (
        hash_split,
        leakage_safe_split,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21)], ["doc_id_a", "doc_id_b"]
    )
    w = {"train": 0.8, "valid": 0.1, "test": 0.1}
    out = leakage_safe_split(docs, pairs, w).select(
        "doc_id", "canonical_id", "split"
    )
    rows = {r["doc_id"]: (r["canonical_id"], r["split"])
            for r in out.collect()}
    assert len(rows) == docs.count()
    # transitive closure: {1,2,3} -> 1, {10,11} -> 10, {20,21} -> 20
    for d in (1, 2, 3):
        assert rows[d][0] == 1
    assert rows[10][0] == rows[11][0] == 10
    assert rows[20][0] == rows[21][0] == 20
    # every near-dup pair lands in ONE split
    for a, b in [(1, 2), (2, 3), (1, 3), (10, 11), (20, 21)]:
        assert rows[a][1] == rows[b][1], (a, b)
    # cluster members inherit exactly the canonical doc's plain label,
    # and untouched docs match plain hash_split verbatim
    plain = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs, w, ["doc_id"]).collect()
    }
    clustered = {1, 2, 3, 10, 11, 20, 21}
    for d, (canon, label) in rows.items():
        assert label == plain[canon]
        if d not in clustered:
            assert canon == d and label == plain[d]


def test_leakage_safe_split_vs_duckdb(spark, docs, duck):
    from haplorec_spark.operators.sampling import leakage_safe_split

    pairs = spark.createDataFrame(
        [(5, 7), (7, 9)], ["doc_id_a", "doc_id_b"]
    )
    got = sorted(
        (r["doc_id"], r["canonical_id"], r["split"])
        for r in leakage_safe_split(
            docs, pairs, {"train": 0.7, "test": 0.3}
        ).select("doc_id", "canonical_id", "split").collect()
    )
    from haplorec_spark.operators.sampling import DUCK_BAND

    band = DUCK_BAND.format(
        key="'split' || chr(31) || canonical_id::VARCHAR"
    )
    cut = int(0.7 * (1 << 32))
    want = sorted(
        tuple(t)
        for t in duck.execute(
            f"""
            WITH canon AS (SELECT doc_id,
                                  CASE WHEN doc_id IN (5, 7, 9) THEN 5
                                       ELSE doc_id END AS canonical_id
                           FROM documents)
            SELECT doc_id, canonical_id,
                   CASE WHEN {band} < {cut} THEN 'train' ELSE 'test' END
            FROM canon
            """
        ).fetchall()
    )
    assert got == want


# ------------------------------------------------------------- DSIR


def _ref_dsir_weights(raw_texts, target_texts, alpha=0.5):
    """Independent replica: add-alpha unigram LMs, summed log10 ratio.
    raw_texts/target_texts: {doc_id: text} / [text]."""
    import math
    from collections import Counter

    def words(t):
        return [w for w in t.lower().split(" ") if w]

    vt = Counter(w for t in target_texts for w in words(t))
    vr = Counter(w for t in raw_texts.values() for w in words(t))
    nt, vtc = sum(vt.values()), len(vt)
    nr, vrc = sum(vr.values()), len(vr)
    dt = nt + alpha * (vtc + 1)
    dr = nr + alpha * (vrc + 1)
    out = {}
    for did, t in raw_texts.items():
        ws = words(t)
        if not ws:
            continue
        lw = sum(
            math.log10((vt.get(w, 0) + alpha) / dt)
            - math.log10((vr.get(w, 0) + alpha) / dr)
            for w in ws
        )
        out[did] = (len(ws), round(lw, 6))
    return out


def test_importance_weights_match_replica(spark, docs):
    from haplorec_spark.operators.sampling import importance_weights

    raw = docs.limit(60)
    target = raw.filter(F.col("doc_id") % 5 == 0)
    raw_texts = {r["doc_id"]: r["text"] for r in raw.collect()}
    target_texts = [
        t for d, t in raw_texts.items() if d % 5 == 0
    ]
    want = _ref_dsir_weights(raw_texts, target_texts)
    got = {
        r["doc_id"]: (r["n_tokens"], r["log_weight"])
        for r in importance_weights(raw, target).collect()
    }
    assert set(got) == set(want)
    for did in want:
        assert got[did][0] == want[did][0], did
        assert got[did][1] == pytest.approx(want[did][1], abs=2e-6), did


def test_importance_weights_shift_toward_target(spark):
    # docs made of target-domain words must outweigh off-domain docs
    from haplorec_spark.operators.sampling import importance_weights

    raw = spark.createDataFrame(
        [(0, "gene variant allele"), (1, "gene variant haplotype"),
         (2, "stock market futures"), (3, "weather rain forecast")],
        "doc_id int, text string",
    )
    target = raw.filter(F.col("doc_id") <= 1)
    w = {
        r["doc_id"]: r["log_weight"]
        for r in importance_weights(raw, target).collect()
    }
    assert min(w[0], w[1]) > max(w[2], w[3])


def test_importance_resample_selects_k_highest_keys(spark, docs):
    import math

    from haplorec_spark.operators.sampling import (
        importance_resample, importance_weights,
    )

    raw = docs.limit(80)
    target = raw.filter(F.col("doc_id") % 5 == 0)
    k = 20
    sel = importance_resample(raw, target, k, seed="t")
    got = sorted(r["doc_id"] for r in sel.collect())
    assert len(got) == k
    # replica: gumbel keys from the rounded weights + the band hash
    weights = {
        r["doc_id"]: r["log_weight"]
        for r in importance_weights(raw, target).collect()
    }
    keys = {}
    for did, lw in weights.items():
        u = (band("t", did) + 0.5) / 2**32
        keys[did] = lw * math.log(10.0) - math.log(-math.log(u))
    want = sorted(
        sorted(keys, key=lambda d: (-keys[d], d))[:k]
    )
    assert got == want
    # determinism: a rerun selects the identical set
    again = sorted(
        r["doc_id"] for r in importance_resample(
            raw, target, k, seed="t"
        ).collect()
    )
    assert again == got


def test_importance_resample_rejects_bad_k(spark, docs):
    from haplorec_spark.operators.sampling import importance_resample

    with pytest.raises(ValueError, match="k must be"):
        importance_resample(docs, docs, 0)


def test_dsir_pinned_vocab_freezes_the_ratio(spark, docs):
    import math

    from haplorec_spark.operators.sampling import (
        build_dsir_vocab, importance_weights,
    )

    base = docs.limit(60)
    target = base.filter(F.col("doc_id") % 5 == 0)
    pinned = build_dsir_vocab(base, target).persist()

    # pinned == self-built on the same corpora
    self_built = {
        r["doc_id"]: (r["n_tokens"], r["log_weight"])
        for r in importance_weights(base, target).collect()
    }
    via_pinned = {
        r["doc_id"]: (r["n_tokens"], r["log_weight"])
        for r in importance_weights(base, vocab=pinned).collect()
    }
    assert via_pinned == self_built

    # a LATER batch scores under the FROZEN counts: replica with the
    # original corpus statistics, not the batch's own
    batch = docs.filter(
        (F.col("doc_id") >= 60) & (F.col("doc_id") < 80)
    )
    vt, vr = {}, {}
    for r in pinned.collect():
        if r["c_t"] is not None:
            vt[r["word"]] = r["c_t"]
        if r["c_r"] is not None:
            vr[r["word"]] = r["c_r"]
    dt = sum(vt.values()) + 0.5 * (len(vt) + 1)
    dr = sum(vr.values()) + 0.5 * (len(vr) + 1)
    want = {}
    for r in batch.collect():
        ws = [w for w in r["text"].lower().split(" ") if w]
        if not ws:
            continue
        lw = sum(
            math.log10((vt.get(w, 0) + 0.5) / dt)
            - math.log10((vr.get(w, 0) + 0.5) / dr)
            for w in ws
        )
        want[r["doc_id"]] = (len(ws), round(lw, 6))
    got = {
        r["doc_id"]: (r["n_tokens"], r["log_weight"])
        for r in importance_weights(batch, vocab=pinned).collect()
    }
    assert set(got) == set(want)
    for did in want:
        assert got[did][0] == want[did][0]
        assert got[did][1] == pytest.approx(want[did][1], abs=2e-6)
    pinned.unpersist()

    with pytest.raises(ValueError, match="target or vocab"):
        importance_weights(batch)


def test_mixture_upsample_matches_duckdb_and_hits_shares(spark, docs):
    import duckdb

    from haplorec_spark.operators.sampling import (
        DUCK_BAND, mixture_upsample,
    )

    weights = {"en": 0.2, "de": 0.5, "zh": 0.3}  # forces de/zh upsampling
    out = mixture_upsample(docs, weights, "lang", ["doc_id"], seed="up")
    got = sorted(
        (r["doc_id"], r["replica"]) for r in out.collect()
    )

    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from "
        f"read_parquet('{SF}/documents.parquet')"
    )
    totals = dict(
        con.execute(
            """select lang, sum(len(string_split(lower(text), ' ')))
               from documents group by lang"""
        ).fetchall()
    )
    s = sum(totals[d] for d in weights)
    case = " ".join(
        f"WHEN lang = '{d}' THEN {int(w * s / totals[d])}"
        f" + (band < {int(((w * s / totals[d]) - int(w * s / totals[d])) * (1 << 32))})::INT"
        for d, w in weights.items()
    )
    want = sorted(
        tuple(t)
        for t in con.execute(
            f"""
            WITH b AS (SELECT doc_id, lang,
                       {DUCK_BAND.format(
                           key="'up' || chr(31) || doc_id::VARCHAR")} AS band
                       FROM documents),
                 n AS (SELECT doc_id, CASE {case} ELSE 0 END AS n_copies
                       FROM b)
            SELECT doc_id, unnest(generate_series(0, n_copies - 1)) AS replica
            FROM n WHERE n_copies > 0
            """
        ).fetchall()
    )
    assert got == want

    # output token shares approximate the targets (within 15% relative)
    shares = {
        r["lang"]: r["t"]
        for r in out.groupBy("lang").agg(
            F.sum(F.size(F.split(F.lower(F.col("text")), " "))).alias("t")
        ).collect()
    }
    tot = sum(shares.values())
    for d, w in weights.items():
        assert abs(shares[d] / tot - w) / w < 0.15, (d, shares[d] / tot, w)

    # (key, replica) is unique; determinism across reruns
    assert len(got) == len(set(got))
    again = sorted(
        (r["doc_id"], r["replica"])
        for r in mixture_upsample(
            docs, weights, "lang", ["doc_id"], seed="up"
        ).collect()
    )
    assert again == got


def test_mixture_upsample_guards(spark, docs):
    from haplorec_spark.operators.sampling import mixture_upsample

    with pytest.raises(ValueError, match="max_replication"):
        mixture_upsample(
            docs, {"de": 0.9, "en": 0.1}, "lang", ["doc_id"],
            max_replication=2.0,
        )
    with pytest.raises(ValueError, match="absent"):
        mixture_upsample(docs, {"xx": 1.0}, "lang", ["doc_id"])
    # explicit token budget scales output
    from pyspark.sql import functions as SF_
    small = mixture_upsample(
        docs, {"en": 1.0}, "lang", ["doc_id"], total_tokens=2000
    )
    t = small.agg(
        SF_.sum(SF_.size(SF_.split(SF_.lower(SF_.col("text")), " ")))
    ).first()[0]
    assert 1000 < t < 3200  # ~2000 in expectation


def test_mixture_upsample_rejects_existing_replica_column(spark, docs):
    from haplorec_spark.operators.sampling import mixture_upsample

    tagged = docs.withColumn("replica", F.lit(9))
    with pytest.raises(ValueError, match="reserved"):
        mixture_upsample(tagged, {"en": 1.0}, "lang", ["doc_id"])


def test_mixture_alpha_one_is_identity(spark, docs):
    """alpha=1 reproduces the natural mix: the downsample face keeps
    every row and the upsample face emits exactly one copy of each."""
    from haplorec_spark.operators.sampling import mixture_upsample

    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    out = mixture_sample(docs, None, "lang", ["doc_id"], alpha=1.0)
    assert sorted(r["doc_id"] for r in out.collect()) == ids
    up = mixture_upsample(docs, None, "lang", ["doc_id"], alpha=1.0)
    got = sorted((r["doc_id"], r["replica"]) for r in up.collect())
    assert got == [(i, 0) for i in ids]


def test_mixture_alpha_flattens_vs_replica(spark, docs):
    """alpha=0.5 boosts tail-domain share; the realized keep set must
    replicate the w_d ∝ share_d^alpha math computed independently from
    DuckDB token totals + the pure-Python band."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from "
        f"read_parquet('{SF}/documents.parquet')"
    )
    totals = dict(
        con.execute(
            """select lang, sum(len(string_split(lower(text), ' ')))
               from documents where lang is not null group by lang"""
        ).fetchall()
    )
    raw = {d: float(t) ** 0.5 for d, t in totals.items()}
    z = sum(raw.values())
    w = {d: r / z for d, r in raw.items()}
    s = min(totals[d] / w[d] for d in totals)
    fr = {d: min(1.0, w[d] * s / totals[d]) for d in totals}

    out = mixture_sample(docs, None, "lang", ["doc_id"], alpha=0.5)
    rows = docs.select("doc_id", "lang").collect()
    want = sorted(
        r["doc_id"] for r in rows
        if r["lang"] is not None
        and band("mixture", r["doc_id"]) < int(fr[r["lang"]] * (1 << 32))
    )
    assert sorted(r["doc_id"] for r in out.collect()) == want

    # flattening property: the smallest domain's realized token share
    # strictly exceeds its natural share
    small = min(totals, key=totals.get)
    nat = totals[small] / sum(totals.values())
    kept = {
        r["lang"]: r["t"]
        for r in out.groupBy("lang").agg(
            F.sum(F.size(F.split(F.lower(F.col("text")), " "))).alias("t")
        ).collect()
    }
    got_share = kept[small] / sum(kept.values())
    assert got_share > nat


def test_mixture_alpha_guards(spark, docs):
    from haplorec_spark.operators.sampling import mixture_upsample

    with pytest.raises(ValueError, match="weights mapping"):
        mixture_sample(docs, None, "lang", ["doc_id"])
    with pytest.raises(ValueError, match="not a weights mapping"):
        mixture_sample(docs, {"en": 1.0}, "lang", ["doc_id"], alpha=0.5)
    with pytest.raises(ValueError, match="alpha"):
        mixture_sample(docs, None, "lang", ["doc_id"], alpha=-0.1)
    with pytest.raises(ValueError, match="absent"):
        mixture_sample(
            docs, ["en", "not_a_lang"], "lang", ["doc_id"], alpha=0.5
        )
    # restricting to a subset of domains drops the rest
    langs = sorted(
        r["lang"] for r in docs.select("lang").distinct().collect()
        if r["lang"] is not None
    )
    keep_two = langs[:2]
    out = mixture_upsample(docs, keep_two, "lang", ["doc_id"], alpha=0.5)
    assert set(
        r["lang"] for r in out.select("lang").distinct().collect()
    ) == set(keep_two)


def test_mixture_rejects_zero_token_domains(spark, docs):
    from haplorec_spark.operators.sampling import mixture_upsample

    tagged = docs.withColumn(
        "n_tok",
        F.when(F.col("lang") == "de", F.lit(0)).otherwise(F.lit(5)),
    )
    with pytest.raises(ValueError, match="zero tokens"):
        mixture_sample(
            tagged, {"en": 0.5, "de": 0.5}, "lang", ["doc_id"],
            token_col="n_tok",
        )
    with pytest.raises(ValueError, match="zero tokens"):
        mixture_upsample(
            tagged, None, "lang", ["doc_id"], alpha=0.5, token_col="n_tok"
        )


def test_decontaminate_cjk_needs_script_segmentation(spark):
    """Round 9: a zh eval item has ZERO 8-word shingles under the
    whitespace split, so decontamination was blind to CJK benchmark
    leaks; script segmentation catches the verbatim overlap."""
    from haplorec_spark.operators.sampling import decontaminate

    leak = "我们的房子很大冬天的水很冷孩子们在学校读书"
    corpus = spark.createDataFrame(
        [
            (0, f"前言{leak}后记还有更多别的内容在这里继续"),
            (1, "the house is big and the water is cold in winter"),
            (2, "完全不同的中文内容和上面没有任何重叠的部分可言"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, leak)], "doc_id long, text string")
    kept_ws = {
        r["doc_id"] for r in decontaminate(corpus, bench).collect()
    }
    assert kept_ws == {0, 1, 2}  # blind: the leak survives
    kept = {
        r["doc_id"]
        for r in decontaminate(
            corpus, bench, segmentation="script"
        ).collect()
    }
    assert kept == {1, 2}  # doc 0 shares the verbatim zh span


def test_mixture_totals_script_accounting(spark):
    """Round 9: domain token totals under script accounting count a
    zh document's characters, not 1 — without it a zh domain's
    mixture share is under-counted by ~|doc| per document."""
    from haplorec_spark.operators.sampling import _domain_token_totals

    zh = "我们的房子很大冬天的水很冷"  # 13 chars
    docs = spark.createDataFrame(
        [(0, "zh", zh), (1, "en", "the house is big")],
        "doc_id long, lang string, text string",
    )
    ws = _domain_token_totals(docs, None, "lang", None, "text")
    assert ws == {"zh": 1, "en": 4}
    sc = _domain_token_totals(
        docs, None, "lang", None, "text", "script"
    )
    assert sc == {"zh": 13, "en": 4}


def test_dsir_script_mode_separates_cjk_domains(spark):
    """Round-9 review follow-up: DSIR features were whitespace words,
    so a zh document was ONE feature and the importance ratio carried
    no signal. Under script mode, documents matching the zh target's
    character distribution outrank Thai ones."""
    from haplorec_spark.operators.sampling import importance_resample

    zh_like = "我们的房子很大冬天的水很冷孩子们在学校读书"
    th_like = "บ้านของเราใหญ่มากน้ำหนาวเย็นเด็กอ่านหนังสือ"
    raw = spark.createDataFrame(
        [(0, zh_like), (1, th_like),
         (2, zh_like + "我们一起去看朋友"), (3, th_like + "ที่โรงเรียน")],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(100, "我们的孩子在学校读书水很冷房子很大")],
        "doc_id long, text string",
    )
    top2 = {
        r["doc_id"]
        for r in importance_resample(
            raw, target, 2, segmentation="script"
        ).collect()
    }
    assert top2 == {0, 2}  # the zh-like docs win under the zh target
