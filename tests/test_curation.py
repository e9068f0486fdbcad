"""End-to-end curation tests: stage invariants on real testdata and
determinism across partition layouts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from haplorec_spark.curation import CurationConfig, curate_documents
from haplorec_spark.operators.text import quality_score

SF_DIR = "/root/testdata/sf0.001"


def test_curation_stage_invariants(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # a benchmark doc copied verbatim from the corpus -> must be dropped
    bench = docs.filter(F.col("doc_id") == 0).select("doc_id", "text")
    cfg = CurationConfig(seq_len=256)
    out, counts = curate_documents(
        docs, benchmark=bench, config=cfg, count_stages=True
    )
    rows = out.collect()
    assert rows and counts["input"] == docs.count()
    # monotone funnel
    stages = ["input", "quality", "redact", "dedup", "decontaminate",
              "split", "pack"]
    for a, b in zip(stages, stages[1:]):
        assert counts[b] <= counts[a], (a, b)

    # quality floor holds on the output
    q = {
        r["doc_id"]: r["quality"]
        for r in quality_score(docs).collect()
    }
    assert all(q[r["doc_id"]] >= 0.7 for r in rows)

    # the contaminated doc is gone, splits and tape columns are present
    ids = {r["doc_id"] for r in rows}
    assert 0 not in ids
    assert {r["split"] for r in rows} <= {"train", "valid", "test"}
    assert all(r["seq_id"] is not None for r in rows)

    # no two output docs share text (exact dedup held)
    texts = [r["text"] for r in rows]
    assert len(texts) == len(set(texts))


def test_curation_packs_each_split_on_its_own_tape(spark):
    """Eval text must never land inside a training sequence: every
    split gets a SEPARATE token tape, dense from 0, covering exactly
    that split's tokens."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    cfg = CurationConfig(seq_len=64, redact=False,
                         splits={"train": 0.6, "valid": 0.2, "test": 0.2})
    out, _ = curate_documents(docs, config=cfg)
    rows = out.select(
        "split", "n_tokens", "global_start", "seq_id"
    ).collect()
    by_split: dict[str, list] = {}
    for r in rows:
        by_split.setdefault(r["split"], []).append(r)
    assert len(by_split) > 1  # the property is vacuous on one split
    for split, rs in by_split.items():
        total = sum(r["n_tokens"] for r in rs)
        # dense per-split tape: starts at 0, ends at the split's own
        # token total — offsets count ONLY this split's tokens
        assert min(r["global_start"] for r in rs) == 0, split
        assert (
            max(r["global_start"] + r["n_tokens"] for r in rs) == total
        ), split
        starts = sorted(r["global_start"] for r in rs)
        ends = sorted(r["global_start"] + r["n_tokens"] for r in rs)
        assert starts[1:] == ends[:-1], split  # contiguous, no overlap


def test_curation_is_deterministic_across_layouts(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    cfg = CurationConfig(seq_len=128, redact=False)
    a, _ = curate_documents(docs, config=cfg)
    b, _ = curate_documents(docs.repartition(13), config=cfg)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_curation_language_and_mixture(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    langs = sorted(
        r["lang"] for r in docs.select("lang").distinct().collect()
    )[:2]
    cfg = CurationConfig(
        languages=langs,
        mixture_weights={langs[0]: 0.5, langs[1]: 0.5},
        min_quality=0.0,
        max_dup_word_fraction=1.1,
        max_top_word_fraction=1.1,
        redact=False,
        dedup=False,
    )
    out, counts = curate_documents(docs, config=cfg, count_stages=True)
    assert counts["language"] <= counts["input"]
    got_langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert got_langs <= set(langs)


def test_curation_near_dedup_drops_near_copies(spark):
    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon the a of and "
        "to in is the a of and to in is extra filler words here"
    )
    docs = spark.createDataFrame(
        [
            (1, "en", base),
            (2, "en", base + " tail"),         # near-dup of 1
            (3, "en", "completely different document content with many "
                      "unique words the a of and to in is spread across "
                      "entirely other themes and subjects and topics"),
        ],
        "doc_id long, lang string, text string",
    )
    cfg = CurationConfig(
        dedup="near", redact=False, min_quality=0.0,
        max_dup_word_fraction=1.1, max_top_word_fraction=1.1,
    )
    out, counts = curate_documents(docs, config=cfg, count_stages=True)
    ids = {r["doc_id"] for r in out.collect()}
    assert ids == {1, 3}  # 2 collapsed into canonical 1
    assert counts["dedup"] == 2

    with_exact = CurationConfig(
        dedup="exact", redact=False, min_quality=0.0,
        max_dup_word_fraction=1.1, max_top_word_fraction=1.1,
    )
    out2, _ = curate_documents(docs, config=with_exact)
    assert {r["doc_id"] for r in out2.collect()} == {1, 2, 3}

    import pytest as _pytest

    with _pytest.raises(ValueError):
        curate_documents(
            docs, config=CurationConfig(dedup="fuzzy")
        )


def test_curation_boilerplate_stage_cleans_before_scoring(spark):
    """With boilerplate_min_df set, shared lines disappear from the
    curated text, and the dedup stage sees the cleaned text — two docs
    identical except for their boilerplate collapse to one."""
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    body1 = base.filter(F.col("doc_id") == 1).select("text").first()["text"]
    docs = base.select(
        "doc_id", "lang",
        F.when(
            # docs 1 and 2: same body, different per-doc banner line
            F.col("doc_id") == 1,
            F.lit("SHARED HEADER\nbanner of doc one\n" + body1),
        ).when(
            F.col("doc_id") == 2,
            F.lit("SHARED HEADER\nbanner of doc two\n" + body1),
        ).otherwise(
            F.concat(F.lit("SHARED HEADER\n"), F.col("text"))
        ).alias("text"),
    )
    cfg = CurationConfig(boilerplate_min_df=2, redact=False)
    out, counts = curate_documents(docs, config=cfg, count_stages=True)
    rows = out.collect()
    assert counts["boilerplate"] == counts["input"]
    # every surviving text lost the shared header line
    assert all("SHARED HEADER" not in r["text"] for r in rows)
    by_id = {r["doc_id"]: r["text"] for r in rows}
    # the unique banner lines survived the strip
    if 1 in by_id:
        assert by_id[1] == "banner of doc one\n" + body1
    if 2 in by_id:
        assert by_id[2] == "banner of doc two\n" + body1
    # control: docs 1 and 2 differ only in their unique banner, so both
    # may survive; but rerunning WITHOUT the banners makes them exact
    # duplicates after cleanup and exactly one survives
    dup_docs = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id").isin(1, 2),
            F.lit("SHARED HEADER\n" + body1),
        ).otherwise(F.col("text")),
    )
    out2, _ = curate_documents(dup_docs, config=cfg)
    ids2 = {r["doc_id"] for r in out2.collect()}
    surviving_pair = {1, 2} & ids2
    assert len(surviving_pair) <= 1
    if surviving_pair:
        assert surviving_pair == {1}  # min id is the keeper


def test_curation_span_strip_stage(spark):
    """With strip_span_ngram set, a passage shared across surviving
    documents disappears from the curated text while unique content
    stays."""
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    passage = (
        "repeated boilerplate passage words appearing verbatim in many "
        "documents across the corpus"
    )
    docs = base.select(
        "doc_id", "lang",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.col("text"), F.lit(" " + passage)),
        ).otherwise(F.col("text")).alias("text"),
    )
    cfg = CurationConfig(
        strip_span_ngram=6, redact=False, dedup=None
    )
    out, counts = curate_documents(docs, config=cfg, count_stages=True)
    rows_ = out.collect()
    assert counts["strip_spans"] == counts["quality"]
    assert rows_ and all(passage not in r["text"] for r in rows_)
    # the stage equals the standalone operator applied at that point
    # in the funnel (composition adds nothing)
    from haplorec_spark.operators.dedup import strip_duplicate_ngram_spans

    pre_ids = [r["doc_id"] for r in rows_]
    pre = docs.join(
        spark.createDataFrame([(i,) for i in pre_ids], "doc_id long"),
        "doc_id",
    )
    want = {
        r["doc_id"]: r["text_clean"]
        for r in strip_duplicate_ngram_spans(pre, n=6, min_df=2).collect()
    }
    assert {r["doc_id"]: r["text"] for r in rows_} == want


def test_curation_lm_floor_drops_gibberish(spark):
    """A seeded gibberish doc (OOV under the corpus's own token
    distribution) falls below the LM floor while normal docs pass."""
    from haplorec_spark.operators.text import unigram_logprob_score

    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    gib = " ".join(f"zxq{i}vw" for i in range(40))
    docs = base.select(
        "doc_id", "lang",
        F.when(F.col("doc_id") == 7, F.lit(gib))
         .otherwise(F.col("text")).alias("text"),
    )
    # pick a floor between the gibberish score and the corpus floor
    scores = {
        r["doc_id"]: r["avg_logprob"]
        for r in unigram_logprob_score(docs).collect()
    }
    others = [v for k, v in scores.items() if k != 7]
    assert scores[7] < min(others)
    floor = (scores[7] + min(others)) / 2

    cfg = CurationConfig(min_avg_logprob=floor, redact=False, dedup=None)
    out, counts = curate_documents(docs, config=cfg, count_stages=True)
    ids = {r["doc_id"] for r in out.collect()}
    assert 7 not in ids
    assert counts["lm_score"] == counts["quality"] - 1


def test_curation_chunking_inherits_split_and_packs_chunks(spark):
    """chunk_size cuts every kept document into windows AFTER split
    assignment: chunks of one doc all carry the doc's split, the text
    column holds chunk text bounded by chunk_size words, and packing
    runs over chunk_id (tape columns present per chunk)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    cfg = CurationConfig(seq_len=64, chunk_size=16, dedup=None)
    out, _ = curate_documents(docs, config=cfg)
    rows = out.collect()
    assert rows
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rs in by_doc.items():
        assert len({r["split"] for r in rs}) == 1, doc_id
        for r in rs:
            assert 1 <= len(r["text"].split(" ")) <= 16
            assert r["chunk_id"] == f"{doc_id}_{r['chunk_ix']}"
            assert r["seq_id"] is not None
    # chunk tiling covers the doc: starts are 0, 16, 32, ...
    some = max(by_doc.values(), key=len)
    assert sorted(r["chunk_start"] for r in some) == [
        16 * i for i in range(len(some))
    ]


def test_curation_ppl_bucket_cut(spark):
    """max_ppl_bucket keeps only the cleanest tiers: the kept set is
    exactly the docs whose bucket <= the cut on the pre-cut corpus."""
    from haplorec_spark.operators.text import perplexity_buckets

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    base = CurationConfig(
        dedup=None, redact=False, min_quality=0.0,
        max_dup_word_fraction=1.1, max_top_word_fraction=1.1,
    )
    pre, _ = curate_documents(docs, config=base)
    cfg = CurationConfig(
        dedup=None, redact=False, min_quality=0.0,
        max_dup_word_fraction=1.1, max_top_word_fraction=1.1,
        max_ppl_bucket=1, ppl_n_buckets=3,
    )
    out, counts = curate_documents(docs, config=cfg, count_stages=True)
    kept = {r["doc_id"] for r in out.collect()}
    want = {
        r["doc_id"]
        for r in perplexity_buckets(pre, n_buckets=3).collect()
        if r["ppl_bucket"] <= 1
    }
    assert kept == want
    assert counts["ppl_bucket"] < counts["quality"]  # the cut bites


def test_curation_classifier_gate(spark):
    """classifier_weights keeps exactly the docs whose sigmoid score
    clears min_classifier_prob on the pre-gate corpus."""
    from haplorec_spark.operators.text import linear_text_score

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    weights = {"the": 2.0, "and": 1.0, "data": -3.0}
    base = dict(
        dedup=None, redact=False, min_quality=0.0,
        max_dup_word_fraction=1.1, max_top_word_fraction=1.1,
    )
    pre, _ = curate_documents(docs, config=CurationConfig(**base))
    out, counts = curate_documents(
        docs,
        config=CurationConfig(
            **base, classifier_weights=weights, min_classifier_prob=0.55,
        ),
        count_stages=True,
    )
    kept = {r["doc_id"] for r in out.collect()}
    want = {
        r["doc_id"]
        for r in linear_text_score(pre, weights).collect()
        if r["prob"] >= 0.55
    }
    assert kept == want
    assert 0 < counts["classifier"] < counts["quality"]


def test_curation_leakage_safe_split_keeps_near_copies_together(spark):
    """With dedup='exact' a near-copy pair survives curation; the
    leakage_safe knob must still pin both members to one split."""
    # each document gets its own 24-word body (repeated id-derived
    # tokens), so unrelated docs share no shingles and only the seeded
    # copies collide in LSH
    rows = [
        (
            i,
            "en",
            " ".join(f"w{i}x{j} t{(i * 7 + j) % 97}" for j in range(12)),
        )
        for i in range(40)
    ]
    # ten near-copy pairs that exact dedup keeps (texts differ by tail)
    rows += [
        (100 + i, "en", rows[i][2] + " tiny tail") for i in range(10)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    cfg = CurationConfig(
        dedup="exact", redact=False, min_quality=0.0,
        max_dup_word_fraction=1.1, max_top_word_fraction=1.1,
        leakage_safe=True,
        splits={"train": 0.5, "test": 0.5},
    )
    out, _ = curate_documents(docs, config=cfg)
    got = {r["doc_id"]: r["split"] for r in out.collect()}
    assert len(got) == 50  # exact dedup drops nothing here
    from haplorec_spark.operators.dedup import lsh_candidate_pairs

    pairs = lsh_candidate_pairs(docs).collect()
    linked = [
        (p["doc_id_a"], p["doc_id_b"])
        for p in pairs
        if p["doc_id_a"] in got and p["doc_id_b"] in got
    ]
    assert linked  # the seeded near-copies produce candidate pairs
    for a, b in linked:
        assert got[a] == got[b], (a, b)
    assert "canonical_id" not in out.columns
    assert set(got.values()) == {"train", "test"}


def test_curation_normalized_dedup_catches_variants(spark):
    """normalize_for_dedup hashes folded text: case/punctuation
    variants collapse (min id survives, raw text kept); raw-hash
    dedup keeps all three."""
    docs = spark.createDataFrame(
        [
            (1, "en", "The QUICK brown fox!"),
            (2, "en", "the quick brown fox"),
            (3, "en", "Entirely different content here"),
        ],
        "doc_id long, lang string, text string",
    )
    base = dict(
        redact=False, min_quality=0.0,
        max_dup_word_fraction=1.1, max_top_word_fraction=1.1,
    )
    out, _ = curate_documents(
        docs, config=CurationConfig(normalize_for_dedup=True, **base)
    )
    rows = {r["doc_id"]: r["text"] for r in out.collect()}
    assert set(rows) == {1, 3}
    assert rows[1] == "The QUICK brown fox!"  # raw text survives
    out2, _ = curate_documents(docs, config=CurationConfig(**base))
    assert {r["doc_id"] for r in out2.collect()} == {1, 2, 3}


def test_curation_dsir_stage_selects_toward_target(spark):
    import pytest

    from haplorec_spark.operators.sampling import importance_resample

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(100)
    target = docs.filter(F.col("doc_id") % 5 == 0).select("doc_id", "text")
    # permissive thresholds isolate the DSIR stage: the curated id set
    # must equal the standalone operator's selection
    cfg = CurationConfig(
        min_quality=0.0,
        max_dup_word_fraction=1.1,
        max_top_word_fraction=1.1,
        redact=False,
        dedup=None,
        dsir_k=25,
        dsir_seed="cur",
    )
    out, counts = curate_documents(
        docs, config=cfg, target=target, count_stages=True
    )
    got = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    want = sorted(
        r["doc_id"]
        for r in importance_resample(
            docs, target, 25, seed="cur"
        ).collect()
    )
    assert got == want and counts["dsir"] == 25

    with pytest.raises(ValueError, match="requires a target"):
        curate_documents(docs, config=cfg)


def test_curation_upsample_mixture_replicas_share_split(spark):
    import pytest

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    cfg = CurationConfig(
        min_quality=0.0,
        max_dup_word_fraction=1.1,
        max_top_word_fraction=1.1,
        redact=False,
        dedup=None,
        mixture_weights={"en": 0.2, "de": 0.5, "zh": 0.3},
        mixture_mode="upsample",
        splits={"train": 0.7, "test": 0.3},
        seq_len=128,
    )
    out, counts = curate_documents(docs, config=cfg, count_stages=True)
    rows_ = out.select("doc_id", "split", "seq_id", "global_start").collect()
    # more output rows than surviving ORIGINAL docs: replication happened
    # (unlisted langs drop, so the comparison is per distinct source id)
    assert counts["mixture"] > len(
        {r["doc_id"].split("#")[0] for r in rows_}
    )

    # replicas of one source doc (id '<orig>#<replica>') share a split
    by_orig = {}
    for r in rows_:
        orig = r["doc_id"].split("#")[0]
        by_orig.setdefault(orig, set()).add(r["split"])
    assert any("#1" in r["doc_id"] for r in rows_)  # replication happened
    assert all(len(s) == 1 for s in by_orig.values())

    # per-split tape positions are unique per replica identity
    seen = set()
    for r in rows_:
        key = (r["split"], r["global_start"])
        assert key not in seen, key
        seen.add(key)

    with pytest.raises(ValueError, match="mixture_mode"):
        curate_documents(
            docs,
            config=CurationConfig(mixture_mode="sideways"),
        )


def test_curation_target_without_dsir_k_raises(spark):
    import pytest

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(20)
    with pytest.raises(ValueError, match="dsir_k is not set"):
        curate_documents(docs, target=docs)


def test_curation_bpe_token_accounting_mixture_and_pack(spark):
    """bpe_merges switches token accounting to tokenizer tokens: the
    mixture's keep set must equal mixture_sample over a PRECOMPUTED
    BPE count column (and a DuckDB band replica of the same math), and
    the packing tape's n_tokens must be the BPE counts, not whitespace
    counts."""
    import duckdb

    from haplorec_spark.operators.bpe import bpe_tokenize, train_bpe
    from haplorec_spark.operators.sampling import DUCK_BAND, mixture_sample

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    merges = train_bpe(docs, n_merges=25)
    weights = {"en": 0.4, "de": 0.6}
    # disable every other stage so the mixture is isolated
    cfg = CurationConfig(
        min_quality=0.0,
        max_dup_word_fraction=1.1,
        max_top_word_fraction=1.1,
        redact=False,
        dedup=None,
        mixture_weights=weights,
        seq_len=64,
    )
    out, _ = curate_documents(docs, config=cfg, bpe_merges=merges)
    rows = out.collect()
    got_ids = sorted(r["doc_id"] for r in rows)

    # equivalent run over an explicitly precomputed token column
    counts = bpe_tokenize(docs, merges).select("doc_id", "n_bpe_tokens")
    pre = docs.join(counts, "doc_id", "left").withColumn(
        "n_bpe_tokens", F.coalesce("n_bpe_tokens", F.lit(0))
    )
    want = mixture_sample(
        pre, weights, "lang", ["doc_id"], token_col="n_bpe_tokens"
    )
    assert got_ids == sorted(r["doc_id"] for r in want.collect())

    # DuckDB replica of the fraction math over the same precomputed
    # counts (registered as a table), selecting by the same band
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    con.execute("create table bpe_counts (doc_id bigint, n bigint)")
    con.executemany(
        "insert into bpe_counts values (?, ?)",
        [(r["doc_id"], r["n_bpe_tokens"]) for r in counts.collect()],
    )
    totals = dict(
        con.execute(
            """select d.lang, sum(coalesce(c.n, 0))
               from documents d left join bpe_counts c using (doc_id)
               where d.lang in ('en', 'de') group by d.lang"""
        ).fetchall()
    )
    s = min(totals[d] / w for d, w in weights.items())
    fr = {d: min(1.0, weights[d] * s / totals[d]) for d in weights}
    case = " ".join(
        f"WHEN lang = '{d}' THEN {int(f * (1 << 32))}"
        for d, f in fr.items()
    )
    duck_ids = [
        t[0]
        for t in con.execute(
            f"""
            SELECT doc_id FROM (
                SELECT doc_id, lang,
                       {DUCK_BAND.format(
                           key="'mixture' || chr(31) || doc_id::VARCHAR")}
                           AS band
                FROM documents WHERE lang IN ('en', 'de'))
            WHERE band < CASE {case} ELSE 0 END
            ORDER BY doc_id
            """
        ).fetchall()
    ]
    assert got_ids == duck_ids

    # realized mixture shares, measured in BPE tokens, near the target
    cnt = {r["doc_id"]: r["n_bpe_tokens"] for r in counts.collect()}
    lang_of = {
        r["doc_id"]: r["lang"]
        for r in docs.select("doc_id", "lang").collect()
    }
    by_lang = {"en": 0, "de": 0}
    for i in got_ids:
        by_lang[lang_of[i]] += cnt.get(i, 0)
    tot = sum(by_lang.values())
    for d, w in weights.items():
        assert abs(by_lang[d] / tot - w) / w < 0.15, (d, by_lang[d] / tot)

    # the packing tape budgeted in BPE tokens: n_tokens == BPE count
    for r in rows:
        assert r["n_tokens"] == cnt.get(r["doc_id"], 0)
    # and the helper accounting columns never leak into the output
    assert "__mix_tokens" not in out.columns
    assert "__pack_tokens" not in out.columns


def test_curation_token_accounting_guards(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    import pytest

    with pytest.raises(ValueError, match="mutually exclusive"):
        curate_documents(
            docs,
            config=CurationConfig(token_col="n"),
            bpe_merges=docs.limit(0),
        )
    with pytest.raises(ValueError, match="chunk"):
        curate_documents(
            docs, config=CurationConfig(token_col="n", chunk_size=10)
        )


def test_curation_token_col_feeds_mixture_and_pack(spark):
    """config.token_col: a precomputed count column drives both the
    mixture shares and the packing tape."""
    from haplorec_spark.operators.sampling import mixture_sample

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").withColumn(
        "my_tokens", (F.col("doc_id") % 7 + 1).cast("long")
    )
    weights = {"en": 0.5, "de": 0.5}
    cfg = CurationConfig(
        min_quality=0.0,
        max_dup_word_fraction=1.1,
        max_top_word_fraction=1.1,
        redact=False,
        dedup=None,
        mixture_weights=weights,
        token_col="my_tokens",
        seq_len=32,
    )
    out, _ = curate_documents(docs, config=cfg)
    want = mixture_sample(
        docs, weights, "lang", ["doc_id"], token_col="my_tokens"
    )
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in want.collect()
    )
    for r in out.collect():
        assert r["n_tokens"] == r["my_tokens"]


def test_curation_mixture_alpha_passthrough(spark):
    """mixture_alpha=1.0 is the identity mixture inside curation."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    cfg = CurationConfig(
        min_quality=0.0,
        max_dup_word_fraction=1.1,
        max_top_word_fraction=1.1,
        redact=False,
        dedup=None,
        mixture_alpha=1.0,
    )
    out, _ = curate_documents(docs, config=cfg)
    in_ids = sorted(
        r["doc_id"]
        for r in docs.filter(F.col("lang").isNotNull()).collect()
    )
    assert sorted(r["doc_id"] for r in out.collect()) == in_ids


def test_curation_detect_language_drives_filter_and_mixture(spark):
    """detect_language derives lang from the text (input has none), so
    the language keep-list and the mixture operate on predictions."""
    from haplorec_spark.operators.text import with_language

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").drop("lang")
    cfg = CurationConfig(
        detect_language="ngram",
        languages=["en", "de"],
        min_quality=0.0,
        max_dup_word_fraction=1.1,
        max_top_word_fraction=1.1,
        redact=False,
        dedup=None,
    )
    out, counts = curate_documents(docs, config=cfg, count_stages=True)
    rows = out.collect()
    assert rows
    pred = {
        r["doc_id"]: r["lang"] for r in with_language(docs).collect()
    }
    assert all(r["lang"] == pred[r["doc_id"]] for r in rows)
    assert {r["lang"] for r in rows} <= {"en", "de"}
    assert counts["language"] == sum(
        1 for v in pred.values() if v in ("en", "de")
    )


def test_map_side_curation_matches_batch_subset(spark):
    """On a map-side-only config, map_side_curation's one-chain face
    must keep exactly the rows/columns the full batch pipeline keeps."""
    from haplorec_spark.curation import map_side_curation

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    cfg = CurationConfig(
        languages=["en", "de"],
        classifier_weights={"the": 0.4, "slow": -0.7},
        classifier_bias=0.1,
        min_classifier_prob=0.4,
        dedup=None,
    )
    fast = map_side_curation(docs, cfg)
    full, _ = curate_documents(docs, config=cfg)
    cols = sorted(full.columns)
    assert sorted(fast.columns) == cols
    assert sorted(
        tuple(r) for r in fast.select(*cols).collect()
    ) == sorted(tuple(r) for r in full.select(*cols).collect())
    # zero Exchange: the whole chain is one map-side stage set
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_map_side_curation_rejects_global_stages(spark):
    import pytest

    from haplorec_spark.curation import map_side_curation

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    for bad in (
        CurationConfig(mixture_weights={"en": 1.0}),
        CurationConfig(dsir_k=10),
        CurationConfig(seq_len=128),
        CurationConfig(chunk_size=50),
        CurationConfig(min_avg_logprob=-5.0),
        CurationConfig(boilerplate_min_df=2),
        CurationConfig(leakage_safe=True),
    ):
        with pytest.raises(ValueError, match="batch-only"):
            map_side_curation(docs, bad)
    with pytest.raises(ValueError, match="literal-map"):
        map_side_curation(
            docs,
            CurationConfig(
                classifier_weights={f"w{i}": 0.1 for i in range(2500)}
            ),
        )


def test_map_side_curation_rejects_clobbering_columns(spark):
    import pytest

    from haplorec_spark.curation import map_side_curation

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").withColumn(
        "quality", F.lit(0.99)
    )
    with pytest.raises(ValueError, match="quality"):
        map_side_curation(docs, CurationConfig(dedup=None))


def test_curation_detect_language_model_rung(spark):
    """detect_language="model" + language_model wires the TRAINED rung
    into both curation faces: predictions come from the pinned literal
    model, the keep-list filters on them, and the map-side face stays
    one shuffle-free chain."""
    from haplorec_spark.curation import map_side_curation
    from haplorec_spark.operators.text import (
        PINNED_LANGID_MODEL,
        language_id_model,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").drop("lang")
    cfg = CurationConfig(
        detect_language="model",
        language_model=PINNED_LANGID_MODEL,
        languages=["en", "de"],
        min_quality=0.0,
        max_dup_word_fraction=1.1,
        max_top_word_fraction=1.1,
        redact=False,
        dedup=None,
    )
    pred = {
        r["doc_id"]: r["predicted_lang"]
        for r in language_id_model(docs, PINNED_LANGID_MODEL).collect()
    }
    out, counts = curate_documents(docs, config=cfg, count_stages=True)
    rows = out.collect()
    assert rows
    assert all(r["lang"] == pred[r["doc_id"]] for r in rows)
    assert {r["lang"] for r in rows} <= {"en", "de"}
    assert counts["language"] == sum(
        1 for v in pred.values() if v in ("en", "de")
    )
    fast = map_side_curation(docs, cfg)
    assert sorted(r["doc_id"] for r in fast.collect()) == sorted(
        r["doc_id"] for r in rows
    )
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_single_pass_counts_match_legacy_per_stage_jobs(spark):
    """Round-7 single-pass stage accounting must reproduce exactly the
    counts the per-stage count() jobs used to produce — replicated
    here stage by stage with the same operators (the legacy
    computation, kept as the independent reference)."""
    from haplorec_spark.operators.text import (
        linear_text_score,
        perplexity_buckets,
        quality_score,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    w = {"the": 0.4, "slow": -0.7}
    cfg = CurationConfig(
        languages=["en", "de"],
        min_quality=0.3,
        classifier_weights=w,
        classifier_bias=0.1,
        min_classifier_prob=0.4,
        max_ppl_bucket=1,
        ppl_n_buckets=3,
        redact=True,
        dedup="exact",
    )
    _out, counts = curate_documents(docs, config=cfg, count_stages=True)

    # legacy reference: progressive filters, one count each
    ref = {}
    d = docs
    ref["input"] = d.count()
    d = d.filter(F.col("lang").isin("en", "de"))
    ref["language"] = d.count()
    q = quality_score(d, include_repetition=True).filter(
        (F.col("quality") >= cfg.min_quality)
        & (F.col("dup_word_fraction") < cfg.max_dup_word_fraction)
        & (F.col("top_word_fraction") <= cfg.max_top_word_fraction)
    )
    d = d.join(q.select("doc_id"), "doc_id")
    ref["quality"] = d.count()
    clf = linear_text_score(
        d, w, bias=cfg.classifier_bias
    ).filter(F.col("prob") >= cfg.min_classifier_prob)
    d = d.join(clf.select("doc_id"), "doc_id")
    ref["classifier"] = d.count()
    tiers = perplexity_buckets(d, n_buckets=3).filter(
        F.col("ppl_bucket") <= 1
    )
    d = d.join(tiers.select("doc_id"), "doc_id")
    ref["ppl_bucket"] = d.count()
    ref["redact"] = ref["ppl_bucket"]  # row-preserving attach
    keep = (
        d.select("doc_id", F.md5(F.col("text")).alias("__h"))
        .groupBy("__h")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    d = d.join(keep, "doc_id")
    ref["dedup"] = d.count()
    ref["split"] = ref["dedup"]

    assert counts == ref, (counts, ref)


def test_single_pass_counts_with_lm_and_decontaminate(spark):
    """Corpus-global stages whose predicate depends on the surviving
    prefix (self-trained LM floor, benchmark decontamination) flag
    against the chain's own keep-sets — counts must equal the legacy
    progressive computation."""
    from haplorec_spark.operators.sampling import decontaminate
    from haplorec_spark.operators.text import (
        quality_score,
        unigram_logprob_score,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    bench = docs.limit(3).select("doc_id", "text")
    cfg = CurationConfig(
        min_quality=0.3,
        min_avg_logprob=-3.5,
        redact=False,
        dedup=None,
        decontaminate_ngram=8,
    )
    _out, counts = curate_documents(
        docs, benchmark=bench, config=cfg, count_stages=True
    )

    d = docs
    ref = {"input": d.count()}
    q = quality_score(d, include_repetition=True).filter(
        (F.col("quality") >= cfg.min_quality)
        & (F.col("dup_word_fraction") < cfg.max_dup_word_fraction)
        & (F.col("top_word_fraction") <= cfg.max_top_word_fraction)
    )
    d = d.join(q.select("doc_id"), "doc_id")
    ref["quality"] = d.count()
    lm = unigram_logprob_score(d).filter(
        F.col("avg_logprob") >= cfg.min_avg_logprob
    )
    d = d.join(lm.select("doc_id"), "doc_id")
    ref["lm_score"] = d.count()
    d = decontaminate(d, bench, n=8)
    ref["decontaminate"] = d.count()
    ref["split"] = ref["decontaminate"]
    assert counts == ref, (counts, ref)


def test_single_pass_counts_cost_one_extra_action_map_side(spark):
    """For a map-side-only survival config the whole survival audit is
    ONE extra Spark action (the flag aggregate) on top of what a plain
    curated-output materialization costs — NOT one count job per
    stage. Measured via the status tracker: the audited run may exceed
    the baseline (chain + one count of the output) by at most the
    aggregate's own AQE sub-jobs, and must stay strictly below one
    action per survival stage."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    cfg = CurationConfig(
        languages=["en", "de"],
        min_quality=0.3,
        classifier_weights={"the": 0.4},
        redact=True,
        dedup=None,
    )
    tracker = spark.sparkContext._jsc.sc().statusTracker()
    sc = spark.sparkContext
    sc.setJobGroup("curation-base", "baseline")
    try:
        out, _ = curate_documents(docs, config=cfg, count_stages=False)
        out.count()
        base = len(tracker.getJobIdsForGroup("curation-base"))
        sc.setJobGroup("curation-audit", "single-pass audit")
        _out, counts = curate_documents(docs, config=cfg, count_stages=True)
        audit = len(tracker.getJobIdsForGroup("curation-audit"))
    finally:
        sc.setJobGroup(None, None)
    assert set(counts) == {
        "input", "language", "quality", "classifier", "redact", "split"
    }
    # one extra action ≈ 2 AQE sub-jobs; 6 audited stages would have
    # cost ≥ 6 extra actions under the legacy per-stage counting
    assert audit - base <= 3, (audit, base)
    assert audit - base < len(counts) - 1, (audit, base)


def test_curation_language_floor_drops_oov_text(spark):
    """language_min_score composes with the languages= keep-list: raw
    gibberish that the argmax would mislabel into the keep-list now
    lands in 'und' and is dropped, and the stage accounting shows the
    new drops."""
    from haplorec_spark.operators.text import with_language

    real = spark.read.parquet(f"{SF_DIR}/documents.parquet").drop("lang")
    gib = spark.createDataFrame(
        [
            (900001, "qzx wvv kkjq zzt bbrm plok"),
            (900002, ";;; ### @@@ %%% &&&"),
        ],
        real.select("doc_id", "text").schema,
    )
    docs = real.select("doc_id", "text").unionByName(gib)
    floor = 0.09
    base = dict(
        detect_language="ngram",
        languages=["en", "de"],
        min_quality=0.0,
        max_dup_word_fraction=1.1,
        max_top_word_fraction=1.1,
        redact=False,
        dedup=None,
    )
    out_f, counts_f = curate_documents(
        docs,
        config=CurationConfig(language_min_score=floor, **base),
        count_stages=True,
    )
    kept = {r["doc_id"] for r in out_f.collect()}
    assert not kept & {900001, 900002}
    # parity with the operator's own floored predictions
    pred = {
        r["doc_id"]: r["lang"]
        for r in with_language(docs, min_score=floor).collect()
    }
    assert counts_f["language"] == sum(
        1 for v in pred.values() if v in ("en", "de")
    )
    # the floor must be the thing that dropped them: without it the
    # argmax files the gibberish under SOME in-inventory label
    assert pred[900001] == "und" and pred[900002] == "und"
    out_nf, counts_nf = curate_documents(
        docs, config=CurationConfig(**base), count_stages=True
    )
    assert counts_nf["language"] >= counts_f["language"]


def test_reject_reservoir_captures_why_documents_died(spark):
    """Round-8 reject sampling: with reject_sample_k the chain also
    returns up to k deterministic hash-minimum rejects PER stage,
    labeled with the FIRST stage whose predicate the document failed
    — so an operator can inspect why data died without re-running
    the chain."""
    rows = (
        # survives everything
        [(i, "the house and the water and the people are here today "
              "and the children are reading the words", "web")
         for i in range(10)]
        # dies at the language keep-list (French)
        + [(100 + i, "le chat est dans la maison avec les enfants et "
                     "nous parlons pendant la soiree ensemble", "web")
           for i in range(5)]
        # dies at quality (too short once language passes)
        + [(200 + i, "the end", "web") for i in range(5)]
    )
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, domain string"
    )
    # "the end" scores 0.6 (length gate 0 at 2 words, word-len 0.3,
    # stopword 0.3) — below 0.7; the long English docs score 1.0
    cfg = CurationConfig(
        detect_language="lexicon",
        languages=["en"],
        min_quality=0.7,
        max_dup_word_fraction=1.1,
        max_top_word_fraction=1.1,
        redact=False,
        dedup=None,
    )
    out, counts, rejects = curate_documents(
        docs, config=cfg, count_stages=True, reject_sample_k=3
    )
    got = rejects.collect()
    by_stage: dict[str, list] = {}
    for r in got:
        by_stage.setdefault(r["stage"], []).append(r)
    # bounded per stage
    assert all(len(v) <= 3 for v in by_stage.values())
    # the French docs die at the language stage, the stubs at quality
    assert {r["doc_id"] for r in by_stage["language"]} <= set(
        range(100, 105)
    )
    assert {r["doc_id"] for r in by_stage["quality"]} <= set(
        range(200, 205)
    )
    # first-failure semantics: every reject appears exactly once
    assert len({r["doc_id"] for r in got}) == len(got)
    # deterministic: a rerun reproduces the reservoir exactly
    _, _, rejects2 = curate_documents(
        docs, config=cfg, count_stages=True, reject_sample_k=3
    )
    assert sorted(map(tuple, got)) == sorted(
        map(tuple, rejects2.collect())
    )
    # counts unchanged vs the 2-tuple face
    out0, counts0 = curate_documents(docs, config=cfg, count_stages=True)
    assert counts0 == counts
    # guard rails
    import pytest

    with pytest.raises(ValueError, match="count_stages"):
        curate_documents(docs, config=cfg, reject_sample_k=3)
    with pytest.raises(ValueError, match=">= 1"):
        curate_documents(
            docs, config=cfg, count_stages=True, reject_sample_k=0
        )


def test_curation_report_golden(spark):
    """Round-9 curation_report: the survival dashboard composes the
    stage counts, the reject reservoirs, and the lazy corpus profile
    from ONE curate_documents run — golden-checked over a fixture
    whose every document has a known fate."""
    from haplorec_spark.curation import curation_report

    rows = (
        [(i, "the house and the water and the people are here today "
              "and the children are reading the words", "web")
         for i in range(8)]
        + [(100 + i, "le chat est dans la maison avec les enfants et "
                     "nous parlons pendant la soiree ensemble", "web")
           for i in range(4)]
        + [(200 + i, "the end", "web") for i in range(3)]
    )
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, domain string"
    )
    cfg = CurationConfig(
        detect_language="lexicon",
        languages=["en"],
        min_quality=0.7,
        max_dup_word_fraction=1.1,
        max_top_word_fraction=1.1,
        redact=False,
        dedup=None,
    )
    report, curated, profile = curation_report(
        docs, config=cfg, reject_sample_k=2, max_sample_chars=20
    )
    rep = {r["stage"]: r for r in report.collect()}
    # chain arithmetic: input 15 -> language drops the 4 French ->
    # quality drops the 3 stubs -> split keeps rows
    assert rep["input"]["n_in"] == 15 and rep["input"]["n_out"] == 15
    assert rep["language"]["n_in"] == 15
    assert rep["language"]["n_out"] == 11
    assert rep["language"]["n_dropped"] == 4
    assert rep["language"]["drop_rate"] == round(4 / 15, 6)
    assert rep["quality"]["n_in"] == 11
    assert rep["quality"]["n_out"] == 8
    # every stage's n_in is the previous stage's n_out (chain order)
    by_order = [r["stage"] for r in report.collect()]
    chain = {r["stage"]: (r["n_in"], r["n_out"]) for r in report.collect()}
    prev = None
    for s in by_order:
        if prev is not None:
            assert chain[s][0] == chain[prev][1], (s, prev)
        prev = s
    # reservoirs: bounded, truncated, and from the right population
    lang = rep["language"]
    assert len(lang["sample_reject_ids"]) == 2
    assert set(lang["sample_reject_ids"]) <= {str(100 + i) for i in range(4)}
    assert all(len(t) <= 20 for t in lang["sample_rejects"])
    qual = rep["quality"]
    assert set(qual["sample_reject_ids"]) <= {str(200 + i) for i in range(3)}
    # surviving stages carry empty reservoirs
    assert rep["input"]["sample_reject_ids"] == []
    # curated output = the 8 good docs (now split-labeled)
    assert {r["doc_id"] for r in curated.collect()} == set(range(8))
    # the lazy profile is the INPUT corpus's dashboard
    prof = {r["metric"]: r["value"] for r in profile.collect()}
    assert prof["n_docs"] == 15.0
    # determinism: a rerun reproduces the report bit-for-bit
    report2, _, _ = curation_report(
        docs, config=cfg, reject_sample_k=2, max_sample_chars=20
    )
    assert sorted(map(tuple, report.collect())) == sorted(
        map(tuple, report2.collect())
    )


def test_lm_order_three_catches_word_order_damage(spark):
    """The lm_order knob's reason to exist: a word-shuffled document
    passes the unigram rung (same words) but fails the trigram rung
    (wrong order)."""
    from pyspark.sql import functions as F

    from haplorec_spark.curation import CurationConfig, curate_documents

    base = "the cat sat on the mat and the dog sat on the rug"
    shuffled = "mat the on dog sat the rug and cat the on sat the"
    docs = spark.createDataFrame(
        [(i, base) for i in range(10)] + [(99, shuffled)],
        "doc_id BIGINT, text STRING",
    )

    def kept(order, floor):
        cfg = CurationConfig(
            min_quality=0.0, max_dup_word_fraction=1.1,
            max_top_word_fraction=1.1,
            min_avg_logprob=floor, lm_order=order,
            redact=False, dedup=None,
        )
        out, _ = curate_documents(docs, config=cfg)
        return {r["doc_id"] for r in out.select("doc_id").collect()}

    # unigram rung: identical word multiset scores identically -> all kept
    assert 99 in kept(1, -2.0)
    # trigram rung: the shuffled doc scores strictly lower; a floor
    # between the two keeps the naturals and drops the shuffle
    from haplorec_spark.operators.text import trigram_logprob_score

    scores = {
        r["doc_id"]: r["avg_logprob"]
        for r in trigram_logprob_score(docs).collect()
    }
    floor = (scores[0] + scores[99]) / 2
    k3 = kept(3, floor)
    assert 99 not in k3 and 0 in k3


def test_lm_order_invalid_raises(spark):
    import pytest as _pytest

    from haplorec_spark.curation import CurationConfig, curate_documents

    docs = spark.createDataFrame([(1, "a b c")], "doc_id BIGINT, text STRING")
    with _pytest.raises(ValueError, match="lm_order"):
        curate_documents(
            docs,
            config=CurationConfig(
                min_avg_logprob=-1.0, lm_order=4, dedup=None, redact=False
            ),
        )


def test_lm_order_null_score_is_not_gibberish(spark):
    """A document too short to have any n-gram at the chosen order
    scores NULL and must SURVIVE the LM gate (review-caught: the >=
    filter silently deleted every 1-2 word doc under lm_order=3)."""
    from haplorec_spark.curation import CurationConfig, curate_documents

    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "hi there")],
        "doc_id BIGINT, text STRING",
    )
    out, _ = curate_documents(
        docs,
        config=CurationConfig(
            min_quality=0.0, max_dup_word_fraction=1.1,
            max_top_word_fraction=1.1,
            min_avg_logprob=-99.0, lm_order=3, redact=False, dedup=None,
        ),
    )
    assert {r["doc_id"] for r in out.select("doc_id").collect()} == {1, 2}


def test_blocked_terms_gate_batch_and_map_side_agree(spark):
    from haplorec_spark.curation import (
        CurationConfig,
        curate_documents,
        map_side_curation,
    )

    docs = spark.createDataFrame(
        [
            (1, "perfectly clean text about spark joins and windows "
                "with plenty of the a of and to in is words here"),
            (2, "one naughtyword inside otherwise clean text "
                "with plenty of the a of and to in is words here"),
            (3, "naughtyword naughtyword naughtyword everywhere "
                "with plenty of the a of and to in is words here"),
        ],
        "doc_id BIGINT, text STRING",
    )
    strict = CurationConfig(
        blocked_terms=["naughtyword"], min_quality=0.0,
        max_dup_word_fraction=1.1, max_top_word_fraction=1.1,
        redact=False, dedup=None,
    )
    out, counts = curate_documents(docs, config=strict, count_stages=True)
    assert {r["doc_id"] for r in out.collect()} == {1}  # ANY hit drops
    assert counts["blocked_terms"] == 1
    ms = {r["doc_id"] for r in map_side_curation(docs, strict).collect()}
    assert ms == {1}  # the streaming-safe chain applies the same gate

    graded = CurationConfig(
        blocked_terms=["naughtyword"], max_blocked_fraction=0.1,
        min_quality=0.0, max_dup_word_fraction=1.1,
        max_top_word_fraction=1.1, redact=False, dedup=None,
    )
    out2, _ = curate_documents(docs, config=graded)
    # doc 2's fraction (1/16) passes a 10% budget; doc 3's (3/16) fails
    assert {r["doc_id"] for r in out2.collect()} == {1, 2}


# ------------------------------ CJK end-to-end fixture (round 10)

#: Mixed-script curation fixture: 4 good prose docs per language
#: (en/fr/zh/ja/ko/th), plus one seeded failure per gate — an exact
#: zh duplicate (dedup), a th duplicate (dedup), gibberish (language
#: keep-list via the und floor), zh single-character spam
#: (repetition), and an en doc lifted verbatim from the benchmark
#: (decontamination). One test pins the keep-rate of every language
#: through the FULL chain, so a regression in any segmentation-aware
#: stage (quality, language id, token accounting, dedup shingles,
#: decontamination) fails here instead of in five places.
_CJK_GOOD = {
    "en": [
        "the house is big and the water is cold in the winter time",
        "we read a book in the school and the children play in the garden",
        "it is a good day and the sun is warm on the river in the morning",
        "they have a small dog and the dog runs to the door of the house",
    ],
    "fr": [
        "la maison est grande et le chat dort dans le jardin pendant la nuit",
        "les enfants lisent un livre dans une école et le chien est petit",
        "le matin est beau et la rivière est froide dans la montagne",
        "elle est dans la cuisine et le pain est sur la table de la maison",
    ],
    "zh": [
        "我们的房子很大冬天的水很冷孩子们在学校读书我们一起去看朋友",
        "他从窗户看那些鸟早上的天气很好我们在花园里说话",
        "她们晚上一起唱歌孩子们喜欢在河边玩水天气很暖和",
        "我有一只小狗它每天跑到门口等我回家然后我们一起吃饭",
    ],
    "ja": [
        "わたしたちのいえはおおきいですふゆのみずはつめたいこどもはほんをよみます",
        "あさのてんきはとてもいいですにわでともだちとはなしをします",
        "よるにみんなでうたをうたいますこどもはかわであそぶのがすきです",
        "ちいさないぬがいますまいにちドアのまえでまっていますいっしょにごはんをたべます",
    ],
    "ko": [
        "우리 집은 크다 겨울 물은 차갑다 아이들은 학교에서 책을 읽는다 그 사람은 지금 여기 있다",
        "오늘 날씨가 정말 좋은 것 같다 우리 모두 여기 함께 있다 그 사람 하나 이 수 있다",
        "지금 거기 누구 있다 우리 모든 사람 함께 보다 다른 것 없다 정말 좋은 때 같다",
        "이 작은 개 하나 있다 그 개 지금 여기 우리 보다 하다 무엇 되다 많은 사람 같다",
    ],
    "th": [
        "บ้านของเราใหญ่มากน้ำในฤดูหนาวเย็นมากเด็กอ่านหนังสือที่โรงเรียนเราไปหาเพื่อนด้วยกัน",
        "อากาศตอนเช้าดีมากเราคุยกับเพื่อนในสวนสุนัขรอที่หน้าประตู",
        "ตอนกลางคืนเราร้องเพลงด้วยกันเด็กชอบเล่นน้ำที่แม่น้ำอากาศอบอุ่น",
        "มีสุนัขตัวเล็กมันรอที่ประตูทุกวันแล้วเรากินข้าวด้วยกันเรามีความสุข",
    ],
}


def test_cjk_end_to_end_curation_keep_rates(spark):
    from haplorec_spark.curation import CurationConfig, curate_documents

    rows, truth = [], {}
    i = 0
    for lang, texts in _CJK_GOOD.items():
        for t in texts:
            rows.append((i, t))
            truth[i] = ("good", lang)
            i += 1
    seeded = [
        ("dup_zh", _CJK_GOOD["zh"][0]),
        ("dup_th", _CJK_GOOD["th"][0]),
        ("gibberish", "qqq zzz xxx vvv kkk jjj www yyy hhh ggg fff ddd"),
        ("spam_zh", "的" * 60),
        ("contaminated", "this exact sentence lives inside the held "
                         "out benchmark suite and must never survive "
                         "into the training corpus at all"),
    ]
    for kind, t in seeded:
        rows.append((i, t))
        truth[i] = (kind, None)
        i += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame(
        [(1, seeded[-1][1])], "doc_id long, text string"
    )
    cfg = CurationConfig(
        detect_language="ngram",
        language_min_score=0.15,
        languages=("en", "fr", "zh", "ja", "ko", "th"),
        min_quality=0.5,
        dedup="exact",
        segmentation="script",
    )
    curated, counts = curate_documents(
        docs, bench, cfg, count_stages=True
    )
    kept = {r["doc_id"] for r in curated.select("doc_id").collect()}
    # every good doc of every language survives the full chain
    by_lang: dict = {}
    for did, (kind, lang) in truth.items():
        if kind == "good":
            by_lang.setdefault(lang, []).append(did in kept)
    for lang, oks in by_lang.items():
        assert all(oks), f"{lang}: good docs dropped {oks}"
    # every seeded failure dies — except exactly ONE of each duplicate
    # pair survives (the duplicate copy dies, the original lives)
    for did, (kind, _) in truth.items():
        if kind in ("gibberish", "spam_zh", "contaminated"):
            assert did not in kept, kind
        elif kind in ("dup_zh", "dup_th"):
            assert did not in kept, f"{kind}: copy must lose to the original"
    # the language column is the detected one; check a sample
    langs = {
        r["doc_id"]: r["lang"]
        for r in curated.select("doc_id", "lang").collect()
    }
    for did, (kind, lang) in truth.items():
        if kind == "good" and did in langs:
            assert langs[did] == lang, (did, langs[did], lang)


def test_encoding_gate_drops_damaged_docs(spark):
    from haplorec_spark.curation import CurationConfig, curate_documents

    good = "the house is big and the water is cold in the winter time"
    docs = spark.createDataFrame(
        [
            (1, good),
            (2, good + " but Ã© broken â€™ badly Ã¼ mojibake Â« here"),
            (3, good + " �����"),
        ],
        "doc_id long, text string",
    )
    cfg = CurationConfig(dedup=None, max_encoding_damage=0.01)
    out, counts = curate_documents(docs, config=cfg, count_stages=True)
    kept = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert kept == {1}
    assert counts["encoding"] == 1  # the audit stage counted the drop


def test_repair_encoding_recovers_mojibake_docs(spark):
    """The keep-rate delta the repair buys: a seeded corpus where half
    the damaged documents carry REVERSIBLE cp1252 mojibake. Without
    repair the encoding gate drops them all; with
    ``repair_encoding=True`` the reversible ones are restored and
    KEPT (their text now clean), while irreversible U+FFFD loss is
    still dropped — measured on both curation faces."""
    from haplorec_spark.curation import (
        CurationConfig,
        curate_documents,
        map_side_curation,
    )

    good = "the house is big and the water is cold in the winter time"
    rows_ = [(i, good) for i in range(10)]
    rows_ += [
        (10 + i, good + " CafÃ© â€™ donâ€™t Ã¼ber Â« but fixable")
        for i in range(5)
    ]
    rows_ += [(20 + i, good + " ����� lost forever") for i in range(5)]
    docs = spark.createDataFrame(rows_, "doc_id long, text string")

    base = dict(dedup=None, max_encoding_damage=0.01)
    plain, counts_plain = curate_documents(
        docs, config=CurationConfig(**base), count_stages=True
    )
    kept_plain = {r["doc_id"] for r in plain.select("doc_id").collect()}
    repaired, counts_rep = curate_documents(
        docs,
        config=CurationConfig(**base, repair_encoding=True),
        count_stages=True,
    )
    kept_rep = {r["doc_id"] for r in repaired.select("doc_id").collect()}

    assert kept_plain == set(range(10))           # keep rate 10/20
    assert kept_rep == set(range(15))             # keep rate 15/20
    # per-stage survivor counts: repair turns 5 mojibake drops into keeps
    assert counts_plain["encoding"] == 10
    assert counts_rep["encoding"] == 15
    # the kept mojibake docs carry RESTORED text
    texts = {
        r["doc_id"]: r["text"]
        for r in repaired.filter("doc_id >= 10").collect()
    }
    for t in texts.values():
        assert "Café ’ don’t über « but fixable" in t

    # streaming face: same decisions from the same config
    stream_kept = {
        r["doc_id"]
        for r in map_side_curation(
            docs, CurationConfig(**base, repair_encoding=True)
        ).collect()
    }
    assert stream_kept == kept_rep
