"""End-to-end corpus curation: the composed face of the training-data
operators, mirroring how ``pipeline.Pipeline`` composes the haplorec
stages.

``curate_documents`` chains the standard corpus-preparation sequence —
language keep-list → cross-document boilerplate-line strip → quality +
repetition filters → unigram-LM score floor → linear-classifier gate →
perplexity-tier cut →
PII redaction → document dedup → span-level duplicated-passage strip →
eval-set decontamination → DSIR target-domain selection → domain
mixture → split assignment →
sliding-window chunking → sequence packing — each stage an existing
operator from
``operators/``, each individually oracle- or replica-verified. The
composition itself adds NO new shuffles beyond its stages: filters and
redaction stay map-side; dedup, decontamination, mixture, and packing
keep their documented plans.

Every stage is deterministic (hash-based selection, content-hash
dedup), so a rerun — or a run on a differently-partitioned copy —
produces the identical curated corpus. That property is what makes
backfills and incremental drops safe, and the tests pin it.

Stage counts are OPTIONAL (``count_stages=True``) and, from round 7,
SINGLE-PASS over the document-survival prefix: per-doc map-side stages
become boolean flag columns (the same shared expressions the chain
filters on), corpus-global stages become left-join flags against the
chain's own keep-sets, and one aggregate resolves every survival
count — a map-side-only config audits in ONE corpus scan
(test-pinned). Only the row-reshaping tail (mixture, split, chunk,
pack) still costs one count job per stage. Default off, the plan
stays one lazy graph.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from haplorec_spark.operators.packing import _SEP as _PACK_SEP
from haplorec_spark.operators.packing import pack_sequences
from haplorec_spark.operators.sampling import (
    decontaminate,
    hash_split,
    mixture_sample,
)
from haplorec_spark.operators.dedup import strip_duplicate_ngram_spans
from haplorec_spark.operators.text import (
    chunk_documents,
    linear_text_score,
    perplexity_buckets,
    quality_score,
    redact_pii,
    strip_boilerplate_lines,
    unigram_logprob_score,
)


@dataclass(frozen=True)
class CurationConfig:
    """Knobs for :func:`curate_documents`; defaults follow common
    corpus-filtering practice (quality floor, Gopher repetition cut,
    90/5/5-style splits are the caller's choice)."""

    languages: Sequence[str] | None = None
    #: derive ``lang_col`` from the text BEFORE any language-dependent
    #: stage ("ngram" = trigram profiles, "lexicon" = whole-word
    #: stopword scan, "model" = the trained char-n-gram rung, which
    #: additionally needs ``language_model`` — all map-side, no
    #: join); None trusts the input's existing column. For corpora
    #: with no language metadata (raw crawl), set this or the
    #: language filter/mixture see nulls.
    detect_language: str | None = None
    #: the distilled literal model for ``detect_language="model"``:
    #: {lang: (bias, {feature: weight})} under the map-side literal
    #: bound (text.MAX_LITERAL_FEATURES; ``training.top_features``
    #: produces it)
    language_model: Mapping | None = None
    #: unknown-language floor for ``detect_language``: documents whose
    #: best rung score falls below it are labeled ``und`` (ISO 639-2
    #: undetermined) instead of forced onto the least-bad in-inventory
    #: language — then the ``languages=`` keep-list drops them (or
    #: keeps them, if 'und' is listed). On a raw crawl — mostly
    #: out-of-inventory text — this is what makes ``languages=``
    #: filtering mean what it says. None keeps the argmax behavior.
    language_min_score: float | None = None
    #: strip lines shared by >= this many documents before any
    #: doc-level scoring (None skips the stage)
    boilerplate_min_df: int | None = None
    min_quality: float = 0.7
    max_dup_word_fraction: float = 0.9
    max_top_word_fraction: float = 0.5
    #: C4-style blocklist gate: drop documents whose whole-word
    #: blocked-term fraction EXCEEDS max_blocked_fraction (the 0.0
    #: default = any hit drops, C4's policy; raise it for a graded
    #: cut). None skips the stage. Map-side literal InSet under
    #: text.MAX_LITERAL_FEATURES.
    blocked_terms: Sequence[str] | None = None
    max_blocked_fraction: float = 0.0
    #: crawl-decode QA gate: drop documents whose encoding_damage
    #: (replacement-char + stray-control + mojibake per-character
    #: rates, ``text.encoding_quality``) exceeds this; None skips.
    #: Map-side regexp counts, zero shuffle.
    max_encoding_damage: float | None = None
    #: repair the dominant UTF-8-read-as-cp1252 mojibake BEFORE any
    #: text-reading stage (``text.fix_encoding``'s substitution table,
    #: applied only where it strictly reduces encoding_damage) — a
    #: pipeline that repairs keeps data the max_encoding_damage gate
    #: would drop. Map-side, zero shuffle.
    repair_encoding: bool = False
    #: drop documents whose mean self-trained-LM log10-probability
    #: (trained on the post-quality corpus) falls below this; None skips
    min_avg_logprob: float | None = None
    #: which LM rung scores the min_avg_logprob gate: 1 = unigram
    #: (word choice), 2 = bigram (word order), 3 = stupid-backoff
    #: trigram (longer-range order; Brants-score scale — thresholds
    #: are NOT comparable across rungs, re-tune when changing)
    lm_order: int = 1
    #: CCNet-style RELATIVE cut (vs the absolute floor above): keep
    #: documents in perplexity buckets 0..max_ppl_bucket of
    #: ``ppl_n_buckets`` tiers (0 = cleanest); None skips
    max_ppl_bucket: int | None = None
    ppl_n_buckets: int = 3
    #: pretrained linear-classifier gate: keep documents whose
    #: sigmoid score >= min_classifier_prob under these word weights
    #: (fastText/DCLM-style educational/quality filter); None skips
    classifier_weights: Mapping[str, float] | None = None
    classifier_bias: float = 0.0
    min_classifier_prob: float = 0.5
    redact: bool = True
    #: "exact" (content-hash), "near" (MinHash-LSH candidate pairs →
    #: connected components, cluster-minimum id survives), or None
    dedup: str | None = "exact"
    #: hash NORMALIZED text for the dedup stage (case/accents/
    #: punctuation/digits/whitespace folded via ``normalize_text``'s
    #: full-knob program) while the surviving rows keep their raw
    #: text — catches trivially-edited duplicates the raw hash misses
    normalize_for_dedup: bool = False
    #: n-gram length for span-level dedup AFTER document dedup (the
    #: word-granularity pass runs on the already-shrunk corpus); None
    #: skips the stage. KNOWN LIMITATION: span dedup is
    #: whitespace-indexed regardless of ``segmentation`` (its spans
    #: index into the whitespace split and reconstruction re-joins
    #: with spaces, which would INSERT spaces into CJK text) — on a
    #: script-mode corpus duplicated CJK passages pass through this
    #: stage untouched; document- and chunk-level dedup cover them
    strip_span_ngram: int | None = None
    span_min_df: int = 2
    decontaminate_ngram: int = 8
    #: DSIR selection: keep the dsir_k documents importance-resampled
    #: toward the ``target`` corpus passed to :func:`curate_documents`
    #: (None skips; setting it without a target is an error). Runs
    #: after decontamination, before mixture — selection sees the
    #: cleaned corpus, and mixture rebalances the selected set.
    dsir_k: int | None = None
    dsir_seed: str = "dsir"
    mixture_weights: Mapping[str, float] | None = None
    #: "downsample" (mixture_sample — largest output with no
    #: repetition) or "upsample" (mixture_upsample — multi-epoch
    #: repetition allowed; rows gain a replica index). Replicas of a
    #: document always share its split (the split still hashes the
    #: ORIGINAL id — copies straddling train/eval would be leakage by
    #: construction), and each replica gets its own identity
    #: (`<id>#<replica>`) before chunking/packing so tape positions
    #: stay unique.
    mixture_mode: str = "downsample"
    max_replication: float | None = None
    #: temperature for DATA-DERIVED mixture weights (w_d ∝ share_d^α,
    #: the exponent-smoothed multilingual recipe): when set,
    #: ``mixture_weights`` may be None (all observed domains) or a
    #: sequence of domain names, and explicit weights are rejected —
    #: see :func:`~haplorec_spark.operators.sampling.mixture_sample`
    mixture_alpha: float | None = None
    #: precomputed per-document token-count column: when set, mixture
    #: shares and packing budgets are measured in ITS tokens instead
    #: of whitespace splits. Incompatible with ``chunk_size`` (the
    #: counts no longer describe chunk rows) and with the
    #: ``bpe_merges`` argument (which computes counts itself).
    token_col: str | None = None
    splits: Mapping[str, float] = field(
        default_factory=lambda: {"train": 0.98, "valid": 0.01, "test": 0.01}
    )
    #: assign splits by near-dup CLUSTER (LSH pairs over the curated
    #: corpus → leakage_safe_split) instead of per-document hash, so
    #: near-copies that survived dedup (e.g. ``dedup="exact"`` or
    #: None) can never straddle train/eval; redundant after
    #: ``dedup="near"`` (losers are already dropped) but harmless
    leakage_safe: bool = False
    seq_len: int | None = None
    #: cut documents into chunk_size-word windows AFTER split
    #: assignment (chunks inherit their document's split, so one
    #: document never straddles train/eval); None skips. When set,
    #: each output row is a chunk and packing runs over chunks.
    chunk_size: int | None = None
    chunk_stride: int | None = None
    chunk_min_words: int = 1
    #: word definition for the quality/repetition stage, chunking,
    #: the near-dup shingles (dedup="near" / leakage_safe), token
    #: accounting (mixture shares, packing tape), decontamination,
    #: and the LM stages (min_avg_logprob / max_ppl_bucket / dsir_k):
    #: "whitespace" (historical single-space split) or "script"
    #: (script-segmented — space-free-script characters become their
    #: own words, a no-op on spaced-script text; see
    #: ``text.segmented_text_sql``). A crawl with ANY zh/ja/th share
    #: needs "script": under "whitespace" such a document is ONE word,
    #: the quality gate reads it as pathological, and the pipeline
    #: silently drops entire writing systems. The language rungs are
    #: script-aware unconditionally (their segmentation is a no-op on
    #: spaced scripts, so there is no knob to get wrong there).
    segmentation: str = "whitespace"
    text_col: str = "text"
    id_col: str = "doc_id"
    lang_col: str = "lang"


def map_side_curation(
    docs: DataFrame, config: CurationConfig = CurationConfig()
) -> DataFrame:
    """The shuffle-free subset of :func:`curate_documents` as ONE
    composed projection/filter chain — no joins, no aggregates — so it
    applies unchanged to a STREAMING frame (the per-micro-batch filter
    of :func:`haplorec_spark.streaming.stream_curate_ingest`) or to a
    batch frame where only these stages are wanted.

    Stages, in the batch pipeline's order: language detection
    (``detect_language``) → language keep-list → quality + Gopher
    repetition floors → blocked-terms gate (``blocked_terms``, a
    literal InSet) → literal-map classifier gate
    (``classifier_weights``; vocabularies beyond the literal-map bound
    need the batch path's measured join) → PII redaction
    (``text_redacted`` attached) → split assignment (``split``
    attached; a per-row hash, so streaming rows get the identical
    split they would get in batch). Dedup is deliberately ABSENT: it
    is corpus-global, and the streaming face runs it against a
    persisted store instead.

    Raises for config knobs that need corpus-global state —
    boilerplate strip, LM/perplexity cuts, span strip, DSIR, mixture,
    chunking, packing, leakage-safe splits, precomputed token columns
    — so a silent semantics downgrade is impossible.
    """
    from haplorec_spark.operators.text import (
        _literal_score_prob,
        _quality_exprs,
        _redact_columns,
        with_language,
    )

    cfg = config
    offenders = [
        name
        for name in (
            "boilerplate_min_df",
            "min_avg_logprob",
            "max_ppl_bucket",
            "strip_span_ngram",
            "dsir_k",
            "chunk_size",
            "seq_len",
            "token_col",
        )
        if getattr(cfg, name) is not None
    ]
    if cfg.mixture_weights or cfg.mixture_alpha is not None:
        offenders.append("mixture")
    if cfg.leakage_safe:
        offenders.append("leakage_safe")
    if cfg.normalize_for_dedup:
        offenders.append("normalize_for_dedup")
    if offenders:
        raise ValueError(
            "config stages need corpus-global state and are batch-only "
            f"(use curate_documents): {offenders}"
        )
    from haplorec_spark.operators.text import MAX_LITERAL_FEATURES

    if (
        cfg.classifier_weights is not None
        and len(cfg.classifier_weights) > MAX_LITERAL_FEATURES
    ):
        raise ValueError(
            "classifier vocabulary exceeds the literal-map bound "
            f"({MAX_LITERAL_FEATURES}); the adaptive-join path is "
            "batch-only"
        )

    out = docs
    if cfg.repair_encoding:
        from haplorec_spark.operators.text import with_fixed_encoding

        # repair BEFORE every text-reading stage, so language/quality/
        # damage gates all see the restored text (column-level face:
        # the rule chain evaluates once per row)
        out = with_fixed_encoding(
            out, text_col=cfg.text_col, fixed_col="_fix_enc_out"
        ).withColumn(cfg.text_col, F.col("_fix_enc_out")).drop(
            "_fix_enc_out"
        )
    if cfg.detect_language is not None:
        out = with_language(
            out,
            method=cfg.detect_language,
            text_col=cfg.text_col,
            lang_col=cfg.lang_col,
            model=cfg.language_model,
            min_score=cfg.language_min_score,
        )
    if cfg.languages is not None:
        out = out.filter(F.col(cfg.lang_col).isin(list(cfg.languages)))
    qexprs = _quality_exprs(
        cfg.text_col,
        include_repetition=True,
        segmentation=cfg.segmentation,
    )
    clobbered = sorted(
        {a for a, _ in qexprs}.intersection(out.columns)
    )
    if clobbered:
        # the attach-in-place chain would silently overwrite AND drop
        # these input columns (the batch face's projection+join
        # preserves them) — refuse rather than diverge
        raise ValueError(
            "input already carries quality-feature column names this "
            f"face would overwrite: {clobbered}; rename them first"
        )
    for alias, expr in qexprs:
        out = out.withColumn(alias, F.expr(expr))
    out = out.filter(
        (F.col("quality") >= cfg.min_quality)
        & (F.col("dup_word_fraction") < cfg.max_dup_word_fraction)
        & (F.col("top_word_fraction") <= cfg.max_top_word_fraction)
    ).drop(*[a for a, _ in qexprs])
    if cfg.blocked_terms is not None:
        from haplorec_spark.operators.text import blocked_term_exprs

        _, _, frac = blocked_term_exprs(
            cfg.text_col, cfg.blocked_terms, cfg.segmentation
        )
        out = out.filter(F.expr(frac) <= cfg.max_blocked_fraction)
    if cfg.max_encoding_damage is not None:
        from haplorec_spark.operators.text import encoding_quality_exprs

        dmg = encoding_quality_exprs(cfg.text_col)["encoding_damage"]
        out = out.filter(F.expr(dmg) <= cfg.max_encoding_damage)
    if cfg.classifier_weights is not None:
        _score, prob = _literal_score_prob(
            cfg.classifier_weights, cfg.classifier_bias, True, cfg.text_col
        )
        out = out.filter(prob >= cfg.min_classifier_prob)
    if cfg.redact:
        redacted, _counts = _redact_columns(cfg.text_col)
        out = out.withColumn("text_redacted", redacted)
    return hash_split(out, dict(cfg.splits), [cfg.id_col])


def curate_documents(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    config: CurationConfig = CurationConfig(),
    *,
    target: DataFrame | None = None,
    bpe_merges: DataFrame | None = None,
    count_stages: bool = False,
    reject_sample_k: int | None = None,
) -> (
    tuple[DataFrame, dict[str, int]]
    | tuple[DataFrame, dict[str, int], DataFrame]
):
    """Run the full curation sequence; returns (curated frame, stage
    counts — empty unless ``count_stages``), plus a third element —
    the per-stage REJECT reservoir frame — when ``reject_sample_k``
    is set.

    ``reject_sample_k`` (requires ``count_stages``) captures up to k
    rejected documents PER survival stage: (stage, doc_id, text,
    reject_priority), where ``stage`` is the FIRST stage whose
    predicate the document failed and ``text`` is the text that
    predicate actually read (post-boilerplate when that stage ran).
    Sampling is the deterministic hash-minimum pattern of
    ``sampling.top_k_by_hash`` — the k smallest
    ``md5('rejects', doc_id)`` priorities per stage — so a rerun
    reproduces the same reservoir and two operators inspecting the
    same drop argue about the same documents. This is the
    WHY-did-my-data-die face for a 100 TB run: the chain is NOT
    re-executed — the death stage comes from the same single-scan
    flag frame the stage counts use, and the only added work is one
    death-stage-keyed exchange whose per-stage top-k is rank-limited
    (Spark's WindowGroupLimit keeps it a bounded per-partition heap,
    never a full sort). Off by default: zero extra work. Row-reshaping
    tail stages (mixture/split/chunk/pack) drop rows by
    construction, not by predicate, and are out of reservoir scope.

    Output columns: the input's, plus ``text_redacted`` (when
    ``redact``), ``split``, — when ``chunk_size`` is set — one row per
    CHUNK with ``chunk_ix`` / ``chunk_start`` / ``chunk_id`` and the
    text column holding the chunk text, and — when ``seq_len`` is set
    — the packing-tape columns (``n_tokens``, ``global_start``,
    ``seq_id``, ``seq_offset``, ``seq_id_end``), computed on a
    SEPARATE tape per split (over chunks when chunking is on) — eval
    text never lands inside a training sequence, and ``seq_id`` is
    unique within a split, not globally. With ``leakage_safe`` the
    split stage hashes near-dup clusters (LSH pairs over the curated
    corpus) instead of documents, so surviving near-copies can never
    straddle train/eval.

    ``bpe_merges`` (a :func:`~haplorec_spark.operators.bpe.train_bpe`
    merge table) switches TOKEN ACCOUNTING to tokenizer tokens: the
    mixture stage's domain shares and the packing tape's budgets are
    measured in BPE tokens of the text they govern — per document for
    the mixture, per CHUNK when chunking is on — instead of
    whitespace splits, so the recipe balances the token budget a real
    training run actually consumes. Each accounting pass is one
    :func:`~haplorec_spark.operators.bpe.bpe_tokenize` (Python encode
    over the distinct-word table only; the corpus-sized half is
    JVM-side) plus an id-keyed join back; rows with no words count 0
    tokens. Alternatively ``config.token_col`` names a PRECOMPUTED
    per-document count column (no extra work, but incompatible with
    chunking, whose rows the precomputed counts no longer describe).
    """
    from haplorec_spark.operators.text import (
        _literal_score_prob,
        _quality_exprs,
    )

    cfg = config
    counts: dict[str, int] = {}
    if reject_sample_k is not None:
        if reject_sample_k < 1:
            raise ValueError(
                f"reject_sample_k must be >= 1, got {reject_sample_k}"
            )
        if not count_stages:
            raise ValueError(
                "reject_sample_k needs the stage flag frame; pass "
                "count_stages=True"
            )
    if cfg.token_col is not None and bpe_merges is not None:
        raise ValueError(
            "token_col and bpe_merges are mutually exclusive "
            "token-accounting modes"
        )
    if cfg.token_col is not None and cfg.chunk_size:
        raise ValueError(
            "token_col does not describe chunk rows; use bpe_merges "
            "(recomputed per chunk) or whitespace accounting with "
            "chunking"
        )

    def _bpe_counts(frame: DataFrame, id_column: str, out_col: str):
        """(id, out_col): BPE token counts per row of ``frame``; the
        caller left-joins and coalesces to 0 because wordless rows
        emit no count row."""
        from haplorec_spark.operators.bpe import bpe_tokenize

        return bpe_tokenize(
            frame, bpe_merges, text_col=cfg.text_col, id_col=id_column
        ).select(id_column, F.col("n_bpe_tokens").alias(out_col))

    # ---- stage accounting (count_stages=True) --------------------
    # Round-7 single-pass design: the SURVIVAL prefix (every stage up
    # to the mixture, all of which keep/drop whole documents) is
    # audited by ONE aggregate over a flag frame instead of one count
    # job per increasingly-long lazy prefix (~11 jobs before). Per-doc
    # map-side stages (language, quality, small-vocab classifier)
    # become boolean COLUMNS on the audit frame — sharing the exact
    # expressions the chain filters on — and corpus-global stages
    # (LM floor, ppl tiers, dedup, DSIR, decontamination) become
    # left-join flags against the chain's own lazy keep-sets, so the
    # audited predicate is the chain's predicate by construction.
    # counts[stage_k] = Σ(flag_1 ∧ … ∧ flag_k) — one job. Stages that
    # only REWRITE text (boilerplate, redact, span-strip) are
    # row-preserving inner joins and inherit the previous count.
    # Stages that reshape the row universe (mixture, split, chunk,
    # pack) still cost one count job each — their outputs are not
    # document-survival predicates. For a map-side-only config the
    # audit aggregate is a single corpus scan (test-pinned).
    audit: DataFrame | None = None
    survival: list[tuple[str, str | None]] = []  # (stage, flag col)
    late: list[tuple[str, DataFrame]] = []  # post-survival stages

    def _flag_map(stage: str, col) -> None:
        nonlocal audit
        assert audit is not None
        name = f"__f_{stage}"
        audit = audit.withColumn(
            name, F.coalesce(col.cast("boolean"), F.lit(False))
        )
        survival.append((stage, name))

    def _flag_ids(stage: str, ids: DataFrame, anti: bool = False) -> None:
        """Left-join flag: alive iff the id is (not, when ``anti``) in
        the chain's keep-set (loser-set) for this stage."""
        nonlocal audit
        assert audit is not None
        name, marker = f"__f_{stage}", f"__m_{stage}"
        audit = audit.join(
            ids.select(cfg.id_col).withColumn(marker, F.lit(True)),
            cfg.id_col,
            "left",
        ).withColumn(
            name,
            F.col(marker).isNull() if anti else F.col(marker).isNotNull(),
        ).drop(marker)
        survival.append((stage, name))

    def _flag_same(stage: str) -> None:
        """Row-preserving rewrite stage: count = previous stage's."""
        survival.append((stage, None))

    def note(stage: str, df: DataFrame) -> DataFrame:
        """Record a row-universe-changing stage for a per-stage count
        job (deferred until the end, after the survival aggregate)."""
        if count_stages:
            late.append((stage, df))
        return df

    out = docs
    if cfg.repair_encoding:
        from haplorec_spark.operators.text import with_fixed_encoding

        # repair BEFORE the language attach and the __t audit
        # snapshot, so every gate (and its audit flag) reads the
        # restored text (column-level face: chain evaluates once)
        out = with_fixed_encoding(
            out, text_col=cfg.text_col, fixed_col="_fix_enc_out"
        ).withColumn(cfg.text_col, F.col("_fix_enc_out")).drop(
            "_fix_enc_out"
        )
    if cfg.detect_language is not None:
        from haplorec_spark.operators.text import with_language

        out = with_language(
            out,
            method=cfg.detect_language,
            text_col=cfg.text_col,
            lang_col=cfg.lang_col,
            model=cfg.language_model,
            min_score=cfg.language_min_score,
        )
    if count_stages:
        # audit base AFTER the language attach, so the flag exprs see
        # the same derived lang; __t is the text the NEXT per-doc flag
        # reads (re-pointed at the cleaned text after boilerplate)
        cols = [F.col(cfg.id_col), F.col(cfg.text_col).alias("__t")]
        if cfg.lang_col in out.columns:
            cols.append(F.col(cfg.lang_col))
        audit = out.select(*cols)
        survival.append(("input", None))
    if cfg.languages is not None:
        out = out.filter(F.col(cfg.lang_col).isin(list(cfg.languages)))
        if count_stages:
            _flag_map(
                "language",
                F.col(cfg.lang_col).isin(list(cfg.languages)),
            )

    if cfg.boilerplate_min_df:
        # line-level cleanup FIRST: quality/repetition scores and the
        # dedup hashes must see the de-boilerplated text, not the
        # shared scaffolding (which would both mask low-quality bodies
        # and create spurious exact-dup collisions)
        cleaned = strip_boilerplate_lines(
            out,
            min_doc_freq=cfg.boilerplate_min_df,
            text_col=cfg.text_col,
            id_col=cfg.id_col,
        ).select(
            cfg.id_col, F.col("text_clean").alias(cfg.text_col)
        )
        out = out.drop(cfg.text_col).join(cleaned, cfg.id_col)
        if count_stages:
            # row-preserving; downstream per-doc flags must read the
            # CLEANED text (dead rows keep the raw text — their flag
            # values never reach a count, every prefix conjunction
            # already excludes them)
            assert audit is not None
            audit = audit.join(
                cleaned.select(
                    cfg.id_col, F.col(cfg.text_col).alias("__t_clean")
                ),
                cfg.id_col,
                "left",
            ).withColumn(
                "__t", F.coalesce("__t_clean", "__t")
            ).drop("__t_clean")
            _flag_same("boilerplate")

    q = quality_score(
        out,
        text_col=cfg.text_col,
        id_col=cfg.id_col,
        include_repetition=True,
        segmentation=cfg.segmentation,
    ).filter(
        (F.col("quality") >= cfg.min_quality)
        & (F.col("dup_word_fraction") < cfg.max_dup_word_fraction)
        & (F.col("top_word_fraction") <= cfg.max_top_word_fraction)
    )
    out = out.join(q.select(cfg.id_col), cfg.id_col)
    if count_stages:
        # the same per-doc exprs map_side_curation shares with
        # quality_score, evaluated on the audit text — map-side
        qx = dict(
            _quality_exprs(
                "__t",
                include_repetition=True,
                segmentation=cfg.segmentation,
            )
        )
        _flag_map(
            "quality",
            (F.expr(qx["quality"]) >= cfg.min_quality)
            & (F.expr(qx["dup_word_fraction"]) < cfg.max_dup_word_fraction)
            & (
                F.expr(qx["top_word_fraction"])
                <= cfg.max_top_word_fraction
            ),
        )

    if cfg.blocked_terms is not None:
        from haplorec_spark.operators.text import blocked_term_exprs

        _, _, frac = blocked_term_exprs(
            cfg.text_col, cfg.blocked_terms, cfg.segmentation
        )
        out = out.filter(F.expr(frac) <= cfg.max_blocked_fraction)
        if count_stages:
            _, _, frac_audit = blocked_term_exprs(
                "__t", cfg.blocked_terms, cfg.segmentation
            )
            _flag_map(
                "blocked_terms",
                F.expr(frac_audit) <= cfg.max_blocked_fraction,
            )

    if cfg.max_encoding_damage is not None:
        from haplorec_spark.operators.text import encoding_quality_exprs

        dmg = encoding_quality_exprs(cfg.text_col)["encoding_damage"]
        out = out.filter(F.expr(dmg) <= cfg.max_encoding_damage)
        if count_stages:
            dmg_audit = encoding_quality_exprs("__t")["encoding_damage"]
            _flag_map(
                "encoding",
                F.expr(dmg_audit) <= cfg.max_encoding_damage,
            )

    if cfg.min_avg_logprob is not None:
        # LM trained on the quality-filtered corpus itself: gibberish
        # that slipped the heuristics scores improbably under the
        # corpus's own token distribution. lm_order picks the rung:
        # bigram/trigram see word-ORDER damage the unigram cannot.
        if cfg.lm_order not in (1, 2, 3):
            raise ValueError(
                f"lm_order must be 1, 2 or 3, got {cfg.lm_order}"
            )
        from haplorec_spark.operators.text import (
            bigram_logprob_score,
            trigram_logprob_score,
        )

        scorer = {
            1: unigram_logprob_score,
            2: bigram_logprob_score,
            3: trigram_logprob_score,
        }[cfg.lm_order]
        # a document too short to have any n-gram at this order scores
        # NULL — "no evidence" must not read as "gibberish", or raising
        # lm_order silently deletes every 1-2 word survivor of the
        # other gates (review-caught); length policy belongs to the
        # quality stage
        lm = scorer(
            out, text_col=cfg.text_col, id_col=cfg.id_col
        ).filter(
            (F.col("avg_logprob") >= cfg.min_avg_logprob)
            | F.col("avg_logprob").isNull()
        )
        out = out.join(lm.select(cfg.id_col), cfg.id_col)
        if count_stages:
            # corpus-global (the LM is the surviving corpus's own
            # distribution): flag against the chain's keep-set
            _flag_ids("lm_score", lm)

    if cfg.classifier_weights is not None:
        clf = linear_text_score(
            out,
            cfg.classifier_weights,
            bias=cfg.classifier_bias,
            text_col=cfg.text_col,
            id_col=cfg.id_col,
        ).filter(F.col("prob") >= cfg.min_classifier_prob)
        out = out.join(clf.select(cfg.id_col), cfg.id_col)
        if count_stages:
            from haplorec_spark.operators.text import (
                MAX_LITERAL_FEATURES as _MLF,
            )

            if len(cfg.classifier_weights) <= _MLF:
                # per-doc and literal-sized: the same shared scoring
                # exprs, map-side on the audit text (both physical
                # paths of linear_text_score round identically)
                _s, prob = _literal_score_prob(
                    cfg.classifier_weights,
                    cfg.classifier_bias,
                    True,
                    "__t",
                )
                _flag_map(
                    "classifier", prob >= cfg.min_classifier_prob
                )
            else:
                _flag_ids("classifier", clf)

    if cfg.max_ppl_bucket is not None:
        # relative cut: keep the cleanest tiers of THIS corpus's score
        # distribution (CCNet trains on the head) — robust where an
        # absolute floor needs retuning per corpus
        tiers = perplexity_buckets(
            out,
            n_buckets=cfg.ppl_n_buckets,
            text_col=cfg.text_col,
            id_col=cfg.id_col,
        ).filter(F.col("ppl_bucket") <= cfg.max_ppl_bucket)
        out = out.join(tiers.select(cfg.id_col), cfg.id_col)
        if count_stages:
            # corpus-global (tier edges come from the surviving score
            # distribution): keep-set flag
            _flag_ids("ppl_bucket", tiers)

    if cfg.redact:
        red = redact_pii(
            out, text_col=cfg.text_col, id_col=cfg.id_col
        ).select(cfg.id_col, "text_redacted")
        out = out.join(red, cfg.id_col)
        if count_stages:
            _flag_same("redact")  # row-preserving attach

    def _dedup_view(df: DataFrame) -> DataFrame:
        """The frame the dedup stage hashes: raw, or (id, normalized
        text) when ``normalize_for_dedup`` — map-side, and the raw
        rows are what survive either way."""
        if not cfg.normalize_for_dedup:
            return df
        from haplorec_spark.operators.text import normalize_text

        return normalize_text(
            df,
            fold_accents=True,
            strip_punctuation=True,
            fold_digits=True,
            text_col=cfg.text_col,
            id_col=cfg.id_col,
        ).withColumnRenamed("text_norm", cfg.text_col)

    if cfg.dedup == "exact":
        # exact content dedup; which duplicate survives must still be
        # deterministic, so keep the min id per content hash
        h = F.md5(F.col(cfg.text_col))
        keep = (
            _dedup_view(out)
            .select(F.col(cfg.id_col), h.alias("__h"))
            .groupBy("__h")
            .agg(F.min(cfg.id_col).alias(cfg.id_col))
            .select(cfg.id_col)
        )
        out = out.join(keep, cfg.id_col)
        if count_stages:
            # corpus-global (min id per hash among SURVIVORS)
            _flag_ids("dedup", keep)
    elif cfg.dedup == "near":
        from haplorec_spark.operators.dedup import (
            dedup_clusters,
            lsh_candidate_pairs,
        )

        pairs = lsh_candidate_pairs(
            _dedup_view(out), text_col=cfg.text_col, id_col=cfg.id_col,
            segmentation=cfg.segmentation,
        )
        # non-canonical members (canonical = cluster-minimum id) drop;
        # docs in no cluster are untouched by the anti-join
        losers = (
            dedup_clusters(pairs)
            .filter(F.col("doc_id") != F.col("canonical_id"))
            .select(F.col("doc_id").alias(cfg.id_col))
        )
        out = out.join(losers, cfg.id_col, "left_anti")
        if count_stages:
            _flag_ids("dedup", losers, anti=True)
    elif cfg.dedup:  # falsy (None/False) skips dedup entirely
        raise ValueError(f"unknown dedup mode: {cfg.dedup!r}")

    if cfg.strip_span_ngram:
        # span-level last of the dedup trio: whole-document and
        # line-level passes have already shrunk the corpus the
        # word-granularity n-gram stream explodes over
        spans = strip_duplicate_ngram_spans(
            out,
            n=cfg.strip_span_ngram,
            min_df=cfg.span_min_df,
            text_col=cfg.text_col,
            id_col=cfg.id_col,
        ).select(cfg.id_col, F.col("text_clean").alias(cfg.text_col))
        out = out.drop(cfg.text_col).join(spans, cfg.id_col)
        if count_stages:
            _flag_same("strip_spans")  # row-preserving rewrite

    if benchmark is not None:
        out = decontaminate(
            out,
            benchmark,
            n=cfg.decontaminate_ngram,
            text_col=cfg.text_col,
            id_col=cfg.id_col,
            segmentation=cfg.segmentation,
        )
        if count_stages:
            # per-doc vs the benchmark shingles, but the operator owns
            # the predicate — flag against its surviving ids
            _flag_ids("decontaminate", out)

    if target is not None and cfg.dsir_k is None:
        # a supplied target with no dsir_k would silently skip the
        # selection the caller clearly expects
        raise ValueError("target corpus supplied but dsir_k is not set")
    if cfg.dsir_k is not None:
        # domain selection on the cleaned corpus: importance-resample
        # toward the target distribution (deterministic Gumbel top-k),
        # then mixture/splits operate on the selected set
        if target is None:
            raise ValueError("dsir_k requires a target corpus")
        from haplorec_spark.operators.sampling import importance_resample

        keep = importance_resample(
            out,
            target,
            cfg.dsir_k,
            seed=cfg.dsir_seed,
            text_col=cfg.text_col,
            id_col=cfg.id_col,
            segmentation=cfg.segmentation,
        ).select(cfg.id_col)
        out = out.join(keep, cfg.id_col)
        if count_stages:
            # corpus-global (Gumbel top-k over the survivors)
            _flag_ids("dsir", keep)

    if cfg.mixture_mode not in ("downsample", "upsample"):
        raise ValueError(f"unknown mixture_mode: {cfg.mixture_mode!r}")
    # near-dup pairs for leakage_safe splits come from the PRE-mixture
    # frame: replicas of a doc share its id and text, so pairing the
    # upsampled frame multiplies the most expensive stage's work by the
    # replication factor for identical output (pairs need id_a < id_b),
    # and for downsampling the extra pairs about dropped docs are
    # no-ops in the split's left join
    pre_mixture = out
    did_upsample = False
    if cfg.mixture_weights or cfg.mixture_alpha is not None:
        mix_token_col = cfg.token_col
        if bpe_merges is not None:
            # token accounting in BPE tokens: attach per-document
            # counts (dropped again below — accounting, not payload)
            out = out.join(
                _bpe_counts(out, cfg.id_col, "__mix_tokens"), cfg.id_col,
                "left",
            ).withColumn(
                "__mix_tokens", F.coalesce("__mix_tokens", F.lit(0))
            )
            mix_token_col = "__mix_tokens"
        if cfg.mixture_mode == "upsample":
            from haplorec_spark.operators.sampling import mixture_upsample

            out = note(
                "mixture",
                mixture_upsample(
                    out,
                    cfg.mixture_weights,
                    cfg.lang_col,
                    [cfg.id_col],
                    alpha=cfg.mixture_alpha,
                    token_col=mix_token_col,
                    text_col=cfg.text_col,
                    max_replication=cfg.max_replication,
                    segmentation=cfg.segmentation,
                ),
            )
            did_upsample = True
        else:
            out = note(
                "mixture",
                mixture_sample(
                    out,
                    cfg.mixture_weights,
                    cfg.lang_col,
                    [cfg.id_col],
                    alpha=cfg.mixture_alpha,
                    token_col=mix_token_col,
                    text_col=cfg.text_col,
                    segmentation=cfg.segmentation,
                ),
            )
        if bpe_merges is not None:
            out = out.drop("__mix_tokens")

    if cfg.leakage_safe:
        from haplorec_spark.operators.dedup import lsh_candidate_pairs
        from haplorec_spark.operators.sampling import leakage_safe_split

        out = note(
            "split",
            leakage_safe_split(
                out,
                lsh_candidate_pairs(
                    pre_mixture, text_col=cfg.text_col,
                    id_col=cfg.id_col, segmentation=cfg.segmentation,
                ),
                dict(cfg.splits),
                id_col=cfg.id_col,
            ).drop("canonical_id"),
        )
    else:
        out = note(
            "split", hash_split(out, dict(cfg.splits), [cfg.id_col])
        )

    if did_upsample:
        # AFTER split (replicas of one doc share its split by hashing
        # the original id), each copy becomes its own identity so
        # chunk ids and tape positions are unique per replica
        out = out.withColumn(
            cfg.id_col,
            F.concat_ws(
                "#",
                F.col(cfg.id_col).cast("string"),
                F.col("replica").cast("string"),
            ),
        ).drop("replica")

    pack_id = cfg.id_col
    if cfg.chunk_size:
        # chunk AFTER split assignment: every chunk inherits its
        # document's split, so a long document can never leak text
        # across the train/eval boundary. Each output row becomes a
        # chunk; chunk_id is the packing identity from here on.
        ch = chunk_documents(
            out,
            chunk_size=cfg.chunk_size,
            stride=cfg.chunk_stride,
            min_words=cfg.chunk_min_words,
            text_col=cfg.text_col,
            id_col=cfg.id_col,
            segmentation=cfg.segmentation,
        ).select(
            cfg.id_col,
            "chunk_ix",
            "chunk_start",
            F.col("chunk_text").alias(cfg.text_col),
        )
        out = note(
            "chunk",
            out.drop(cfg.text_col)
            .join(ch, cfg.id_col)
            .withColumn(
                "chunk_id",
                F.concat_ws(
                    "_",
                    F.col(cfg.id_col).cast("string"),
                    F.col("chunk_ix").cast("string"),
                ),
            ),
        )
        pack_id = "chunk_id"

    if cfg.seq_len:
        # Each split is packed on its OWN token tape (split-specific
        # seed): a training sequence must never interleave train docs
        # with valid/test text, and a consumer that filters to one
        # split needs global_start/seq_id offsets that count only that
        # split's tokens. seq_id is therefore unique per (split,
        # seq_id) — consumers key sequences by the pair.
        pack_token_col = cfg.token_col
        if bpe_merges is not None:
            # budget the tape in BPE tokens of the rows being packed
            # (per chunk when chunking is on); recomputed here rather
            # than carried from the mixture pass because dedup/chunk
            # stages changed the rows since
            out = out.join(
                _bpe_counts(out, pack_id, "__pack_tokens"), pack_id,
                "left",
            ).withColumn(
                "__pack_tokens", F.coalesce("__pack_tokens", F.lit(0))
            )
            pack_token_col = "__pack_tokens"
        tape: DataFrame | None = None
        for name in cfg.splits:
            t = pack_sequences(
                out.filter(F.col("split") == F.lit(name)),
                cfg.seq_len,
                token_col=pack_token_col,
                text_col=cfg.text_col,
                id_col=pack_id,
                seed=f"pack{_PACK_SEP}{name}",
                segmentation=cfg.segmentation,
            )
            tape = t if tape is None else tape.unionByName(t)
        assert tape is not None  # cfg.splits is non-empty by contract
        out = note("pack", out.join(tape, pack_id))
        if bpe_merges is not None:
            out = out.drop("__pack_tokens")

    if count_stages:
        # ONE aggregate resolves every survival-stage count: stage k's
        # count is the number of docs passing the conjunction of all
        # flags up to k (row-preserving stages contribute no flag and
        # inherit the running conjunction). Only the row-reshaping
        # tail (mixture/split/chunk/pack) still costs one job each.
        assert audit is not None
        if reject_sample_k is not None:
            # two actions read the flag frame (this aggregate + the
            # reservoir collect below) — persist it so the language
            # scorer / quality expressions evaluate once per row, not
            # once per action (measured 95 → ~50 s at 50k CJK docs);
            # the reservoir is materialized bounded below, so the
            # cache is released before returning
            audit = audit.persist()
        aggs = []
        conj = F.lit(True)
        for i, (_stage, colname) in enumerate(survival):
            if colname is not None:
                conj = conj & F.col(colname)
            aggs.append(
                F.sum(F.when(conj, 1).otherwise(0)).alias(f"__c{i}")
            )
        row = audit.agg(*aggs).first()
        for i, (stage, _colname) in enumerate(survival):
            counts[stage] = int(row[f"__c{i}"] or 0)
        for stage, frame in late:
            counts[stage] = frame.count()
    if reject_sample_k is not None:
        assert audit is not None
        # death stage = the FIRST failed flag (flags evaluate in
        # chain order, so the CASE's first-match semantics give
        # exactly "the stage that killed it")
        death = F.when(F.lit(False), F.lit(None))
        for stage, colname in survival:
            if colname is not None:
                death = death.when(~F.col(colname), F.lit(stage))
        rejected = (
            audit.withColumn("__death", death)
            .filter(F.col("__death").isNotNull())
            .select(
                F.col("__death").alias("stage"),
                F.col(cfg.id_col),
                F.col("__t").alias(cfg.text_col),
                F.md5(
                    F.concat_ws(
                        "\x1f",
                        F.lit("rejects"),
                        F.col(cfg.id_col).cast("string"),
                    )
                ).alias("reject_priority"),
            )
        )
        w = Window.partitionBy("stage").orderBy(
            "reject_priority", cfg.id_col
        )
        rejects = (
            rejected.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= reject_sample_k)
            .drop("__rn")
            # bounded (k rows per stage): pin it so the audit cache
            # can be released without the caller's later collect
            # recomputing the whole flag frame
            .localCheckpoint(eager=True)
        )
        audit.unpersist()
        return out, counts, rejects
    return out, counts


def curation_report(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    config: CurationConfig = CurationConfig(),
    *,
    target: DataFrame | None = None,
    bpe_merges: DataFrame | None = None,
    reject_sample_k: int = 5,
    max_sample_chars: int = 120,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(report, curated, input_profile): the survival dashboard a
    100 TB curation operator actually reads — one row per pipeline
    stage with ``(stage, n_in, n_out, n_dropped, drop_rate,
    sample_reject_ids, sample_rejects)``, where the samples are the
    deterministic per-stage reject reservoirs (up to
    ``reject_sample_k`` documents whose DEATH stage this was, texts
    truncated to ``max_sample_chars``).

    Composition, not new machinery: the counts and reservoirs come
    from ONE :func:`curate_documents` run (``count_stages=True`` +
    ``reject_sample_k`` — the single-scan flag-frame audit; no stage
    is re-executed), the report assembly is a bounded driver-side
    collect (``k × #stages`` reservoir rows), and ``input_profile``
    is the LAZY
    :func:`~haplorec_spark.operators.profiling.text_corpus_profile`
    of the input corpus — it costs its one corpus scan only if the
    caller collects it. ``curated`` is the pipeline's output frame,
    so reading the report never wastes the run.

    Accounting semantics inherited from ``count_stages``: a
    row-preserving rewrite stage (boilerplate, redact) inherits the
    previous count (drop_rate 0); the row-reshaping tail (mixture /
    split / chunk / pack) counts ROWS of its output, so a chunking
    stage can legitimately report n_out > n_in (drop_rate is floored
    at 0 rather than reported negative).
    """
    from haplorec_spark.operators.profiling import text_corpus_profile

    out, counts, rejects = curate_documents(
        docs,
        benchmark,
        config,
        target=target,
        bpe_merges=bpe_merges,
        count_stages=True,
        reject_sample_k=reject_sample_k,
    )
    samples: dict[str, list[tuple[str, str]]] = {}
    for r in rejects.collect():  # bounded: k rows per stage
        samples.setdefault(r["stage"], []).append(
            (
                r["reject_priority"],
                str(r[config.id_col]),
                (r[config.text_col] or "")[:max_sample_chars],
            )
        )
    rows = []
    prev = None
    for stage, n_out_c in counts.items():
        n_in = n_out_c if prev is None else prev
        dropped = max(n_in - n_out_c, 0)
        sample = sorted(samples.get(stage, []))
        rows.append(
            (
                stage,
                int(n_in),
                int(n_out_c),
                int(dropped),
                round(dropped / n_in, 6) if n_in else 0.0,
                [i for _, i, _ in sample],
                [t for _, _, t in sample],
            )
        )
        prev = n_out_c
    report = docs.sparkSession.createDataFrame(
        rows,
        "stage string, n_in bigint, n_out bigint, n_dropped bigint, "
        "drop_rate double, sample_reject_ids array<string>, "
        "sample_rejects array<string>",
    )
    return report, out, text_corpus_profile(
        docs, text_col=config.text_col, id_col=config.id_col
    )
