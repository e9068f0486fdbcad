"""In-engine training of the linear text classifier.

:func:`haplorec_spark.operators.text.linear_text_score` applies a
PRETRAINED fastText/DCLM-style quality filter; this module closes the
loop by TRAINING that model inside the engine — full-batch logistic
regression on bag-of-words features, expressed entirely as DataFrame
joins and aggregations, so the curated-vs-crawl classifier of a
RefinedWeb/DCLM-style pipeline can be fit on cluster-scale labeled
data without exporting features to a single machine.

Model (kept in exact lockstep with ``linear_text_score`` so the
trained weights drop straight into it):

    score(d) = bias + sum_w weight(w) * x(d, w)
    x(d, w)  = count(w in d) / n_tokens(d)   (``average=True``, the
               fastText bag shape; raw counts when False)
    p(d)     = sigmoid(score(d))

trained by full-batch gradient descent on L2-regularized log loss:

    grad_w  = (1/n_docs) * sum_d (p(d) - y(d)) * x(d, w) + l2 * w
    grad_b  = (1/n_docs) * sum_d (p(d) - y(d))

Physical shape per iteration (the engine's iterative-algorithm
charter, same as IVF k-means in similarity.py):

* The token feature table (doc, word, x) and the label table (doc, y)
  are built ONCE, hash-partitioned by doc id, and persisted — the
  corpus text is never re-tokenized inside the loop.
* Scoring joins features to the current weights — broadcast under the
  MEASURED vocabulary bound (the ``dedup_clusters``/``assign_ids``
  adaptive pattern), shuffle join above it — then aggregates per doc.
  Because features are pre-partitioned by doc id, the per-doc
  aggregate and the residual join are exchange-free.
* The word gradient is one word-keyed shuffle with map-side partial
  aggregation — the only corpus-sized exchange in the loop.
* The weight update is a word-keyed join of two vocabulary-sized
  frames, ``localCheckpoint``-ed to truncate lineage across
  iterations (the ``dedup_clusters`` pattern); the driver sees two
  scalars per iteration (loss, bias gradient) — never the vocabulary,
  never the corpus.

So one iteration = 1 vocab join + 1 word-keyed shuffle + 2 bounded
driver scalars, linear in corpus size and independent of iteration
count in memory.

Reference lineage: the reference has no trainer (its only "models"
are scraped lookup tables); this is the forward-looking face of the
training-data pipeline mandate, paired with ``linear_text_score``.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "LanguageIdModel",
    "LinearTextModel",
    "calibration_buckets",
    "evaluate_binary_classifier",
    "load_language_model",
    "load_text_model",
    "save_language_model",
    "save_text_model",
    "top_features",
    "train_language_classifier",
    "train_linear_text_classifier",
]

#: Probability clamp for the log-loss; keeps log() finite when the
#: model saturates. Gradients use the unclamped p.
_EPS = 1e-12


@dataclass
class LinearTextModel:
    """Result of :func:`train_linear_text_classifier`.

    ``weights`` is a (word, weight) DataFrame — exactly the shape
    :func:`haplorec_spark.operators.text.linear_text_score` accepts;
    pass ``bias`` and the same ``average`` flag alongside it.
    ``loss`` is the mean log loss measured at the START of each
    iteration (loss[0] is the untrained model's loss).
    """

    weights: DataFrame
    bias: float
    average: bool
    n_docs: int
    vocab_size: int
    loss: list[float] = field(default_factory=list)


def _prepare_features(
    docs: DataFrame,
    *,
    label_col: str,
    text_col: str,
    id_col: str,
    average: bool,
) -> tuple[DataFrame, DataFrame]:
    """(feats, labels): the persisted per-iteration inputs.

    feats = (doc, word, x) hash-partitioned by doc; labels =
    (doc, y, n) on the same partitioning. Built once per training
    run — the corpus text is never re-tokenized inside the loop.
    """
    spark = docs.sparkSession
    ws = f"split(lower({text_col}), ' ')"
    n_parts = spark.sparkContext.defaultParallelism
    labels = (
        docs.select(
            F.col(id_col).alias("__doc"),
            F.col(label_col).cast("double").alias("__y"),
            F.expr(f"size({ws})").cast("double").alias("__n"),
        )
        .repartition(n_parts, "__doc")
        .persist()
    )
    counts = (
        docs.select(
            F.col(id_col).alias("__doc"),
            F.explode(F.expr(ws)).alias("__word"),
        )
        .groupBy("__doc", "__word")
        .agg(F.count(F.lit(1)).cast("double").alias("__cnt"))
        .repartition(n_parts, "__doc")
    )
    x_expr = (
        (F.col("__cnt") / F.col("__n")) if average else F.col("__cnt")
    )
    feats = (
        counts.join(labels.select("__doc", "__n"), on="__doc")
        .select("__doc", "__word", x_expr.alias("__x"))
        .repartition(n_parts, "__doc")
        .persist()
    )
    return feats, labels


def _residuals(
    feats: DataFrame,
    labels: DataFrame,
    weights: DataFrame,
    bias: float,
    *,
    vocab_size: int,
    max_broadcast_vocab: int,
) -> DataFrame:
    """(doc, r, p, y) under the current model — one vocab join
    (broadcast under the measured bound) + one per-doc aggregate that
    is exchange-free on feats' doc partitioning."""
    w_side = (
        F.broadcast(weights)
        if vocab_size <= max_broadcast_vocab
        else weights.hint("merge")
    )
    scores = (
        feats.join(w_side, on="__word", how="inner")
        .groupBy("__doc")
        .agg(F.sum(F.col("__x") * F.col("__w")).alias("__s"))
    )
    p = F.lit(1.0) / (
        F.lit(1.0)
        + F.exp(-(F.lit(bias) + F.coalesce(F.col("__s"), F.lit(0.0))))
    )
    return labels.join(scores, on="__doc", how="left").select(
        "__doc", (p - F.col("__y")).alias("__r"), p.alias("__p"), "__y"
    )


def _word_gradient(
    feats: DataFrame, resid: DataFrame, n_docs: int
) -> DataFrame:
    """(word, g): doc-keyed join (exchange-free on feats) then the
    iteration's one corpus-sized shuffle — word-keyed, map-side
    combined."""
    return (
        feats.join(resid.select("__doc", "__r"), on="__doc")
        .groupBy("__word")
        .agg((F.sum(F.col("__x") * F.col("__r")) / n_docs).alias("__g"))
    )


def train_linear_text_classifier(
    docs: DataFrame,
    *,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    iterations: int = 20,
    learning_rate: float = 1.0,
    l2: float = 0.0,
    l1: float = 0.0,
    min_df: int = 1,
    average: bool = True,
    max_broadcast_vocab: int = 2_000_000,
    init: LinearTextModel | None = None,
    vocab: Sequence[str] | None = None,
) -> LinearTextModel:
    """Fit the linear quality classifier on (text, 0/1 label) rows.

    ``min_df`` prunes the feature vocabulary to words seen in at
    least that many documents (hapax features are noise and triple
    the vocabulary on web text); pruned words simply carry no weight,
    matching ``linear_text_score``'s OOV-contributes-0 convention.

    ``vocab`` RESTRICTS the feature vocabulary to the given words
    (intersected with the corpus's min_df vocabulary): the
    prune-and-REFIT move — select a bounded feature set from a full
    model, then retrain on exactly that set so the surviving features
    can absorb the dropped ones' discriminative work. (Measured
    honestly on the pinned-model eval: refit did NOT beat plain
    top-|weight| truncation at equal budget there — the sweep lives
    in SCALE.md — but the knob is the standard tool for corpora where
    it does, and the shipped pinned model uses plain ``top_features``
    at k=128.)

    ``l1`` trains a SPARSE model by proximal gradient descent (ISTA:
    the gradient step is followed by soft-thresholding
    ``w ← sign(w)·max(|w| − lr·l1, 0)``) — the standard way to get a
    small-and-accurate linear model: the model CONCENTRATES its
    discriminative mass onto few features during training instead of
    having a dense model truncated after the fact — the standard tool
    for fitting under a map-side literal budget
    (``text.MAX_LITERAL_FEATURES``). Exact zeros stay in the weights
    frame (callers drop them when distilling). Note the ISTA
    shrinkage biases surviving weights low; on the pinned-model eval
    plain top-|weight| truncation of an unregularized model measured
    better (SCALE.md) — measure per corpus.

    Rows with an empty token list score ``bias`` alone and still
    contribute to the bias gradient. Labels must be 0/1 (validated:
    anything else raises ``ValueError`` before the loop starts).

    ``init`` warm-starts from a previous model (continue training
    after more iterations or on a new labeled drop): weights start
    from ``init.weights`` instead of zero (words absent there start
    at 0; init words outside this corpus's vocabulary are dropped —
    this run's gradients would never touch them) and bias from
    ``init.bias``. Exactness contract: on the same corpus and
    settings, train(k, init=train(j)) == train(j + k) to float
    precision (test-pinned).
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    if init is not None and bool(init.average) != bool(average):
        # init weights were learned against the OTHER feature scaling;
        # continuing from them is silent nonsense, not a warm start
        raise ValueError(
            f"init was trained with average={init.average}; this run "
            f"uses average={average} — feature scalings must match"
        )
    feats, labels = _prepare_features(
        docs,
        label_col=label_col,
        text_col=text_col,
        id_col=id_col,
        average=average,
    )
    bad = labels.filter(
        F.col("__y").isNull() | ~F.col("__y").isin(0.0, 1.0)
    ).count()
    if bad:
        raise ValueError(
            f"{label_col} must be 0/1 with no nulls; {bad} rows are not"
        )
    n_docs = labels.count()
    if n_docs == 0:
        raise ValueError("cannot train on an empty corpus")

    # Feature vocabulary with the min_df prune; weights start at 0,
    # or at the init model's values on warm start. feats is already
    # distinct per (doc, word), so df = plain count.
    keep = vocab
    vocab = (
        feats.groupBy("__word")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") >= min_df)
        .select("__word")
    )
    if keep is not None:
        vocab = vocab.filter(F.col("__word").isin(list(keep)))
    if init is not None:
        vocab = vocab.join(
            init.weights.select(
                F.col("word").alias("__word"),
                F.col("weight").alias("__w0"),
            ),
            on="__word",
            how="left",
        )
        w0 = F.coalesce(F.col("__w0"), F.lit(0.0))
    else:
        w0 = F.lit(0.0)
    weights = vocab.select("__word", w0.alias("__w")).localCheckpoint(
        eager=True
    )
    vocab_size = weights.count()  # measured broadcast bound

    bias = float(init.bias) if init is not None else 0.0
    history: list[float] = []
    lr = float(learning_rate)
    for _ in range(iterations):
        resid = _residuals(
            feats,
            labels,
            weights,
            bias,
            vocab_size=vocab_size,
            max_broadcast_vocab=max_broadcast_vocab,
        ).persist()
        pc = F.greatest(
            F.least(F.col("__p"), F.lit(1.0 - _EPS)), F.lit(_EPS)
        )
        stats = resid.agg(
            F.avg(
                -(
                    F.col("__y") * F.log(pc)
                    + (F.lit(1.0) - F.col("__y")) * F.log(F.lit(1.0) - pc)
                )
            ).alias("loss"),
            F.avg("__r").alias("gb"),
        ).first()
        history.append(float(stats["loss"]))

        grad = _word_gradient(feats, resid, n_docs)
        step = F.col("__w") - lr * (
            F.coalesce(F.col("__g"), F.lit(0.0))
            + F.lit(float(l2)) * F.col("__w")
        )
        if l1:
            # ISTA proximal step: soft-threshold the gradient update
            # so weights hit EXACT zero — sparsity emerges during
            # training rather than by post-hoc truncation
            thr = F.lit(lr * float(l1))
            step = F.signum(step) * F.greatest(
                F.abs(step) - thr, F.lit(0.0)
            )
        new_weights = (
            weights.join(grad, on="__word", how="left")
            .select("__word", step.alias("__w"))
            .localCheckpoint(eager=True)
        )
        resid.unpersist()
        weights = new_weights
        bias -= lr * float(stats["gb"])

    feats.unpersist()
    labels.unpersist()
    return LinearTextModel(
        weights=weights.select(
            F.col("__word").alias("word"), F.col("__w").alias("weight")
        ),
        bias=bias,
        average=average,
        n_docs=n_docs,
        vocab_size=vocab_size,
        loss=history,
    )


@dataclass
class LanguageIdModel:
    """A trained multi-language identifier: one one-vs-rest linear
    model per language over character-n-gram features — the third
    language-ID rung, above the whole-word lexicon
    (``text.language_id``) and the trigram membership profiles
    (``text.language_id_ngram``), for the short/inflected documents
    where unweighted profile overlap ties or misleads.

    ``weights`` is a (lang, word, weight) DataFrame whose ``word``
    values are the n-gram feature tokens produced by
    ``text.char_ngram_text_sql`` (spaces rendered as ``▁``);
    ``languages`` fixes the deterministic argmax tiebreak order
    (first listed wins), and ``biases``/``average``/``ngram`` must
    travel with the weights — ``text.language_id_model`` consumes
    exactly this bundle.
    """

    languages: list[str]
    weights: DataFrame
    biases: dict[str, float]
    average: bool
    ngram: int

    def as_literal(self) -> dict[str, tuple[float, dict[str, float]]]:
        """{lang: (bias, {feature: weight})} — the driver-side literal
        form ``text.language_id_model`` inlines as a map-side column
        program and ``curation.map_side_curation`` requires (bounded;
        the caller is responsible for having distilled the vocabulary
        first, e.g. via ``top_features``). The mapping form carries no
        ``average`` flag — it scores average-normalized by convention
        — so a non-averaging model cannot be represented and raises
        rather than silently rescaling."""
        if not self.average:
            raise ValueError(
                "the literal mapping form is average-normalized by "
                "convention; a model trained with average=False "
                "cannot be distilled — score it via "
                "text.language_id_model with the full model instead"
            )
        rows = self.weights.collect()
        out: dict[str, tuple[float, dict[str, float]]] = {
            lang: (float(self.biases[lang]), {}) for lang in self.languages
        }
        for r in rows:
            out[r["lang"]][1][r["word"]] = float(r["weight"])
        # undistilled, so every trained feature is here — but the
        # mapping form still needs ONE full-length key to carry the
        # gram size (see training._ensure_full_length_feature)
        _ensure_full_length_feature(out, self)
        return out


def train_language_classifier(
    docs: DataFrame,
    *,
    lang_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    languages: list[str] | None = None,
    ngram: int = 3,
    iterations: int = 12,
    learning_rate: float = 1.0,
    l2: float = 0.0,
    l1: float = 0.0,
    min_df: int = 2,
    max_broadcast_vocab: int = 2_000_000,
    vocab: Sequence[str] | None = None,
) -> LanguageIdModel:
    """Fit the model rung of language ID on (text, lang) labeled rows:
    per language a one-vs-rest binary linear classifier
    (:func:`train_linear_text_classifier`, unchanged — same loss, same
    physical shape) over CHARACTER-N-GRAM features
    (``text.char_ngram_text_sql``: the space-padded n-gram stream,
    spaces rendered ``▁`` so the bag tokenizer's split survives).

    Character n-grams are what real language identifiers (fastText
    langid et al., publicly documented) train on: inflected forms the
    function-word lexicons miss ('les chats', 'parlons') still light
    up their boundary n-grams, and LEARNED weights separate languages
    that share n-grams, where :func:`text.language_id_ngram`'s
    unweighted profile membership ties. Labeled data is
    training-set-sized (not corpus-sized); scoring the corpus is the
    scale path and lives in ``text.language_id_model``.

    ``languages`` fixes both the label set and the deterministic
    prediction tiebreak order; default = sorted distinct values of
    ``lang_col`` (a bounded label-set collect).

    ``vocab`` restricts every per-language model to the given feature
    set (see :func:`train_linear_text_classifier`): the REFIT half of
    prune-and-refit — after top-|weight| selection from a full model,
    retraining on the kept set redistributes the dropped features'
    discriminative work (measured on the pinned-model eval: refit
    recovers truncation loss when the candidate set is tight, and the
    distilled-k sweep in scripts/make_pinned_langid.py picks the
    operating point under text.MAX_LITERAL_FEATURES).
    """
    from haplorec_spark.operators.text import char_ngram_text_sql

    if languages is None:
        languages = sorted(
            r[0]
            for r in docs.select(lang_col).distinct().collect()
            if r[0] is not None
        )
    if not languages:
        raise ValueError("no languages to train on")
    feat = docs.select(
        F.col(id_col),
        F.expr(char_ngram_text_sql(text_col, ngram)).alias("__ftext"),
        F.col(lang_col).alias("__lang"),
    ).persist()
    weights: DataFrame | None = None
    biases: dict[str, float] = {}
    try:
        for lang in languages:
            m = train_linear_text_classifier(
                feat.select(
                    F.col(id_col),
                    F.col("__ftext"),
                    (F.col("__lang") == F.lit(lang))
                    .cast("int")
                    .alias("__is_lang"),
                ),
                label_col="__is_lang",
                text_col="__ftext",
                id_col=id_col,
                iterations=iterations,
                learning_rate=learning_rate,
                l2=l2,
                l1=l1,
                min_df=min_df,
                average=True,
                max_broadcast_vocab=max_broadcast_vocab,
                vocab=vocab,
            )
            lw = m.weights.select(
                F.lit(lang).alias("lang"), "word", "weight"
            )
            weights = lw if weights is None else weights.unionByName(lw)
            biases[lang] = float(m.bias)
        assert weights is not None
        weights = weights.localCheckpoint(eager=True)
    finally:
        feat.unpersist()
    return LanguageIdModel(
        languages=list(languages),
        weights=weights,
        biases=biases,
        average=True,
        ngram=ngram,
    )


def top_features(
    model: LanguageIdModel, k=32
) -> dict[str, tuple[float, dict[str, float]]]:
    """Distill the model to its ``k`` strongest features per language
    (by |weight|; ties broken by word for determinism), as the literal
    mapping form. This is how a trained model gets under the map-side
    literal bound: scoring stays exact w.r.t. the DISTILLED weights
    (OOV features contribute 0 by the shared convention), the
    established trade of every literal-codebook path. Raises for a
    non-averaging model (the mapping form carries no ``average``
    flag; see :meth:`LanguageIdModel.as_literal`).

    ``k`` may be a mapping ``{lang: k}`` (missing languages fall back
    to its ``"*"`` entry, default 32) — the budget-allocation knob
    (round 9): a language whose features are categorical (the
    space-free scripts — any Han gram separates zh from every spaced
    language) saturates at small k, and its surplus is better spent
    on the mutually-confusable Latin inventory under the shared
    :data:`~haplorec_spark.operators.text.MAX_LITERAL_FEATURES`
    budget."""
    if not model.average:
        raise ValueError(
            "the literal mapping form is average-normalized by "
            "convention; a model trained with average=False cannot "
            "be distilled — score it via text.language_id_model "
            "with the full model instead"
        )
    from collections.abc import Mapping as _Mapping

    if isinstance(k, _Mapping):
        default = int(k.get("*", 32))
        entries = [
            x
            for lang, kk in sorted(k.items())
            if lang != "*"
            for x in (lang, int(kk))
        ]
        if entries:
            k_expr = F.coalesce(
                F.element_at(
                    F.create_map(*[F.lit(e) for e in entries]),
                    F.col("lang"),
                ),
                F.lit(default),
            )
        else:
            k_expr = F.lit(default)
    else:
        k_expr = F.lit(int(k))
    ranked = model.weights.withColumn(
        "__rk",
        F.row_number().over(
            Window.partitionBy("lang").orderBy(
                F.abs(F.col("weight")).desc(), "word"
            )
        ),
    ).filter(F.col("__rk") <= k_expr)
    out: dict[str, tuple[float, dict[str, float]]] = {
        lang: (float(model.biases[lang]), {}) for lang in model.languages
    }
    for r in ranked.collect():
        out[r["lang"]][1][r["word"]] = round(float(r["weight"]), 6)
    _ensure_full_length_feature(out, model)
    return out


def _ensure_full_length_feature(
    out: dict[str, tuple[float, dict[str, float]]], model: LanguageIdModel
) -> None:
    """The mapping form drops ``ngram``; scorers recover it as the
    LONGEST feature-key length (``text._mapping_ngram``), which is
    only exact if at least one FULL-length feature (exactly ``ngram``
    characters) survived distillation. If top-|weight| selection kept
    only sub-n boundary grams, force-include the single strongest
    full-length feature from the full weight table, then evict the
    globally weakest kept feature so the total feature count is
    unchanged — a model distilled to land exactly at the consumer's
    ``MAX_LITERAL_FEATURES`` bound stays at the bound instead of
    overshooting by one and being rejected. If the trained weights
    contain no full-length feature at all, the gram size is genuinely
    unrecoverable and we raise rather than let the scorer silently
    run at the wrong n and predict near-bias-only."""
    n = int(model.ngram)
    if any(len(w) == n for _, ws in out.values() for w in ws):
        return
    best = (
        model.weights.filter(F.length("word") == n)
        .orderBy(F.abs(F.col("weight")).desc(), "word")
        .limit(1)
        .collect()
    )
    if not best:
        raise ValueError(
            f"trained weights contain no full-length ({n}-char) "
            "feature; the literal mapping form cannot carry the "
            "gram size — score with the full LanguageIdModel via "
            "text.language_id_model instead"
        )
    r = best[0]
    # evict BEFORE inserting the carrier so it can never evict itself
    # (deterministic: smallest |weight|, ties broken by (lang, word))
    kept = [
        (abs(w), lang, word)
        for lang, (_, ws) in sorted(out.items())
        for word, w in sorted(ws.items())
    ]
    if kept:
        _, evict_lang, evict_word = min(kept)
        del out[evict_lang][1][evict_word]
    out[r["lang"]][1][r["word"]] = round(float(r["weight"]), 6)


def _table_fingerprint(df: DataFrame, *cols: str) -> str:
    """Cheap order-insensitive content fingerprint of an artifact
    part: row count + crc32 sum over the named columns — enough to
    catch a torn multi-part save (one part swapped, another stale)
    without hashing bytes. Shared with the BPE tokenizer artifact
    (``operators.bpe`` imports it), so a sign flip, a renamed word,
    or a cross-row permutation all change the fingerprint — the
    failure modes a count + |weight|-mass scheme would miss."""
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.crc32(F.concat_ws("\x1f", *[F.col(c).cast("string")
                                           for c in cols]))
        ).alias("h"),
    ).first()
    return f"{int(row['n'])}:{int(row['h'] or 0)}"


def save_language_model(model: LanguageIdModel, path: str) -> None:
    """Persist the language identifier: ``<path>/weights`` first, then
    ``<path>/meta`` (per-language bias + tiebreak rank + the shared
    scalars) LAST, carrying a fingerprint of the weights table —
    ``load_language_model`` validates it, so a crash between the two
    swaps is DETECTED at load instead of silently pairing new weights
    with a stale meta (each part is individually atomic via
    :func:`safe_overwrite_parquet`)."""
    weights = model.weights.localCheckpoint(eager=True)
    safe_overwrite_parquet(weights, f"{path}/weights")
    spark = model.weights.sparkSession
    fp = _table_fingerprint(weights, "lang", "word", "weight")
    meta = spark.createDataFrame(
        [
            (
                lang,
                rank,
                float(model.biases[lang]),
                bool(model.average),
                int(model.ngram),
                fp,
            )
            for rank, lang in enumerate(model.languages)
        ],
        "lang string, rank int, bias double, average boolean, "
        "ngram int, weights_fingerprint string",
    )
    safe_overwrite_parquet(meta, f"{path}/meta")


def load_language_model(spark, path: str) -> LanguageIdModel:
    """Load a :func:`save_language_model` artifact, validating the
    meta's weights fingerprint against the weights actually on disk
    (raises ``IOError`` on a torn artifact)."""
    meta = sorted(
        spark.read.parquet(f"{path}/meta").collect(),
        key=lambda r: r["rank"],
    )
    weights = spark.read.parquet(f"{path}/weights")
    fp = _table_fingerprint(weights, "lang", "word", "weight")
    want = meta[0]["weights_fingerprint"]
    if fp != want:
        # the pre-crc32 scheme wrote "<n>:<|weight| mass>" with a
        # decimal point; distinguish a scheme change from real tearing
        # so an intact old artifact gets an actionable message
        if "." in str(want):
            raise IOError(
                f"language model at {path} was saved with an older "
                f"fingerprint scheme ({want}); re-save it with this "
                f"version's save_language_model to upgrade"
            )
        raise IOError(
            f"language model at {path} is torn: weights fingerprint "
            f"{fp} != meta's {want} (re-save the artifact)"
        )
    return LanguageIdModel(
        languages=[r["lang"] for r in meta],
        weights=weights,
        biases={r["lang"]: float(r["bias"]) for r in meta},
        average=bool(meta[0]["average"]),
        ngram=int(meta[0]["ngram"]),
    )


def evaluate_binary_classifier(
    scored: DataFrame,
    *,
    label_col: str = "label",
    prob_col: str = "prob",
    threshold: float = 0.5,
) -> DataFrame:
    """One row: (n, n_pos, accuracy, precision, recall, f1, auc) for a
    scored frame carrying a 0/1 label and a probability column — the
    eval face of the train (:func:`train_linear_text_classifier`) →
    apply (``linear_text_score``) loop, run where the scores already
    live instead of collecting them to a driver-side metrics library.

    The ONLY corpus-sized work is the one distinct-score histogram
    build (prob → count, positives; a shuffle with map-side partial
    aggregation): every thresholded count AND the AUC rank-sum are
    sums over histogram rows, so the corpus is scanned exactly once.
    AUC is exact, via the Mann-Whitney U statistic:
    AUC = (R_pos − n_pos(n_pos+1)/2) / (n_pos · n_neg), where R_pos is
    the rank-sum of positives under ascending ``prob`` with AVERAGE
    ranks on ties (the textbook tie handling — without it, a constant
    classifier would not score 0.5). The rank window runs over
    distinct score values, never over the corpus — and that bound is
    ENFORCED, not assumed: probabilities are quantized to 6 decimals
    before the histogram (matching the rounding every in-repo score
    producer already applies), so the histogram is ≤ 10^6 + 1 rows and
    the single-partition window is dimension-sized no matter the
    corpus or the caller's score precision. AUC/threshold counts are
    therefore exact at 6-decimal score resolution.
    Precision/recall/f1 are null (not 0/0) when undefined; AUC is null
    when either class is absent.
    """
    # distinct-score histogram: (prob, n at that prob, positives at
    # that prob) — the one corpus-sized shuffle; everything below is
    # arithmetic over score values
    hist = (
        scored.groupBy(F.round(F.col(prob_col), 6).alias("__p"))
        .agg(
            F.count(F.lit(1)).alias("__c"),
            F.sum(F.col(label_col).cast("long")).alias("__cp"),
        )
    )
    w = Window.orderBy("__p").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # average rank of the __c tied rows ending at cumulative count C:
    # (C - __c + 1 + C) / 2
    at = F.col("__p") >= threshold
    rpos = (
        hist.withColumn("__cum", F.sum("__c").over(w))
        .agg(
            F.sum("__c").alias("n"),
            F.sum("__cp").alias("n_pos"),
            F.coalesce(
                F.sum(F.when(at, F.col("__cp"))), F.lit(0)
            ).alias("tp"),
            F.coalesce(
                F.sum(F.when(at, F.col("__c") - F.col("__cp"))),
                F.lit(0),
            ).alias("fp"),
            F.sum(
                (
                    (F.col("__cum") - F.col("__c") + 1 + F.col("__cum"))
                    / F.lit(2.0)
                )
                * F.col("__cp")
            ).alias("r"),
        )
        .withColumn("fn", F.col("n_pos") - F.col("tp"))
        .withColumn("tn", F.col("n") - F.col("n_pos") - F.col("fp"))
    )
    prec = F.when(
        F.col("tp") + F.col("fp") > 0,
        F.col("tp") / (F.col("tp") + F.col("fp")),
    )
    rec = F.when(
        F.col("tp") + F.col("fn") > 0,
        F.col("tp") / (F.col("tp") + F.col("fn")),
    )
    f1 = F.when(
        prec.isNotNull() & rec.isNotNull() & (prec + rec > 0),
        2 * prec * rec / (prec + rec),
    )
    n_neg = F.col("n") - F.col("n_pos")
    auc = F.when(
        (F.col("n_pos") > 0) & (n_neg > 0),
        (
            F.col("r")
            - F.col("n_pos") * (F.col("n_pos") + 1) / F.lit(2.0)
        )
        / (F.col("n_pos") * n_neg),
    )
    return rpos.select(
        "n",
        "n_pos",
        F.round((F.col("tp") + F.col("tn")) / F.col("n"), 6).alias(
            "accuracy"
        ),
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
        F.round(auc, 6).alias("auc"),
    )


def calibration_buckets(
    scored: DataFrame,
    *,
    n_buckets: int = 10,
    label_col: str = "label",
    prob_col: str = "prob",
) -> DataFrame:
    """(bucket, p_low, p_high, n, mean_prob, pos_rate, abs_gap): the
    reliability diagram's data — equal-width probability buckets with
    predicted-vs-empirical positive rates. ``sum(n * abs_gap) /
    sum(n)`` over the rows is the expected calibration error (ECE);
    a well-calibrated quality filter has pos_rate ≈ mean_prob per
    bucket, and a miscalibrated one mis-ranks every threshold cut
    built on it.

    One map-side bucket assignment + one aggregate — no window, no
    sort; bucket count is the only output dimension. ``prob = 1.0``
    lands in the last bucket (half-open buckets, closed at the top).
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    b = F.least(
        F.floor(F.col(prob_col) * n_buckets).cast("int"),
        F.lit(n_buckets - 1),
    )
    agg = (
        scored.select(
            b.alias("bucket"),
            F.col(prob_col).alias("__p"),
            F.col(label_col).cast("double").alias("__y"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("__p"), 6).alias("mean_prob"),
            F.round(F.avg("__y"), 6).alias("pos_rate"),
        )
    )
    return agg.select(
        "bucket",
        F.round(F.col("bucket") / n_buckets, 6).alias("p_low"),
        F.round((F.col("bucket") + 1) / n_buckets, 6).alias("p_high"),
        "n",
        "mean_prob",
        "pos_rate",
        F.round(F.abs(F.col("mean_prob") - F.col("pos_rate")), 6).alias(
            "abs_gap"
        ),
    ).orderBy("bucket")


def safe_overwrite_parquet(df: DataFrame, dest: str) -> None:
    """Replace the parquet directory at ``dest`` with ``df`` WITHOUT
    the overwrite-in-place failure window: the new data is fully
    written to a ``.__tmp__`` sibling first, then swapped in by a
    filesystem rename through the Hadoop ``FileSystem`` API (any
    supported scheme). A failure mid-write leaves the existing
    artifact intact — ``mode('overwrite')`` straight at ``dest``
    would have deleted it before the write committed."""
    spark = df.sparkSession
    tmp = f"{dest}.__tmp__"
    df.write.mode("overwrite").parquet(tmp)
    jvm = spark.sparkContext._jvm
    hadoop_path = jvm.org.apache.hadoop.fs.Path(dest)
    fs = hadoop_path.getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration()
    )
    if fs.exists(hadoop_path):
        fs.delete(hadoop_path, True)
    if not fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), hadoop_path):
        raise IOError(f"rename {tmp} -> {dest} failed")


def save_text_model(model: LinearTextModel, path: str) -> None:
    """Persist a trained model: ``<path>/weights`` (the word-weight
    table, the only data-sized part) + ``<path>/meta`` (one row of
    scalars + the loss history) — the artifact ``linear_text_score``
    consumes on any cluster, the store convention of
    ``write_pq_store``/``write_semantic_store``.

    Safe to re-save a LOADED model to its own path, on a real cluster
    included: the new weights are FULLY WRITTEN to a temporary sibling
    (``<path>/weights.__tmp__``) before the old directory is replaced
    by a filesystem rename, so a failure mid-write (lost executor,
    decommission) leaves the existing artifact intact — overwrite-in-
    place would have deleted it before the write committed, and
    ``localCheckpoint`` blocks (executor-storage only, truncated
    lineage) could not recompute it. The rename goes through the
    Hadoop ``FileSystem`` API, so any supported scheme (hdfs://,
    s3a://, file://) works; the checkpoint below additionally keeps
    the IN-MEMORY loaded model readable after its source files are
    replaced (a local-mode convenience, not the durability
    mechanism)."""
    weights = model.weights.localCheckpoint(eager=True)
    safe_overwrite_parquet(weights, f"{path}/weights")
    spark = model.weights.sparkSession
    spark.createDataFrame(
        [
            (
                float(model.bias),
                bool(model.average),
                int(model.n_docs),
                int(model.vocab_size),
                [float(x) for x in model.loss],
            )
        ],
        "bias double, average boolean, n_docs long, vocab_size long, "
        "loss array<double>",
    ).write.mode("overwrite").parquet(f"{path}/meta")


def load_text_model(spark, path: str) -> LinearTextModel:
    """Load a :func:`save_text_model` artifact; the returned model
    drops straight into ``linear_text_score`` or back into
    ``train_linear_text_classifier(init=...)`` for continued
    training."""
    meta = spark.read.parquet(f"{path}/meta").first()
    return LinearTextModel(
        weights=spark.read.parquet(f"{path}/weights"),
        bias=float(meta["bias"]),
        average=bool(meta["average"]),
        n_docs=int(meta["n_docs"]),
        vocab_size=int(meta["vocab_size"]),
        loss=list(meta["loss"]),
    )
