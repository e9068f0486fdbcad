"""Single-pass table profiling: per-column stats for corpus audits.

``profile_table`` answers the first questions asked of any new 100 TB
drop — null rates, cardinalities, ranges, text lengths — in ONE pass:
every statistic is an aggregate column of a single ``agg`` (partial
aggregation map-side, one scalar row out), which is then unpivoted
into a row per column. Nothing is collected besides that one row.

Distinct counts default to HyperLogLog++ (``approx_count_distinct``,
one pass, mergeable) — at corpus scale an exact multi-column distinct
forces an Expand of the whole scan per column. ``exact=True`` opts
into exact counts for oracle-checked or dimension-sized tables.

min/max are computed in the column's own type (not lexicographically)
and cast to string afterwards for the uniform schema; non-orderable
columns (arrays, maps, structs, binary) report null min/max, map
columns additionally report null ``n_distinct`` (Spark cannot hash or
compare maps), and ``avg_length`` covers string columns only.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    MapType,
    StructType,
)

_NOT_ORDERABLE = (ArrayType, MapType, StructType, BinaryType)


def profile_table(df: DataFrame, *, exact: bool = False) -> DataFrame:
    """One row per column: (column, dtype, n_rows, n_nulls,
    null_fraction, n_distinct, min_value, max_value, avg_length).
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in df.columns:
        dt = fields[c]
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls")
        )
        if isinstance(dt, MapType):
            # maps are not hashable/comparable in Spark — a distinct
            # aggregate over one raises; report null like min/max
            aggs.append(
                F.first(F.lit(None).cast("bigint")).alias(f"{c}__distinct")
            )
        else:
            aggs.append(
                (
                    F.count_distinct(F.col(c))
                    if exact
                    else F.approx_count_distinct(c)
                ).alias(f"{c}__distinct")
            )
        if isinstance(dt, _NOT_ORDERABLE):
            aggs.append(F.first(F.lit(None).cast("string")).alias(f"{c}__min"))
            aggs.append(F.first(F.lit(None).cast("string")).alias(f"{c}__max"))
        else:
            aggs.append(F.min(F.col(c)).cast("string").alias(f"{c}__min"))
            aggs.append(F.max(F.col(c)).cast("string").alias(f"{c}__max"))
        aggs.append(
            (
                F.round(F.avg(F.length(F.col(c))), 6)
                if dt.simpleString() == "string"
                else F.first(F.lit(None).cast("double"))
            ).alias(f"{c}__avglen")
        )
    row = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.lit(fields[c].simpleString()).alias("dtype"),
                F.col("__n").alias("n_rows"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.when(F.col("__n") > 0,
                       F.round(F.col(f"{c}__nulls") / F.col("__n"), 6))
                .otherwise(F.lit(None))
                .alias("null_fraction"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_value"),
                F.col(f"{c}__max").alias("max_value"),
                F.col(f"{c}__avglen").alias("avg_length"),
            )
            for c in df.columns
        ]
    )
    return row.select(F.explode(per_col).alias("p")).select("p.*")


def frequent_values(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    k: int = 10,
) -> DataFrame:
    """(column, value, n_rows, rank): the top-``k`` most frequent values
    per column — the histogram half of a profile (skew keys, default
    sentinel strings, degenerate columns).

    All columns share ONE shuffle: each row is stacked into
    (column, value-as-string) pairs map-side, counted per pair with
    partial aggregation, then ranked per column. Ties break by value
    for determinism. Value stringification uses the same cast as
    :func:`profile_table`'s min/max; nulls are counted like any value
    and surface as NULL.
    """
    cols = list(columns) if columns is not None else list(df.columns)
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("value"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    ).select("p.*")
    counted = pairs.groupBy("column", "value").agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    w = Window.partitionBy("column").orderBy(
        F.col("n_rows").desc(), F.col("value").asc_nulls_last()
    )
    return (
        counted.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def numeric_quantiles(
    df: DataFrame,
    columns: Sequence[str],
    probs: Sequence[float] = (0.25, 0.5, 0.75, 0.95),
    *,
    exact: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """(column, prob, value): quantiles of numeric columns, one pass.

    Default is ``approx_percentile`` (Greenwald-Khanna sketch,
    mergeable partials, bounded memory — the only viable form at corpus
    scale; ``accuracy`` trades memory for error <= 1/accuracy of rank).
    ``exact=True`` switches to ``percentile`` (interpolated, matches
    SQL ``quantile_cont`` — used by the oracle cross-checks), which
    buffers each column's values per partial: dimension-sized tables
    only. All columns and probs still aggregate in the same single agg.
    """
    if not columns:
        raise ValueError("columns must not be empty")
    prob_list = ", ".join(repr(float(p)) for p in probs)
    fn = "percentile" if exact else "approx_percentile"
    extra = "" if exact else f", {int(accuracy)}"
    aggs = [
        F.expr(
            f"{fn}({c}, array({prob_list}){extra})"
        ).alias(f"{c}__q")
        for c in columns
    ]
    row = df.agg(*aggs)
    per = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.lit(float(p)).alias("prob"),
                F.get(F.col(f"{c}__q"), i).cast("double").alias("value"),
            )
            for c in columns
            for i, p in enumerate(probs)
        ]
    )
    return row.select(F.explode(per).alias("p")).select("p.*")


def text_corpus_profile(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(metric, value): the corpus-curation dashboard in ONE pass.

    The text-family composition of :func:`profile_table`: document
    count, token totals and quantiles, mean quality / repetition
    scores, and per-language fractions. Round 12 scale shape: the
    per-document features PRE-AGGREGATE by word count (one shuffle,
    map-side combine, distinct-length-sized result — every metric here
    is a sum, a count, or a quantile of ``n_words``, so the word-count
    histogram loses nothing), the word-count quantiles read off a
    cumulative window over that histogram (the
    :mod:`~haplorec_spark.operators.percentiles` rewrite — identical
    ``quantile_cont`` interpolation), and the final global aggregate
    folds histogram rows. The old single ``agg`` was also one pass but
    its exact ``percentile`` buffered EVERY document's word count on
    one task; now no buffer outgrows the distinct document lengths.
    One scalar row computes, then unpivots to (metric, value) for
    dashboards and drift comparisons between drops. The quantile
    bounds sit in the SAME aggregate as every other metric (the
    shared bound/interp spellings from
    :mod:`~haplorec_spark.operators.percentiles`), so the histogram
    is consumed exactly once — no persist, no second corpus
    featurization pass.
    """
    from haplorec_spark.operators.percentiles import (
        histogram_quantile_bound_aggs,
        histogram_quantile_exprs,
    )
    from haplorec_spark.operators.text import (
        LANG_LEXICON,
        _floor_pred,
        _lexicon_struct,
        _null_text_guard,
        _quality_exprs,
    )

    # attach-in-place featurization: quality/repetition and language
    # are both pure map-side expression programs (_quality_exprs is
    # text.py's documented no-join face; the language argmax is the
    # same struct language_id projects), so the profile computes every
    # per-document feature in ONE projection over ONE corpus scan —
    # the operator-composition spelling (quality_score ⋈ language_id
    # on id) re-scanned the corpus three times and paid two
    # corpus-wide id shuffles just to reattach map-side columns
    lx = _null_text_guard(_lexicon_struct(text_col), text_col)
    feats = docs.select(
        F.col(id_col),
        *[
            F.expr(e).alias(a)
            for a, e in _quality_exprs(text_col, True)
        ],
        _floor_pred(
            lx.getField("l"), lx.getField("s"), None
        ).alias("predicted_lang"),
    )
    # sum/count pairs per metric so null handling matches avg() exactly
    mean_cols = {
        "avg_quality": "quality",
        "avg_dup_word_fraction": "dup_word_fraction",
        "avg_top_word_fraction": "top_word_fraction",
    }
    per_len = feats.groupBy("n_words").agg(
        F.count(F.lit(1)).alias("__c"),
        *[
            a
            for name, src in mean_cols.items()
            for a in (
                F.sum(src).alias(f"__s_{name}"),
                F.count(src).alias(f"__n_{name}"),
            )
        ],
        *[
            F.sum(
                F.when(F.col("predicted_lang") == lang, 1.0).otherwise(0.0)
            ).alias(f"__l_{lang}")
            for lang in LANG_LEXICON
        ],
    )
    # Word-count quantiles ride the shared histogram spellings of
    # operators.percentiles INSIDE the same aggregate as every other
    # metric, over null-excluding cumulative windows (so null-text
    # docs never shift a rank or inflate the interpolation count —
    # the percentile() null convention) — one consumption of the
    # histogram, one corpus featurization. Quantiles stay raw
    # (unrounded) doubles, bit-equal to DuckDB quantile_cont.
    quantiles = (0.5, 0.9, 0.99)
    qnames = [f"words_p{int(p * 100)}" for p in quantiles]
    nzc = F.when(
        F.col("n_words").isNotNull(), F.col("__c")
    ).otherwise(F.lit(0))
    wall = Window.partitionBy()
    cum = Window.orderBy("n_words").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    h = per_len.withColumn("__cum", F.sum(nzc).over(cum)).withColumn(
        "__n", F.sum(nzc).over(wall)
    )
    row = h.agg(
        # coalesce: an empty corpus is n_docs 0, the count() convention
        F.coalesce(F.sum("__c"), F.lit(0)).cast("double").alias("n_docs"),
        F.sum(F.col("n_words") * F.col("__c")).cast("double").alias(
            "total_words"
        ),
        F.max("__n").alias("__cnt_words"),
        *histogram_quantile_bound_aggs(quantiles, value_col="n_words"),
        *[
            F.sum(f"__s_{name}").alias(f"__s_{name}")
            for name in mean_cols
        ],
        *[
            F.sum(f"__n_{name}").alias(f"__n_{name}")
            for name in mean_cols
        ],
        *[
            F.sum(f"__l_{lang}").alias(f"__l_{lang}")
            for lang in LANG_LEXICON
        ],
    ).withColumn(
        # avg() ignores nulls: divide by the non-null word count, not
        # the document count
        "avg_words",
        F.round(F.col("total_words") / F.col("__cnt_words"), 6),
    )
    for qname, qexpr in zip(
        qnames,
        histogram_quantile_exprs(
            quantiles, F.col("__cnt_words"), round_to=None
        ),
    ):
        row = row.withColumn(qname, qexpr.cast("double"))
    for name in mean_cols:
        row = row.withColumn(
            name,
            F.round(F.col(f"__s_{name}") / F.col(f"__n_{name}"), 6),
        )
    for lang in LANG_LEXICON:
        row = row.withColumn(
            f"lang_{lang}_fraction",
            F.round(F.col(f"__l_{lang}") / F.col("n_docs"), 6),
        )
    metric_cols = (
        ["n_docs", "total_words", "avg_words"]
        + list(mean_cols)
        + [f"lang_{lang}_fraction" for lang in LANG_LEXICON]
        + qnames
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("metric"),
                F.col(c).cast("double").alias("value"),
            )
            for c in metric_cols
        ],
    )
    return row.select(F.explode(pairs).alias("m")).select("m.*")


def embedding_profile(
    vectors: DataFrame, *, vec_col: str = "embedding"
) -> DataFrame:
    """(metric, value): the vector-column sanity audit in ONE pass —
    the embeddings-table sibling of :func:`text_corpus_profile`, run
    BEFORE any ANN/semantic-dedup job: a single corrupt drop (ragged
    dimensions, NaN/zero vectors) otherwise surfaces as a mystery
    failure deep inside a k-means or a cosine join.

    Metrics: row count, null-vector count, distinct dimension count +
    min/max dimension (a healthy table has exactly one), vectors
    containing NaN / infinite / null ELEMENTS (three separate counts —
    a ragged cast upstream shows up as whichever it produced), zero-
    norm vectors (cosine is undefined on them), and norm mean/min/max
    over the clean rows only. Every number is an aggregate column of
    one ``agg`` over one map-side projection (norms and badness flags
    are array folds) — one scalar row out, then unpivoted. Exact, not
    sampled: at 100 TB this is one scan with partial aggregation, the
    same cost class as any corpus count.
    """
    v = F.col(vec_col)
    nrm = F.expr(
        f"sqrt(aggregate({vec_col}, cast(0.0 as double),"
        f" (acc, x) -> acc + cast(x as double) * cast(x as double)))"
    )
    has_nan = F.expr(
        f"exists({vec_col},"
        f" x -> x is not null and isnan(cast(x as double)))"
    )
    has_inf = F.expr(
        f"exists({vec_col}, x -> x is not null and"
        f" abs(cast(x as double)) = cast('Infinity' as double))"
    )
    has_null_elem = F.expr(f"exists({vec_col}, x -> x is null)")
    bad = has_nan | has_inf | has_null_elem
    row = vectors.select(
        v.isNull().cast("double").alias("_null"),
        F.when(v.isNull(), None).otherwise(F.size(v)).alias("_dim"),
        F.when(v.isNull(), None).otherwise(has_nan.cast("double")).alias(
            "_nan"
        ),
        F.when(v.isNull(), None).otherwise(has_inf.cast("double")).alias(
            "_inf"
        ),
        F.when(v.isNull(), None)
        .otherwise(has_null_elem.cast("double"))
        .alias("_nule"),
        F.when(v.isNull() | bad, None).otherwise(nrm).alias("_nrm"),
    ).agg(
        F.count(F.lit(1)).cast("double").alias("n_vectors"),
        F.sum("_null").alias("n_null_vectors"),
        F.countDistinct("_dim").cast("double").alias("n_distinct_dims"),
        F.min("_dim").cast("double").alias("min_dim"),
        F.max("_dim").cast("double").alias("max_dim"),
        F.coalesce(F.sum("_nan"), F.lit(0.0)).alias("n_nan_vectors"),
        F.coalesce(F.sum("_inf"), F.lit(0.0)).alias("n_inf_vectors"),
        F.coalesce(F.sum("_nule"), F.lit(0.0)).alias(
            "n_null_element_vectors"
        ),
        F.sum(
            F.when(F.col("_nrm") == 0.0, 1.0).otherwise(0.0)
        ).alias("n_zero_norm"),
        F.round(F.avg("_nrm"), 6).alias("avg_norm"),
        F.round(F.min("_nrm"), 6).alias("min_norm"),
        F.round(F.max("_nrm"), 6).alias("max_norm"),
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("metric"),
                F.col(c).cast("double").alias("value"),
            )
            for c in row.columns
        ]
    )
    return row.select(F.explode(pairs).alias("m")).select("m.*")


def profile_drift(before: DataFrame, after: DataFrame) -> DataFrame:
    """(column, metric, before, after, delta, rel_change): compare two
    :func:`profile_table` outputs — the corpus-monitoring face (a new
    crawl/drop vs the previous snapshot: did null rates spike, did a
    column's cardinality collapse, did value ranges shift?).

    One row per (column, metric) for ``n_rows`` / ``n_nulls`` /
    ``null_fraction`` / ``n_distinct`` / ``avg_length`` (numeric:
    ``delta`` = after − before, ``rel_change`` = delta / |before|,
    null when before is 0/null) and for ``min_value`` / ``max_value``
    (string-compared: delta columns null, drift visible in the
    before/after pair). Columns present in only one profile appear
    with the missing side null — schema drift is drift.

    Profiles are column-counted (rows = columns × metrics), so this is
    driver-scale arithmetic on two tiny frames — the 100 TB cost was
    already paid by the profiles themselves.
    """
    num = ["n_rows", "n_nulls", "null_fraction", "n_distinct",
           "avg_length"]
    txt = ["min_value", "max_value"]

    def melt(p: DataFrame, side: str) -> DataFrame:
        entries = [
            F.struct(
                F.lit(m).alias("metric"),
                F.col(m).cast("double").alias(f"{side}_num"),
                F.col(m).cast("string").alias(side),
            )
            for m in num
        ] + [
            F.struct(
                F.lit(m).alias("metric"),
                F.lit(None).cast("double").alias(f"{side}_num"),
                F.col(m).alias(side),
            )
            for m in txt
        ]
        return p.select(
            "column", F.explode(F.array(*entries)).alias("e")
        ).select("column", "e.*")

    j = melt(before, "before").join(
        melt(after, "after"), on=["column", "metric"], how="full_outer"
    )
    delta = F.round(F.col("after_num") - F.col("before_num"), 6)
    rel = F.when(
        F.abs(F.col("before_num")) > 0,
        F.round(
            (F.col("after_num") - F.col("before_num"))
            / F.abs(F.col("before_num")),
            6,
        ),
    )
    return j.select(
        "column",
        "metric",
        "before",
        "after",
        delta.alias("delta"),
        rel.alias("rel_change"),
    )


def value_histogram_psi(
    freq_before: DataFrame,
    freq_after: DataFrame,
    *,
    alpha: float = 0.5,
) -> DataFrame:
    """(column, psi, n_buckets): population stability index per column
    between two :func:`frequent_values` histograms — the standard
    drift score (PSI < 0.1 stable, 0.1–0.25 moderate, > 0.25 shifted).

    PSI = Σ_buckets (p_after − p_before) · ln(p_after / p_before),
    over the UNION of the two top-k bucket sets; shares are computed
    within each histogram's captured mass and add-``alpha`` smoothed,
    so a bucket present on one side only contributes a finite,
    smoothing-bounded term instead of ±inf. Deterministic and
    engine-replayable (plain arithmetic on the histogram rows).

    Like :func:`profile_drift`, the inputs are top-k-sized — the
    corpus-scale work happened in ``frequent_values``' one shuffle.

    NULL is a real bucket: ``frequent_values`` surfaces NULL values as
    a histogram row, so the bucket join is NULL-SAFE — a column with
    the same null rate on both sides contributes ~0 PSI instead of the
    two one-sided phantom buckets a plain equality join would create.
    """
    # coalesce to a sentinel rather than eqNullSafe: the sentinel keeps
    # the join a plain hash equi-join on both engines and in the SQL
    # replica; \x00null cannot collide with a real cast string
    sent = F.lit("\x00null")
    a = freq_before.select(
        "column",
        F.coalesce(F.col("value"), sent).alias("value"),
        F.col("n_rows").alias("_na"),
    )
    b = freq_after.select(
        "column",
        F.coalesce(F.col("value"), sent).alias("value"),
        F.col("n_rows").alias("_nb"),
    )
    j = a.join(b, on=["column", "value"], how="full_outer").select(
        "column",
        F.coalesce(F.col("_na"), F.lit(0)).cast("double").alias("_na"),
        F.coalesce(F.col("_nb"), F.lit(0)).cast("double").alias("_nb"),
    )
    tot = j.groupBy("column").agg(
        F.sum("_na").alias("_ta"),
        F.sum("_nb").alias("_tb"),
        F.count(F.lit(1)).alias("n_buckets"),
    )
    s = j.join(tot, on="column")
    pa = (F.col("_na") + F.lit(alpha)) / (
        F.col("_ta") + F.lit(alpha) * F.col("n_buckets")
    )
    pb = (F.col("_nb") + F.lit(alpha)) / (
        F.col("_tb") + F.lit(alpha) * F.col("n_buckets")
    )
    term = (pb - pa) * F.log(pb / pa)
    return (
        s.groupBy("column")
        .agg(
            F.round(F.sum(term), 6).alias("psi"),
            F.first("n_buckets").alias("n_buckets"),
        )
    )
