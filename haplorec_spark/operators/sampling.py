"""Deterministic sampling, splitting, and decontamination operators.

Training-data curation at 100 TB needs samples that are REPRODUCIBLE
(reruns and backfills select the same rows), CONSISTENT across engines
(a row's split assignment must not depend on Spark internals), and
MAP-SIDE (no shuffle just to subsample). All operators here derive
selection from ``md5(seed || key)`` — a content hash both Spark and any
SQL engine compute identically — never from ``rand()`` (nondeterministic
across retries) or ``monotonically_increasing_id`` (partition-layout
dependent).

* :func:`hash_fraction_sample` — keep a deterministic ~``fraction`` of
  rows by key hash. Pure filter: map-side, zero shuffle, stable under
  reruns and engine changes.
* :func:`hash_split` — disjoint train/valid/test-style splits from one
  hash band per row; a row's split never changes when other rows are
  added or removed (the property random shuffles lack).
* :func:`stratified_hash_sample` — per-stratum fractions (e.g. downsample
  boilerplate-heavy languages), still a pure map-side filter.
* :func:`top_k_by_hash` — exact k-row uniform-without-replacement sample:
  the k smallest hash priorities. One partial top-k per partition + a
  k-row merge (Spark's sort+limit), never a full global sort of payloads.
* :func:`mixture_sample` — rebalance a multi-domain corpus to target
  token shares: per-domain keep fractions are derived from one
  token-total aggregate (domain-count rows to the driver), then applied
  as the stratified map-side filter. The largest mixture satisfying
  every target without upsampling is chosen (the binding domain keeps
  fraction 1.0).
* :func:`decontaminate` — drop corpus documents sharing any n-gram
  shingle with a benchmark/eval set (training-set contamination removal):
  shingle both sides, LEFT ANTI join corpus shingles against the
  (broadcast) benchmark shingles, keep clean documents.

The reference engine has no sampling surface (SURVEY §2 — strictly
batch-complete pipelines); this module is engine breadth for the
training-data pipeline target, same charter as dedup/similarity/text.
"""

from __future__ import annotations

import math
from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Hash-band resolution: bands are the first 8 hex chars of md5 read as
#: a 32-bit integer, uniform on [0, 2^32).
_BAND_BITS = 32

#: ASCII unit separator between seed and key columns inside the hashed
#: string, so ('ab', 'c') and ('a', 'bc') produce different keys. Any
#: replica of the hash (tests, other engines) must join with this byte.
_SEP = "\x1f"

#: NULL key components hash as this sentinel rather than being skipped
#: (concat_ws drops NULL arguments), so ('a', NULL) and (NULL, 'a')
#: land in different bands and NULL keys don't collapse into one band.
#: Replicas (tests, other engines) must substitute the same bytes.
_NULL = "\x00null"


def _key_str(seed: str, key_cols: Sequence[str]) -> Column:
    """seed || SEP || key columns, NULLs replaced by the sentinel."""
    return F.concat_ws(
        _SEP,
        F.lit(seed),
        *[
            F.coalesce(F.col(c).cast("string"), F.lit(_NULL))
            for c in key_cols
        ],
    )


def _hash_band(seed: str, key_cols: Sequence[str]) -> Column:
    """Uniform integer in [0, 2^32) from md5(seed || key columns).

    conv() parses the first 8 hex chars; the concat uses an explicit
    unit separator so ('ab', 'c') and ('a', 'bc') hash differently,
    and NULL components become the `_NULL` sentinel so they neither
    vanish from the key nor collide across positions.
    """
    return F.conv(
        F.substring(F.md5(_key_str(seed, key_cols)), 1, 8), 16, 10
    ).cast("bigint")


def hash_fraction_sample(
    df: DataFrame,
    fraction: float,
    key_cols: Sequence[str],
    *,
    seed: str = "sample",
) -> DataFrame:
    """Deterministically keep ~``fraction`` of rows by key hash.

    Selection depends only on (seed, key) — reruns, retries, engine
    swaps, and adding unrelated rows never change which keys are kept.
    Map-side filter: pushes down to the scan, no shuffle.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    cutoff = int(fraction * (1 << _BAND_BITS))
    return df.filter(_hash_band(seed, key_cols) < F.lit(cutoff))


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    key_cols: Sequence[str],
    *,
    seed: str = "weighted",
) -> DataFrame:
    """Deterministically keep each row with probability = its own
    ``weight_col`` value (clamped to [0, 1]).

    Per-row acceptance sampling for score-weighted corpus selection
    (keep high-quality documents with higher probability instead of a
    hard threshold — the soft-filter shape quality-classifier
    pipelines use): a row survives iff its hash band falls under its
    weight. Same determinism contract as
    :func:`hash_fraction_sample` — selection depends only on (seed,
    key, weight), so reruns, retries, and unrelated appends never flip
    a decision, and it composes with :func:`hash_split` (different
    seeds => independent bands). Map-side filter, no shuffle.
    """
    band = _hash_band(seed, key_cols)
    w = F.least(
        F.greatest(F.col(weight_col).cast("double"), F.lit(0.0)),
        F.lit(1.0),
    )
    return df.filter(band < (w * F.lit(float(1 << _BAND_BITS))))


def top_fraction_by_score(
    df: DataFrame,
    score_col: str,
    fraction: float,
    *,
    exact: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """Keep (approximately) the top ``fraction`` of rows by score —
    quality-percentile selection ("keep the best 30%") without a
    hand-tuned absolute threshold.

    The cut point is the (1 - fraction) quantile of ``score_col``
    computed in ONE aggregate (Greenwald-Khanna sketch by default:
    mergeable partials, bounded memory at corpus scale; ``exact=True``
    buffers values — dimension-sized inputs only), collected as a
    single scalar and pushed into a map-side ``>=`` filter. Ties at
    the cut keep every tied row, so the realized fraction can exceed
    the target on discrete scores. Unlike :func:`weighted_sample`
    (per-row independent acceptance), this is a rank cut: the kept set
    changes when the score distribution does.
    """
    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    if fraction == 1.0:
        return df
    fn = "percentile" if exact else "approx_percentile"
    extra = "" if exact else f", {int(accuracy)}"
    cut = df.agg(
        F.expr(
            f"{fn}({score_col}, {float(1.0 - fraction)!r}{extra})"
        ).alias("cut")
    ).first()["cut"]
    if cut is None:  # empty input (or all-null scores): nothing to keep
        return df.filter(F.lit(False))
    return df.filter(F.col(score_col) >= F.lit(float(cut)))


def hash_split(
    df: DataFrame,
    weights: Mapping[str, float],
    key_cols: Sequence[str],
    *,
    seed: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Assign each row a deterministic split label by hash band.

    ``weights`` maps label -> proportion (must sum to ~1). Bands are
    half-open and ordered by the mapping's iteration order, so the
    assignment is a pure function of (seed, key): stable under
    appends/deletes of other rows — the property a shuffled split lacks,
    and the one that keeps eval sets fixed across dataset versions.
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    band = _hash_band(seed, key_cols)
    expr = None
    acc = 0.0
    labels = list(weights)
    for label in labels[:-1]:
        acc += weights[label]
        cutoff = int(acc * (1 << _BAND_BITS))
        cond = band < F.lit(cutoff)
        case = F.when(cond, F.lit(label))
        expr = case if expr is None else expr.when(cond, F.lit(label))
    last = F.lit(labels[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, out)


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    weights: Mapping[str, float],
    *,
    id_col: str = "doc_id",
    seed: str = "split",
    split_col: str = "split",
    a_col: str = "doc_id_a",
    b_col: str = "doc_id_b",
    small_edge_limit: int = 1_000_000,
) -> DataFrame:
    """:func:`hash_split` with near-duplicate clusters kept whole.

    A per-document hash split leaks: two near-copies can land one in
    train and one in test, and the model is then evaluated on its own
    training data. Here the split label is a function of the
    document's CLUSTER — ``pairs`` (any of the near-dup family's
    (doc_id_a, doc_id_b) outputs: LSH, SimHash, Jaccard, semantic)
    is closed transitively via :func:`~haplorec_spark.operators.dedup.
    dedup_clusters` and every member of a cluster hashes by the
    cluster's canonical id, so near-duplicates move between splits
    together or not at all. Documents in no pair are their own
    cluster, and their labels are EXACTLY what plain ``hash_split``
    on ``id_col`` assigns — adding/removing pairs never reshuffles
    untouched documents.

    Output = ``docs`` + ``canonical_id`` (the audit face: group by it
    to see which clusters straddled nothing) + ``split_col``.

    Scale shape: clusters come from the adaptive union-find /
    label-propagation closure (edge sets are duplicate-sized); the
    cluster map joins back LEFT onto the corpus keyed on ``id_col``
    (duplicate-sized side broadcasts under AQE); the band hash itself
    stays map-side.
    """
    from haplorec_spark.operators.dedup import dedup_clusters

    clusters = dedup_clusters(
        pairs,
        a_col=a_col,
        b_col=b_col,
        small_edge_limit=small_edge_limit,
    ).withColumnsRenamed({"doc_id": "__cid", "canonical_id": "__canon"})
    labeled = (
        docs.join(clusters, on=docs[id_col] == clusters["__cid"], how="left")
        .drop("__cid")
        .withColumn(
            "canonical_id", F.coalesce(F.col("__canon"), F.col(id_col))
        )
        .drop("__canon")
    )
    out = hash_split(
        labeled, weights, ["canonical_id"], seed=seed, split_col=split_col
    )
    return out


def stratified_hash_sample(
    df: DataFrame,
    fractions: Mapping[str, float],
    strata_col: str,
    key_cols: Sequence[str],
    *,
    default_fraction: float = 0.0,
    seed: str = "stratified",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. language rebalancing).

    ``fractions`` maps stratum value -> keep fraction; strata not listed
    keep ``default_fraction``. One map-side filter — the per-stratum
    cutoff is a small CASE over the stratum column, never a join.
    """
    band = _hash_band(seed, key_cols)
    cutoff = None
    for value, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {value!r} not in [0, 1]: {frac}")
        cond = F.col(strata_col) == F.lit(value)
        cut = F.lit(int(frac * (1 << _BAND_BITS)))
        cutoff = (
            F.when(cond, cut) if cutoff is None else cutoff.when(cond, cut)
        )
    default_cut = F.lit(int(default_fraction * (1 << _BAND_BITS)))
    cutoff = default_cut if cutoff is None else cutoff.otherwise(default_cut)
    return df.filter(band < cutoff)


def _domain_token_totals(
    df: DataFrame,
    domains,
    strata_col: str,
    token_col: str | None,
    text_col: str,
    segmentation: str = "whitespace",
) -> dict:
    """Per-domain token totals — the one bounded driver collect the
    two mixture operators share (domain-count rows, like
    fk.assign_ids' offsets). ``domains`` restricts (and validates
    presence of) the listed names; None keeps every observed non-null
    domain."""
    from haplorec_spark.operators.text import token_count_expr

    n_tokens = token_count_expr(token_col, text_col, segmentation)
    totals = {
        r["d"]: r["t"]
        for r in df.groupBy(F.col(strata_col).alias("d"))
        .agg(F.sum(n_tokens).alias("t"))
        .collect()
        if r["d"] is not None
        and (domains is None or r["d"] in domains)
    }
    if domains is not None:
        missing = set(domains) - set(totals)
        if missing:
            raise ValueError(
                f"target domains absent from input: {sorted(missing)}"
            )
    if not totals:
        raise ValueError(f"no non-null domains observed in {strata_col!r}")
    zero = sorted(d for d, t in totals.items() if not t)
    if zero:
        # a zero-token domain (possible with token_col / BPE-count
        # accounting over wordless rows) cannot carry any share of the
        # mix; both operators would otherwise divide by it
        raise ValueError(
            f"domains with zero tokens cannot be mixed: {zero}"
        )
    return totals


def _resolve_mixture(
    df: DataFrame,
    target_weights,
    alpha: float | None,
    strata_col: str,
    token_col: str | None,
    text_col: str,
    segmentation: str = "whitespace",
) -> tuple[dict, dict]:
    """(totals, weights) for the two mixture operators.

    With ``alpha`` unset, ``target_weights`` is the explicit
    share mapping (validated as before). With ``alpha`` set, weights
    are DERIVED from the data: w_d ∝ share_d^alpha over the observed
    per-domain token shares — the standard temperature-scaled
    multilingual/multi-domain recipe (exponent-smoothed sampling,
    XLM-R style): alpha=1 reproduces the natural mix exactly (the
    mixture is an identity), alpha=0 is a uniform mix, and alpha in
    between flattens the head domains toward the tail.
    ``target_weights`` may then be None (every observed non-null
    domain participates) or a sequence of domain names restricting
    the mix; passing a weights MAPPING together with alpha is
    rejected as ambiguous.
    """
    if alpha is None:
        if not isinstance(target_weights, Mapping):
            raise ValueError(
                "target_weights mapping is required when alpha is None"
            )
        if not target_weights:
            raise ValueError("target_weights must not be empty")
        for dom, w in target_weights.items():
            if w <= 0:
                raise ValueError(
                    f"target weight for {dom!r} must be > 0: {w}"
                )
        totals = _domain_token_totals(
            df, set(target_weights), strata_col, token_col, text_col,
            segmentation,
        )
        return totals, dict(target_weights)
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    if isinstance(target_weights, Mapping):
        raise ValueError(
            "pass domain names (or None), not a weights mapping, "
            "together with alpha — weights are derived from the data"
        )
    domains = set(target_weights) if target_weights is not None else None
    totals = _domain_token_totals(
        df, domains, strata_col, token_col, text_col, segmentation
    )
    raw = {d: float(t) ** alpha for d, t in totals.items()}
    z = sum(raw.values())
    return totals, {d: r / z for d, r in raw.items()}


def mixture_sample(
    df: DataFrame,
    target_weights: Mapping[str, float] | Sequence[str] | None,
    strata_col: str,
    key_cols: Sequence[str],
    *,
    alpha: float | None = None,
    token_col: str | None = None,
    text_col: str = "text",
    seed: str = "mixture",
    segmentation: str = "whitespace",
) -> DataFrame:
    """Downsample domains so output token shares match ``target_weights``.

    The standard curation knob: given per-domain target shares (summing
    to ~1), pick the LARGEST output achievable purely by downsampling —
    output size S = min over domains of (domain tokens / target share);
    each domain then keeps fraction ``share × S / tokens`` (the binding
    domain keeps 1.0; domains absent from the input or the targets are
    dropped). Fractions govern tokens in expectation via uniform row
    hashing; document-size variance averages out at corpus scale.

    ``alpha`` switches to TEMPERATURE-scaled targets derived from the
    data itself — w_d ∝ share_d^alpha over observed token shares (the
    exponent-smoothed multilingual recipe): alpha=1 keeps the natural
    mix (identity), alpha<1 flattens head domains toward the tail,
    alpha=0 targets a uniform mix. ``target_weights`` is then None
    (all observed domains) or a sequence of domain names.

    One token-total aggregate (domain-count rows to the driver, a
    bounded collect like fk.assign_ids' offsets) followed by the
    stratified map-side filter — no join, no second shuffle.
    """
    totals, weights = _resolve_mixture(
        df, target_weights, alpha, strata_col, token_col, text_col,
        segmentation,
    )
    s = min(totals[d] / w for d, w in weights.items())
    fractions = {
        d: min(1.0, (weights[d] * s) / totals[d]) for d in totals
    }
    return stratified_hash_sample(
        df, fractions, strata_col, key_cols, seed=seed
    )


def mixture_upsample(
    df: DataFrame,
    target_weights: Mapping[str, float] | Sequence[str] | None,
    strata_col: str,
    key_cols: Sequence[str],
    *,
    alpha: float | None = None,
    total_tokens: int | None = None,
    token_col: str | None = None,
    text_col: str = "text",
    seed: str = "mixture",
    max_replication: float | None = None,
    segmentation: str = "whitespace",
) -> DataFrame:
    """Rebalance domains to ``target_weights`` token shares WITH
    replication — the multi-epoch mixture :func:`mixture_sample`
    cannot express (high-quality sources are routinely repeated 2-5
    epochs while web crawl is downsampled; Gopher/LLaMA-style
    recipes). Output rows carry a ``replica`` column (0-based copy
    index), so (key_cols, replica) stays unique downstream and the
    packing tape hashes each copy to its own position.

    Each domain's replication factor is r = share × S / tokens, where
    S is ``total_tokens`` (the token budget) or, by default, the input
    total over the listed domains — reshape the mix, keep the size.
    Every row emits ⌊r⌋ copies plus one more where its hash band falls
    under frac(r) — tokens match the target in expectation per domain,
    deterministically (the module's md5 bands, so reruns replicate the
    identical rows). ``max_replication`` fails fast when a tiny domain
    would be repeated more than intended (repetition past a handful of
    epochs measurably hurts models; cap and fix the recipe instead).
    Domains absent from ``target_weights`` are dropped, as in
    :func:`mixture_sample`.

    ``alpha`` derives temperature-scaled targets w_d ∝ share_d^alpha
    from the observed token shares instead of explicit weights (see
    :func:`mixture_sample`); with the default token budget, alpha=1
    is an exact identity (every row keeps one copy) and alpha<1
    upsamples tail domains while downsampling the head.

    Scale shape: ONE token-total aggregate (domain-count rows to the
    driver), then a map-side posexplode of ``sequence(0, n_copies-1)``
    — no join, no second shuffle; output size is the only cost.
    """
    if "replica" in df.columns:
        raise ValueError(
            "input already has a 'replica' column — the name is "
            "reserved for the copy index this operator emits"
        )
    totals, weights = _resolve_mixture(
        df, target_weights, alpha, strata_col, token_col, text_col,
        segmentation,
    )
    s = (
        float(total_tokens)
        if total_tokens is not None
        else float(sum(totals.values()))
    )
    reps = {d: (weights[d] * s) / totals[d] for d in totals}
    if max_replication is not None:
        over = {d: r for d, r in reps.items() if r > max_replication}
        if over:
            raise ValueError(
                f"replication above max_replication={max_replication}: "
                + ", ".join(f"{d!r}: {r:.2f}" for d, r in sorted(over.items()))
            )
    band = _hash_band(seed, key_cols)
    n_copies = None
    for dom, r in reps.items():
        whole = int(r)
        frac_cut = int((r - whole) * (1 << _BAND_BITS))
        copies = F.lit(whole) + (band < F.lit(frac_cut)).cast("int")
        cond = F.col(strata_col) == F.lit(dom)
        n_copies = (
            F.when(cond, copies)
            if n_copies is None
            else n_copies.when(cond, copies)
        )
    n_copies = n_copies.otherwise(F.lit(0))
    return (
        df.withColumn("__n", n_copies)
        .filter(F.col("__n") > 0)
        .select(
            "*",
            F.explode(F.expr("sequence(0, __n - 1)")).alias("replica"),
        )
        .drop("__n")
    )


def top_k_by_hash(
    df: DataFrame,
    k: int,
    key_cols: Sequence[str],
    *,
    seed: str = "topk",
) -> DataFrame:
    """Exactly ``k`` rows, uniform-without-replacement, deterministic.

    The sample = the k smallest md5 priorities (ties broken by the full
    hash, then arbitrarily for true key duplicates). Spark executes
    sort+limit as per-partition top-k followed by a k-row merge on one
    task — the k-bounded part is the only single-task work, so this
    scales with |df| map-side and k driver-side, never |df| globally.
    """
    pr = F.md5(_key_str(seed, key_cols))
    return (
        df.withColumn("__pr", pr)
        .orderBy("__pr")
        .limit(k)
        .drop("__pr")
    )


def shingle_hashes(
    docs: DataFrame,
    n: int = 8,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    segmentation: str = "whitespace",
    distinct: bool = True,
) -> DataFrame:
    """Distinct (id, shingle-hash) pairs for contamination matching.

    ``distinct=False`` skips the per-doc shingle dedup (a map-side
    ``array_distinct`` pass) and streams every occurrence — the right
    call when the consumer is dedup-insensitive (a semi join or a
    DISTINCT of its own, e.g. :func:`decontaminate`'s corpus side);
    keep the default wherever per-doc hash multiplicity matters
    (:func:`contamination_report` counts distinct shared shingles).

    Longer shingles than near-dup detection (default 8 words — the
    scale used for benchmark decontamination, where only verbatim
    overlap matters) and hashed immediately so only 32 hex chars per
    shingle cross the shuffle, not the text.

    ``segmentation="script"`` (round 9) shingles the script-segmented
    stream — under the whitespace split a zh/ja/th eval item has ZERO
    8-word shingles, so decontamination could not see a CJK benchmark
    leak at all.
    """
    from haplorec_spark.operators.dedup import word_shingles

    sh = word_shingles(
        docs, n, text_col=text_col, id_col=id_col,
        segmentation=segmentation, distinct=distinct,
    )
    return sh.select(F.col(id_col), F.md5("shingle").alias("sh_hash"))


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    segmentation: str = "whitespace",
) -> DataFrame:
    """Drop corpus docs sharing any n-word shingle with ``benchmark``.

    The standard eval-set decontamination step for training corpora.
    Benchmark shingle hashes are deduplicated and broadcast (eval sets
    are MBs against a 100 TB corpus); contaminated ids surface from one
    semi join over the corpus's shingle stream, and the final anti join
    keeps clean documents intact (full columns, no reshuffle of text —
    the join is on the id).
    """
    # Neither side needs per-doc shingle dedup (distinct=False): the
    # benchmark side takes a global DISTINCT of its own below, and the
    # corpus side only feeds a semi join + id DISTINCT — multiplicity
    # never reaches the result, so the map-side array_distinct pass is
    # pure CPU (measured 0.51 -> 0.30 s on the sf0.1 corpus stream).
    bench_hashes = (
        shingle_hashes(
            benchmark, n, text_col=text_col, id_col=id_col,
            segmentation=segmentation, distinct=False,
        )
        .select("sh_hash")
        .distinct()
    )
    corpus_hashes = shingle_hashes(
        corpus, n, text_col=text_col, id_col=id_col,
        segmentation=segmentation, distinct=False,
    )
    contaminated = (
        corpus_hashes.join(
            F.broadcast(bench_hashes), on="sh_hash", how="left_semi"
        )
        .select(id_col)
        .distinct()
    )
    return corpus.join(contaminated, on=id_col, how="left_anti")


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_id_col: str | None = None,
    segmentation: str = "whitespace",
) -> DataFrame:
    """(corpus id, benchmark id, n_shared_shingles): the audit face of
    :func:`decontaminate`.

    Where decontaminate silently drops, this reports WHICH benchmark
    items leak into WHICH corpus documents and how heavily — the
    evidence needed to adjudicate borderline hits (a shared boilerplate
    header vs a verbatim eval question) and to tune ``n``. Same plan
    shape: the benchmark side stays broadcast, the corpus shingle
    stream is map-side, and the one shuffle is the per-pair count.
    """
    bench_id = bench_id_col or id_col
    bench_hashes = shingle_hashes(
        benchmark, n, text_col=text_col, id_col=bench_id,
        segmentation=segmentation,
    ).select(F.col(bench_id).alias("benchmark_id"), "sh_hash")
    corpus_hashes = shingle_hashes(
        corpus, n, text_col=text_col, id_col=id_col,
        segmentation=segmentation,
    )
    return (
        corpus_hashes.join(F.broadcast(bench_hashes), on="sh_hash")
        .groupBy(id_col, "benchmark_id")
        .agg(F.count(F.lit(1)).alias("n_shared_shingles"))
    )


def build_dsir_vocab(
    raw: DataFrame,
    target: DataFrame,
    *,
    text_col: str = "text",
    segmentation: str = "whitespace",
) -> DataFrame:
    """(word, c_t, c_r): the combined DSIR vocabulary — target and raw
    word counts FULL-joined on word (nulls where a word appears on one
    side only). Build once, persist or write to parquet, and pass to
    :func:`importance_weights` as ``vocab`` to score LATER batches
    under the FROZEN likelihood ratio — the incremental pattern every
    store in this repo uses (scoring drifts silently if each batch
    re-learns both LMs from itself). ``segmentation="script"``
    tokenizes the script-segmented stream — under the whitespace
    split a zh/ja/th document is ONE DSIR feature, so the importance
    ratio carries no signal on space-free scripts."""
    from haplorec_spark.operators.text import _words_sql

    ws = _words_sql(text_col, segmentation)
    if segmentation == "whitespace":
        ws = f"filter(split(lower({text_col}), ' '), w -> w != '')"

    def counts(df: DataFrame, cname: str) -> DataFrame:
        return (
            df.select(F.explode(F.expr(ws)).alias("word"))
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias(cname))
        )

    return counts(target, "c_t").join(
        counts(raw, "c_r"), on="word", how="full"
    )


def importance_weights(
    raw: DataFrame,
    target: DataFrame | None = None,
    *,
    vocab: DataFrame | None = None,
    alpha: float = 0.5,
    min_count: int = 1,
    max_broadcast_vocab: int = 2_000_000,
    text_col: str = "text",
    id_col: str = "doc_id",
    segmentation: str = "whitespace",
) -> DataFrame:
    """(id, n_tokens, log_weight): DSIR-style importance weights for
    every ``raw`` document against a ``target``-domain corpus.

    DSIR (Xie et al. 2023, "Data Selection for Language Models via
    Importance Resampling") scores each raw document by the
    log-likelihood ratio between a target-domain LM and a raw-corpus
    LM; resampling proportional to the ratio shifts the raw corpus
    toward the target distribution. Here both LMs are the engine's
    add-alpha unigram model (``unigram_logprob_score``'s exact
    smoothing: P(w) = (count + alpha) / (N + alpha * (V + 1)), V and N
    measured per side before any ``min_count`` prune), and
    ``log_weight = Σ_tokens log10 P_target(w) - log10 P_raw(w)``,
    rounded to 6 places so any engine replica is bit-comparable.
    Empty-string artifacts of repeated whitespace are dropped from
    both the vocabularies and the scored token stream (the
    ``build_vocab`` convention); documents with no surviving tokens
    produce no row.

    Scale shape: ONE combined vocabulary — the two word-count
    aggregates FULL-joined on word into (word, c_target, c_raw) — so
    scoring needs a single token join, not one per LM. The combined
    table is persisted across its two consumers (the N/V totals
    aggregate and the scoring join — the r4 double-build lesson), and
    the scoring join is adaptive on the MEASURED kept-vocabulary size:
    broadcast under ``max_broadcast_vocab`` entries (stopword skew
    lands on the broadcast side), plain shuffle join above (a
    web-scale token set must never be forced into executor memory).
    Then one per-doc sum. The raw corpus is scanned twice total (its
    vocabulary; scoring), the target corpus once.

    Pass ``vocab`` (a :func:`build_dsir_vocab` frame) to score under a
    FROZEN likelihood ratio instead of learning both LMs from the
    inputs — the incremental/streaming shape: later batches keep the
    original corpus statistics, and ``target`` is then unused. The
    totals aggregate over the pinned vocab is vocabulary-sized.

    ``segmentation="script"`` tokenizes both the vocabulary and the
    scored stream over the script-segmented words (must match how a
    pinned ``vocab`` was built).
    """
    if segmentation == "script":
        from haplorec_spark.operators.text import _words_sql

        ws = _words_sql(text_col, "script")
    else:
        ws = f"filter(split(lower({text_col}), ' '), w -> w != '')"
    if vocab is None:
        if target is None:
            raise ValueError("importance_weights needs target or vocab")
        # localCheckpoint, not persist (round 13): GC release path for
        # the measured vocab (the scoring join is consumed lazily)
        combined = build_dsir_vocab(
            raw, target, text_col=text_col, segmentation=segmentation
        ).localCheckpoint()
    else:
        combined = vocab.localCheckpoint()
    tot = combined.agg(
        F.sum("c_t").alias("nt"),
        F.count("c_t").alias("vt"),
        F.sum("c_r").alias("nr"),
        F.count("c_r").alias("vr"),
        F.count(
            F.when(
                (F.coalesce(F.col("c_t"), F.lit(0)) >= min_count)
                | (F.coalesce(F.col("c_r"), F.lit(0)) >= min_count),
                1,
            )
        ).alias("v_kept"),
    ).first()
    denom_t = float(tot["nt"] or 0) + alpha * (float(tot["vt"] or 0) + 1.0)
    denom_r = float(tot["nr"] or 0) + alpha * (float(tot["vr"] or 0) + 1.0)
    lm = combined
    if min_count > 1:
        lm = lm.filter(
            (F.coalesce(F.col("c_t"), F.lit(0)) >= min_count)
            | (F.coalesce(F.col("c_r"), F.lit(0)) >= min_count)
        ).select(
            "word",
            F.when(F.col("c_t") >= min_count, F.col("c_t")).alias("c_t"),
            F.when(F.col("c_r") >= min_count, F.col("c_r")).alias("c_r"),
        )
    lm = (
        F.broadcast(lm)
        if int(tot["v_kept"] or 0) <= max_broadcast_vocab
        else lm.hint("merge")
    )
    toks = raw.select(F.col(id_col), F.explode(F.expr(ws)).alias("word"))
    ratio = F.log10(
        (F.coalesce(F.col("c_t"), F.lit(0)).cast("double") + alpha)
        / F.lit(denom_t)
    ) - F.log10(
        (F.coalesce(F.col("c_r"), F.lit(0)).cast("double") + alpha)
        / F.lit(denom_r)
    )
    return (
        toks.join(lm, on="word", how="left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum(ratio), 6).alias("log_weight"),
        )
    )


def importance_resample(
    raw: DataFrame,
    target: DataFrame | None,
    k: int,
    *,
    vocab: DataFrame | None = None,
    seed: str = "dsir",
    alpha: float = 0.5,
    min_count: int = 1,
    max_broadcast_vocab: int = 2_000_000,
    text_col: str = "text",
    id_col: str = "doc_id",
    segmentation: str = "whitespace",
) -> DataFrame:
    """(id, n_tokens, log_weight): the ``k`` raw documents selected by
    importance resampling toward the target domain — the DSIR
    selection step, deterministic.

    Sampling without replacement with probability ∝ weight is the
    Gumbel top-k trick: key = ln(weight) + Gumbel noise, keep the k
    largest keys. Both terms are reproducible across engines and
    reruns: ln(weight) = ``log_weight``·ln(10) from the ROUNDED
    :func:`importance_weights` output, and the noise is
    -ln(-ln(u)) with u = (band + 0.5) / 2³² from the module's
    ``md5(seed || id)`` hash band — no ``rand()`` anywhere, the same
    determinism contract as every other operator here. Ties (measure
    zero) break by id.

    Scale shape: the weighting is :func:`importance_weights`; the key
    is one more map-side projection, and the top-k is Spark's
    sort+limit (per-partition partial top-k, k-row merge — never a
    global payload sort).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = importance_weights(
        raw,
        target,
        vocab=vocab,
        alpha=alpha,
        min_count=min_count,
        max_broadcast_vocab=max_broadcast_vocab,
        text_col=text_col,
        id_col=id_col,
        segmentation=segmentation,
    )
    u = (_hash_band(seed, [id_col]).cast("double") + 0.5) / float(2**32)
    key = F.col("log_weight") * math.log(10.0) + (-F.log(-F.log(u)))
    return (
        w.withColumn("_gkey", key)
        .orderBy(F.col("_gkey").desc(), id_col)
        .limit(k)
        .drop("_gkey")
    )


# ------------------------------------------------------ query registration

from haplorec_spark.queries import register, table  # noqa: E402

#: DuckDB replica of :func:`_hash_band` — parse the first 8 hex chars of
#: md5(seed || US || key) digit-by-digit (DuckDB has no base-16 conv());
#: shared by the driver gate below and tests/test_sampling.py.
DUCK_BAND = (
    "list_reduce(list_transform(generate_series(1, 8),"
    " i -> strpos('0123456789abcdef',"
    "             substr(md5({key}), i, 1)) - 1),"
    " (x, y) -> x * 16 + y)::BIGINT"
)


@register(
    "q_sample_weighted",
    # Per-row acceptance sampling: each document survives iff its
    # deterministic hash band falls under its own weight — here a
    # synthetic quality weight (doc_id % 10) / 10 so the kept fraction
    # ramps 0%..90% across weight strata, non-vacuously.
    f"""
    SELECT doc_id, w FROM (
        SELECT doc_id,
               (doc_id % 10) / 10.0 AS w,
               {DUCK_BAND.format(
                   key="'weighted' || chr(31) || doc_id::VARCHAR")} AS band
        FROM documents)
    WHERE band < least(greatest(w, 0.0), 1.0) * 4294967296.0
    """,
    "deterministic weighted acceptance sampling: md5 hash band under "
    "the row's own weight (reproducible across engines and reruns)",
)
def q_sample_weighted(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", ((F.col("doc_id") % 10) / 10.0).alias("w")
    )
    return weighted_sample(docs, "w", ["doc_id"], seed="weighted")


#: Tokens-per-doc stream shared by the DSIR oracle's CTEs: non-empty
#: single-space word split, the build_vocab/importance_weights spec.
_DUCK_DSIR_WORDS = (
    "unnest(list_filter(string_split(lower(text), ' '), w -> w <> ''))"
)


@register(
    "q_dsir_select",
    # DSIR selection toward a synthetic target domain (every 7th doc):
    # add-alpha unigram LMs on both sides (alpha=0.5, V/N measured per
    # side), per-doc summed log10 likelihood ratio, then deterministic
    # Gumbel top-k from the md5 hash band. k=400 keeps the gate
    # non-vacuous at sf0.01 (~6k docs) and sf0.1 alike.
    f"""
    WITH tv AS (SELECT w, count(*) AS c_t FROM (
             SELECT {_DUCK_DSIR_WORDS} AS w
             FROM documents WHERE doc_id % 7 = 0) GROUP BY w),
         rv AS (SELECT w, count(*) AS c_r FROM (
             SELECT {_DUCK_DSIR_WORDS} AS w FROM documents) GROUP BY w),
         v AS (SELECT coalesce(tv.w, rv.w) AS w, c_t, c_r
               FROM tv FULL JOIN rv ON tv.w = rv.w),
         tot AS (SELECT coalesce(sum(c_t), 0)::DOUBLE AS nt,
                        count(c_t)::DOUBLE AS vt,
                        coalesce(sum(c_r), 0)::DOUBLE AS nr,
                        count(c_r)::DOUBLE AS vr FROM v),
         toks AS (SELECT doc_id, {_DUCK_DSIR_WORDS} AS w FROM documents),
         scored AS (
             SELECT doc_id, count(*)::BIGINT AS n_tokens,
                    round(sum(
                        log10((coalesce(c_t, 0) + 0.5)
                              / (nt + 0.5 * (vt + 1)))
                      - log10((coalesce(c_r, 0) + 0.5)
                              / (nr + 0.5 * (vr + 1)))), 6) AS log_weight
             FROM toks LEFT JOIN v USING (w) CROSS JOIN tot
             GROUP BY doc_id)
    SELECT doc_id, n_tokens, log_weight FROM (
        SELECT *, log_weight * ln(10)
                  + (-ln(-ln(({DUCK_BAND.format(
                      key="'dsir' || chr(31) || doc_id::VARCHAR")}
                      + 0.5) / 4294967296.0))) AS gkey
        FROM scored)
    ORDER BY gkey DESC, doc_id LIMIT 400
    """,
    "DSIR importance resampling: unigram-LM log-likelihood ratio "
    "toward a target domain, deterministic Gumbel top-k selection",
)
def q_dsir_select(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    target = docs.filter(F.col("doc_id") % 7 == 0)
    return importance_resample(docs, target, 400, seed="dsir")


#: 8-word shingles from a single-space split of the lowercased text —
#: the exact word_shingles tokenization; the oracle matches on shingle
#: STRINGS where the operator matches on their md5 (collision-free at
#: gate scale by construction).
_DUCK_8SHINGLES = """
    unnest(CASE WHEN len(ws) >= 8
           THEN list_transform(generate_series(1, len(ws) - 7),
                               i -> array_to_string(ws[i:i+7], ' '))
           ELSE []::VARCHAR[] END) AS shingle
"""


@register(
    "q_decontaminate",
    # Eval-set decontamination: every doc_id % 50 == 0 document IS the
    # "benchmark", so those documents (and any corpus document sharing
    # a verbatim 8-gram with them) must drop — self-contamination makes
    # the gate non-vacuous without synthetic leakage rows.
    f"""
    WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws
               FROM documents),
         bsh AS (SELECT DISTINCT shingle FROM (
                    SELECT {_DUCK_8SHINGLES}
                    FROM w WHERE doc_id % 50 = 0)),
         csh AS (SELECT DISTINCT doc_id, shingle FROM (
                    SELECT doc_id, {_DUCK_8SHINGLES}
                    FROM w)),
         dirty AS (SELECT DISTINCT doc_id
                   FROM csh JOIN bsh USING (shingle))
    SELECT doc_id, source FROM documents
    WHERE doc_id NOT IN (SELECT doc_id FROM dirty)
    """,
    "benchmark decontamination: drop corpus documents sharing any "
    "verbatim 8-word shingle with the (broadcast) benchmark set",
)
def q_decontaminate(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0).select("doc_id", "text")
    return decontaminate(docs, bench, n=8).select("doc_id", "source")
