"""Similarity search over an embedding column (``array<float>``).

Two paths:

* ``brute_force_topk``  — exact cosine top-k: probes x corpus cross
  product, window-ranked. Correctness baseline; O(|probes| * n).
* ``ann_lsh_topk``      — approximate top-k: random-hyperplane LSH.
  Each vector is projected onto ``n_planes`` +-1 hyperplanes (signs
  derived deterministically from md5, so Spark and the DuckDB oracle
  build the identical plane matrix); the 8-bit sign pattern is the
  bucket key, and exact cosine ranking runs only inside the probe's
  bucket.

Scale design (100 TB of vectors): brute force is the small-probe-set
tool — the corpus side streams, probes broadcast, no shuffle besides the
final per-probe top-k aggregate. The LSH path is the real index: bucket
assignment is a map-side projection (plane matrix broadcast, ~n_planes x
dim doubles), the bucket join is an equi-join on the signature, and each
bucket holds ~n / 2^n_planes vectors, so per-probe work drops by the
bucket fanout. Recall is tunable via n_planes (fewer planes = bigger
buckets = higher recall). Multi-probe (flipping low-margin bits) is the
natural extension; IVF with learned centroids would replace the plane
matrix with a k-means codebook — same join shape.

The memory-bound rung is product quantization (``pq_train`` /
``pq_encode`` / ``pq_topk``): per-subspace k-means codebooks compress
each vector to m small codes, and ADC ranks probes against codes
without decompressing — the standard way to keep a 100 TB vector
corpus scannable.

All arithmetic is double-precision with a pinned left-to-right fold
order so results are bit-identical across engines before rounding.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from haplorec_spark.operators.dedup import _HEXMAP, cosine_expr


def brute_force_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k neighbors for every probe vector.

    Returns (probe_id, neighbor_id, cosine, rank), rank 1..k by cosine
    descending with neighbor_id as the deterministic tiebreak. The probe
    itself is excluded.
    """
    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("pv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        F.broadcast(p)
        .crossJoin(c)
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .select(
            "probe_id",
            "neighbor_id",
            F.round(cosine_expr("pv", "cv"), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cosine", "rank")
    )


def hyperplane_signs(spark, n_planes: int, dim: int) -> DataFrame:
    """(plane, d, sign): deterministic +-1 hyperplane matrix.

    sign(p, d) = -1 if the first hex nibble of md5('p,d') < 8 else +1 —
    a balanced pseudo-random sign both engines can recompute exactly.
    """
    planes = spark.range(n_planes).select(F.col("id").cast("int").alias("plane"))
    dims = spark.range(dim).select(F.col("id").cast("int").alias("d"))
    return planes.crossJoin(dims).select(
        "plane",
        "d",
        F.expr(
            f"CASE WHEN instr('{_HEXMAP}', substring(md5(concat("
            f"cast(plane as string), ',', cast(d as string))), 1, 1)) - 1 < 8"
            f" THEN -1 ELSE 1 END"
        ).alias("sign"),
    )


def _plane_sign(plane: int, d: int) -> int:
    """Python replica of :func:`hyperplane_signs`'s md5 sign derivation —
    first hex nibble of md5('plane,d') < 8 -> -1 else +1. Keeping the
    three formulations (this, the SQL in hyperplane_signs, the DuckDB
    oracle) in lockstep is what makes the bucket keys engine-portable."""
    nibble = int(hashlib.md5(f"{plane},{d}".encode()).hexdigest()[0], 16)
    return -1 if nibble < 8 else 1


def lsh_bucket_keys(
    vectors: DataFrame,
    *,
    n_planes: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, bucket): concatenated sign bits of the hyperplane projections.

    Pure map-side projection, ZERO shuffle and zero row expansion: the
    +-1 plane matrix (n_planes x dim, ~4 KB at the defaults) is computed
    driver-side and inlined as literal arrays, and each row evaluates
    its n_planes dot products as strict left-to-right ``aggregate``
    folds inside whole-stage codegen. (An earlier form exploded every
    vector into dim x n_planes rows through a groupBy shuffle — a 512x
    row blow-up for what is a per-row expression.)

    A vector shorter than ``dim`` yields null products via ``zip_with``
    padding, a null fold result, and a '0' bit — no ANSI out-of-bounds
    hazard. A vector LONGER than ``dim`` is sliced to its first ``dim``
    components first (without the slice, zip_with would pad the SIGN
    side with nulls and every oversized vector would collapse into the
    all-'0' bucket).
    """
    bits = []
    for p in range(n_planes):
        signs = ", ".join(
            f"{_plane_sign(p, d)}.0D" for d in range(dim)
        )
        proj = (
            f"aggregate(zip_with(slice({vec_col}, 1, {dim}),"
            f" array({signs}),"
            f" (x, s) -> cast(x as double) * s),"
            f" cast(0.0 as double), (acc, y) -> acc + y)"
        )
        bits.append(f"CASE WHEN {proj} > 0 THEN '1' ELSE '0' END")
    return vectors.select(
        F.col(id_col),
        F.expr("concat(" + ", ".join(bits) + ")").alias("bucket"),
    )


def lsh_probe_buckets(
    vectors: DataFrame,
    *,
    n_flip: int = 2,
    n_planes: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, bucket) MULTI-PROBE bucket keys: the vector's own bucket
    plus ``n_flip`` variants, each with ONE lowest-|margin| sign bit
    flipped (Lv et al. 2007 multi-probe LSH, single-bit perturbations).

    The recall knob of the hyperplane-LSH path, mirroring IVF's
    ``nprobe``: a near neighbor lost to one knife-edge projection is
    recovered from the adjacent bucket. Still map-side — the margin
    sort happens inside the same row expression and only the PROBE
    side expands (×(n_flip+1) rows on query-sized data, never on the
    corpus). Flipped keys are distinct from each other and the base,
    so a corpus vector (one bucket each) matches a probe at most once.
    """
    if not 0 <= n_flip <= n_planes:
        raise ValueError("n_flip must be in [0, n_planes]")
    projs = []
    for p in range(n_planes):
        signs = ", ".join(f"{_plane_sign(p, d)}.0D" for d in range(dim))
        projs.append(
            f"aggregate(zip_with(slice({vec_col}, 1, {dim}),"
            f" array({signs}),"
            f" (x, s) -> cast(x as double) * s),"
            f" cast(0.0 as double), (acc, y) -> acc + y)"
        )
    projs_arr = "array(" + ", ".join(projs) + ")"
    base = (
        f"array_join(transform({projs_arr},"
        f" x -> CASE WHEN x > 0 THEN '1' ELSE '0' END), '')"
    )
    # plane indices ordered by |projection| ascending (knife-edge first),
    # index as tiebreak for full determinism
    order = (
        f"transform(array_sort(zip_with({projs_arr},"
        f" sequence(0, {n_planes - 1}),"
        f" (p, i) -> struct(abs(p) as a, i as i))), s -> s.i)"
    )
    flip = (
        "transform(slice(__order, 1, {n}), i -> concat("
        "substring(__base, 1, i),"
        " CASE WHEN substring(__base, i + 1, 1) = '1'"
        " THEN '0' ELSE '1' END,"
        " substring(__base, i + 2, {np})))"
    ).format(n=int(n_flip), np=n_planes)
    return (
        vectors.select(
            F.col(id_col),
            F.expr(base).alias("__base"),
            F.expr(order).alias("__order"),
        )
        .select(
            F.col(id_col),
            F.explode(
                F.expr(f"concat(array(__base), {flip})")
            ).alias("bucket"),
        )
    )


def ann_lsh_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    *,
    n_planes: int = 8,
    dim: int = 64,
    n_probe_flips: int = 0,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate cosine top-k: exact ranking within the probe's bucket.

    Returns (probe_id, neighbor_id, cosine, rank) with rank over the
    candidates that share the probe's full sign pattern — or, with
    ``n_probe_flips`` > 0, any of its multi-probe perturbed patterns
    (:func:`lsh_probe_buckets`), trading ×(n_flip+1) probe-side rows
    for recall.
    """
    corpus_buckets = lsh_bucket_keys(
        corpus, n_planes=n_planes, dim=dim, vec_col=vec_col, id_col=id_col
    )
    probe_buckets = (
        lsh_bucket_keys(
            probes, n_planes=n_planes, dim=dim,
            vec_col=vec_col, id_col=id_col,
        )
        if n_probe_flips == 0
        else lsh_probe_buckets(
            probes, n_flip=n_probe_flips, n_planes=n_planes, dim=dim,
            vec_col=vec_col, id_col=id_col,
        )
    )
    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("pv")
    ).join(
        probe_buckets.select(
            F.col(id_col).alias("probe_id"), "bucket"
        ),
        on="probe_id",
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    ).join(
        corpus_buckets.select(
            F.col(id_col).alias("neighbor_id"), "bucket"
        ),
        on="neighbor_id",
    )
    scored = (
        F.broadcast(p)
        .join(c, on="bucket")
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .select(
            "probe_id",
            "neighbor_id",
            F.round(cosine_expr("pv", "cv"), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cosine", "rank")
    )


# ----------------------------------------------------------- IVF (k-means)


def _dist2_to_codebook(cents: list[list[float]], vec_expr: str = "v"):
    """Array of squared-L2 distances from ``vec_expr`` (a SQL expression
    yielding an array<double>) to each literal centroid, evaluated
    per-row inside whole-stage codegen.

    The codebook is rendered as ONE SQL string and parsed JVM-side: a
    k × dim nest of ``F.lit``/``F.array`` calls costs a py4y round-trip
    per element (~512 at the defaults), several seconds of driver time
    per plan — the same reason ``lsh_bucket_keys`` inlines its plane
    matrix as SQL text. ``repr(float)`` round-trips doubles exactly.
    """
    codebook = "array(" + ", ".join(
        "array(" + ", ".join(f"CAST({float(x)!r} AS DOUBLE)" for x in c)
        + ")"
        for c in cents
    ) + ")"
    return F.expr(
        f"transform({codebook}, c -> aggregate(zip_with({vec_expr}, c,"
        f" (x, cc) -> (x - cc) * (x - cc)), cast(0.0 as double),"
        f" (acc, d) -> acc + d))"
    )


def _collect_codebook(centroids: DataFrame) -> list[list[float]]:
    """The codebook as a driver-side list, ordered by centroid_id (k
    rows by construction — a bounded collect, like the convergence
    probes)."""
    return [
        list(r["centroid"])
        for r in centroids.orderBy("centroid_id").collect()
    ]


def _project_with_cells(
    vectors: DataFrame,
    cents: list[list[float]],
    *,
    vec_col: str,
    id_col: str,
    nprobe: int = 1,
    with_norm: bool = True,
) -> DataFrame:
    """(id, vec, [nrm], cluster) as ONE map-side projection.

    Cell assignment is a per-row argmin against the literal codebook —
    joining the corpus against a separate ``assign_clusters`` frame on
    the id column would shuffle the entire vector corpus to attach a
    value every row can compute locally, which at the 100 TB target is
    the single largest avoidable Exchange in the semantic-dedup / IVF
    family. ``nprobe > 1`` explodes each row onto its nprobe nearest
    cells in the same projection (probe-sized inputs only).
    """
    cast_v = f"transform({vec_col}, x -> cast(x as double))"
    cols = [F.col(id_col), F.col(vec_col)]
    if with_norm:
        cols.append(
            F.expr(
                f"sqrt(aggregate(transform({vec_col},"
                f" x -> cast(x as double) * cast(x as double)),"
                f" cast(0.0 as double), (acc, v) -> acc + v))"
            ).alias("nrm")
        )
    if not cents:  # empty codebook (empty corpus): no assignments
        return (
            vectors.select(*cols)
            .limit(0)
            .withColumn("cluster", F.lit(0).cast("int"))
        )
    staged = vectors.withColumn(
        "_d2s", _dist2_to_codebook(cents, cast_v)
    )
    if nprobe <= 1:
        cluster = F.expr(
            "cast(array_position(_d2s, array_min(_d2s)) as int) - 1"
        ).alias("cluster")
    else:
        nearest = (
            "transform(array_sort(zip_with(_d2s,"
            " sequence(0, size(_d2s) - 1),"
            " (d, i) -> struct(d as d, i as i))), s -> s.i)"
        )
        cluster = F.explode(
            F.expr(f"slice({nearest}, 1, {int(nprobe)})")
        ).alias("cluster")
    return staged.select(*cols, cluster)


def kmeans_centroids(
    vectors: DataFrame,
    k: int = 8,
    iterations: int = 3,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(centroid_id, centroid): deterministic k-means codebook.

    Classic iterative Spark shape: initialize from the k lowest-id
    vectors, then repeat {broadcast centroids -> assign each vector to
    its nearest (squared-L2) centroid -> average per cluster}. Each
    iteration is one shuffle (the per-cluster mean); the centroid table
    (k x dim doubles) always broadcasts. Clusters that lose all members
    keep their previous centroid.

    The DataFrame face of :func:`_kmeans_codebook_list` — consumers
    that immediately need the driver-side list (every literal-codebook
    projection) call the list trainer directly: the codebook is BORN
    on the driver, and wrapping it in a DataFrame only to re-collect
    it cost two extra driver jobs per consumer (createDataFrame +
    orderBy/collect — measured ~0.6 s of the sf0.1 IVF gate).
    """
    return _codebook_frame(
        vectors.sparkSession,
        _kmeans_codebook_list(
            vectors, k, iterations, vec_col=vec_col, id_col=id_col
        ),
    )


def _codebook_frame(spark, cents: list[list[float]]) -> DataFrame:
    """Wrap a driver-side codebook list as the (centroid_id, centroid)
    frame — for store writers that need BOTH the list (literal
    projections) and the frame (the parquet pin) from one training
    run."""
    return spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)],
        "centroid_id int, centroid array<double>",
    )


def _kmeans_codebook_list(
    vectors: DataFrame,
    k: int = 8,
    iterations: int = 3,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """The k-means trainer itself: the ordered centroid list (index =
    centroid_id), ``[]`` on an empty corpus — exactly the rows
    :func:`kmeans_centroids` wraps (same floats: the loop state never
    leaves the driver)."""
    v = vectors.select(
        F.col(id_col),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("v"),
    ).persist()  # re-read every iteration; pin the casted vectors once
    # centroid_id = rank of the seed vector's id — explicitly ordered so
    # the init is reproducible across engines (the DuckDB oracle unrolls
    # the same iterations from the same seeds), not merely within Spark.
    cents: list[list[float]] = [
        list(r["v"]) for r in v.orderBy(id_col).limit(k).collect()
    ]
    if not cents:  # empty corpus: empty codebook, nothing to iterate
        v.unpersist()
        return []
    dim = len(cents[0])
    for it in range(iterations):
        # Map-side argmin against the literal codebook (k × dim doubles,
        # inlined like the LSH plane matrix): no ×k crossJoin row
        # expansion, no per-id window shuffle. First-min index matches
        # the previous orderBy(d2, centroid_id) tiebreak exactly.
        assigned = v.withColumn(
            "_d2s", _dist2_to_codebook(cents)
        ).withColumn(
            "cluster",
            F.expr("cast(array_position(_d2s, array_min(_d2s)) as int) - 1"),
        )
        # Per-cluster mean as dim sum-aggregates + a count: one
        # partial-aggregated shuffle of k×(dim+1) values, and a k-row
        # driver round-trip (bounded, like the clusters convergence
        # probe) — instead of a ×dim posexplode through two shuffles.
        # The size min/max piggyback on the same aggregate: squared-L2
        # against a fixed-dim codebook is undefined for ragged input,
        # and without the check the breakage would surface as a null
        # per-dimension sum. (The LSH path handles ragged vectors
        # explicitly; k-means cannot.)
        stats = (
            assigned.groupBy("cluster")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.min(F.size("v")).alias("_mn"),
                F.max(F.size("v")).alias("_mx"),
                *[
                    F.sum(F.get("v", d)).alias(f"s{d}")
                    for d in range(dim)
                ],
            )
            .collect()
        )
        if it == 0 and stats:
            mn = min(r["_mn"] for r in stats)
            mx = max(r["_mx"] for r in stats)
            if mn != mx:
                v.unpersist()
                raise ValueError(
                    "k-means requires fixed-dimension vectors; got "
                    f"sizes {mn}..{mx} in column {vec_col!r}"
                )
        means = {
            r["cluster"]: [r[f"s{d}"] / r["n"] for d in range(dim)]
            for r in stats
        }
        # keep previous centroid for clusters that emptied out
        cents = [means.get(i, prev) for i, prev in enumerate(cents)]
    v.unpersist()
    return cents


def assign_clusters(
    vectors: DataFrame,
    centroids: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, cluster): nearest centroid per vector.

    The codebook is k rows by construction, so it collects to the
    driver and inlines as a literal array: assignment is a map-side
    argmin (zero shuffle, zero row expansion), the same shape as the
    LSH plane projection. First-min index = lowest centroid_id on
    ties, identical to an orderBy(d2, centroid_id) window.
    """
    cents = [
        list(r["centroid"])
        for r in centroids.orderBy("centroid_id").collect()
    ]
    if not cents:  # empty codebook (empty corpus): no assignments
        return vectors.select(F.col(id_col)).limit(0).withColumn(
            "cluster", F.lit(0).cast("int")
        )
    v = vectors.select(
        F.col(id_col),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("v"),
    )
    return (
        v.withColumn("_d2s", _dist2_to_codebook(cents))
        .withColumn(
            "cluster",
            F.expr("cast(array_position(_d2s, array_min(_d2s)) as int) - 1"),
        )
        .select(id_col, "cluster")
    )


def assign_probe_cells(
    vectors: DataFrame,
    centroids: DataFrame,
    nprobe: int,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, cluster) for each vector's ``nprobe`` NEAREST cells.

    The IVF recall knob: probing more cells trades work for recall
    (nprobe = k degenerates to exact search over every cell). Still
    map-side — the d2 array is sorted with its index and the first
    ``nprobe`` indices explode (×nprobe on probe rows only; probes are
    query-sized, not corpus-sized). Cell order ties break toward the
    lower centroid_id, matching :func:`assign_clusters`.
    """
    cents = [
        list(r["centroid"])
        for r in centroids.orderBy("centroid_id").collect()
    ]
    if not cents:  # empty codebook (empty corpus): no assignments
        return vectors.select(F.col(id_col)).limit(0).withColumn(
            "cluster", F.lit(0).cast("int")
        )
    v = vectors.select(
        F.col(id_col),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("v"),
    )
    nearest = (
        "transform(array_sort(zip_with(_d2s,"
        " sequence(0, size(_d2s) - 1),"
        " (d, i) -> struct(d as d, i as i))), s -> s.i)"
    )
    return (
        v.withColumn("_d2s", _dist2_to_codebook(cents))
        .select(
            id_col,
            F.explode(
                F.expr(f"slice({nearest}, 1, {int(nprobe)})")
            ).alias("cluster"),
        )
    )


def ivf_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    *,
    n_clusters: int = 8,
    iterations: int = 3,
    nprobe: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF approximate top-k: exact cosine ranking inside the probe's
    ``nprobe`` nearest k-means cells.

    The codebook replaces the hyperplane matrix of :func:`ann_lsh_topk`
    with learned centroids — same join shape (cluster-keyed equi-join),
    per-probe work divided by cluster fanout / nprobe. nprobe =
    n_clusters reproduces brute force exactly (the recall test's
    oracle); a neighbor is counted once because it lives in exactly one
    cell.
    """
    # cell assignment folds into each side's scan projection (map-side
    # literal-codebook argmin) — an id-keyed join against a separate
    # assignment frame would shuffle the full corpus for a value every
    # row computes locally. The codebook comes straight off the driver
    # trainer (no DataFrame round-trip; see kmeans_centroids).
    cents = _kmeans_codebook_list(
        corpus, n_clusters, iterations, vec_col=vec_col, id_col=id_col
    )
    p = _project_with_cells(
        probes, cents, vec_col=vec_col, id_col=id_col,
        nprobe=nprobe, with_norm=False,
    ).select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("pv"),
        "cluster",
    )
    c = _project_with_cells(
        corpus, cents, vec_col=vec_col, id_col=id_col, with_norm=False,
    ).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        "cluster",
    )
    scored = (
        F.broadcast(p)
        .join(c, on="cluster")
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .select(
            "probe_id",
            "neighbor_id",
            F.round(cosine_expr("pv", "cv"), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cosine", "rank")
    )


def semantic_dedup_pairs(
    vectors: DataFrame,
    *,
    threshold: float = 0.95,
    n_clusters: int | None = 8,
    iterations: int = 2,
    nprobe: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id_a, id_b, cosine): embedding near-dup pairs found INSIDE
    k-means cells — the scale path for embedding-cosine deduplication
    (SemDedup, Abbas et al. 2023: semantic dedup = pairwise cosine
    within k-means clusters, keep one representative per dup group).

    Same output schema as :func:`~haplorec_spark.operators.dedup.
    embedding_near_duplicates` (the exact O(n^2) baseline), so it is a
    drop-in replacement upstream of ``dedup_clusters``; recall is
    bounded by cluster assignment — a near-dup pair split across cell
    boundaries is missed at ``nprobe=1``. ``nprobe`` is the recall
    knob (the IVF pattern): each vector joins its ``nprobe`` nearest
    cells, so boundary pairs meet in a shared cell at ×nprobe row cost
    on the assignment (still map-side); ``nprobe = n_clusters``
    degenerates to the exact pairwise scan.

    Scale shape: codebook learning is the iterative k-means (broadcast
    codebook, one shuffle per iteration), assignment is a map-side
    literal-codebook argmin, and the pair generation is a cluster-keyed
    self-join — (n/k)^2 work per cell instead of n^2, the published
    tradeoff. ``n_clusters`` is the OPERATING PARAMETER that tradeoff
    rides on: total pair work ≈ n²/k, so ``k ≈ √n`` balances the
    per-cell quadratic against the codebook cost (argmin is O(k) per
    vector) — pass ``n_clusters=None`` to auto-size k = ⌊√n⌋ from one
    count. The default 8 suits gate-sized inputs only; audit actual
    cell sizes with :func:`cell_profile` before trusting a k at scale.
    Norms are computed once per vector before the join; a pair sharing
    several probed cells is emitted once (distinct on the pair before
    scoring).
    """
    if n_clusters is None:
        import math

        n_clusters = max(1, math.isqrt(max(vectors.count(), 1)))
    cents = _kmeans_codebook_list(
        vectors, n_clusters, iterations, vec_col=vec_col, id_col=id_col
    )
    return _within_cell_pairs_from_list(
        vectors, cents, threshold=threshold, nprobe=nprobe,
        vec_col=vec_col, id_col=id_col,
    )


#: Upper bound on the temporary (anchor-block x remaining-rows) dot
#: matrix inside :func:`_within_cell_pair_frame`'s kernel, in cells
#: (doubles). 4M cells = 32 MB per temporary, ~3 such temporaries live
#: at once — bounds Python-worker memory regardless of cell size.
_PAIR_BLOCK_CELLS = 4_000_000


def _round6_like_spark(x):
    """Vectorized replica of Spark's ``round(<double>, 6)``.

    Spark rounds a double by its SHORTEST DECIMAL REPR
    (``BigDecimal.valueOf`` = ``Double.toString``) with HALF_UP —
    empirically pinned against ``F.round`` on boundary doubles
    (tests/test_similarity.py). ``np.round`` is half-EVEN on a scaled
    binary intermediate, which can differ, but ONLY when the scaled
    value sits within ~1 ULP of a .5 boundary (both the repr-vs-binary
    gap and numpy's documented scaling error are ULP-sized, ~1e-10 at
    this magnitude). So: round the bulk with numpy, detect every value
    whose fractional part at 1e-6 scale is within 1e-6 of .5 — a
    window 1000x wider than the divergence zone — and repair those few
    through ``Decimal(repr(x))`` HALF_UP, which is exactly the Spark
    computation (``repr`` is the same shortest round-trip decimal).
    Non-finite values pass through unchanged on both paths.
    """
    import numpy as np
    from decimal import ROUND_HALF_UP, Decimal

    r = np.round(x, 6)
    finite = np.isfinite(x)
    f = np.where(finite, x, 0.0) * 1e6
    suspect = finite & (np.abs(f - np.floor(f) - 0.5) < 1e-6)
    for i in np.nonzero(suspect)[0]:
        r[i] = float(
            Decimal(repr(float(x[i]))).quantize(
                Decimal("0.000001"), ROUND_HALF_UP
            )
        )
    return r


def _within_cell_pair_frame(
    with_cell: DataFrame,
    *,
    threshold: float,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """groupBy(cluster) + vectorized numpy pair kernel over a
    (id, vec, nrm, cluster) projection: (vec_id_a, vec_id_b, cosine)
    with a < b and round(cosine, 6) >= threshold — bit-identical to
    the former cluster-keyed HOF self-join, row for row:

    * dims are accumulated in STRICT index order (one vectorized pass
      per dimension), so every dot product is the same left-to-right
      IEEE fold ``cosine_expr`` pins;
    * rounding rides :func:`_round6_like_spark`; the threshold filter
      keeps NaN cosines (a NaN-element pair: NaN divisor divides
      IEEE) because Spark's ordering treats NaN as greater than every
      double, while an exactly-ZERO divisor (zero-norm pair) never
      emits — Spark division NULLs it under ansi=false and ERRORS
      under ansi=true, so dropping is the only total mode-neutral
      reading (the kernel is the first spelling of this operator that
      does not crash a zero vector under the ANSI default) — both
      pinned by test against the join spelling;
    * rows with a NULL vector, NULL id, or NULL cluster never pair
      (NULL never survives the join's key match / a < b filter), so
      they are dropped up front; vectors of DIFFERENT lengths pair to
      a NULL dot under ``zip_with`` and are dropped by the filter, so
      the kernel pairs only within same-length groups — equal-length
      pairs dot over the full length, exactly as before;
    * duplicate ids never pair with themselves (strict a < b).

    Work per cell is the same O(m^2 . dim) arithmetic the join paid,
    but vectorized over pairs instead of interpreted per element
    (measured 3.6x on the sf0.1 gate), at one corpus projection and
    ONE cluster-keyed exchange instead of two join sides. The kernel
    is ``applyInArrow``, not ``applyInPandas``: pandas reads a float
    NaN as a MISSING value, so a NaN cosine would cross back into
    Spark as NULL — pyarrow keeps NaN a value, as the join did.
    """

    def kernel(tbl):
        import numpy as np
        import pyarrow as pa

        id_type = tbl.schema.field(id_col).type
        ids_py = tbl.column(id_col).to_pylist()
        vecs_py = tbl.column(vec_col).to_pylist()
        nrm_py = tbl.column("nrm").to_pylist()
        # A NULL id or NULL vector never pairs (NULL key / a < b);
        # a NULL ELEMENT poisons every dot involving the row to NULL
        # (zip_with product NULL -> fold NULL -> filtered) — drop all
        # three row classes up front.
        keep = [
            i
            for i, (vid, v) in enumerate(zip(ids_py, vecs_py))
            if vid is not None
            and v is not None
            and not any(e is None for e in v)
        ]
        out_a, out_b, out_c = [], [], []
        if len(keep) >= 2:
            ids_all = np.array([ids_py[i] for i in keep])
            nrm_all = np.array(
                [
                    np.nan if nrm_py[i] is None else nrm_py[i]
                    for i in keep
                ],
                dtype=np.float64,
            )
            vec_list = [
                np.asarray(vecs_py[i], dtype=np.float64) for i in keep
            ]
            lens = np.array([v.shape[0] for v in vec_list])
            for length in np.unique(lens):
                sel = np.nonzero(lens == length)[0]
                if sel.size < 2:
                    continue
                ids = ids_all[sel]
                order = np.argsort(ids, kind="stable")
                ids = ids[order]
                nrm = nrm_all[sel][order]
                n = ids.shape[0]
                V = (
                    np.vstack([vec_list[i] for i in sel[order]])
                    if length
                    else np.zeros((n, 0))
                )
                blk = max(1, _PAIR_BLOCK_CELLS // n)
                for s in range(0, n - 1, blk):
                    e = min(s + blk, n)
                    acc = np.zeros((e - s, n - s))
                    for d in range(length):  # strict fold order over dims
                        acc = acc + V[s:e, d, None] * V[s:, d][None, :]
                    denom = nrm[s:e, None] * nrm[None, s:]
                    with np.errstate(divide="ignore", invalid="ignore"):
                        cos = acc / denom
                    r = _round6_like_spark(cos.ravel()).reshape(cos.shape)
                    gi = np.arange(s, e)[:, None]
                    gj = np.arange(s, n)[None, :]
                    m = (gj > gi) & ((r >= threshold) | np.isnan(r))
                    # Spark division NULLs on an exactly-zero divisor
                    # (ansi=false; ansi=true ERRORS) — a zero-norm
                    # pair never emits; a NaN divisor is not zero and
                    # divides IEEE (NaN, kept above)
                    m &= denom != 0.0
                    m &= ids[gi] != ids[gj]
                    rows_i, cols_j = np.nonzero(m)
                    out_a.append(ids[s + rows_i])
                    out_b.append(ids[s + cols_j])
                    out_c.append(r[rows_i, cols_j])
        cat = [
            np.concatenate(x) if x else []
            for x in (out_a, out_b, out_c)
        ]
        return pa.table(
            {
                "vec_id_a": pa.array(list(cat[0]), type=id_type),
                "vec_id_b": pa.array(list(cat[1]), type=id_type),
                "cosine": pa.array(
                    [float(c) for c in cat[2]], type=pa.float64()
                ),
            }
        )

    idt = with_cell.schema[id_col].dataType.simpleString()
    return (
        with_cell.select(id_col, vec_col, "nrm", "cluster")
        .filter(F.col("cluster").isNotNull())
        .groupBy("cluster")
        .applyInArrow(
            kernel, schema=f"vec_id_a {idt}, vec_id_b {idt}, cosine double"
        )
    )


def within_cell_pairs(
    vectors: DataFrame,
    centroids: DataFrame,
    *,
    threshold: float = 0.95,
    nprobe: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id_a, id_b, cosine) pairs >= threshold within a GIVEN codebook's
    cells — :func:`semantic_dedup_pairs` without the codebook learning,
    for callers that pin the codebook (the incremental store, the
    streaming ingest bootstrap).

    Cell assignment and the norm fold INTO one map-side projection over
    one corpus scan (joining against a separate ``assign_clusters``
    frame on the id column would shuffle the whole corpus to attach a
    per-row-computable value — asserted by ``explain_audit.py``); the
    within-cell quadratic then runs as ONE cluster-keyed exchange into
    a vectorized numpy pair kernel (:func:`_within_cell_pair_frame`).
    Round 12: the former a/b self-join recomputed the projection per
    side and evaluated every pair's dot through an interpreted
    ``aggregate(zip_with(...))`` — the grouped kernel pays HALF the
    scan+shuffle and vectorizes the per-pair arithmetic (3.6x on the
    sf0.1 gate, bit-identical rows; the guide's batch-native-kernel
    pattern). Worker memory stays bounded by an anchor-block loop
    (``_PAIR_BLOCK_CELLS``), never O(cell^2) at once — but the CELL's
    vectors do sit in one Python worker, so audit cell sizes with
    :func:`cell_profile` before trusting a codebook at scale (the same
    skew audit the join form needed: a hot cell's quadratic was one
    join partition then, one group now).
    """
    return _within_cell_pairs_from_list(
        vectors, _collect_codebook(centroids),
        threshold=threshold, nprobe=nprobe,
        vec_col=vec_col, id_col=id_col,
    )


def _within_cell_pairs_from_list(
    vectors: DataFrame,
    cents: list[list[float]],
    *,
    threshold: float,
    nprobe: int,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """:func:`within_cell_pairs` over an already-collected codebook —
    the shared core, so trainer-fed callers (:func:`semantic_dedup_
    pairs`) skip the centroid DataFrame round-trip."""
    with_cell = _project_with_cells(
        vectors,
        cents,
        vec_col=vec_col,
        id_col=id_col,
        nprobe=nprobe,
    )
    scored = _within_cell_pair_frame(
        with_cell, threshold=threshold, vec_col=vec_col, id_col=id_col
    )
    if nprobe > 1:
        # a pair sharing several probed cells is produced once per
        # shared cell; rows are identical (deterministic cosine), so
        # distinct restores one row per pair
        scored = scored.distinct()
    return scored


def cell_profile(
    vectors: DataFrame,
    centroids: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(cluster, n_vectors, pair_cost): the audit face of the
    within-cell quadratic — per cell, how many vectors landed there and
    the implied n·(n-1)/2 pair evaluations
    :func:`within_cell_pairs` will run.

    Run this BEFORE a big semantic-dedup job: ``max(n_vectors)`` is the
    largest single-cell cost and ``sum(pair_cost)`` the total; a skewed
    codebook (one giant cell) shows up here as one row, not as a
    mystery 10-hour stage. One map-side assignment + one k-row
    aggregate — audit cost is a corpus scan, never a join.
    """
    cells = assign_clusters(
        vectors, centroids, vec_col=vec_col, id_col=id_col
    )
    return (
        cells.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
        .select(
            "cluster",
            "n_vectors",
            (
                F.col("n_vectors").cast("long")
                * (F.col("n_vectors") - 1)
                / 2
            ).cast("long").alias("pair_cost"),
        )
    )


def ann_recall(
    approx: DataFrame,
    exact: DataFrame,
    *,
    probe_col: str = "probe_id",
    neighbor_col: str = "neighbor_id",
) -> DataFrame:
    """(probe_id, n_exact, n_hit, recall): per-probe recall of an
    approximate top-k result against the exact top-k.

    The evaluation face of the recall knobs (LSH ``n_probe_flips``,
    IVF/semantic ``nprobe``): feed it ``ann_lsh_topk``/``ivf_topk``
    output as ``approx`` and ``brute_force_topk`` output as ``exact``
    to measure what a knob setting buys on a sample of probes. Probes
    with no approximate hits still appear (recall 0.0), so macro
    averages are honest. Two probe-keyed aggregates + one join —
    evaluation-sample sized, not corpus sized.
    """
    e = exact.groupBy(F.col(probe_col)).agg(
        F.count(F.lit(1)).alias("n_exact")
    )
    hits = (
        exact.select(probe_col, neighbor_col)
        .join(
            approx.select(probe_col, neighbor_col),
            on=[probe_col, neighbor_col],
            how="left_semi",
        )
        .groupBy(F.col(probe_col))
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        e.join(hits, on=probe_col, how="left")
        .select(
            F.col(probe_col),
            "n_exact",
            F.coalesce(F.col("n_hit"), F.lit(0)).alias("n_hit"),
            F.round(
                F.coalesce(F.col("n_hit"), F.lit(0))
                / F.col("n_exact").cast("double"),
                6,
            ).alias("recall"),
        )
    )


def ann_recall_summary(
    approx: DataFrame,
    exact: DataFrame,
    *,
    probe_col: str = "probe_id",
    neighbor_col: str = "neighbor_id",
) -> DataFrame:
    """One-row overall recall of an approximate top-k against the
    exact top-k: (n_probes, n_exact, n_hit, micro_recall,
    macro_recall) — micro = total hits / total exact pairs, macro =
    mean of the per-probe recalls (:func:`ann_recall`), which differ
    whenever probes have unequal n_exact (boundary probes with < k
    real neighbors). This is the number a knob sweep reads: recall@k
    as a function of ``nprobe`` / ``n_probe_flips`` / PQ ``m``
    becomes one row per setting (the SCALE.md recall table), turning
    the approximate-index knobs into measured recall/latency curves
    instead of hopes. One extra aggregate over the per-probe frame —
    evaluation-sample sized."""
    per = ann_recall(
        approx, exact, probe_col=probe_col, neighbor_col=neighbor_col
    )
    return per.agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.sum("n_exact").alias("n_exact"),
        F.sum("n_hit").alias("n_hit"),
        F.round(
            F.sum("n_hit") / F.sum("n_exact").cast("double"), 6
        ).alias("micro_recall"),
        F.round(F.avg("recall"), 6).alias("macro_recall"),
    )


# --------------------------------------------------- product quantization


def _literal_codebooks_sql(cbs: list[list[list[float]]]) -> str:
    """Render m codebooks (m × k × subdim doubles) as ONE SQL literal —
    same py4j-avoidance rationale as :func:`_dist2_to_codebook`."""
    return "array(" + ", ".join(
        "array(" + ", ".join(
            "array(" + ", ".join(
                f"CAST({float(x)!r} AS DOUBLE)" for x in c
            ) + ")"
            for c in cb
        ) + ")"
        for cb in cbs
    ) + ")"


def _pq_codebooks_list(codebooks) -> list[list[list[float]]]:
    """Accept the (sub_ix, centroid_id, centroid) frame of
    :func:`pq_train` or an already-collected nested list. The collect
    is bounded: m × k rows (codebook-sized, like the k-means path)."""
    if isinstance(codebooks, DataFrame):
        rows = codebooks.orderBy("sub_ix", "centroid_id").collect()
        if not rows:
            return []
        m = 1 + max(r["sub_ix"] for r in rows)
        cbs: list[list[list[float]]] = [[] for _ in range(m)]
        for r in rows:
            cbs[r["sub_ix"]].append(list(r["centroid"]))
        return cbs
    return codebooks


def pq_train(
    corpus: DataFrame,
    *,
    m: int = 4,
    k: int = 16,
    iterations: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(sub_ix, centroid_id, centroid): per-subspace k-means codebooks
    for product quantization (Jégou et al. 2011).

    Each vector is split into ``m`` contiguous subvectors of dim/m;
    each subspace learns its own ``k``-centroid codebook, so a vector
    compresses to ``m`` small codes (m bytes at k<=256) — the standard
    memory-bound ANN representation: a 100 TB float32 corpus becomes
    ~1.5 TB of codes at m=8, k=256 on 64-dim vectors.

    Scale shape: ONE k-means run over the subvector stream, not m
    separate corpus scans — vectors explode map-side into (sub_ix,
    subvector) rows and every iteration is a single argmin projection
    against the literal m×k×(dim/m) codebook nest plus one
    (sub_ix, cluster)-keyed aggregate (m×k×(dim/m + 1) shuffled
    values, m×k driver rows). Init is the m sliced codebooks of the k
    lowest-id vectors — the :func:`kmeans_centroids` convention, so
    the DuckDB oracle unrolls identically per subspace.

    The DataFrame face of :func:`_pq_train_list` (the
    :func:`kmeans_centroids` split): consumers that feed the literal
    codebook nest take the list directly — ``_pq_codebooks_list`` on
    this frame costs an extra orderBy/collect job per consumer.
    """
    spark = corpus.sparkSession
    cbs = _pq_train_list(
        corpus, m=m, k=k, iterations=iterations,
        vec_col=vec_col, id_col=id_col,
    )
    out_schema = "sub_ix int, centroid_id int, centroid array<double>"
    return spark.createDataFrame(
        [
            (i, j, c)
            for i, cb in enumerate(cbs)
            for j, c in enumerate(cb)
        ],
        out_schema,
    )


def _pq_train_list(
    corpus: DataFrame,
    *,
    m: int = 4,
    k: int = 16,
    iterations: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[list[float]]]:
    """The PQ trainer itself: the m×k×(dim/m) codebook nest as a
    driver list (``[]`` on an empty corpus) — exactly the rows
    :func:`pq_train` wraps (same floats: the loop state never leaves
    the driver)."""
    seeds = [
        list(r["v"])
        for r in corpus.select(
            F.col(id_col),
            F.expr(f"transform({vec_col}, x -> cast(x as double))").alias(
                "v"
            ),
        )
        .orderBy(id_col)
        .limit(k)
        .collect()
    ]
    if not seeds:
        return []
    dim = len(seeds[0])
    if dim % m:
        raise ValueError(f"vector dim {dim} not divisible by m={m}")
    sub = dim // m
    cbs = [
        [s[i * sub : (i + 1) * sub] for s in seeds] for i in range(m)
    ]
    subv = corpus.select(
        F.col(id_col),
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {m - 1}),"
                f" i -> transform(slice({vec_col}, i * {sub} + 1, {sub}),"
                f" x -> cast(x as double)))"
            )
        ).alias("sub_ix", "v"),
    ).persist()
    for it in range(iterations):
        cb_sql = _literal_codebooks_sql(cbs)
        assigned = subv.withColumn(
            "_d2s",
            F.expr(
                f"transform(element_at({cb_sql}, sub_ix + 1),"
                f" c -> aggregate(zip_with(v, c, (x, cc) ->"
                f" (x - cc) * (x - cc)), cast(0.0 as double),"
                f" (acc, d) -> acc + d))"
            ),
        ).withColumn(
            "cluster",
            F.expr("cast(array_position(_d2s, array_min(_d2s)) as int) - 1"),
        )
        stats = (
            assigned.groupBy("sub_ix", "cluster")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.min(F.size("v")).alias("_mn"),
                F.max(F.size("v")).alias("_mx"),
                *[F.sum(F.get("v", d)).alias(f"s{d}") for d in range(sub)],
            )
            .collect()
        )
        if it == 0 and stats:
            mn = min(r["_mn"] for r in stats)
            mx = max(r["_mx"] for r in stats)
            if mn != sub or mx != sub:
                subv.unpersist()
                raise ValueError(
                    f"pq_train requires fixed dimension {dim} vectors; "
                    f"got subvector sizes {mn}..{mx} in column {vec_col!r}"
                )
        means = {
            (r["sub_ix"], r["cluster"]): [
                r[f"s{d}"] / r["n"] for d in range(sub)
            ]
            for r in stats
        }
        cbs = [
            [
                means.get((i, j), prev)
                for j, prev in enumerate(cb)
            ]
            for i, cb in enumerate(cbs)
        ]
    subv.unpersist()
    return cbs


def pq_encode(
    corpus: DataFrame,
    codebooks,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """(id, [keep...], codes): each vector's m nearest-centroid codes.

    Map-side only: one projection computes all m argmins against the
    literal codebook nest inside whole-stage codegen — encoding 100 TB
    is an embarrassingly parallel scan writing |corpus| × m small ints.
    Ties break to the lowest centroid_id (``array_position`` finds the
    first minimum), matching :func:`kmeans_centroids`.

    ``keep`` columns pass through the projection unchanged — the IVF-PQ
    compositions carry the coarse ``cluster`` this way so codes+cells
    come out of ONE scan instead of an id-keyed join of two
    corpus-sized frames (a full-corpus shuffle for a value computed in
    the same scan).
    """
    cbs = _pq_codebooks_list(codebooks)
    if not cbs or not cbs[0]:
        raise ValueError(
            "pq_encode requires a non-empty codebook (pq_train on an "
            "empty corpus returns an empty frame)"
        )
    m = len(cbs)
    sub = len(cbs[0][0])
    cb_sql = _literal_codebooks_sql(cbs)
    # per-subspace distance arrays materialize ONCE in a first
    # projection; the argmin reads them twice (position + min) without
    # recomputing the k x subdim folds — half the arithmetic and half
    # the codegen of inlining the distance expression into both spots
    d2ss = (
        f"transform(sequence(0, {m - 1}),"
        f" i -> transform(element_at({cb_sql}, i + 1),"
        f"  c -> aggregate(zip_with("
        f"   transform(slice({vec_col}, i * {sub} + 1, {sub}),"
        f"    x -> cast(x as double)),"
        f"   c, (x, cc) -> (x - cc) * (x - cc)),"
        f"   cast(0.0 as double), (acc, d) -> acc + d)))"
    )
    kept = [F.col(c) for c in keep]
    return corpus.select(
        F.col(id_col), *kept, F.expr(d2ss).alias("_d2ss")
    ).select(
        F.col(id_col),
        *kept,
        F.expr(
            "transform(_d2ss, ds ->"
            " cast(array_position(ds, array_min(ds)) as int) - 1)"
        ).alias("codes"),
    )


def _adc_expr(cb_sql: str, m: int, sub: int, pv_sql: str = "pv"):
    """ADC distance column: sum over subspaces of squared L2 between
    the probe subvector (``pv_sql``, any array<double> SQL expression)
    and the coded centroid (``codes``).

    Kept as the per-row spelling for parity tests; the scan paths ride
    :func:`_adc_lut_sql` + :func:`_adc_from_lut` instead (round 13) —
    same folds, evaluated once per PROBE instead of once per
    (probe x corpus row)."""
    return F.expr(
        f"aggregate(sequence(0, {m - 1}),"
        f" cast(0.0 as double), (acc, i) -> acc +"
        f" aggregate(zip_with("
        f"  slice({pv_sql}, i * {sub} + 1, {sub}),"
        f"  element_at(element_at({cb_sql}, i + 1),"
        f"   element_at(codes, i + 1) + 1),"
        f"  (x, c) -> (x - c) * (x - c)),"
        f"  cast(0.0 as double), (a, d) -> a + d))"
    )


def _adc_lut_sql(cb_sql: str, m: int, sub: int, pv_sql: str = "pv") -> str:
    """Per-PROBE ADC lookup table (Jégou et al. 2011 §"distance
    computation"): ``lut[i][j]`` = squared L2 between the probe's i-th
    subvector and codebook entry j — the m x k table every ADC scan
    classically precomputes per query. Each entry is the IDENTICAL
    ``zip_with``/``aggregate`` fold :func:`_adc_expr` evaluated per
    corpus row (same slice, same left-to-right dimension order), so
    distances assembled from the table are bit-equal doubles; the
    interpreted higher-order fold now runs k·m times per PROBE instead
    of once per (probe x corpus row) — guide §4.1: the per-row work
    left in the scan is m codegen array lookups."""
    return (
        f"transform(sequence(0, {m - 1}),"
        f" i -> transform(element_at({cb_sql}, i + 1),"
        f" c -> aggregate(zip_with("
        f"  slice({pv_sql}, i * {sub} + 1, {sub}), c,"
        f"  (x, cc) -> (x - cc) * (x - cc)),"
        f"  cast(0.0 as double), (a, d) -> a + d)))"
    )


def _adc_from_lut(m: int, lut_col: str = "_lut"):
    """Per-row ADC distance from the per-probe table: the left-to-right
    sum over subspaces of ``lut[i][codes[i] + 1]`` — the same outer
    fold order as :func:`_adc_expr`, as m whole-stage-codegen
    ``element_at`` lookups (no higher-order function in the scan).
    NULL parity with the per-row fold: a NULL ``codes`` array or NULL
    code element makes its term NULL and the sum NULL, exactly as the
    old NULL-poisoned ``zip_with`` fold did; a ragged-short probe
    yields NULL table entries (the slice/zip_with NULL padding lives
    inside the table build), which poison the sum the same way."""
    adc = None
    for i in range(m):
        term = F.expr(
            f"element_at(element_at({lut_col}, {i + 1}),"
            f" element_at(codes, {i + 1}) + 1)"
        )
        adc = term if adc is None else adc + term
    return adc


def _literal_matrix_sql(rows: list[list[float]]) -> str:
    """k × dim doubles as ONE SQL literal (py4j-avoidance, as above)."""
    return "array(" + ", ".join(
        "array(" + ", ".join(f"CAST({float(x)!r} AS DOUBLE)" for x in r)
        + ")"
        for r in rows
    ) + ")"


def _residual_sql(cent_sql: str, v_sql: str, cluster_sql: str = "cluster"):
    """``v - centroid[cluster]`` as a SQL expression string."""
    return (
        f"zip_with({v_sql}, element_at({cent_sql}, {cluster_sql} + 1),"
        f" (x, c) -> x - c)"
    )


def pq_topk(
    codes: DataFrame,
    probes: DataFrame,
    codebooks,
    k: int = 5,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_id_col: str | None = None,
) -> DataFrame:
    """(probe_id, neighbor_id, adc_dist2, rank): asymmetric-distance
    top-k over PQ codes.

    ADC (Jégou et al. 2011): the probe stays exact, the corpus is its
    codes — distance is the sum over subspaces of squared L2 between
    the probe's subvector and the CODED centroid. Rank 1..k ascending
    (nearest first), neighbor_id tiebreak; a probe appearing in the
    corpus is excluded by id.

    Scale shape: probes broadcast (the :func:`brute_force_topk`
    contract — ADC is the brute-force rung of the PQ ladder, reading
    m ints per corpus row instead of dim floats); the scan is
    map-side, the only shuffle the per-probe top-k window. Compose
    with IVF cells for the bucketed rung (encode per cell, ADC only
    inside probed cells).
    """
    cbs = _pq_codebooks_list(codebooks)
    m = len(cbs)
    sub = len(cbs[0][0])
    cb_sql = _literal_codebooks_sql(cbs)
    pid = probe_id_col or id_col
    # the ADC lookup table is computed ONCE per probe inside the
    # broadcast side (round 13, guide §4.1): the interpreted
    # zip_with/aggregate folds leave the corpus scan, whose per-row
    # work is now m codegen element_at lookups — bit-equal distances
    p = probes.select(
        F.col(pid).alias("probe_id"),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("pv"),
    ).select(
        "probe_id", F.expr(_adc_lut_sql(cb_sql, m, sub)).alias("_lut")
    )
    scored = (
        F.broadcast(p)
        .crossJoin(codes.select(F.col(id_col).alias("neighbor_id"), "codes"))
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .select(
            "probe_id",
            "neighbor_id",
            F.round(_adc_from_lut(m), 6).alias("adc_dist2"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("adc_dist2").asc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "adc_dist2", "rank")
    )


def ivf_pq_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    *,
    n_clusters: int = 8,
    iterations: int = 2,
    nprobe: int = 1,
    m: int = 4,
    pq_k: int = 16,
    pq_iterations: int = 2,
    residual: bool = False,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(probe_id, neighbor_id, adc_dist2, rank): IVF-PQ — the composed
    100 TB ANN path.

    The coarse quantizer (:func:`kmeans_centroids` cells) cuts WHICH
    rows each probe scans (×n_clusters/nprobe); product quantization
    cuts HOW MANY BYTES each scanned row costs (m codes vs dim
    floats). ADC runs only inside the probe's ``nprobe`` nearest
    cells.

    Two quantization modes:

    * ``residual=False`` (flat): codes quantize the raw vectors with
      one global codebook — codes are cell-independent, and
      ``nprobe = n_clusters`` reproduces :func:`pq_topk` over the
      full corpus exactly (the equivalence test's oracle).
    * ``residual=True`` (FAISS IVFPQ shape): codes quantize
      ``v - centroid(cell)``. Residuals have the within-cell variance
      only, so the same m×pq_k codebook spends its capacity on a
      tighter distribution — finer codes, lower quantization error
      (test-measured). ADC compares the probe's residual AGAINST THE
      PROBED CELL to the coded residual — same join shape, one extra
      literal-centroid subtraction per side.

    Scale shape: both assignment steps are map-side literal-codebook
    argmins; the cell join is (cluster)-keyed with probes broadcast;
    the only corpus-wide shuffle is the code/cell materialization's
    id-join — and in a real deployment codes+cells persist as ONE
    parquet store written at encode time (cluster-partitioned, so the
    cell join becomes partition pruning), making queries scan-only
    (:func:`write_pq_store` / :func:`pq_store_topk`).
    """
    cents = _kmeans_codebook_list(
        corpus, n_clusters, iterations, vec_col=vec_col, id_col=id_col
    )
    # (id, vec, cluster) from ONE map-side projection — coarse cells,
    # residuals, and PQ codes all derive from it without any id-keyed
    # join of corpus-sized frames
    with_cells = _project_with_cells(
        corpus, cents, vec_col=vec_col, id_col=id_col, with_norm=False,
    )
    if residual:
        cent_sql = _literal_matrix_sql(cents)
        vcast = f"transform({vec_col}, x -> cast(x as double))"
        enc_src = with_cells.select(
            F.col(id_col),
            F.expr(_residual_sql(cent_sql, vcast)).alias("_rv"),
            "cluster",
        )
        train_col, train_src = "_rv", enc_src
    else:
        cent_sql = None
        train_col, train_src = vec_col, with_cells
    cbs = _pq_train_list(
        train_src, m=m, k=pq_k, iterations=pq_iterations,
        vec_col=train_col, id_col=id_col,
    )
    if not cbs:  # empty corpus: no index, no neighbors
        return probes.select(
            F.col(id_col).alias("probe_id"),
            F.col(id_col).alias("neighbor_id"),
            F.lit(0.0).alias("adc_dist2"),
            F.lit(0).alias("rank"),
        ).limit(0)
    sub = len(cbs[0][0])
    cb_sql = _literal_codebooks_sql(cbs)
    coded = pq_encode(
        train_src, cbs, vec_col=train_col, id_col=id_col,
        keep=("cluster",),
    ).select(F.col(id_col).alias("neighbor_id"), "codes", "cluster")
    p = _project_with_cells(
        probes, cents, vec_col=vec_col, id_col=id_col,
        nprobe=nprobe, with_norm=False,
    ).select(
        F.col(id_col).alias("probe_id"),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("pv"),
        "cluster",
    )
    pv_sql = _residual_sql(cent_sql, "pv") if residual else "pv"
    # ADC table once per (probe, probed cell) broadcast row (round 13,
    # guide §4.1): the residual arithmetic and the interpreted folds
    # leave the per-corpus-row path — m codegen lookups remain; the
    # residual binds ONCE in the _pv projection
    p = p.select(
        "probe_id", F.expr(pv_sql).alias("_pv"), "cluster"
    ).select(
        "probe_id",
        F.expr(_adc_lut_sql(cb_sql, m, sub, "_pv")).alias("_lut"),
        "cluster",
    )
    scored = (
        F.broadcast(p)
        .join(coded, on="cluster")
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .select(
            "probe_id",
            "neighbor_id",
            F.round(_adc_from_lut(m), 6).alias("adc_dist2"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("adc_dist2").asc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "adc_dist2", "rank")
    )


def _encode_with_cells(
    corpus: DataFrame,
    centroids: DataFrame,
    codebooks,
    *,
    residual: bool,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """(id, codes, cluster) for a corpus against a FIXED index —
    the shared encode step of the store writer, the stream ingester,
    and (inlined) :func:`ivf_pq_topk`. Cells ride the encode scan as a
    pass-through column (one map-side projection), never an id-keyed
    join of two corpus-sized frames."""
    cents = _collect_codebook(centroids)
    with_cells = _project_with_cells(
        corpus, cents, vec_col=vec_col, id_col=id_col, with_norm=False,
    )
    cbs = _pq_codebooks_list(codebooks)
    if residual:
        vcast = f"transform({vec_col}, x -> cast(x as double))"
        src = with_cells.select(
            F.col(id_col),
            F.expr(
                _residual_sql(_literal_matrix_sql(cents), vcast)
            ).alias("_rv"),
            "cluster",
        )
        return pq_encode(
            src, cbs, vec_col="_rv", id_col=id_col, keep=("cluster",)
        )
    return pq_encode(
        with_cells, cbs, vec_col=vec_col, id_col=id_col, keep=("cluster",)
    )


def train_pq_index(
    corpus: DataFrame,
    path: str,
    *,
    n_clusters: int = 8,
    iterations: int = 2,
    m: int = 4,
    pq_k: int = 16,
    pq_iterations: int = 2,
    residual: bool = False,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[DataFrame, DataFrame]:
    """Train and PIN an IVF-PQ index at ``<path>/{centroids,
    codebooks}`` (no codes written); returns (centroids, codebooks).

    The shared first-write step of :func:`write_pq_store` and
    ``streaming.stream_pq_index_ingest`` — the residual flag persists
    on the codebooks frame so every later consumer follows the stored
    mode.
    """
    cents = _kmeans_codebook_list(
        corpus, n_clusters, iterations, vec_col=vec_col, id_col=id_col
    )
    centroids = _codebook_frame(corpus.sparkSession, cents)
    if residual:
        vcast = f"transform({vec_col}, x -> cast(x as double))"
        train_src = _project_with_cells(
            corpus, cents, vec_col=vec_col, id_col=id_col,
            with_norm=False,
        ).select(
            F.col(id_col),
            F.expr(
                _residual_sql(_literal_matrix_sql(cents), vcast)
            ).alias("_rv"),
        )
        codebooks = pq_train(
            train_src, m=m, k=pq_k, iterations=pq_iterations,
            vec_col="_rv", id_col=id_col,
        )
    else:
        codebooks = pq_train(
            corpus, m=m, k=pq_k, iterations=pq_iterations,
            vec_col=vec_col, id_col=id_col,
        )
    codebooks = codebooks.withColumn("residual", F.lit(residual))
    centroids.write.mode("overwrite").parquet(f"{path}/centroids")
    codebooks.write.mode("overwrite").parquet(f"{path}/codebooks")
    spark = corpus.sparkSession
    return (
        spark.read.parquet(f"{path}/centroids"),
        spark.read.parquet(f"{path}/codebooks"),
    )


def write_pq_store(
    corpus: DataFrame,
    path: str,
    *,
    n_clusters: int = 8,
    iterations: int = 2,
    m: int = 4,
    pq_k: int = 16,
    pq_iterations: int = 2,
    residual: bool = False,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    mode: str = "overwrite",
) -> None:
    """Persist the IVF-PQ index: coarse centroids + PQ codebooks +
    each vector's (id, codes), cluster-partitioned.

    The deployment shape :func:`ivf_pq_topk` describes: train once,
    encode once, and every query is scan-only — probe-cell assignment
    against the pinned centroids, then ADC over ONLY the probed cells'
    partitions (partition pruning, no join against history). The
    store holds codes, not vectors: ~m bytes per vector at pq_k<=256.

    ``residual=True`` trains/encodes cell residuals (see
    :func:`ivf_pq_topk`); the flag persists on the codebooks frame,
    so queries and appends follow the stored mode — the caller's
    flag only matters on first write.

    ``mode="append"`` follows the :func:`write_semantic_store`
    contract — the PINNED centroids/codebooks win over retraining, so
    an appended batch's codes are consistent with the stored index.
    """
    spark = corpus.sparkSession
    if mode == "append":
        try:
            centroids = spark.read.parquet(f"{path}/centroids")
            codebooks = spark.read.parquet(f"{path}/codebooks")
            # pre-flag stores (no residual column) are flat
            residual = (
                "residual" in codebooks.columns
                and bool(codebooks.first()["residual"])
            )
        except AnalysisException:
            centroids = codebooks = None  # fresh path: train + pin below
    else:
        centroids = codebooks = None
    if centroids is None:
        if not corpus.take(1):
            raise ValueError(
                "cannot build a PQ index from an empty corpus"
            )
        centroids, codebooks = train_pq_index(
            corpus, path,
            n_clusters=n_clusters, iterations=iterations,
            m=m, pq_k=pq_k, pq_iterations=pq_iterations,
            residual=residual, vec_col=vec_col, id_col=id_col,
        )
    (
        _encode_with_cells(
            corpus, centroids, codebooks,
            residual=residual, vec_col=vec_col, id_col=id_col,
        )
        .write.mode("append" if mode == "append" else "overwrite")
        .partitionBy("cluster")
        .parquet(f"{path}/codes")
    )


def pq_store_topk(
    spark,
    path: str,
    probes: DataFrame,
    k: int = 5,
    *,
    nprobe: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(probe_id, neighbor_id, adc_dist2, rank): query a persisted
    IVF-PQ store.

    Scan-only: probe cells come from the pinned centroids (map-side
    argmin), the probed cells' DISTINCT cluster ids collect to the
    driver (bounded by |probes| × nprobe) and prune the codes scan to
    those partitions — a 1-cell probe of a 32k-cell store reads
    1/32k of the codes. ADC + one top-k window as in
    :func:`pq_topk`. The store's persisted residual flag decides the
    distance mode — callers never have to remember how it was built.
    """
    centroids = spark.read.parquet(f"{path}/centroids")
    codebooks = spark.read.parquet(f"{path}/codebooks")
    residual = (
        "residual" in codebooks.columns
        and bool(codebooks.first()["residual"])
    )
    cbs = _pq_codebooks_list(codebooks)
    sub = len(cbs[0][0])
    mm = len(cbs)
    cb_sql = _literal_codebooks_sql(cbs)
    p = _project_with_cells(
        probes,
        _collect_codebook(centroids),
        vec_col=vec_col,
        id_col=id_col,
        nprobe=nprobe,
        with_norm=False,
    ).select(
        F.col(id_col).alias("probe_id"),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("pv"),
        "cluster",
    )
    probed = [
        r["cluster"] for r in p.select("cluster").distinct().collect()
    ]
    codes = (
        spark.read.parquet(f"{path}/codes")
        .filter(F.col("cluster").isin(probed))  # literal partition prune
        .select(F.col(id_col).alias("neighbor_id"), "codes", "cluster")
    )
    pv_sql = (
        _residual_sql(
            _literal_matrix_sql(
                [
                    list(r["centroid"])
                    for r in centroids.orderBy("centroid_id").collect()
                ]
            ),
            "pv",
        )
        if residual
        else "pv"
    )
    # per-(probe, cell) ADC table on the broadcast side (round 13);
    # the residual binds ONCE in the _pv projection
    p = p.select(
        "probe_id", F.expr(pv_sql).alias("_pv"), "cluster"
    ).select(
        "probe_id",
        F.expr(_adc_lut_sql(cb_sql, mm, sub, "_pv")).alias("_lut"),
        "cluster",
    )
    scored = (
        F.broadcast(p)
        .join(codes, on="cluster")
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .select(
            "probe_id",
            "neighbor_id",
            F.round(_adc_from_lut(mm), 6).alias("adc_dist2"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("adc_dist2").asc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "adc_dist2", "rank")
    )


def refine_topk(
    candidates: DataFrame,
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    *,
    metric: str = "l2",
    probe_col: str = "probe_id",
    neighbor_col: str = "neighbor_id",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_broadcast_candidates: int = 10_000_000,
    max_broadcast_probes: int = 1_000_000,
) -> DataFrame:
    """Exact re-rank of an approximate candidate shortlist — the FAISS
    refine stage. Takes ANY (probe_id, neighbor_id) candidate frame
    (:func:`pq_topk`, :func:`ivf_pq_topk`, :func:`pq_store_topk`,
    :func:`lsh_bucketed_topk`, ...), fetches the candidates' EXACT
    corpus vectors, and returns the true top-k per probe. The standard
    two-stage shape: retrieve ``k' = k * refine_factor`` candidates
    cheaply (quantized / bucketed), then pay exact distances only on
    the shortlist — recall approaches exact search while the corpus
    scan stays compressed.

    ``metric``: ``"l2"`` ranks by exact squared L2 (``dist2``
    ascending, the PQ family's space), ``"cosine"`` by exact cosine
    (descending, the brute-force/LSH family's space). Rank ties break
    on neighbor id, as everywhere in the family.

    Scale shape: the shortlist is |probes| x k' id pairs — it is
    persisted, MEASURED, and joined onto the corpus scan by broadcast
    under ``max_broadcast_candidates`` (~20 B per pair), shuffle hash
    join above (corpus-vs-corpus refinement makes the shortlist
    corpus-proportional, and a forced broadcast there is an OOM — the
    hot-set rule). The probe-VECTOR side gets the same measured bound
    (``max_broadcast_probes``, vectors are ~4·dim B each): in the
    corpus-vs-corpus shape probes == corpus and a forced broadcast
    would OOM the same way. The only shuffle is the per-probe top-k
    window (plus the key joins themselves above the bounds).

    Measure what refinement buys with :func:`ann_recall` /
    :func:`ann_recall_summary` against :func:`brute_force_topk` —
    the recall@k-vs-knob tables in SCALE.md come from exactly that
    pairing.
    """
    if metric not in ("l2", "cosine"):
        raise ValueError(f"metric must be l2 or cosine, got {metric}")
    # localCheckpoint, not persist (round 13): the measured count and
    # the join share one materialization either way; checkpointed
    # blocks free when the frame is GC'd (persist had no release path)
    cand = (
        candidates.select(probe_col, neighbor_col)
        .distinct()
        .localCheckpoint()
    )
    n_cand = cand.count()
    cand_side = (
        F.broadcast(cand)
        if n_cand <= max_broadcast_candidates
        else cand.hint("merge")
    )
    nv = corpus.select(
        F.col(id_col).alias(neighbor_col),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("_nv"),
    )
    pv = probes.select(
        F.col(id_col).alias(probe_col),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("_pv"),
    )
    n_probes = probes.count()  # measured bound, as everywhere else
    pv_side = (
        F.broadcast(pv)
        if n_probes <= max_broadcast_probes
        else pv.hint("merge")
    )
    j = nv.join(cand_side, on=neighbor_col).join(pv_side, on=probe_col)
    if metric == "l2":
        dist = F.expr(
            "aggregate(zip_with(_pv, _nv, (a, b) -> (a - b) * (a - b)),"
            " cast(0.0 as double), (acc, x) -> acc + x)"
        )
        score_col, order = "dist2", F.col("dist2").asc()
    else:
        dist = F.expr(
            "aggregate(zip_with(_pv, _nv, (a, b) -> a * b),"
            " cast(0.0 as double), (acc, x) -> acc + x)"
            " / (sqrt(aggregate(transform(_pv, x -> x * x),"
            " cast(0.0 as double), (acc, x) -> acc + x))"
            " * sqrt(aggregate(transform(_nv, x -> x * x),"
            " cast(0.0 as double), (acc, x) -> acc + x)))"
        )
        score_col, order = "cosine", F.col("cosine").desc()
    scored = j.select(
        probe_col, neighbor_col, F.round(dist, 6).alias(score_col)
    )
    w = Window.partitionBy(probe_col).orderBy(order, F.col(neighbor_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(probe_col, neighbor_col, score_col, "rank")
    )


def write_semantic_store(
    vectors: DataFrame,
    centroids: DataFrame,
    path: str,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    mode: str = "append",
) -> None:
    """Persist the semantic-dedup state: the codebook plus each
    vector's (id, cluster, vector, norm), cluster-partitioned.

    The embedding twin of ``write_lsh_store`` / ``write_hash_store``.
    Unlike those, the store must keep the vectors themselves (cosine
    needs them) — still a fraction of the corpus (embeddings vs text),
    and cluster partitioning means an incoming batch reads ONLY the
    cells it probes, never all of history. The codebook is written
    alongside (``<path>/codebook``) and on append the STORED codebook
    is the one used for cell assignment — a caller that re-learned
    centroids before appending would otherwise silently write cells
    inconsistent with the pinned codebook, and incremental probes
    would lose recall with no error.
    """
    spark = vectors.sparkSession
    cents = centroids.orderBy("centroid_id")
    if mode != "append":  # first write (or rebuild): pin the codebook
        cents.write.mode(mode).parquet(f"{path}/codebook")
    else:
        try:
            # appending to an existing store: the pinned codebook wins
            # over whatever the caller passed
            centroids = spark.read.parquet(f"{path}/codebook")
        except AnalysisException:
            # appending to a fresh path: pin the codebook now so the
            # store is self-contained from its first write
            cents.write.parquet(f"{path}/codebook")
    (
        _project_with_cells(
            vectors, _collect_codebook(centroids),
            vec_col=vec_col, id_col=id_col,
        )
        .write.mode("append" if mode == "append" else "overwrite")
        .partitionBy("cluster")
        .parquet(f"{path}/cells")
    )


def incremental_semantic_pairs(
    new_vectors: DataFrame,
    store_path: str,
    *,
    threshold: float = 0.95,
    nprobe: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(vec_id_new, vec_id_matched, cosine, source): embedding near-dup
    matches of an incoming batch against the semantic store
    ('history') and inside the batch itself ('batch',
    id_new > id_matched).

    Same contract as ``incremental_candidate_pairs`` /
    ``incremental_exact_duplicates``, embedding flavor: the batch
    assigns to the STORE's codebook (with ``nprobe`` nearest cells as
    the recall knob), joins only the probed cells' history vectors —
    cluster partition pruning keeps the scan proportional to the
    batch, not to history — and runs the in-batch within-cell scan.

    A codebook with no ``<store>/cells`` yet is EMPTY HISTORY, not an
    error: a crash between the first batch's codebook write and its
    cells write must not wedge the stream (every replay would raise on
    the never-written path); the batch then dedups only against itself
    and its survivors create the first cells partition.
    """
    spark = new_vectors.sparkSession
    centroids = spark.read.parquet(f"{store_path}/codebook")
    try:
        store = spark.read.parquet(f"{store_path}/cells")
    except AnalysisException:
        store = None
    batch = _project_with_cells(
        new_vectors, _collect_codebook(centroids),
        vec_col=vec_col, id_col=id_col, nprobe=nprobe,
    )
    dot = F.expr(
        "aggregate(zip_with(va, vb, (x, y) ->"
        " cast(x as double) * cast(y as double)), cast(0.0 as double),"
        " (acc, v) -> acc + v)"
    )
    a = batch.select(
        F.col(id_col).alias("vec_id_new"),
        F.col(vec_col).alias("va"),
        F.col("nrm").alias("na"),
        "cluster",
    )
    if store is not None:
        h = store.select(
            F.col(id_col).alias("vec_id_matched"),
            F.col(vec_col).alias("vb"),
            F.col("nrm").alias("nb"),
            "cluster",
        )
        vs_history = (
            a.join(h, on="cluster")
            .select(
                "vec_id_new",
                "vec_id_matched",
                F.round(dot / (F.col("na") * F.col("nb")), 6).alias("cosine"),
            )
            .filter(F.col("cosine") >= threshold)
            .distinct()  # nprobe > 1 can meet the same pair in two cells
            .withColumn("source", F.lit("history"))
        )
    else:
        vs_history = None
    # In-batch half: the SAME grouped Arrow pair kernel as
    # :func:`within_cell_pairs` (round 12 — one batch projection and
    # one cluster-keyed exchange instead of an a/b self-join with the
    # interpreted per-pair dot). The kernel emits a < b; this face
    # names the larger id ``vec_id_new``, so the rename flips sides.
    # The HISTORY half deliberately stays the broadcast join below:
    # the batch side broadcasts onto the cluster-pruned store scan, so
    # history is never shuffled at all — a groupBy(cluster) kernel
    # would pay an exchange of the pruned history every micro-batch.
    vs_batch = (
        _within_cell_pair_frame(
            batch, threshold=threshold, vec_col=vec_col, id_col=id_col
        )
        .select(
            F.col("vec_id_b").alias("vec_id_new"),
            F.col("vec_id_a").alias("vec_id_matched"),
            "cosine",
        )
        .distinct()
        .withColumn("source", F.lit("batch"))
    )
    if vs_history is None:
        return vs_batch
    return vs_history.unionByName(vs_batch)


# ------------------------------------------------- scalar quantization (SQ8)

def sq_train(
    corpus: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",  # accepted for SQ-family signature symmetry
) -> DataFrame:
    """(dim_ix, lo, hi): per-dimension bounds for 8-bit scalar
    quantization — the third rung of the quantization ladder (flat
    floats → SQ8 at 4× compression and near-exact recall → PQ at
    16-64× and coarser recall; Faiss's ScalarQuantizer QT_8bit is the
    public reference point).

    ONE aggregate: vectors posexplode map-side into (dim_ix, x) and
    min/max partial-aggregate per dimension — the shuffle moves
    ``dim`` rows. No iterations, no seeds: SQ training is just bounds,
    which is why it is the cheap default when 4× is enough.

    Every consumer (sq_encode / sq_topk / the stores) also accepts a
    plain ``(los, his)`` pair: when feeding SEVERAL consumers, collect
    once — ``los, his = ([r["lo"] ...], [r["hi"] ...])`` from one
    ``.collect()`` — or each consumer re-runs this aggregate.

    ``id_col`` is accepted for signature symmetry with the rest of the
    SQ family (external callers pass it uniformly) but unused: bounds
    are per-dimension, no id is involved.
    """
    del id_col
    return (
        corpus.select(
            F.posexplode(
                F.expr(f"transform({vec_col}, x -> cast(x as double))")
            ).alias("dim_ix", "x")
        )
        .groupBy("dim_ix")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    )


def _sq_bounds_lists(bounds) -> tuple[list[float], list[float]]:
    """Accept the sq_train frame or a (los, his) pair; returns the two
    dim-ordered lists (a dim-bounded collect — never corpus-sized)."""
    if isinstance(bounds, DataFrame):
        rows = sorted(
            ((r["dim_ix"], r["lo"], r["hi"]) for r in bounds.collect())
        )
        return [r[1] for r in rows], [r[2] for r in rows]
    los, his = bounds
    return list(los), list(his)


def sq_bounds(bounds) -> tuple[list[float], list[float]]:
    """Collect an :func:`sq_train` frame ONCE into the ``(los, his)``
    pair every SQ consumer accepts — the pattern for feeding several
    consumers without re-running the bounds aggregate per call."""
    return _sq_bounds_lists(bounds)


def _literal_doubles_sql(xs: list[float]) -> str:
    return "array(" + ", ".join(f"cast({x!r} as double)" for x in xs) + ")"


def _sq_encode_sql(vec_sql: str, los: list[float], his: list[float]) -> str:
    """codes = clamp(floor((x - lo) / (hi - lo) * 256), 0, 255) per
    dimension; a degenerate dimension (hi == lo) codes as 0. Pure IEEE
    double arithmetic, identical in the DuckDB twin. ``try_element_at``
    on the vector (not the literal bounds, which are always in range)
    so a ragged SHORT vector yields NULL → code 0 under the engine
    contract's ANSI mode instead of INVALID_ARRAY_INDEX_IN_ELEMENT_AT —
    the ragged tolerance the :func:`sq_encode` docstring promises."""
    dim = len(los)
    lo_sql = _literal_doubles_sql(los)
    hi_sql = _literal_doubles_sql(his)
    return (
        f"transform(sequence(1, {dim}), d -> coalesce(cast(least("
        f"greatest(floor((cast(try_element_at({vec_sql}, d) as double)"
        f" - element_at({lo_sql}, d))"
        f" / nullif(element_at({hi_sql}, d) - element_at({lo_sql}, d),"
        f" cast(0.0 as double)) * cast(256.0 as double)),"
        f" cast(0.0 as double)), cast(255.0 as double)) as int), 0))"
    )


def sq_encode(
    corpus: DataFrame,
    bounds,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """(id, codes [, keep...]): 8-bit codes per dimension — one
    map-side projection against the literal bounds (the
    :func:`pq_encode` contract: no shuffle, no join; at 100 TB the
    encode folds into whatever scan produces the vectors).

    Fixed-dimension vectors assumed (the family contract pq_train
    enforces by raising): a ragged SHORT vector quantizes its missing
    dimensions to code 0 rather than erroring — run
    ``profiling.embedding_profile`` first if the corpus's dims are
    unaudited (its n_distinct_dims row is the check).
    """
    los, his = _sq_bounds_lists(bounds)
    return corpus.select(
        F.col(id_col),
        F.expr(_sq_encode_sql(vec_col, los, his)).alias("codes"),
        *[F.col(c) for c in keep],
    )


def _sq_adc_sql(los: list[float], his: list[float], pv_sql: str = "pv") -> str:
    """ADC against midpoint reconstruction: decode(code) = lo +
    (code + 0.5) · (hi − lo)/256. The probe expression binds ONCE
    (zip_with over the decoded array) so a composed ``pv_sql`` — the
    IVF residual — is not re-inlined 2·dim times; the fold order is
    dimension order either way, so the arithmetic is unchanged."""
    lo_sql = _literal_doubles_sql(los)
    hi_sql = _literal_doubles_sql(his)
    recon = (
        f"transform(codes, (c, d) -> element_at({lo_sql}, d + 1)"
        f" + (cast(c as double) + cast(0.5 as double))"
        f" * (element_at({hi_sql}, d + 1) - element_at({lo_sql}, d + 1))"
        f" / cast(256.0 as double))"
    )
    return (
        f"aggregate(zip_with({pv_sql}, {recon},"
        f" (x, r) -> (x - r) * (x - r)),"
        f" cast(0.0 as double), (acc, y) -> acc + y)"
    )


def _sq_lut_sql(
    los: list[float], his: list[float], pv_sql: str = "pv"
) -> str:
    """Per-probe dim x 256 squared-distance table (the SQ analog of
    :func:`_adc_lut_sql`): entry [d][c] = (pv[d] − decode(c))² with
    decode the same midpoint expression :func:`_sq_adc_sql` evaluates
    per corpus row — identical IEEE arithmetic, evaluated once per
    PROBE. ``try_element_at`` reproduces the old ``zip_with`` NULL
    padding for a ragged-SHORT probe (NULL entries poison the sum);
    the ``size > dim`` guard reproduces it for a ragged-LONG probe
    (the old fold went NULL through the padded recon side). Pass a
    simple column reference as ``pv_sql`` (project composed residual
    expressions first) — it is inlined per table entry."""
    dim = len(los)
    lo_sql = _literal_doubles_sql(los)
    hi_sql = _literal_doubles_sql(his)
    recon = (
        f"element_at({lo_sql}, d) + (cast(c as double)"
        f" + cast(0.5 as double))"
        f" * (element_at({hi_sql}, d) - element_at({lo_sql}, d))"
        f" / cast(256.0 as double)"
    )
    term = (
        f"(try_element_at({pv_sql}, d) - ({recon}))"
        f" * (try_element_at({pv_sql}, d) - ({recon}))"
    )
    return (
        f"CASE WHEN size({pv_sql}) > {dim}"
        f" THEN cast(null as array<array<double>>)"
        f" ELSE transform(sequence(1, {dim}),"
        f" d -> transform(sequence(0, 255), c -> {term})) END"
    )


def _sq_from_lut(dim: int, lut_col: str = "_lut"):
    """Per-row SQ ADC distance from the per-probe table: left-to-right
    sum over dimensions of ``lut[d][codes[d] + 1]`` — the same fold
    order as :func:`_sq_adc_sql`, as whole-stage-codegen lookups (no
    higher-order function, no per-row decode arithmetic). NULL parity:
    a NULL table (ragged-long probe), NULL entry (ragged-short probe),
    NULL ``codes`` or NULL code element each make a term NULL and the
    sum NULL, exactly as the old NULL-poisoned fold did."""
    adc = None
    for d in range(1, dim + 1):
        term = F.expr(
            f"element_at(element_at({lut_col}, {d}),"
            f" element_at(codes, {d}) + 1)"
        )
        adc = term if adc is None else adc + term
    return adc


def sq_topk(
    codes: DataFrame,
    probes: DataFrame,
    bounds,
    k: int = 5,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_id_col: str | None = None,
) -> DataFrame:
    """(probe_id, neighbor_id, adc_dist2, rank): asymmetric-distance
    top-k over SQ8 codes — the probe stays exact, the corpus is its
    codes decoded to bucket midpoints.

    Same contract and plan shape as :func:`pq_topk` (probes broadcast,
    map-side scan reading dim bytes per row instead of dim floats, one
    per-probe top-k window); compose with IVF cells exactly as PQ does
    when the scan itself must shrink.
    """
    los, his = _sq_bounds_lists(bounds)
    pid = probe_id_col or id_col
    p = probes.select(
        F.col(pid).alias("probe_id"),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("pv"),
    )
    # dim x 256 ADC table once per probe on the broadcast side
    # (round 13, guide §4.1): the per-corpus-row midpoint decode +
    # interpreted fold become dim codegen lookups — bit-equal doubles
    if los:
        p = p.select(
            "probe_id", F.expr(_sq_lut_sql(los, his)).alias("_lut")
        )
        dist = _sq_from_lut(len(los))
    else:  # degenerate empty bounds: keep the per-row fold
        dist = F.expr(_sq_adc_sql(los, his))
    scored = (
        F.broadcast(p)
        .crossJoin(codes.select(F.col(id_col).alias("neighbor_id"), "codes"))
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .select(
            "probe_id",
            "neighbor_id",
            F.round(dist, 6).alias("adc_dist2"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("adc_dist2").asc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "adc_dist2", "rank")
    )


def _sq_encode_with_cells(
    corpus: DataFrame,
    cents: list[list[float]],
    los: list[float],
    his: list[float],
    *,
    residual: bool,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """(id, codes, cluster) in ONE map-side projection — the SQ twin
    of :func:`_encode_with_cells`."""
    with_cells = _project_with_cells(
        corpus, cents, vec_col=vec_col, id_col=id_col, with_norm=False,
    )
    if residual:
        vcast = f"transform({vec_col}, x -> cast(x as double))"
        src = with_cells.select(
            F.col(id_col),
            F.expr(
                _residual_sql(_literal_matrix_sql(cents), vcast)
            ).alias("_rv"),
            "cluster",
        )
        return sq_encode(
            src, (los, his), vec_col="_rv", id_col=id_col,
            keep=("cluster",),
        )
    return sq_encode(
        with_cells, (los, his), vec_col=vec_col, id_col=id_col,
        keep=("cluster",),
    )


def write_sq_store(
    corpus: DataFrame,
    path: str,
    *,
    n_clusters: int = 8,
    iterations: int = 2,
    residual: bool = False,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    mode: str = "overwrite",
) -> None:
    """Persist the IVF-SQ8 index: coarse centroids + per-dimension
    bounds + each vector's (id, codes), cluster-partitioned — the
    :func:`write_pq_store` deployment shape at the 4×/near-exact rung
    (dim bytes per vector instead of m).

    ``residual=True`` trains bounds over cell residuals (see
    :func:`ivf_sq_topk`); the flag persists on the bounds frame, so
    queries and appends follow the stored mode. ``mode="append"``
    keeps the PINNED centroids/bounds (the :func:`write_pq_store`
    contract) so appended codes stay consistent with the stored index.
    """
    spark = corpus.sparkSession
    centroids = bounds = cents = None
    if mode == "append":
        try:
            centroids = spark.read.parquet(f"{path}/centroids")
            bounds = spark.read.parquet(f"{path}/bounds")
            residual = bool(bounds.first()["residual"])
        except AnalysisException:
            centroids = bounds = None
    if centroids is None:
        if not corpus.take(1):
            raise ValueError(
                "cannot build an SQ index from an empty corpus"
            )
        cents = _kmeans_codebook_list(
            corpus, n_clusters, iterations, vec_col=vec_col,
            id_col=id_col,
        )
        centroids = _codebook_frame(spark, cents)
        if residual:
            vcast = f"transform({vec_col}, x -> cast(x as double))"
            train_src = _project_with_cells(
                corpus, cents, vec_col=vec_col, id_col=id_col,
                with_norm=False,
            ).select(
                F.col(id_col),
                F.expr(
                    _residual_sql(_literal_matrix_sql(cents), vcast)
                ).alias("_rv"),
            )
            bounds = sq_train(train_src, vec_col="_rv")
        else:
            bounds = sq_train(corpus, vec_col=vec_col)
        bounds = bounds.withColumn("residual", F.lit(residual))
        centroids.write.mode("overwrite").parquet(f"{path}/centroids")
        bounds.write.mode("overwrite").parquet(f"{path}/bounds")
        centroids = spark.read.parquet(f"{path}/centroids")
        bounds = spark.read.parquet(f"{path}/bounds")
    if cents is None:  # append path: the pinned store's codebook
        cents = _collect_codebook(centroids)
    los, his = _sq_bounds_lists(
        bounds.select("dim_ix", "lo", "hi")
    )
    (
        _sq_encode_with_cells(
            corpus, cents, los, his,
            residual=residual, vec_col=vec_col, id_col=id_col,
        )
        .write.mode("append" if mode == "append" else "overwrite")
        .partitionBy("cluster")
        .parquet(f"{path}/codes")
    )


def sq_store_topk(
    spark,
    path: str,
    probes: DataFrame,
    k: int = 5,
    *,
    nprobe: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(probe_id, neighbor_id, adc_dist2, rank): query a persisted
    IVF-SQ8 store — scan-only, the :func:`pq_store_topk` contract:
    probe cells from the pinned centroids (map-side argmin), probed
    cluster ids collected (bounded by |probes| × nprobe) into a
    literal partition prune of the codes scan, ADC + one top-k
    window. The stored residual flag decides the distance mode.
    """
    centroids = spark.read.parquet(f"{path}/centroids")
    bounds = spark.read.parquet(f"{path}/bounds")
    residual = bool(bounds.first()["residual"])
    los, his = _sq_bounds_lists(bounds.select("dim_ix", "lo", "hi"))
    cents = _collect_codebook(centroids)
    p = _project_with_cells(
        probes, cents, vec_col=vec_col, id_col=id_col,
        nprobe=nprobe, with_norm=False,
    ).select(
        F.col(id_col).alias("probe_id"),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("pv"),
        "cluster",
    )
    probed = [
        r["cluster"] for r in p.select("cluster").distinct().collect()
    ]
    codes = (
        spark.read.parquet(f"{path}/codes")
        .filter(F.col("cluster").isin(probed))  # literal partition prune
        .select(F.col(id_col).alias("neighbor_id"), "codes", "cluster")
    )
    pv_sql = (
        _residual_sql(_literal_matrix_sql(cents), "pv")
        if residual
        else "pv"
    )
    # per-(probe, cell) ADC table on the broadcast side (round 13);
    # the residual binds ONCE in the _pv projection, then the table
    # inlines only the simple column reference
    p = p.select(
        "probe_id", F.expr(pv_sql).alias("_pv"), "cluster"
    ).select(
        "probe_id",
        F.expr(_sq_lut_sql(los, his, "_pv")).alias("_lut"),
        "cluster",
    )
    scored = (
        F.broadcast(p)
        .join(codes, on="cluster")
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .select(
            "probe_id",
            "neighbor_id",
            F.round(_sq_from_lut(len(los)), 6).alias("adc_dist2"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("adc_dist2").asc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "adc_dist2", "rank")
    )


def ivf_sq_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    *,
    n_clusters: int = 8,
    iterations: int = 2,
    nprobe: int = 1,
    residual: bool = False,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(probe_id, neighbor_id, adc_dist2, rank): IVF-SQ8 — coarse
    cells cut WHICH rows a probe scans, scalar quantization cuts each
    scanned row to dim bytes at near-exact recall (the
    :func:`ivf_pq_topk` composition one rung up the fidelity ladder:
    4× compression instead of 16-64×, no codebook training).

    * ``residual=False``: global bounds over raw vectors;
      ``nprobe = n_clusters`` reproduces :func:`sq_topk` over the full
      corpus exactly (test-asserted, the family invariant).
    * ``residual=True`` (the FAISS IVF-SQ shape): bounds over
      ``v − centroid(cell)`` — residuals span the within-cell range
      only, so the same 256 buckets get finer (quantization error
      test-measured lower); ADC compares the probe's residual against
      the probed cell.

    Scale shape: identical to :func:`ivf_pq_topk` — map-side literal
    argmin cell assignment, map-side encode, probes broadcast onto the
    (cluster)-keyed join, one top-k window. In deployment persist
    codes+cells cluster-partitioned so the cell join becomes partition
    pruning (the :func:`write_pq_store` pattern applies unchanged).
    """
    cents = _kmeans_codebook_list(
        corpus, n_clusters, iterations, vec_col=vec_col, id_col=id_col
    )
    with_cells = _project_with_cells(
        corpus, cents, vec_col=vec_col, id_col=id_col, with_norm=False,
    )
    if residual:
        cent_sql = _literal_matrix_sql(cents)
        vcast = f"transform({vec_col}, x -> cast(x as double))"
        train_src = with_cells.select(
            F.col(id_col),
            F.expr(_residual_sql(cent_sql, vcast)).alias("_rv"),
            "cluster",
        )
        train_col = "_rv"
    else:
        cent_sql = None
        train_col, train_src = vec_col, with_cells
    los, his = _sq_bounds_lists(
        sq_train(train_src, vec_col=train_col)
    )
    if not los:  # empty corpus: no index, no neighbors
        return probes.select(
            F.col(id_col).alias("probe_id"),
            F.col(id_col).alias("neighbor_id"),
            F.lit(0.0).alias("adc_dist2"),
            F.lit(0).alias("rank"),
        ).limit(0)
    coded = sq_encode(
        train_src, (los, his), vec_col=train_col, id_col=id_col,
        keep=("cluster",),
    ).select(F.col(id_col).alias("neighbor_id"), "codes", "cluster")
    p = _project_with_cells(
        probes, cents, vec_col=vec_col, id_col=id_col,
        nprobe=nprobe, with_norm=False,
    ).select(
        F.col(id_col).alias("probe_id"),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("pv"),
        "cluster",
    )
    pv_sql = _residual_sql(cent_sql, "pv") if residual else "pv"
    # per-(probe, cell) ADC table on the broadcast side (round 13);
    # residual bound once in _pv, table over the column reference
    p = p.select(
        "probe_id", F.expr(pv_sql).alias("_pv"), "cluster"
    ).select(
        "probe_id",
        F.expr(_sq_lut_sql(los, his, "_pv")).alias("_lut"),
        "cluster",
    )
    scored = (
        F.broadcast(p)
        .join(coded, on="cluster")
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .select(
            "probe_id",
            "neighbor_id",
            F.round(_sq_from_lut(len(los)), 6).alias("adc_dist2"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("adc_dist2").asc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "adc_dist2", "rank")
    )


# ------------------------------------------- store maintenance under drift


def store_cell_stats(spark, path: str) -> DataFrame:
    """(cluster, n_codes, fill_fraction, skew): the drift audit of a
    persisted IVF store (PQ or SQ, batch or streaming layout).

    ``fill_fraction`` is the cell's share of all stored codes;
    ``skew`` normalizes by the uniform fill (n_codes · n_cells /
    total — 1.0 everywhere when balanced). EMPTY cells appear as
    n_codes = 0 rows (a drifting stream starves the cells the
    training distribution filled, and an audit that hides them
    under-reports the drift). One aggregate over the codes store's
    ``cluster`` partition column — column-pruned to zero data columns,
    so the scan reads footers, not codes — joined against the
    (k-row, broadcast) pinned centroid table.

    Round-10 drift ask (r9 verdict #4): ``stream_pq_index_ingest``
    appends into frozen coarse cells, so a drifting vector stream
    piles into whichever pinned cell is nearest and nprobe recall
    quietly degrades; this is the detector, :func:`rebalance_pq_store`
    the repair.
    """
    centroids = spark.read.parquet(f"{path}/centroids")
    counts = (
        spark.read.parquet(f"{path}/codes")
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_codes"))
    )
    per = (
        centroids.select(F.col("centroid_id").alias("cluster"))
        .join(counts, on="cluster", how="left")
        .select(
            "cluster",
            F.coalesce("n_codes", F.lit(0)).cast("long").alias("n_codes"),
        )
    )
    # the frame is k rows (one per cell): whole-frame windows are safe
    w = Window.partitionBy()
    total = F.greatest(F.sum("n_codes").over(w), F.lit(1))
    return per.select(
        "cluster",
        "n_codes",
        F.round(F.col("n_codes") / total, 6).alias("fill_fraction"),
        F.round(
            F.col("n_codes") * F.count(F.lit(1)).over(w) / total, 6
        ).alias("skew"),
    )


@dataclass(frozen=True)
class StoreHealth:
    """The advisor's verdict on a persisted IVF store (PQ or SQ):
    measured signals plus the recommended maintenance rung.

    ``recommendation`` is one of ``"ok"``, ``"compact"``,
    ``"rebalance"``, ``"rebuild"``; ``reasons`` states which signal
    crossed which threshold (empty for ``"ok"``)."""

    n_cells: int
    n_codes: int
    n_files: int
    max_skew: float
    hot_mass: float
    empty_fraction: float
    files_per_cell: float
    recommendation: str
    reasons: tuple[str, ...]


def _store_health_decision(
    cells: list[tuple[int, float, float]],
    n_files: int,
    *,
    skew_threshold: float,
    hot_mass_threshold: float,
    empty_fraction_threshold: float,
    files_per_cell_threshold: float,
) -> StoreHealth:
    """The pure decision half of :func:`store_health` over collected
    (n_codes, fill_fraction, skew) cell rows — driver-side so the
    escalation goldens test the rule itself on the measured r10/r11
    drift states without rebuilding the stores."""
    n_cells = len(cells)
    n_codes = sum(c[0] for c in cells)
    max_skew = max((c[2] for c in cells), default=0.0)
    hot_mass = sum(c[1] for c in cells if c[2] >= skew_threshold)
    empty_fraction = (
        sum(1 for c in cells if c[0] == 0) / n_cells if n_cells else 0.0
    )
    files_per_cell = n_files / n_cells if n_cells else 0.0
    reasons: list[str] = []
    if hot_mass >= hot_mass_threshold:
        reasons.append(
            f"hot_mass {hot_mass:.3f} >= {hot_mass_threshold} (most of "
            "the stored mass sits in over-skew cells: the training "
            "distribution no longer matches — splitting recovers only "
            "part of the gap, retraining closes it)"
        )
    if empty_fraction >= empty_fraction_threshold:
        reasons.append(
            f"empty_fraction {empty_fraction:.3f} >= "
            f"{empty_fraction_threshold} (the distribution the "
            "centroids were trained on has largely vanished)"
        )
    if reasons:
        rec = "rebuild"
    elif max_skew >= skew_threshold:
        rec = "rebalance"
        reasons.append(
            f"max_skew {max_skew:.3f} >= {skew_threshold} (hot cells "
            "exist but hold a minority of the mass: the split repair "
            "recovers recall touching only their members)"
        )
    elif files_per_cell > files_per_cell_threshold:
        rec = "compact"
        reasons.append(
            f"files_per_cell {files_per_cell:.1f} > "
            f"{files_per_cell_threshold} (probe-time read "
            "amplification from per-batch appends)"
        )
    else:
        rec = "ok"
    return StoreHealth(
        n_cells=n_cells,
        n_codes=n_codes,
        n_files=n_files,
        max_skew=round(max_skew, 6),
        hot_mass=round(hot_mass, 6),
        empty_fraction=round(empty_fraction, 6),
        files_per_cell=round(files_per_cell, 6),
        recommendation=rec,
        reasons=tuple(reasons),
    )


def store_health(
    spark,
    path: str,
    *,
    skew_threshold: float = 2.0,
    hot_mass_threshold: float = 0.5,
    empty_fraction_threshold: float = 0.5,
    files_per_cell_threshold: float = 8.0,
) -> StoreHealth:
    """One call answering "which maintenance rung does this IVF store
    need?" — the escalation rule the measured drift ladder implies
    (SCALE.md round-11 table: drifted 0.024 → rebalanced 0.286 →
    rebuilt 0.318 = fresh-build recall), folded into code so the
    detect → compact → rebalance → rebuild family is drivable without
    reading prose.

    Signals (all metadata-cheap): per-cell skew and fill from
    :func:`store_cell_stats` (a footer-only aggregate over the codes
    partition column) and the data-file count from the Hadoop FS
    listing (zero rows read). The ladder, most expensive rung first:

    * ``rebuild`` — over-skew cells hold ≥ ``hot_mass_threshold`` of
      ALL codes, or ≥ ``empty_fraction_threshold`` of cells sit
      empty. Both say the pinned centroids/codebooks were trained on
      a distribution that no longer exists; the r10 drift scenario
      (454 of 700 codes ≈ 0.65 of the mass in one skew-2.59 cell) is
      the measured case where rebalance plateaued at 0.286 while
      rebuild reached the 0.318 fresh ceiling.
    * ``rebalance`` — some cell's skew ≥ ``skew_threshold`` (the
      :func:`rebalance_pq_store` default trigger) but hot cells hold
      a minority of the mass: splitting them touches only their
      members and recovered 0.024 → 0.286 in the measured scenario.
    * ``compact`` — balanced, but > ``files_per_cell_threshold``
      data files per cell (per-micro-batch appends): probe latency,
      not recall, is the problem.
    * ``ok`` — none of the above.

    Works on PQ and SQ stores, batch or streaming layout (both keep
    codes under ``<path>/codes`` partitioned by cluster). The
    recommendation is advisory — it never mutates the store.
    """
    from haplorec_spark.operators.stores import count_data_files

    cells = [
        (int(r["n_codes"]), float(r["fill_fraction"]), float(r["skew"]))
        for r in store_cell_stats(spark, path).collect()
    ]
    n_files = count_data_files(spark, f"{path}/codes")
    return _store_health_decision(
        cells,
        n_files,
        skew_threshold=skew_threshold,
        hot_mass_threshold=hot_mass_threshold,
        empty_fraction_threshold=empty_fraction_threshold,
        files_per_cell_threshold=files_per_cell_threshold,
    )


def compact_pq_store(spark, path: str) -> None:
    """Consolidate a PQ store's codes into one partition per cell.

    The streaming ingester writes (ingest_batch, cluster) partitions —
    exactly-once per replayed batch — so after thousands of
    micro-batches every probe-cell scan opens thousands of small
    files. Compaction rewrites all batches into ``ingest_batch = -1``
    (the layout KEEPS the ingest_batch level, so later stream batches
    append at the same partition depth and replayed-batch overwrite
    still works); a batch-written store (no ingest_batch column) is
    rewritten one-file-per-cell. Offline, single-writer: run with the
    stream stopped — committed batches won't replay after restart
    (the checkpoint), so folding them into -1 is safe.
    """
    from haplorec_spark.operators.stores import replace_parquet_dir

    codes = spark.read.parquet(f"{path}/codes")
    if "ingest_batch" in codes.columns:
        compacted = codes.withColumn(
            "ingest_batch", F.lit(-1).cast("long")
        ).repartition("cluster")
        replace_parquet_dir(
            compacted,
            f"{path}/codes",
            partition_by=("ingest_batch", "cluster"),
        )
    else:
        replace_parquet_dir(
            codes.repartition("cluster"),
            f"{path}/codes",
            partition_by=("cluster",),
        )


def rebalance_pq_store(
    corpus: DataFrame,
    path: str,
    *,
    skew_threshold: float = 2.0,
    split_factor: int = 2,
    iterations: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> dict:
    """Split the hottest cells of a persisted IVF-PQ store and
    re-encode ONLY their members — the repair for coarse-cell drift.

    Every cell whose :func:`store_cell_stats` skew is >=
    ``skew_threshold`` is split into ``split_factor`` sub-cells
    (k-means over the cell's own members); the old cell id is reused
    by the LARGEST sub-cell so its partition is overwritten in place
    (dynamic partition overwrite — no stale rows), the others take
    fresh ids appended to the pinned centroid table. Members are
    re-encoded from their EXACT vectors in ``corpus`` (codes are
    lossy, so re-encoding from reconstructions would compound error) —
    the member read is partition-pruned to the hot cells, and the
    function raises if ``corpus`` is missing any member id rather
    than silently dropping vectors.

    Scope and honesty: cold cells are untouched — a cold vector that
    is now nearer to a new sub-centroid stays filed under its old
    cell (the standard IVF append tradeoff; nprobe > 1 covers the
    boundary). PQ codebooks are NOT retrained (old and new codes must
    stay comparable); in residual mode the re-encode computes
    residuals against the NEW sub-centroids, which is exactly what
    restores ADC resolution for the drifted mass. A streaming-layout
    store must be compacted first (:func:`compact_pq_store`) —
    multiple live ingest_batch partitions would keep stale copies of
    the split cell (raises).

    Returns ``{"split_cells": [...], "new_cells": [...],
    "n_reencoded": int}`` (empty lists when nothing crossed the
    threshold).
    """
    spark = corpus.sparkSession
    codebooks = spark.read.parquet(f"{path}/codebooks")
    residual = (
        "residual" in codebooks.columns
        and bool(codebooks.first()["residual"])
    )
    split = _split_hot_cells(
        corpus, path,
        skew_threshold=skew_threshold, split_factor=split_factor,
        iterations=iterations, vec_col=vec_col, id_col=id_col,
        fn_name="rebalance_pq_store", compactor="compact_pq_store",
    )
    if split is None:
        return {"split_cells": [], "new_cells": [], "n_reencoded": 0}
    cbs = _pq_codebooks_list(codebooks)
    if residual:
        cent_sql = _literal_matrix_sql(
            [split["new_cents"][i] for i in sorted(split["new_cents"])]
        )
        src = split["with_vecs"].select(
            F.col(id_col),
            F.expr(_residual_sql(cent_sql, "_v")).alias("_rv"),
            "cluster",
        )
        reencoded = pq_encode(
            src, cbs, vec_col="_rv", id_col=id_col, keep=("cluster",)
        )
    else:
        reencoded = pq_encode(
            split["with_vecs"], cbs, vec_col="_v", id_col=id_col,
            keep=("cluster",),
        )
    return _write_rebalanced_codes(spark, path, reencoded, split)


def rebalance_sq_store(
    corpus: DataFrame,
    path: str,
    *,
    skew_threshold: float = 2.0,
    split_factor: int = 2,
    iterations: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> dict:
    """:func:`rebalance_pq_store` for the IVF-SQ8 store: same hot-cell
    split and partition-pruned re-encode, with the PINNED per-dim
    bounds in place of PQ codebooks (bounds are not retrained — old
    and new codes must stay comparable); in residual mode the
    re-encode quantizes residuals against the NEW sub-centroids."""
    spark = corpus.sparkSession
    bounds = spark.read.parquet(f"{path}/bounds")
    residual = (
        "residual" in bounds.columns and bool(bounds.first()["residual"])
    )
    split = _split_hot_cells(
        corpus, path,
        skew_threshold=skew_threshold, split_factor=split_factor,
        iterations=iterations, vec_col=vec_col, id_col=id_col,
        fn_name="rebalance_sq_store", compactor="compact_pq_store",
    )
    if split is None:
        return {"split_cells": [], "new_cells": [], "n_reencoded": 0}
    los, his = _sq_bounds_lists(bounds.select("dim_ix", "lo", "hi"))
    if residual:
        cent_sql = _literal_matrix_sql(
            [split["new_cents"][i] for i in sorted(split["new_cents"])]
        )
        src = split["with_vecs"].select(
            F.col(id_col),
            F.expr(_residual_sql(cent_sql, "_v")).alias("_rv"),
            "cluster",
        )
        reencoded = sq_encode(
            src, (los, his), vec_col="_rv", id_col=id_col,
            keep=("cluster",),
        )
    else:
        reencoded = sq_encode(
            split["with_vecs"], (los, his), vec_col="_v", id_col=id_col,
            keep=("cluster",),
        )
    return _write_rebalanced_codes(spark, path, reencoded, split)


#: literal-doubles budget for one grouped-kmeans codebook nest: the
#: per-cell codebooks inline as SQL text (the _dist2_to_codebook
#: rationale), and an unbounded nest at hundreds of hot cells ×
#: split_factor × dim would blow driver parse time and push the
#: generated code past whole-stage-codegen's method limit — so cells
#: are processed in groups whose nest stays under this many doubles
#: (jobs grow with n_hot/group, not n_hot).
_GROUPED_KMEANS_LITERAL_BUDGET = 32_768


def _grouped_cell_kmeans(
    members: DataFrame,
    split_factor: int,
    iterations: int,
    *,
    id_col: str,
) -> tuple[dict, dict, DataFrame]:
    """Per-cell k-means over each hot cell's OWN members with EVERY
    cell sharing the same jobs — one seed collect, one stats collect
    per iteration, one checkpointed final assignment — where the
    per-cell ``kmeans_centroids`` + ``assign_clusters`` loop paid
    O(n_hot_cells) small Spark jobs (the r10 verdict's maintenance
    ergonomics note: a store with hundreds of hot cells cost hundreds
    of driver round-trips). Reproduces the sequential per-cell
    procedure EXACTLY (parity test-pinned): seeds are each cell's
    ``split_factor`` lowest-id members in id order, an emptied
    sub-cell keeps its previous centroid, ties break to the first
    minimum — the :func:`kmeans_centroids` contract, evaluated
    against a per-cell literal codebook nest selected by
    ``array_position`` (the :func:`pq_train` per-subspace pattern,
    cells in place of subspaces).

    ``members`` is (id, cluster, v array<double>); returns
    ``(cents: {cell: [centroid, ...]}, sizes: {(cell, sub): n},
    assignment (id, cluster, sub) — checkpointed, so consumers don't
    re-run the iteration lineage)``.
    """
    v = members.persist()
    w = Window.partitionBy("cluster").orderBy(id_col)
    seed_rows = (
        v.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= split_factor)
        .select("cluster", "_rk", "v")
        .collect()
    )
    cents: dict[int, list[list[float]]] = {}
    for r in sorted(seed_rows, key=lambda s: (s["cluster"], s["_rk"])):
        cents.setdefault(r["cluster"], []).append(list(r["v"]))
    if not cents:
        v.unpersist()
        return {}, {}, members.select(id_col, "cluster").limit(0).withColumn(
            "sub", F.lit(0).cast("int")
        )
    cells = sorted(cents)
    dim = len(cents[cells[0]][0])
    # bound the literal nest: at hundreds of hot cells the full nest
    # would be megabytes of SQL text (review-caught) — process cells
    # in groups under the literal budget; jobs grow with
    # ceil(n_cells/group) × iterations, still independent of n_cells
    # in the common few-hot-cells case
    group_n = max(
        1, _GROUPED_KMEANS_LITERAL_BUDGET // max(1, split_factor * dim)
    )
    groups = [
        cells[i : i + group_n] for i in range(0, len(cells), group_n)
    ]

    def assigned(group):
        cells_arr = ", ".join(str(c) for c in group)
        nest = _literal_codebooks_sql([cents[c] for c in group])
        return (
            v.filter(F.col("cluster").isin(group))
            .withColumn(
                "_cx",
                F.expr(
                    f"cast(array_position(array({cells_arr}), cluster)"
                    " as int)"
                ),
            )
            .withColumn(
                "_d2s",
                F.expr(
                    f"transform(element_at({nest}, _cx),"
                    " c -> aggregate(zip_with(v, c, (x, cc) ->"
                    " (x - cc) * (x - cc)), cast(0.0 as double),"
                    " (acc, d) -> acc + d))"
                ),
            )
            .withColumn(
                "sub",
                F.expr(
                    "cast(array_position(_d2s, array_min(_d2s)) as int)"
                    " - 1"
                ),
            )
        )

    for group in groups:
        for it in range(iterations):
            stats = (
                assigned(group)
                .groupBy("cluster", "sub")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.min(F.size("v")).alias("_mn"),
                    F.max(F.size("v")).alias("_mx"),
                    *[
                        F.sum(F.get("v", d)).alias(f"s{d}")
                        for d in range(dim)
                    ],
                )
                .collect()
            )
            if it == 0 and stats:  # every group's first pass validates
                mn = min(r["_mn"] for r in stats)
                mx = max(r["_mx"] for r in stats)
                if mn != mx:
                    v.unpersist()
                    raise ValueError(
                        "k-means requires fixed-dimension vectors; got "
                        f"sizes {mn}..{mx}"
                    )
            means = {
                (r["cluster"], r["sub"]): [
                    r[f"s{d}"] / r["n"] for d in range(dim)
                ]
                for r in stats
            }
            cents.update(
                {
                    c: [
                        means.get((c, i), prev)
                        for i, prev in enumerate(cents[c])
                    ]
                    for c in group
                }
            )
    final_parts = [
        assigned(group).select(id_col, "cluster", "sub")
        for group in groups
    ]
    final = final_parts[0]
    for part in final_parts[1:]:
        final = final.unionByName(part)
    final = final.localCheckpoint(eager=True)
    v.unpersist()
    sizes = {
        (r["cluster"], r["sub"]): r["n"]
        for r in final.groupBy("cluster", "sub")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    return cents, sizes, final


def _split_hot_cells(
    corpus: DataFrame,
    path: str,
    *,
    skew_threshold: float,
    split_factor: int,
    iterations: int,
    vec_col: str,
    id_col: str,
    fn_name: str,
    compactor: str,
) -> dict | None:
    """The family-agnostic half of store rebalancing: detect hot
    cells, validate the layout and the corpus, split each hot cell
    into k-means sub-cells over its OWN members, pin the new centroid
    table, and return the member→new-cell assignment joined with the
    exact vectors. ``None`` when nothing crossed the threshold (or no
    hot cell actually split)."""
    spark = corpus.sparkSession
    stats = store_cell_stats(spark, path).collect()
    hot = sorted(
        r["cluster"]
        for r in stats
        if r["skew"] >= skew_threshold and r["n_codes"] >= split_factor
    )
    if not hot:
        return None
    centroids = spark.read.parquet(f"{path}/centroids")
    codes = spark.read.parquet(f"{path}/codes")
    streaming_layout = "ingest_batch" in codes.columns
    if streaming_layout:
        live = [
            r["ingest_batch"]
            for r in codes.select("ingest_batch").distinct().collect()
        ]
        if live not in ([], [-1]):
            raise ValueError(
                f"{fn_name} needs a compacted store; run "
                f"{compactor} first (live ingest_batch partitions "
                f"{sorted(live)} would keep stale copies of split cells)"
            )

    # partition-pruned member read: only the hot cells' directories
    member_ids = codes.filter(F.col("cluster").isin(hot)).select(
        id_col, "cluster"
    )
    n_members = member_ids.count()
    members_all = corpus.join(
        member_ids.select(id_col), on=id_col, how="left_semi"
    )
    n_found = members_all.count()
    if n_found != n_members:
        raise ValueError(
            f"corpus is missing {n_members - n_found} of the hot "
            "cells' member vectors — re-encoding would silently drop "
            "them; pass the corpus the store was built from"
        )

    old = {
        r["centroid_id"]: list(r["centroid"]) for r in centroids.collect()
    }
    next_id = max(old) + 1
    new_cents = dict(old)
    split_cells, new_cells = [], []
    n_reencoded = 0
    # ALL hot cells share one grouped k-means (one seed collect + one
    # stats job per iteration + one checkpointed assignment —
    # independent of how many cells are hot); the per-cell driver loop
    # this replaces cost O(n_hot) small jobs (r10 verdict note)
    members = corpus.join(member_ids, on=id_col).select(
        F.col(id_col),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("v"),
        "cluster",
    )
    cents_by_cell, sizes, local = _grouped_cell_kmeans(
        members, split_factor, iterations, id_col=id_col
    )
    mapping_entries: list[tuple[int, int, int]] = []
    for c in hot:
        cb = cents_by_cell.get(c, [])
        subs = [
            (sid, cent)
            for sid, cent in enumerate(cb)
            if sizes.get((c, sid), 0) > 0  # seed cells that emptied: drop
        ]
        if len(subs) < 2:
            continue  # the cell would not actually split
        # the LARGEST sub-cell reuses the old id (its partition is
        # overwritten in place — never left stale)
        subs.sort(key=lambda sc: -sizes.get((c, sc[0]), 0))
        mapping_entries.append((c, subs[0][0], c))
        new_cents[c] = subs[0][1]
        split_cells.append(c)
        # members of cells that did NOT split are never re-encoded, so
        # they must not be counted (review-caught overcount)
        n_reencoded += sum(sizes.get((c, sid), 0) for sid, _ in subs)
        for sid, cent in subs[1:]:
            mapping_entries.append((c, sid, next_id))
            new_cents[next_id] = cent
            new_cells.append(next_id)
            next_id += 1
    if not split_cells:
        return None

    # members redistribute among THEIR OWN cell's sub-centroids only —
    # a global argmin could re-file a boundary member under a cold
    # cell, and the dynamic overwrite of that cold partition would
    # then REPLACE the cold cell's data with the handful of movers
    # (destructive; review-caught in design). One map-side remap keyed
    # by cell*split_factor + sub covers every split cell at once.
    map_lits = ", ".join(
        f"{c * split_factor + sid}L, {gl}"
        for c, sid, gl in sorted(mapping_entries)
    )
    assigned = local.filter(F.col("cluster").isin(split_cells)).select(
        F.col(id_col),
        F.expr(
            f"element_at(map({map_lits}),"
            f" cast(cluster as bigint) * {split_factor} + sub)"
        )
        .cast("int")
        .alias("cluster"),
    )
    with_vecs = corpus.join(assigned, on=id_col).select(
        F.col(id_col),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("_v"),
        "cluster",
    )
    return {
        "new_cents": new_cents,
        "with_vecs": with_vecs,
        "split_cells": split_cells,
        "new_cells": new_cells,
        "n_reencoded": n_reencoded,
        "streaming_layout": streaming_layout,
    }


def _write_rebalanced_codes(
    spark, path: str, reencoded: DataFrame, split: dict
) -> dict:
    """Commit a rebalance with the smallest possible inconsistency
    window (review-caught: pinning new centroids BEFORE the expensive
    re-encode job left a crash window in which every existing residual
    code in the split cell decoded against the wrong centroid):

    1. STAGE the re-encoded rows to ``<path>/codes__pending`` — the
       long Spark job; the store is untouched if it dies.
    2. Back up ``centroids`` to ``centroids__prev``, then pin the new
       table (tiny driver-collected frames, fast).
    3. Dynamic-partition-overwrite ``codes`` FROM the staged rows (a
       read+write of only the affected partitions), then drop the
       staging dir.

    The residual window is between steps 2 and 3 — one small local
    job, not the encode. Recovery if a crash lands there: the staging
    dir is still present, so either re-run the rebalance (idempotent
    arithmetic: same stats, same splits) or restore ``centroids`` from
    ``centroids__prev``. Offline single-writer maintenance, like the
    compactions."""
    from haplorec_spark.operators.stores import delete_dir

    if split["streaming_layout"]:
        reencoded = reencoded.withColumn(
            "ingest_batch", F.lit(-1).cast("long")
        )
        part_cols = ["ingest_batch", "cluster"]
    else:
        part_cols = ["cluster"]
    pending = f"{path}/codes__pending"
    reencoded.write.mode("overwrite").parquet(pending)

    old_centroids = spark.read.parquet(f"{path}/centroids")
    spark.createDataFrame(
        [(r["centroid_id"], list(r["centroid"]))
         for r in old_centroids.collect()],
        "centroid_id int, centroid array<double>",
    ).write.mode("overwrite").parquet(f"{path}/centroids__prev")
    spark.createDataFrame(
        sorted((i, c) for i, c in split["new_cents"].items()),
        "centroid_id int, centroid array<double>",
    ).write.mode("overwrite").parquet(f"{path}/centroids")

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            spark.read.parquet(pending)
            .write.mode("overwrite")
            .partitionBy(*part_cols)
            .parquet(f"{path}/codes")
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    delete_dir(spark, pending)
    return {
        "split_cells": split["split_cells"],
        "new_cells": split["new_cells"],
        "n_reencoded": split["n_reencoded"],
    }


def rebuild_pq_store(
    corpus: DataFrame,
    path: str,
    *,
    n_clusters: int | None = None,
    iterations: int = 2,
    pq_iterations: int = 2,
    train_fraction: float = 1.0,
    seed: int = 13,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> dict:
    """Full repair for a drifted IVF-PQ store: re-train coarse
    centroids AND PQ codebooks from the current corpus (optionally a
    ``train_fraction`` sample), re-encode EVERY vector, and commit
    with the staged contract — the escalation rung above
    :func:`rebalance_pq_store`.

    The split-based rebalance is cheap (touches only hot cells) but
    has a measured recall ceiling: sub-centroids come from the hot
    cell's own members, codebooks stay frozen on the original
    training distribution, and cold cells keep their stale boundary.
    When :func:`store_cell_stats` shows drift past what a split
    repairs (the SCALE.md drift table gives the measured
    when-to-escalate rule), this operator rebuilds the index as if
    freshly trained on today's corpus — same layout, same store
    paths, so queries and the streaming ingester continue unchanged.

    The rebuilt store indexes exactly ``corpus`` (ids present in the
    store but missing from the corpus raise, mirroring the rebalance
    honesty check; NEW corpus ids not yet in the store are indexed —
    a rebuild is also a catch-up). m / pq_k / residual mode are read
    from the stored codebooks; ``n_clusters`` defaults to the
    store's current cell count. A streaming-layout store keeps its
    ``ingest_batch`` partition depth (rebuilt codes land in -1, the
    compacted convention, so later stream batches append normally).

    Commit sequence (single-writer, OFFLINE — stop readers too):
    everything — centroids, codebooks, codes — is trained and
    materialized under ``<path>/rebuild__pending`` first (the store is
    untouched if the long encode dies); the old centroid/codebook
    tables are backed up to ``__prev`` (tiny); then the three
    directories are promoted by rename-aside + rename-in (no table is
    deleted before its replacement lands). A crash mid-promotion
    leaves a mixed but never lossy store: every table still exists (at
    worst under ``<t>__replaced``, which the next rebuild restores
    automatically before re-reading the store), and re-running the
    rebuild rebuilds everything from scratch.
    """
    from haplorec_spark.operators.stores import delete_dir

    spark = corpus.sparkSession
    _recover_interrupted_promotion(
        spark, path, ("codes", "centroids", "codebooks")
    )
    codes = spark.read.parquet(f"{path}/codes")
    codebooks = spark.read.parquet(f"{path}/codebooks")
    residual = (
        "residual" in codebooks.columns
        and bool(codebooks.first()["residual"])
    )
    shape = codebooks.agg(
        F.max("sub_ix").alias("mx_sub"), F.max("centroid_id").alias("mx_c")
    ).first()
    m, pq_k = int(shape["mx_sub"]) + 1, int(shape["mx_c"]) + 1
    if n_clusters is None:
        n_clusters = spark.read.parquet(f"{path}/centroids").count()
    train_src = _validated_rebuild_corpus(
        corpus, codes, "rebuild_pq_store",
        train_fraction=train_fraction, seed=seed, id_col=id_col,
    )
    stage = f"{path}/rebuild__pending"
    delete_dir(spark, stage)
    new_centroids, new_codebooks = train_pq_index(
        train_src, stage,
        n_clusters=n_clusters, iterations=iterations,
        m=m, pq_k=pq_k, pq_iterations=pq_iterations,
        residual=residual, vec_col=vec_col, id_col=id_col,
    )
    encoded = _encode_with_cells(
        corpus, new_centroids, new_codebooks,
        residual=residual, vec_col=vec_col, id_col=id_col,
    )
    _stage_and_promote_rebuild(
        spark, path, stage, encoded,
        small_tables=("centroids", "codebooks"),
        streaming_layout="ingest_batch" in codes.columns,
    )
    return {
        "n_cells": n_clusters,
        "m": m,
        "pq_k": pq_k,
        "residual": residual,
    }


def rebuild_sq_store(
    corpus: DataFrame,
    path: str,
    *,
    n_clusters: int | None = None,
    iterations: int = 2,
    train_fraction: float = 1.0,
    seed: int = 13,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> dict:
    """:func:`rebuild_pq_store` for the IVF-SQ8 store: re-train
    coarse centroids AND per-dimension bounds from the current corpus
    (optionally a sample), full re-encode, same staged commit."""
    from haplorec_spark.operators.stores import delete_dir

    spark = corpus.sparkSession
    _recover_interrupted_promotion(
        spark, path, ("codes", "centroids", "bounds")
    )
    codes = spark.read.parquet(f"{path}/codes")
    old_bounds = spark.read.parquet(f"{path}/bounds")
    residual = (
        "residual" in old_bounds.columns
        and bool(old_bounds.first()["residual"])
    )
    if n_clusters is None:
        n_clusters = spark.read.parquet(f"{path}/centroids").count()
    train_src = _validated_rebuild_corpus(
        corpus, codes, "rebuild_sq_store",
        train_fraction=train_fraction, seed=seed, id_col=id_col,
    )
    stage = f"{path}/rebuild__pending"
    delete_dir(spark, stage)
    cents = _kmeans_codebook_list(
        train_src, n_clusters, iterations, vec_col=vec_col, id_col=id_col
    )
    centroids = _codebook_frame(spark, cents)
    if residual:
        vcast = f"transform({vec_col}, x -> cast(x as double))"
        bounds_src = _project_with_cells(
            train_src, cents, vec_col=vec_col, id_col=id_col,
            with_norm=False,
        ).select(
            F.col(id_col),
            F.expr(
                _residual_sql(_literal_matrix_sql(cents), vcast)
            ).alias("_rv"),
        )
        bounds = sq_train(bounds_src, vec_col="_rv")
    else:
        bounds = sq_train(train_src, vec_col=vec_col)
    bounds = bounds.withColumn("residual", F.lit(residual))
    centroids.write.mode("overwrite").parquet(f"{stage}/centroids")
    bounds.write.mode("overwrite").parquet(f"{stage}/bounds")
    los, his = _sq_bounds_lists(
        spark.read.parquet(f"{stage}/bounds").select("dim_ix", "lo", "hi")
    )
    encoded = _sq_encode_with_cells(
        corpus, cents, los, his,
        residual=residual, vec_col=vec_col, id_col=id_col,
    )
    _stage_and_promote_rebuild(
        spark, path, stage, encoded,
        small_tables=("centroids", "bounds"),
        streaming_layout="ingest_batch" in codes.columns,
    )
    return {"n_cells": n_clusters, "residual": residual}


def _validated_rebuild_corpus(
    corpus: DataFrame,
    codes: DataFrame,
    fn_name: str,
    *,
    train_fraction: float,
    seed: int,
    id_col: str,
) -> DataFrame:
    """Shared rebuild validation: the corpus must cover every stored
    member id (a rebuild that silently dropped vectors would be a
    data loss masquerading as maintenance), and the training sample
    must be non-empty. Returns the training source frame."""
    if not 0.0 < train_fraction <= 1.0:
        raise ValueError(
            f"train_fraction must be in (0, 1], got {train_fraction}"
        )
    missing = (
        codes.select(id_col)
        .distinct()
        .join(corpus.select(id_col), on=id_col, how="left_anti")
        .count()
    )
    if missing:
        raise ValueError(
            f"{fn_name}: corpus is missing {missing} of the store's "
            "member vectors — rebuilding would silently drop them; "
            "pass the full corpus the store indexes"
        )
    if train_fraction >= 1.0:
        return corpus
    sample = corpus.sample(fraction=train_fraction, seed=seed)
    if not sample.take(1):
        raise ValueError(
            f"{fn_name}: train_fraction={train_fraction} sampled zero "
            "vectors — raise the fraction"
        )
    return sample


def _recover_interrupted_promotion(
    spark, path: str, tables: tuple[str, ...]
) -> None:
    """Heal a store whose previous rebuild crashed mid-promotion:
    :func:`~haplorec_spark.operators.stores.promote_dir` never deletes
    a table before its replacement is in place, so the only broken
    state is a table renamed aside (``<t>__replaced``) with the new
    copy not yet renamed in — restore the aside copy and let the
    re-run rebuild from scratch. Asides next to a LIVE table are
    completed promotions' leftovers and are cleared."""
    from haplorec_spark.operators.stores import (
        delete_dir,
        dir_exists,
        rename_dir,
    )

    for t in tables:
        aside = f"{path}/{t}__replaced"
        if not dir_exists(spark, aside):
            continue
        if dir_exists(spark, f"{path}/{t}"):
            delete_dir(spark, aside)
        else:
            rename_dir(spark, aside, f"{path}/{t}")


def _stage_and_promote_rebuild(
    spark,
    path: str,
    stage: str,
    encoded: DataFrame,
    *,
    small_tables: tuple[str, ...],
    streaming_layout: bool,
) -> None:
    """Materialize the re-encoded codes into the staging dir (the
    long job — the live store is untouched if it dies), back up the
    tiny pinned tables to ``__prev``, then promote the staged tables
    by rename-aside + rename-in (:func:`promote_dir` — no table is
    ever deleted before its replacement is in place). Promotion is a
    few fast FS renames; a crash between them leaves the store MIXED
    (some tables new, some old) — detectably wrong, never silently
    lossy: every table still exists (at worst renamed aside, which
    the next rebuild's :func:`_recover_interrupted_promotion`
    restores), the tiny tables have ``__prev`` copies for manual
    rollback, and re-running the rebuild rebuilds everything from
    scratch. Single-writer OFFLINE maintenance: stop readers too —
    queries during the promotion window may pair new codes with old
    pinned tables (or vice versa) and return wrong neighbors."""
    from haplorec_spark.operators.stores import delete_dir, promote_dir

    part_cols = ["cluster"]
    if streaming_layout:
        encoded = encoded.withColumn(
            "ingest_batch", F.lit(-1).cast("long")
        )
        part_cols = ["ingest_batch", "cluster"]
    (
        encoded.write.mode("overwrite")
        .partitionBy(*part_cols)
        .parquet(f"{stage}/codes")
    )
    for t in small_tables:
        spark.read.parquet(f"{path}/{t}").write.mode("overwrite").parquet(
            f"{path}/{t}__prev"
        )
    # tiny tables first (sub-second renames shrink the mixed window),
    # codes last
    for t in (*small_tables, "codes"):
        promote_dir(spark, f"{stage}/{t}", f"{path}/{t}")
    delete_dir(spark, stage)


# ------------------------------------------------------ query registration

from haplorec_spark.queries import register, table  # noqa: E402

_COSINE_DUCK = """
    round(list_reduce(list_transform(generate_series(1, len(p.v)),
                                     i -> p.v[i] * c.v[i]),
                      (x, y) -> x + y)
          / (sqrt(list_reduce(list_transform(p.v, x -> x * x),
                              (x, y) -> x + y))
             * sqrt(list_reduce(list_transform(c.v, x -> x * x),
                                (x, y) -> x + y))), 6)
"""

_PLANES_DUCK = """
    planes AS (SELECT p.plane, d.d,
                      CASE WHEN strpos('0123456789abcdef',
                                       substr(md5(p.plane::VARCHAR || ','
                                                  || d.d::VARCHAR), 1, 1)) - 1 < 8
                           THEN -1 ELSE 1 END AS sign
               FROM range(8) p(plane) CROSS JOIN range(64) d(d)),
    buckets AS (
        SELECT vec_id, string_agg(bit, '' ORDER BY plane) AS bucket
        FROM (SELECT e.vec_id, pl.plane,
                     CASE WHEN sum(e.v[pl.d + 1] * pl.sign) > 0
                          THEN '1' ELSE '0' END AS bit
              FROM emb e CROSS JOIN planes pl
              GROUP BY e.vec_id, pl.plane)
        GROUP BY vec_id)
"""


@register(
    "q_ann_brute_force",
    """
    WITH emb AS (SELECT vec_id,
                        list_transform(embedding, x -> x::DOUBLE) AS v
                 FROM embeddings),
         probes AS (SELECT * FROM emb WHERE vec_id < 10),
         scored AS (SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
                           """ + _COSINE_DUCK + """ AS cosine
                    FROM probes p CROSS JOIN emb c
                    WHERE p.vec_id <> c.vec_id)
    SELECT probe_id, neighbor_id, cosine, rank FROM (
        SELECT probe_id, neighbor_id, cosine,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY cosine DESC, neighbor_id) AS rank
        FROM scored)
    WHERE rank <= 5
    """,
    "exact cosine top-5 neighbors for the first 10 vectors",
)
def q_ann_brute_force(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    return brute_force_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


@register(
    "q_ann_lsh_bucketed",
    """
    WITH emb AS (SELECT vec_id,
                        list_transform(embedding, x -> x::DOUBLE) AS v
                 FROM embeddings),
    """ + _PLANES_DUCK + """,
         probes AS (SELECT emb.*, b.bucket FROM emb
                    JOIN buckets b USING (vec_id) WHERE vec_id < 10),
         corpus AS (SELECT emb.*, b.bucket FROM emb
                    JOIN buckets b USING (vec_id)),
         scored AS (SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
                           """ + _COSINE_DUCK + """ AS cosine
                    FROM probes p JOIN corpus c USING (bucket)
                    WHERE p.vec_id <> c.vec_id)
    SELECT probe_id, neighbor_id, cosine, rank FROM (
        SELECT probe_id, neighbor_id, cosine,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY cosine DESC, neighbor_id) AS rank
        FROM scored)
    WHERE rank <= 5
    """,
    "hyperplane-LSH bucketed approximate top-5 (8 planes)",
)
def q_ann_lsh_bucketed(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    return ann_lsh_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


def _duck_dist2(v: str, c: str) -> str:
    """Squared L2 between two DuckDB double lists (1-based index)."""
    return (
        f"list_reduce(list_transform(generate_series(1, len({v})),"
        f" i -> ({v}[i] - {c}[i]) * ({v}[i] - {c}[i])), (x, y) -> x + y)"
    )


def _duck_kmeans_iter(
    i: int, prev: str, *, src: str = "emb", dim: int = 64, prefix: str = ""
) -> str:
    """One unrolled k-means iteration: assign to nearest centroid of
    ``prev``, recompute per-dimension means, keep the previous centroid
    for emptied clusters — mirroring ``kmeans_centroids`` exactly.
    ``src``/``dim``/``prefix`` let the PQ oracle unroll per-subspace
    runs side by side in one WITH chain."""
    return f"""
    {prefix}asg{i} AS (SELECT vec_id, v, centroid_id FROM (
                 SELECT e.vec_id, e.v, c.centroid_id,
                        row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY {_duck_dist2('e.v', 'c.centroid')},
                                     c.centroid_id) AS rn
                 FROM {src} e CROSS JOIN {prev} c) WHERE rn = 1),
    {prefix}mean{i} AS (SELECT centroid_id, list(m ORDER BY d) AS centroid
                FROM (SELECT centroid_id, d, avg(v[d]) AS m
                      FROM {prefix}asg{i}
                      CROSS JOIN generate_series(1, {dim}) AS g(d)
                      GROUP BY centroid_id, d)
                GROUP BY centroid_id),
    {prefix}c{i} AS (SELECT p.centroid_id,
                    coalesce(m.centroid, p.centroid) AS centroid
             FROM {prev} p LEFT JOIN {prefix}mean{i} m USING (centroid_id))"""


@register(
    "q_ann_ivf_kmeans",
    """
    WITH emb AS (SELECT vec_id,
                        list_transform(embedding, x -> x::DOUBLE) AS v
                 FROM embeddings),
         init AS (SELECT row_number() OVER (ORDER BY vec_id) - 1
                             AS centroid_id,
                         v AS centroid
                  FROM (SELECT vec_id, v FROM emb
                        ORDER BY vec_id LIMIT 8)),"""
    + _duck_kmeans_iter(1, "init") + ","
    + _duck_kmeans_iter(2, "c1") + f""",
         cells AS (SELECT vec_id, v, centroid_id AS cluster FROM (
                     SELECT e.vec_id, e.v, c.centroid_id,
                            row_number() OVER (PARTITION BY e.vec_id
                                ORDER BY {_duck_dist2('e.v', 'c.centroid')},
                                         c.centroid_id) AS rn
                     FROM emb e CROSS JOIN c2 c) WHERE rn = 1),
         probes AS (SELECT e.vec_id, e.v, cl.cluster FROM emb e
                    JOIN cells cl USING (vec_id) WHERE e.vec_id < 10),
         corpus AS (SELECT e.vec_id, e.v, cl.cluster FROM emb e
                    JOIN cells cl USING (vec_id)),
         scored AS (SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
                           """ + _COSINE_DUCK + """ AS cosine
                    FROM probes p JOIN corpus c USING (cluster)
                    WHERE p.vec_id <> c.vec_id)
    SELECT probe_id, neighbor_id, cosine, rank FROM (
        SELECT probe_id, neighbor_id, cosine,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY cosine DESC, neighbor_id) AS rank
        FROM scored)
    WHERE rank <= 5
    """,
    "IVF approximate top-5 inside the probe's k-means cell "
    "(2-iteration DataFrame k-means, nprobe=1; the oracle unrolls the "
    "same two iterations from the same lowest-8-id seeds)",
)
def q_ann_ivf_kmeans(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    return ivf_topk(
        emb, emb.filter(F.col("vec_id") < 10), k=5,
        n_clusters=8, iterations=2,
    )


def _duck_pq_subspace(ix: int, lo: int, hi: int) -> str:
    """WITH-chain fragment: subspace ``ix`` slice, seeded init, two
    unrolled k-means iterations, and the final code assignment."""
    p = f"s{ix}"
    return (
        f"""
    {p}sub AS (SELECT vec_id, v[{lo}:{hi}] AS v FROM emb),
    {p}init AS (SELECT row_number() OVER (ORDER BY vec_id) - 1
                    AS centroid_id,
                v AS centroid
         FROM (SELECT vec_id, v FROM {p}sub ORDER BY vec_id LIMIT 4)),"""
        + _duck_kmeans_iter(
            1, f"{p}init", src=f"{p}sub", dim=hi - lo + 1, prefix=p
        )
        + ","
        + _duck_kmeans_iter(
            2, f"{p}c1", src=f"{p}sub", dim=hi - lo + 1, prefix=p
        )
        + f""",
    {p}code AS (SELECT vec_id, centroid_id AS code, centroid FROM (
                 SELECT s.vec_id, c.centroid_id, c.centroid,
                        row_number() OVER (PARTITION BY s.vec_id
                            ORDER BY {_duck_dist2('s.v', 'c.centroid')},
                                     c.centroid_id) AS rn
                 FROM {p}sub s CROSS JOIN {p}c2 c) WHERE rn = 1)"""
    )


@register(
    "q_ann_pq_adc",
    """
    WITH emb AS (SELECT vec_id,
                        list_transform(embedding, x -> x::DOUBLE) AS v
                 FROM embeddings),"""
    + _duck_pq_subspace(0, 1, 32) + ","
    + _duck_pq_subspace(1, 33, 64) + f""",
         probes AS (SELECT vec_id, v FROM emb WHERE vec_id < 10),
         scored AS (
             SELECT p.vec_id AS probe_id, x.vec_id AS neighbor_id,
                    round({_duck_dist2('p.v[1:32]', 'x.c0')}
                          + {_duck_dist2('p.v[33:64]', 'x.c1')}, 6)
                        AS adc_dist2
             FROM probes p CROSS JOIN (
                 SELECT c0.vec_id, c0.centroid AS c0, c1.centroid AS c1
                 FROM s0code c0 JOIN s1code c1 USING (vec_id)) x
             WHERE p.vec_id <> x.vec_id)
    SELECT probe_id, neighbor_id, adc_dist2, rank FROM (
        SELECT probe_id, neighbor_id, adc_dist2,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY adc_dist2, neighbor_id) AS rank
        FROM scored)
    WHERE rank <= 5
    """,
    "product-quantization ADC top-5 (2 subspaces x 4 centroids, "
    "2-iteration per-subspace k-means; the oracle unrolls both "
    "subspace k-means runs from the same lowest-4-id seeds)",
)
def q_ann_pq_adc(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    # the list trainer: pq_encode and pq_topk each re-collected the
    # codebook FRAME (an orderBy+collect driver job apiece) when the
    # nest was driver-born to begin with
    cb = _pq_train_list(emb, m=2, k=4, iterations=2)
    return pq_topk(
        pq_encode(emb, cb), emb.filter(F.col("vec_id") < 10), cb, k=5
    )


@register(
    "q_ann_sq_adc",
    # SQ8 ADC top-k: bounds = per-dim min/max, codes = clamp(floor(
    # (x-lo)/(hi-lo)*256), 0, 255) (degenerate dim -> 0), ADC against
    # bucket midpoints — the same IEEE double arithmetic as the
    # operator, summed in the same dimension order.
    """
    WITH e AS (SELECT vec_id,
                      list_transform(embedding, x -> x::DOUBLE) AS v
               FROM embeddings),
         dims AS (SELECT d, min(x) AS lo, max(x) AS hi FROM (
                     SELECT unnest(v) AS x,
                            unnest(generate_series(1, len(v))) AS d
                     FROM e)
                  GROUP BY d),
         b AS (SELECT list(lo ORDER BY d) AS los,
                      list(hi ORDER BY d) AS his FROM dims),
         codes AS (SELECT vec_id,
                          list_transform(generate_series(1, len(v)),
                              d -> coalesce(CAST(least(greatest(
                                  floor((v[d] - los[d])
                                        / nullif(his[d] - los[d], 0.0)
                                        * 256.0),
                                  0.0), 255.0) AS INT), 0)) AS cs
                   FROM e CROSS JOIN b),
         scored AS (SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
                           round(list_reduce(list_transform(
                               generate_series(1, len(p.v)),
                               d -> (p.v[d] - (los[d] + (cs[d] + 0.5)
                                     * (his[d] - los[d]) / 256.0))
                                  * (p.v[d] - (los[d] + (cs[d] + 0.5)
                                     * (his[d] - los[d]) / 256.0))),
                               (x, y) -> x + y), 6) AS adc_dist2
                    FROM (SELECT * FROM e WHERE vec_id < 10) p
                    CROSS JOIN codes c CROSS JOIN b
                    WHERE p.vec_id <> c.vec_id)
    SELECT probe_id, neighbor_id, adc_dist2, rank FROM (
        SELECT *, row_number() OVER (PARTITION BY probe_id
                      ORDER BY adc_dist2, neighbor_id) AS rank
        FROM scored)
    WHERE rank <= 5
    """,
    "SQ8 scalar-quantization ADC top-k: per-dimension min/max bounds "
    "(one aggregate), map-side 8-bit encode, asymmetric distance "
    "against bucket midpoints, one per-probe top-k window",
)
def q_ann_sq_adc(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    # collect the bounds ONCE: passing the sq_train frame to both
    # consumers would run the corpus-wide min/max aggregate twice
    # (review-caught)
    bounds = _sq_bounds_lists(sq_train(emb))
    return sq_topk(
        sq_encode(emb, bounds), emb.filter(F.col("vec_id") < 10), bounds,
        k=5,
    )


@register(
    "q_semantic_dedup",
    # SemDedup: cosine pairs found inside k-means cells. Random vectors
    # rarely reach cosine 0.8, so shifted-id copies of the low-id
    # vectors are seeded — exact-duplicate pairs the operator must find
    # in whatever cell they land in. The oracle unrolls the same two
    # k-means iterations from the same lowest-8-id seeds.
    """
    WITH emb AS (SELECT vec_id,
                        list_transform(embedding, x -> x::DOUBLE) AS v
                 FROM embeddings
                 UNION ALL
                 SELECT vec_id + 100000,
                        list_transform(embedding, x -> x::DOUBLE) AS v
                 FROM embeddings WHERE vec_id < 25),
         init AS (SELECT row_number() OVER (ORDER BY vec_id) - 1
                             AS centroid_id,
                         v AS centroid
                  FROM (SELECT vec_id, v FROM emb
                        ORDER BY vec_id LIMIT 8)),"""
    + _duck_kmeans_iter(1, "init") + ","
    + _duck_kmeans_iter(2, "c1") + f""",
         cells AS (SELECT vec_id, v, centroid_id AS cluster FROM (
                     SELECT e.vec_id, e.v, c.centroid_id,
                            row_number() OVER (PARTITION BY e.vec_id
                                ORDER BY {_duck_dist2('e.v', 'c.centroid')},
                                         c.centroid_id) AS rn
                     FROM emb e CROSS JOIN c2 c) WHERE rn = 1),
         withn AS (SELECT vec_id, v, cluster,
                          sqrt(list_reduce(list_transform(v, x -> x * x),
                                           (x, y) -> x + y)) AS nrm
                   FROM cells)
    SELECT vec_id_a, vec_id_b, cosine FROM (
        SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
               round(list_reduce(list_transform(
                         generate_series(1, len(a.v)),
                         i -> a.v[i] * b.v[i]), (x, y) -> x + y)
                     / (a.nrm * b.nrm), 6) AS cosine
        FROM withn a JOIN withn b USING (cluster)
        WHERE a.vec_id < b.vec_id)
    WHERE cosine >= 0.8
    """,
    "semantic (SemDedup) dedup: embedding cosine pairs within k-means "
    "cells (2-iteration DataFrame k-means, seeded duplicates; the "
    "oracle unrolls the same iterations from the same seeds)",
)
def q_semantic_dedup(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    seeded = emb.unionByName(
        emb.filter(F.col("vec_id") < 25).select(
            (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
        )
    ).localCheckpoint(eager=True)
    # gate-local checkpoint: the k-means iterations and BOTH sides of
    # the within-cell pair join would otherwise re-derive the seeded
    # union from the scan each time (measured ~2x gate cost). This is
    # a GATE choice, not an operator change — at corpus scale
    # within_cell_pairs deliberately recomputes the cheap projection
    # instead of materializing the vector corpus (similarity.py
    # within_cell_pairs docstring); here the seeded frame is gate-
    # sized, so pinning it is the right tradeoff.
    return semantic_dedup_pairs(
        seeded, threshold=0.8, n_clusters=8, iterations=2
    )
