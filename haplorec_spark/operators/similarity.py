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

All arithmetic is double-precision with a pinned left-to-right fold
order so results are bit-identical across engines before rounding.
"""

from __future__ import annotations

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


def lsh_bucket_keys(
    vectors: DataFrame,
    *,
    n_planes: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, bucket): concatenated sign bits of the hyperplane projections.

    The projection sum runs over an exploded (vector x plane x dim) form
    with map-side partial aggregation; the plane matrix is broadcast.
    """
    spark = vectors.sparkSession
    planes = F.broadcast(hyperplane_signs(spark, n_planes, dim))
    dims = F.broadcast(
        spark.range(dim).select(F.col("id").cast("int").alias("d"))
    )
    comps = (
        vectors.select(F.col(id_col), F.col(vec_col).alias("v"))
        .crossJoin(dims)
        .select(
            F.col(id_col),
            "d",
            F.expr("cast(element_at(v, d + 1) as double)").alias("x"),
        )
        .join(planes, on="d")
        .groupBy(id_col, "plane")
        .agg(F.sum(F.col("x") * F.col("sign")).alias("proj"))
        .withColumn("bit", F.when(F.col("proj") > 0, F.lit("1")).otherwise(F.lit("0")))
    )
    return (
        comps.groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("plane", "bit"))).alias("pb"))
        .select(
            F.col(id_col),
            F.expr("concat_ws('', transform(pb, s -> s.bit))").alias("bucket"),
        )
    )


def ann_lsh_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    *,
    n_planes: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate cosine top-k: exact ranking within the probe's bucket.

    Returns (probe_id, neighbor_id, cosine, rank) with rank over the
    candidates that share the probe's full sign pattern.
    """
    corpus_buckets = lsh_bucket_keys(
        corpus, n_planes=n_planes, dim=dim, vec_col=vec_col, id_col=id_col
    )
    probe_buckets = lsh_bucket_keys(
        probes, n_planes=n_planes, dim=dim, vec_col=vec_col, id_col=id_col
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
    """
    v = vectors.select(
        F.col(id_col),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("v"),
    ).persist()  # re-read every iteration; pin the casted vectors once
    centroids = (
        v.orderBy(id_col).limit(k)
        .select(F.col("v").alias("centroid"))
        .withColumn(
            "centroid_id",
            F.row_number().over(Window.orderBy(F.lit(1))) - 1,
        )
        .select("centroid_id", "centroid")
    )
    dist2 = F.expr(
        "aggregate(zip_with(v, centroid, (x, c) -> (x - c) * (x - c)),"
        " cast(0.0 as double), (acc, d) -> acc + d)"
    )
    for _ in range(iterations):
        assigned = (
            v.crossJoin(F.broadcast(centroids))
            .select(id_col, "v", "centroid_id", dist2.alias("d2"))
            .withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy(id_col).orderBy("d2", "centroid_id")
                ),
            )
            .filter(F.col("rn") == 1)
        )
        means = (
            assigned.select(
                "centroid_id", F.posexplode("v").alias("d", "x")
            )
            .groupBy("centroid_id", "d")
            .agg(F.avg("x").alias("m"))
            .groupBy("centroid_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("d", "m"))
                ).alias("dm")
            )
            .select(
                "centroid_id",
                F.expr("transform(dm, s -> s.m)").alias("centroid"),
            )
        )
        # keep previous centroid for clusters that emptied out
        centroids = (
            centroids.select(
                "centroid_id", F.col("centroid").alias("prev")
            )
            .join(means, on="centroid_id", how="left")
            .select(
                "centroid_id",
                F.coalesce("centroid", "prev").alias("centroid"),
            )
        ).localCheckpoint(eager=True)  # truncate the iterative lineage
    v.unpersist()
    return centroids


def assign_clusters(
    vectors: DataFrame,
    centroids: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, cluster): nearest centroid per vector (broadcast argmin)."""
    v = vectors.select(
        F.col(id_col),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("v"),
    )
    dist2 = F.expr(
        "aggregate(zip_with(v, centroid, (x, c) -> (x - c) * (x - c)),"
        " cast(0.0 as double), (acc, d) -> acc + d)"
    )
    return (
        v.crossJoin(F.broadcast(centroids))
        .select(id_col, "centroid_id", dist2.alias("d2"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy("d2", "centroid_id")
            ),
        )
        .filter(F.col("rn") == 1)
        .select(id_col, F.col("centroid_id").alias("cluster"))
    )


def ivf_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    *,
    n_clusters: int = 8,
    iterations: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF approximate top-k: exact cosine ranking inside the probe's
    k-means cell (nprobe=1).

    The codebook replaces the hyperplane matrix of :func:`ann_lsh_topk`
    with learned centroids — same join shape (cluster-keyed equi-join),
    per-probe work divided by the cluster fanout.
    """
    centroids = kmeans_centroids(
        corpus, n_clusters, iterations, vec_col=vec_col, id_col=id_col
    )
    corpus_cells = assign_clusters(
        corpus, centroids, vec_col=vec_col, id_col=id_col
    )
    probe_cells = assign_clusters(
        probes, centroids, vec_col=vec_col, id_col=id_col
    )
    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("pv")
    ).join(
        probe_cells.select(F.col(id_col).alias("probe_id"), "cluster"),
        on="probe_id",
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    ).join(
        corpus_cells.select(F.col(id_col).alias("neighbor_id"), "cluster"),
        on="neighbor_id",
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


@register(
    "q_ann_ivf_kmeans",
    None,  # iterative k-means codebook -> rows-only check
    "IVF approximate top-5 inside the probe's k-means cell "
    "(2-iteration DataFrame k-means, nprobe=1)",
)
def q_ann_ivf_kmeans(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    return ivf_topk(
        emb, emb.filter(F.col("vec_id") < 10), k=5,
        n_clusters=8, iterations=2,
    )
