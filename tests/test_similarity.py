"""Similarity-search operator tests: brute force as ground truth, LSH
and IVF recall, k-means codebook invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import rows

from haplorec_spark.operators.similarity import (
    _plane_sign,
    assign_clusters,
    brute_force_topk,
    hyperplane_signs,
    ivf_topk,
    kmeans_centroids,
    lsh_bucket_keys,
)

SF = "/root/testdata/sf0.001"


def test_plane_sign_matches_sql_derivation(spark):
    """The driver-side Python sign matrix, the SQL hyperplane_signs
    table, and the DuckDB oracle must all derive identical signs from
    md5('plane,d') — lockstep check of the first two."""
    sql_signs = {
        (r.plane, r.d): r.sign
        for r in hyperplane_signs(spark, 4, 16).collect()
    }
    for (p, d), s in sql_signs.items():
        assert _plane_sign(p, d) == s


def test_lsh_bucket_keys_is_shuffle_free(spark):
    """The bucket projection is a per-row expression: no Exchange, no
    row expansion anywhere in its plan."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = lsh_bucket_keys(emb)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Generate" not in plan  # no explode
    assert out.count() == emb.count()
    # bucket is an 8-bit string over '0'/'1'
    import re
    for r in out.limit(20).collect():
        assert re.fullmatch("[01]{8}", r.bucket)


def test_kmeans_codebook_shape_and_determinism(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    c1 = kmeans_centroids(emb, k=4, iterations=2)
    c2 = kmeans_centroids(emb, k=4, iterations=2)
    rows1 = sorted((r.centroid_id, tuple(r.centroid)) for r in c1.collect())
    rows2 = sorted((r.centroid_id, tuple(r.centroid)) for r in c2.collect())
    assert rows1 == rows2
    assert [i for i, _ in rows1] == [0, 1, 2, 3]
    assert all(len(v) == 64 for _, v in rows1)


def test_assign_clusters_partitions_corpus(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cells = assign_clusters(emb, kmeans_centroids(emb, k=4, iterations=1))
    assert cells.count() == emb.count()
    assert cells.select("cluster").distinct().count() <= 4


def test_ivf_recall_vs_brute_force(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.probe_id, r.neighbor_id)
        for r in brute_force_topk(emb, probes, k=5).collect()
    }
    approx = {
        (r.probe_id, r.neighbor_id)
        for r in ivf_topk(emb, probes, k=5, n_clusters=4,
                          iterations=2).collect()
    }
    # nprobe=1 IVF with 4 cells over 500 vectors should keep most of the
    # true top-5 (cells hold ~125 vectors each)
    assert len(approx & exact) / len(exact) >= 0.5
    # every IVF hit is correctly scored: its cosine equals brute force's
    bf = {
        (r.probe_id, r.neighbor_id): r.cosine
        for r in brute_force_topk(emb, probes, k=500).collect()
    }
    for r in ivf_topk(emb, probes, k=5, n_clusters=4,
                      iterations=2).collect():
        assert bf[(r.probe_id, r.neighbor_id)] == r.cosine


def test_ivf_nprobe_all_cells_equals_brute_force(spark):
    """nprobe = n_clusters searches every cell, so IVF must reproduce
    the exact brute-force top-k ranking bit-for-bit."""
    from haplorec_spark.operators.similarity import brute_force_topk, ivf_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    probes = emb.filter(emb["vec_id"] < 5)
    exact = sorted(
        tuple(r) for r in brute_force_topk(emb, probes, k=5).collect()
    )
    full_probe = sorted(
        tuple(r)
        for r in ivf_topk(
            emb, probes, k=5, n_clusters=4, iterations=1, nprobe=4
        ).collect()
    )
    assert full_probe == exact


def test_ivf_nprobe_recall_is_monotone(spark):
    from haplorec_spark.operators.similarity import brute_force_topk, ivf_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    probes = emb.filter(emb["vec_id"] < 5)
    exact = {
        (r["probe_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, probes, k=5).collect()
    }

    def recall(np_):
        got = {
            (r["probe_id"], r["neighbor_id"])
            for r in ivf_topk(
                emb, probes, k=5, n_clusters=4, iterations=1, nprobe=np_
            ).collect()
        }
        return len(got & exact) / len(exact)

    r1, r2, r4 = recall(1), recall(2), recall(4)
    assert r1 <= r2 <= r4 == 1.0


def test_lsh_bucket_oversized_vector_projects_on_first_dim(spark):
    """A vector longer than dim projects on its first dim components —
    without the slice, zip_with pads the SIGN side with nulls and every
    oversized vector collapses into the all-'0' bucket."""
    base = [float(i % 7 - 3) for i in range(8)]
    df = spark.createDataFrame(
        [(1, base), (2, base + [99.0, -99.0])],
        "vec_id long, embedding array<double>",
    )
    got = {
        r.vec_id: r.bucket
        for r in lsh_bucket_keys(df, n_planes=4, dim=8).collect()
    }
    assert got[2] == got[1]


def test_semantic_dedup_pairs_vs_duckdb(spark):
    """SemDedup (within-cell cosine pairs) against a DuckDB oracle that
    unrolls the same two k-means iterations from the same seeds. The
    corpus seeds shifted-id copies so true near-dup pairs exist."""
    import duckdb

    from haplorec_spark.operators.similarity import (
        _duck_dist2,
        _duck_kmeans_iter,
        semantic_dedup_pairs,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    seeded = emb.unionByName(
        emb.filter(F.col("vec_id") < 25).select(
            (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
        )
    )
    got = sorted(
        tuple(r)
        for r in semantic_dedup_pairs(
            seeded, threshold=0.8, n_clusters=8, iterations=2
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "create view embeddings as select * from "
        f"read_parquet('{SF}/embeddings.parquet')"
    )
    want = sorted(
        tuple(t)
        for t in con.execute(
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
    """
        ).fetchall()
    )
    assert got == want
    assert len(got) >= 25  # the seeded exact duplicates must be found


def test_semantic_dedup_subset_of_exact_baseline(spark):
    """Every within-cell pair must also be found by the exact O(n^2)
    baseline at the same threshold (cells only bound recall, never
    invent pairs or change the cosine arithmetic)."""
    from haplorec_spark.operators.dedup import embedding_near_duplicates
    from haplorec_spark.operators.similarity import semantic_dedup_pairs

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    seeded = emb.unionByName(
        emb.filter(F.col("vec_id") < 25).select(
            (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
        )
    )
    cell_pairs = {
        (r.vec_id_a, r.vec_id_b)
        for r in semantic_dedup_pairs(seeded, threshold=0.8).collect()
    }
    exact_pairs = {
        (r.vec_id_a, r.vec_id_b)
        for r in embedding_near_duplicates(seeded, threshold=0.8).collect()
    }
    assert cell_pairs <= exact_pairs
    # exact duplicates land in the same cell by construction
    # (identical vectors share a nearest centroid), so recall on the
    # seeded copies is total
    seeded_pairs = {(a, b) for a, b in exact_pairs if b == a + 100000}
    assert seeded_pairs <= cell_pairs


def test_multiprobe_base_bucket_matches_single(spark):
    """n_flip=0-equivalent: the first bucket emitted per vector is the
    vector's own single-probe bucket."""
    from haplorec_spark.operators.similarity import lsh_probe_buckets

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    single = {
        r["vec_id"]: r["bucket"]
        for r in lsh_bucket_keys(emb).collect()
    }
    multi = lsh_probe_buckets(emb, n_flip=2).collect()
    per_vec = {}
    for r in multi:
        per_vec.setdefault(r["vec_id"], set()).add(r["bucket"])
    assert set(per_vec) == set(single)
    for vid, buckets in per_vec.items():
        assert single[vid] in buckets
        assert len(buckets) == 3  # base + 2 distinct single-bit flips
        # every perturbed key differs from base in exactly one position
        for b in buckets - {single[vid]}:
            diffs = sum(x != y for x, y in zip(b, single[vid]))
            assert diffs == 1


def test_multiprobe_recall_is_monotone(spark):
    from haplorec_spark.operators.similarity import (
        ann_lsh_topk,
        brute_force_topk,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    probes = emb.filter(emb["vec_id"] < 10)
    exact = {
        (r["probe_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, probes, k=5).collect()
    }

    def recall(flips):
        got = {
            (r["probe_id"], r["neighbor_id"])
            for r in ann_lsh_topk(
                emb, probes, k=5, n_probe_flips=flips
            ).collect()
        }
        return len(got & exact) / len(exact)

    r0, r2, r4 = recall(0), recall(2), recall(4)
    assert r0 <= r2 <= r4
    assert r2 > r0  # the knife-edge flips recover real neighbors here


def test_semantic_dedup_nprobe_recall_monotone(spark):
    """nprobe recovers boundary pairs: recall against the exact O(n^2)
    baseline is monotone, and nprobe = n_clusters reproduces it."""
    from haplorec_spark.operators.dedup import embedding_near_duplicates
    from haplorec_spark.operators.similarity import semantic_dedup_pairs

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    seeded = emb.unionByName(
        emb.filter(F.col("vec_id") < 25).select(
            (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
        )
    )
    exact = rows(embedding_near_duplicates(seeded, threshold=0.8))

    def pairs(np_):
        return rows(
            semantic_dedup_pairs(
                seeded, threshold=0.8, n_clusters=4, nprobe=np_
            )
        )

    p1, p2, p4 = pairs(1), pairs(2), pairs(4)
    assert set(p1) <= set(p2) <= set(p4)
    assert p4 == exact  # full probe = exact pairwise, incl. no dup rows


def test_kmeans_rejects_ragged_vectors(spark):
    """Mixed-dimension input fails fast with a clear error instead of a
    null-sum TypeError deep inside iteration 1."""
    import pytest

    emb = spark.createDataFrame(
        [(1, [1.0] * 64), (2, [1.0] * 64), (3, [0.5] * 8)],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(ValueError, match="fixed-dimension"):
        kmeans_centroids(emb, 2, 1)
    with pytest.raises(ValueError, match="fixed-dimension"):
        from haplorec_spark.operators.similarity import semantic_dedup_pairs

        semantic_dedup_pairs(emb, n_clusters=2, iterations=1).collect()


def test_semantic_dedup_empty_corpus(spark):
    from haplorec_spark.operators.similarity import semantic_dedup_pairs

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert semantic_dedup_pairs(empty, n_clusters=2).count() == 0


def test_incremental_semantic_store_roundtrip(spark, tmp_path):
    """Drop 1 seeds the store (codebook + cluster-partitioned cells);
    drop 2 carries an exact copy of a stored vector, an in-batch
    duplicate pair, and a novel vector — matches come back with the
    right sources and without re-learning the codebook."""
    from haplorec_spark.operators.similarity import (
        incremental_semantic_pairs,
        write_semantic_store,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    drop1 = emb.filter(F.col("vec_id") < 200)
    centroids = kmeans_centroids(drop1, 4, 2)
    store = str(tmp_path / "sem_store")
    write_semantic_store(drop1, centroids, store, mode="overwrite")

    v5 = drop1.filter(F.col("vec_id") == 5).first()["embedding"]
    v300 = emb.filter(F.col("vec_id") == 300).first()["embedding"]
    drop2 = spark.createDataFrame(
        [
            (1005, v5),     # exact copy of stored vector 5
            (1300, v300),   # novel (not in store)
            (1301, v300),   # in-batch duplicate of 1300
        ],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r["vec_id_new"], r["vec_id_matched"], r["source"])
        for r in incremental_semantic_pairs(
            drop2, store, threshold=0.9999
        ).collect()
    }
    assert (1005, 5, "history") in got
    assert (1301, 1300, "batch") in got
    # the novel vector matches no history at this threshold
    assert not any(
        new == 1300 and src == "history" for new, _, src in got
    )

    # appending drop 2 advances the store: a re-sent 1005 now matches
    # BOTH 5 and 1005 from history
    write_semantic_store(drop2, centroids, store, mode="append")
    resend = spark.createDataFrame(
        [(2005, v5)], "vec_id long, embedding array<float>"
    )
    got2 = {
        (r["vec_id_new"], r["vec_id_matched"])
        for r in incremental_semantic_pairs(
            resend, store, threshold=0.9999
        ).collect()
    }
    assert {(2005, 5), (2005, 1005)} <= got2


def test_semantic_store_append_to_fresh_path_pins_codebook(spark, tmp_path):
    from haplorec_spark.operators.similarity import (
        incremental_semantic_pairs,
        write_semantic_store,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    ).filter(F.col("vec_id") < 100)
    centroids = kmeans_centroids(emb, 4, 1)
    store = str(tmp_path / "fresh_store")
    write_semantic_store(emb, centroids, store, mode="append")
    # the store is self-contained: incremental matching works
    v1 = emb.filter(F.col("vec_id") == 1).first()["embedding"]
    drop = spark.createDataFrame(
        [(901, v1)], "vec_id long, embedding array<float>"
    )
    got = {
        (r["vec_id_new"], r["vec_id_matched"])
        for r in incremental_semantic_pairs(
            drop, store, threshold=0.9999
        ).collect()
    }
    assert (901, 1) in got


def test_ann_recall_matches_python(spark):
    from haplorec_spark.operators.similarity import (
        ann_lsh_topk,
        ann_recall,
        brute_force_topk,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, probes, k=5)
    approx = ann_lsh_topk(emb, probes, k=5)
    got = {
        r["probe_id"]: (r["n_exact"], r["n_hit"], r["recall"])
        for r in ann_recall(approx, exact).collect()
    }
    e = {}
    for r in exact.collect():
        e.setdefault(r["probe_id"], set()).add(r["neighbor_id"])
    a = {}
    for r in approx.collect():
        a.setdefault(r["probe_id"], set()).add(r["neighbor_id"])
    assert set(got) == set(e)  # every probe appears, hitless included
    for p, (n_exact, n_hit, recall) in got.items():
        hits = len(e[p] & a.get(p, set()))
        assert (n_exact, n_hit) == (len(e[p]), hits)
        assert recall == round(hits / len(e[p]), 6)


def test_incremental_semantic_pairs_codebook_without_cells(spark, tmp_path):
    """A crash between the first batch's codebook write and its cells
    write must not wedge the stream: a store with a codebook but no
    cells path is EMPTY HISTORY — the batch dedups against itself and
    no AnalysisException escapes."""
    from haplorec_spark.operators.similarity import (
        incremental_semantic_pairs,
        kmeans_centroids,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    drop1 = emb.filter(F.col("vec_id") < 200)
    store = str(tmp_path / "wedged_store")
    # simulate the crash: codebook landed, cells never did
    kmeans_centroids(drop1, 4, 2).write.parquet(f"{store}/codebook")

    v5 = drop1.filter(F.col("vec_id") == 5).first()["embedding"]
    batch = spark.createDataFrame(
        [(1005, v5), (1006, v5)], "vec_id long, embedding array<float>"
    )
    got = {
        (r["vec_id_new"], r["vec_id_matched"], r["source"])
        for r in incremental_semantic_pairs(
            batch, store, threshold=0.9999
        ).collect()
    }
    assert got == {(1006, 1005, "batch")}  # in-batch only, no history


def test_semantic_store_append_uses_pinned_codebook(spark, tmp_path):
    """Appending with re-learned (different) centroids must assign the
    new cells with the STORED codebook, or incremental probes read the
    wrong cells and silently lose recall."""
    from haplorec_spark.operators.similarity import (
        assign_clusters,
        incremental_semantic_pairs,
        kmeans_centroids,
        write_semantic_store,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    drop1 = emb.filter(F.col("vec_id") < 200)
    pinned = kmeans_centroids(drop1, 4, 2)
    store = str(tmp_path / "pin_store")
    write_semantic_store(drop1, pinned, store, mode="overwrite")

    drop2 = emb.filter(
        (F.col("vec_id") >= 200) & (F.col("vec_id") < 300)
    )
    # a "wrong" re-learned codebook from the second drop alone
    relearned = kmeans_centroids(drop2, 4, 2)
    write_semantic_store(drop2, relearned, store, mode="append")

    cells = spark.read.parquet(f"{store}/cells")
    got = {
        (r["vec_id"], r["cluster"])
        for r in cells.filter(F.col("vec_id") >= 200)
        .select("vec_id", "cluster").collect()
    }
    want = {
        (r["vec_id"], r["cluster"])
        for r in assign_clusters(drop2, pinned).collect()
    }
    assert got == want  # pinned codebook, not the re-learned one

    # and a probe for a drop-2 vector still finds it through the store
    v250 = emb.filter(F.col("vec_id") == 250).first()["embedding"]
    probe = spark.createDataFrame(
        [(9250, v250)], "vec_id long, embedding array<float>"
    )
    got2 = {
        (r["vec_id_new"], r["vec_id_matched"], r["source"])
        for r in incremental_semantic_pairs(
            probe, store, threshold=0.9999
        ).collect()
    }
    assert (9250, 250, "history") in got2


def test_cell_profile_counts_and_pair_cost(spark):
    """cell_profile accounts every vector exactly once and its
    pair_cost is n(n-1)/2 per cell — matching what within_cell_pairs
    would evaluate."""
    from haplorec_spark.operators.similarity import (
        cell_profile,
        kmeans_centroids,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    cents = kmeans_centroids(emb, 4, 2)
    prof = cell_profile(emb, cents).collect()
    assert sum(r["n_vectors"] for r in prof) == emb.count()
    for r in prof:
        n = r["n_vectors"]
        assert r["pair_cost"] == n * (n - 1) // 2


def test_semantic_dedup_auto_k(spark):
    """n_clusters=None sizes k to floor(sqrt(n)) and still finds the
    seeded exact duplicates (recall survives auto-sizing)."""
    from haplorec_spark.operators.similarity import semantic_dedup_pairs

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    seeded = emb.unionByName(
        emb.filter(F.col("vec_id") < 10).select(
            (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
        )
    )
    got = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in semantic_dedup_pairs(
            seeded, threshold=0.9999, n_clusters=None
        ).collect()
    }
    # exact copies share a cell by construction (identical vectors)
    assert {(i, i + 100000) for i in range(10)} <= got


def test_pq_train_m1_equals_kmeans(spark):
    """A single-subspace PQ codebook IS the plain k-means codebook —
    same seeds, same iterations, same update rule."""
    from haplorec_spark.operators.similarity import pq_train

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(100)
    pq = {
        r["centroid_id"]: r["centroid"]
        for r in pq_trainer(emb).collect()
    }
    km = {
        r["centroid_id"]: r["centroid"]
        for r in kmeans_centroids(emb, 4, 2).collect()
    }
    assert pq == km


def pq_trainer(emb):
    from haplorec_spark.operators.similarity import pq_train

    return pq_train(emb, m=1, k=4, iterations=2).select(
        "centroid_id", "centroid"
    )


def test_pq_encode_centroid_vectors_get_their_code(spark):
    """A vector equal to a concatenation of per-subspace centroids
    encodes to exactly those centroid ids, and ADC distance to itself
    is 0."""
    from haplorec_spark.operators.similarity import (
        pq_encode,
        pq_topk,
        pq_train,
    )

    # 4 vectors, dim 4, m=2 -> subdim 2; k=4 so every subvector is a
    # seed centroid and k-means converges to the points themselves
    vecs = [
        (0, [0.0, 0.0, 10.0, 10.0]),
        (1, [1.0, 1.0, 11.0, 11.0]),
        (2, [2.0, 2.0, 12.0, 12.0]),
        (3, [3.0, 3.0, 13.0, 13.0]),
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    cb = pq_train(emb, m=2, k=4, iterations=2)
    codes = {
        r["vec_id"]: r["codes"] for r in pq_encode(emb, cb).collect()
    }
    assert codes == {0: [0, 0], 1: [1, 1], 2: [2, 2], 3: [3, 3]}
    # mixed vector: first half nearest seed 1, second half nearest seed 3
    probe = spark.createDataFrame(
        [(99, [1.1, 0.9, 12.8, 13.1])], "vec_id long, embedding array<double>"
    )
    got = pq_encode(probe, cb).first()["codes"]
    assert got == [1, 3]
    # ADC of an exact corpus point against its own codes is 0 (probe id
    # differs so it isn't excluded)
    same = spark.createDataFrame(
        [(99, [2.0, 2.0, 12.0, 12.0])], "vec_id long, embedding array<double>"
    )
    top = pq_topk(pq_encode(emb, cb), same, cb, k=1).first()
    assert top["neighbor_id"] == 2 and top["adc_dist2"] == 0.0


def test_pq_train_rejects_ragged_and_indivisible(spark):
    import pytest as _pytest

    from haplorec_spark.operators.similarity import pq_train

    bad_dim = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
    )
    with _pytest.raises(ValueError, match="not divisible"):
        pq_train(bad_dim, m=2, k=1, iterations=1)
    ragged = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0, 4.0]), (1, [1.0, 2.0])],
        "vec_id long, embedding array<double>",
    )
    with _pytest.raises(ValueError, match="fixed dimension"):
        pq_train(ragged, m=2, k=1, iterations=1)


def test_pq_topk_recall_improves_with_k(spark):
    """More centroids per subspace => finer quantization => ADC ranking
    closer to exact; recall@5 must not degrade when k grows 2 -> 16."""
    from haplorec_spark.operators.similarity import (
        ann_recall,
        pq_encode,
        pq_topk,
        pq_train,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 5)
    exact = brute_force_topk(emb, probes, k=5)

    def recall_at(kk):
        cb = pq_train(emb, m=4, k=kk, iterations=2)
        approx = pq_topk(pq_encode(emb, cb), probes, cb, k=5)
        rs = ann_recall(approx, exact).collect()
        return sum(r["recall"] for r in rs) / len(rs)

    assert recall_at(16) >= recall_at(2)


def test_ivf_pq_nprobe_all_cells_equals_pq_brute(spark):
    """nprobe = n_clusters makes IVF-PQ scan every cell: identical
    output to flat ADC over the whole corpus (same codebooks — both
    train from the same lowest-id seeds)."""
    from haplorec_spark.operators.similarity import (
        ivf_pq_topk,
        pq_encode,
        pq_topk,
        pq_train,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 5)
    full = ivf_pq_topk(
        emb, probes, k=5, n_clusters=4, nprobe=4, m=4, pq_k=8
    )
    cb = pq_train(emb, m=4, k=8, iterations=2)
    flat = pq_topk(pq_encode(emb, cb), probes, cb, k=5)
    assert sorted(map(tuple, full.collect())) == sorted(
        map(tuple, flat.collect())
    )


def test_ivf_pq_nprobe_recall_is_monotone(spark):
    """Probing more cells can only add candidates: recall of IVF-PQ
    against flat ADC must be non-decreasing in nprobe, reaching 1.0
    at nprobe = n_clusters."""
    from haplorec_spark.operators.similarity import (
        ann_recall,
        ivf_pq_topk,
        pq_encode,
        pq_topk,
        pq_train,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 5)
    cb = pq_train(emb, m=4, k=8, iterations=2)
    exact = pq_topk(pq_encode(emb, cb), probes, cb, k=5)

    def mean_recall(np_):
        approx = ivf_pq_topk(
            emb, probes, k=5, n_clusters=4, nprobe=np_, m=4, pq_k=8
        )
        rs = ann_recall(approx, exact).collect()
        return sum(r["recall"] for r in rs) / len(rs)

    r1, r2, r4 = mean_recall(1), mean_recall(2), mean_recall(4)
    assert r1 <= r2 <= r4
    assert r4 == 1.0


def test_pq_store_roundtrip_and_pruning(spark, tmp_path):
    """A persisted IVF-PQ store answers identically to the in-memory
    composition (same deterministic training), the codes scan is
    partition-pruned to the probed cells, and appended batches join
    the index under the pinned codebooks."""
    from haplorec_spark.operators.similarity import (
        ivf_pq_topk,
        pq_store_topk,
        write_pq_store,
    )

    store = str(tmp_path / "pq_store")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 5)
    write_pq_store(emb, store, n_clusters=4, m=4, pq_k=8)
    got = pq_store_topk(spark, store, probes, k=5, nprobe=2)
    want = ivf_pq_topk(
        emb, probes, k=5, n_clusters=4, nprobe=2, m=4, pq_k=8,
        iterations=2, pq_iterations=2,
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # the codes scan must prune to the probed cells' partitions
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster" in plan

    # append a shifted copy under the PINNED index: the new ids are
    # queryable and coded consistently (an exact copy of a corpus
    # vector ranks at its distance)
    shifted = emb.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    write_pq_store(shifted, store, mode="append")
    after = pq_store_topk(spark, store, probes, k=5, nprobe=4).collect()
    # probe 0's exact copy (100000) shares its cell and codes, so it
    # ranks first; its ADC distance is the probe's own quantization
    # error (ADC compares the exact probe to CODES), not 0
    top0 = [r for r in after if r["probe_id"] == 0 and r["rank"] == 1][0]
    assert top0["neighbor_id"] == 100000


def test_residual_pq_beats_flat_quantization(spark):
    """Residual codes spend the m x pq_k codebook on within-cell
    variance only: probing with exact copies of corpus vectors
    (shifted ids, nprobe = all cells), the rank-1 hit is the copy and
    its ADC distance IS the probe's quantization error — strictly
    lower on average than flat-PQ's."""
    from haplorec_spark.operators.similarity import ivf_pq_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )

    def mean_self_err(res):
        top = ivf_pq_topk(
            emb, probes, k=1, n_clusters=4, nprobe=4, m=4, pq_k=8,
            residual=res,
        ).collect()
        # every probe's nearest code is its own copy's
        assert all(r["neighbor_id"] == r["probe_id"] - 100000 for r in top)
        return sum(r["adc_dist2"] for r in top) / len(top)

    assert mean_self_err(True) < mean_self_err(False)


def test_pq_store_residual_flag_persists(spark, tmp_path):
    """A residual store answers like the in-memory residual
    composition, and appends follow the STORED mode even when the
    caller passes a different flag."""
    from haplorec_spark.operators.similarity import (
        ivf_pq_topk,
        pq_store_topk,
        write_pq_store,
    )

    store = str(tmp_path / "pq_res_store")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 5)
    write_pq_store(emb, store, n_clusters=4, m=4, pq_k=8, residual=True)
    got = pq_store_topk(spark, store, probes, k=5, nprobe=2)
    want = ivf_pq_topk(
        emb, probes, k=5, n_clusters=4, nprobe=2, m=4, pq_k=8,
        residual=True,
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # append with residual=False: the stored True wins, so an exact
    # copy of vec 2 still encodes to vec 2's codes and ranks first
    write_pq_store(
        emb.filter(F.col("vec_id") == 2).select(
            (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
        ),
        store, mode="append", residual=False,
    )
    probe2 = emb.filter(F.col("vec_id") == 2)
    top = pq_store_topk(spark, store, probe2, k=1, nprobe=4).first()
    assert top["neighbor_id"] == 100002


def test_pq_empty_corpus_edges(spark):
    """Empty corpus: ivf_pq_topk returns an empty result (no index, no
    neighbors), pq_encode refuses an empty codebook loudly, and
    write_pq_store refuses to build an index from nothing."""
    import pytest as _pytest

    from haplorec_spark.operators.similarity import (
        ivf_pq_topk,
        pq_encode,
        pq_train,
        write_pq_store,
    )

    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<double>"
    )
    probes = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0, 4.0])], "vec_id long, embedding array<double>"
    )
    out = ivf_pq_topk(empty, probes, k=3, m=2, pq_k=2)
    assert out.count() == 0
    assert out.columns == ["probe_id", "neighbor_id", "adc_dist2", "rank"]
    with _pytest.raises(ValueError, match="non-empty codebook"):
        pq_encode(probes, pq_train(empty, m=2, k=2))
    with _pytest.raises(ValueError, match="empty corpus"):
        write_pq_store(empty, "/tmp/should_never_write_pq")


# -------------------------------------------------------- exact refine stage


def test_refine_recovers_exact_topk_from_pq_shortlist(spark):
    """Retrieve a wide ADC shortlist, refine with exact L2: the result
    must equal exact L2 top-k whenever the shortlist contains it (here
    the shortlist is the whole corpus, so always)."""
    from haplorec_spark.operators.similarity import (
        pq_encode,
        pq_topk,
        pq_train,
        refine_topk,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 5)
    cb = pq_train(emb, m=4, k=4, iterations=2)
    shortlist = pq_topk(
        pq_encode(emb, cb), probes, cb, k=emb.count()
    )
    got = sorted(
        tuple(r)
        for r in refine_topk(shortlist, emb, probes, k=5).collect()
    )
    # exact L2 reference in DuckDB over the same parquet
    import duckdb

    con = duckdb.connect()
    con.execute(
        "create view emb as select vec_id, "
        "list_transform(embedding, x -> x::DOUBLE) v from "
        f"read_parquet('{SF}/embeddings.parquet')"
    )
    want = sorted(
        tuple(t)
        for t in con.execute(
            """
            SELECT probe_id, neighbor_id, dist2, rank FROM (
                SELECT p.vec_id AS probe_id, x.vec_id AS neighbor_id,
                       round(list_reduce(list_transform(
                           generate_series(1, len(p.v)),
                           i -> (p.v[i] - x.v[i]) * (p.v[i] - x.v[i])),
                           (a, b) -> a + b), 6) AS dist2,
                       row_number() OVER (PARTITION BY p.vec_id
                           ORDER BY round(list_reduce(list_transform(
                               generate_series(1, len(p.v)),
                               i -> (p.v[i] - x.v[i]) * (p.v[i] - x.v[i])),
                               (a, b) -> a + b), 6), x.vec_id) AS rank
                FROM emb p JOIN emb x ON p.vec_id < 5
                     AND p.vec_id <> x.vec_id)
            WHERE rank <= 5
            """
        ).fetchall()
    )
    assert got == want


def test_refine_cosine_matches_brute_force(spark):
    """Cosine refine over a full-corpus shortlist reproduces
    brute_force_topk exactly; the forced-shuffle path agrees."""
    from haplorec_spark.operators.similarity import refine_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 4)
    wide = brute_force_topk(emb, probes, k=emb.count())
    want = sorted(
        tuple(r) for r in brute_force_topk(emb, probes, k=5).collect()
    )
    got = sorted(
        tuple(r)
        for r in refine_topk(
            wide, emb, probes, k=5, metric="cosine"
        ).collect()
    )
    assert got == want
    shuffled = sorted(
        tuple(r)
        for r in refine_topk(
            wide, emb, probes, k=5, metric="cosine",
            max_broadcast_candidates=0,
        ).collect()
    )
    assert shuffled == want


def test_refine_rejects_bad_metric(spark):
    from haplorec_spark.operators.similarity import refine_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="metric"):
        refine_topk(emb.limit(1), emb, emb.limit(1), metric="dot")


def test_ann_recall_summary_matches_per_probe(spark):
    """The one-row overall face: micro = total hits / total exact,
    macro = mean per-probe recall — pinned against ann_recall's
    per-probe frame computed in Python."""
    import pytest

    from haplorec_spark.operators.similarity import (
        ann_lsh_topk,
        ann_recall,
        ann_recall_summary,
        brute_force_topk,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 10)
    approx = ann_lsh_topk(emb, probes, k=5)
    exact = brute_force_topk(emb, probes, k=5)
    per = ann_recall(approx, exact).collect()
    (row,) = ann_recall_summary(approx, exact).collect()
    assert row["n_probes"] == len(per)
    assert row["n_exact"] == sum(r["n_exact"] for r in per)
    assert row["n_hit"] == sum(r["n_hit"] for r in per)
    assert row["micro_recall"] == pytest.approx(
        round(sum(r["n_hit"] for r in per)
              / sum(r["n_exact"] for r in per), 6), abs=1e-9
    )
    assert row["macro_recall"] == pytest.approx(
        round(sum(r["recall"] for r in per) / len(per), 6), abs=1e-6
    )


# ------------------------------------------------- scalar quantization (SQ8)

def test_sq_roundtrip_error_bounded(spark):
    """Midpoint reconstruction error is at most half a bucket width
    per dimension: |x - decode(code)| <= (hi - lo)/512."""
    import math

    from haplorec_spark.operators.similarity import (
        _sq_bounds_lists,
        sq_encode,
        sq_train,
    )

    rows = [
        (i, [math.sin(i * 0.7 + d) * (d + 1) for d in range(8)])
        for i in range(50)
    ]
    emb = spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<DOUBLE>")
    bounds = sq_train(emb)
    los, his = _sq_bounds_lists(bounds)
    coded = {
        r["vec_id"]: r["codes"]
        for r in sq_encode(emb, bounds).collect()
    }
    for vid, vec in rows:
        for d, x in enumerate(vec):
            code = coded[vid][d]
            assert 0 <= code <= 255
            width = his[d] - los[d]
            decoded = los[d] + (code + 0.5) * width / 256.0
            assert abs(x - decoded) <= width / 512.0 + 1e-12


def test_sq_degenerate_dimension_codes_zero(spark):
    from haplorec_spark.operators.similarity import sq_encode, sq_train

    emb = spark.createDataFrame(
        [(1, [3.0, 1.0]), (2, [3.0, 2.0])],
        "vec_id INT, embedding ARRAY<DOUBLE>",
    )
    out = {
        r["vec_id"]: r["codes"]
        for r in sq_encode(emb, sq_train(emb)).collect()
    }
    # dim 0 is constant: hi == lo -> code 0 on every vector, no NaN
    assert out[1][0] == 0 and out[2][0] == 0
    assert out[1][1] == 0 and out[2][1] == 255  # lo -> 0, hi -> 255


def test_sq_encode_ragged_short_vector_codes_zero(spark):
    """A vector shorter than the trained dim must quantize its missing
    dimensions to code 0 — under the default ANSI mode too, where a
    plain element_at past the end would raise
    INVALID_ARRAY_INDEX_IN_ELEMENT_AT (try_element_at yields NULL, the
    coalesce folds it to 0). Pins the ragged tolerance the sq_encode
    docstring promises."""
    from haplorec_spark.operators.similarity import sq_encode

    emb = spark.createDataFrame(
        [(1, [0.5, 0.5, 0.5]), (2, [1.0])],
        "vec_id INT, embedding ARRAY<DOUBLE>",
    )
    out = {
        r["vec_id"]: r["codes"]
        for r in sq_encode(
            emb, ([0.0, 0.0, 0.0], [1.0, 1.0, 1.0])
        ).collect()
    }
    assert out[1] == [128, 128, 128]
    assert out[2] == [255, 0, 0]  # dims 1-2 missing -> code 0


def test_sq_topk_matches_exact_on_separable_data(spark):
    """With vectors far apart relative to bucket width, SQ8 ADC must
    reproduce the exact L2 ranking."""
    from haplorec_spark.operators.similarity import (
        sq_encode,
        sq_topk,
        sq_train,
    )

    rows = [(i, [float(i), float(100 - i)]) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<DOUBLE>")
    bounds = sq_train(emb)
    got = sq_topk(
        sq_encode(emb, bounds), emb.filter("vec_id = 15"), bounds, k=4
    ).collect()
    assert [r["neighbor_id"] for r in sorted(got, key=lambda r: r["rank"])] \
        in ([14, 16, 13, 17], [16, 14, 17, 13])


def test_sq_encode_is_map_side(spark):
    from haplorec_spark.operators.similarity import sq_encode

    emb = spark.createDataFrame(
        [(1, [0.1, 0.2])], "vec_id INT, embedding ARRAY<DOUBLE>"
    )
    plan = (
        sq_encode(emb, ([0.0, 0.0], [1.0, 1.0]))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_sq_recall_near_exact_at_4x_compression(spark):
    """On the real sf0.001 embeddings, SQ8's top-10 by ADC must agree
    with exact L2 top-10 on >= 9 of 10 neighbors averaged over probes
    — the 'near-exact recall at 4x' claim the ladder docstring makes."""
    import numpy as np

    from haplorec_spark.operators.similarity import (
        sq_encode,
        sq_topk,
        sq_train,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    bounds = sq_train(emb)
    probes = emb.filter("vec_id < 10")
    got = sq_topk(sq_encode(emb, bounds), probes, bounds, k=10).collect()
    by_probe = {}
    for r in got:
        by_probe.setdefault(r["probe_id"], set()).add(r["neighbor_id"])

    rows = emb.collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    hits = total = 0
    for pid in by_probe:
        pv = mat[ids == pid][0]
        d2 = ((mat - pv) ** 2).sum(axis=1)
        d2[ids == pid] = np.inf
        exact = set(ids[np.argsort(d2, kind="stable")[:10]].tolist())
        hits += len(exact & by_probe[pid])
        total += 10
    assert hits / total >= 0.9, hits / total


def test_ivf_sq_full_probe_reproduces_flat_sq(spark):
    """nprobe = n_clusters with flat (non-residual) bounds must equal
    sq_topk over the full corpus — the family's pinned invariant."""
    from haplorec_spark.operators.similarity import (
        ivf_sq_topk,
        sq_encode,
        sq_topk,
        sq_train,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).filter("vec_id < 200")
    probes = emb.filter("vec_id < 5")
    bounds = sq_train(emb)
    flat = sorted(
        tuple(r)
        for r in sq_topk(sq_encode(emb, bounds), probes, bounds, k=5).collect()
    )
    ivf = sorted(
        tuple(r)
        for r in ivf_sq_topk(
            emb, probes, k=5, n_clusters=4, nprobe=4, residual=False
        ).collect()
    )
    assert ivf == flat


def test_ivf_sq_residual_tightens_quantization(spark):
    """Residual bounds span the within-cell range only, so ADC
    distances sit closer to the exact distances (the reason the FAISS
    IVF-SQ shape exists) — measured, not assumed."""
    import numpy as np

    from haplorec_spark.operators.similarity import ivf_sq_topk

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).filter("vec_id < 300")
    probes = emb.filter("vec_id < 5")
    rows = emb.collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)

    def mean_err(residual):
        got = ivf_sq_topk(
            emb, probes, k=10, n_clusters=4, nprobe=4, residual=residual
        ).collect()
        errs = []
        for r in got:
            pv = mat[ids == r["probe_id"]][0]
            nv = mat[ids == r["neighbor_id"]][0]
            exact = float(((pv - nv) ** 2).sum())
            errs.append(abs(r["adc_dist2"] - exact))
        return sum(errs) / len(errs)

    assert mean_err(True) < mean_err(False)


def test_sq_store_roundtrip_pruning_and_append(spark, tmp_path):
    """A persisted IVF-SQ store answers identically to the in-memory
    composition, the codes scan is partition-pruned to the probed
    cells, and appends follow the pinned centroids/bounds."""
    from haplorec_spark.operators.similarity import (
        ivf_sq_topk,
        sq_store_topk,
        write_sq_store,
    )

    store = str(tmp_path / "sq_store")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 5)
    write_sq_store(emb, store, n_clusters=4)
    got = sq_store_topk(spark, store, probes, k=5, nprobe=2)
    want = ivf_sq_topk(emb, probes, k=5, n_clusters=4, nprobe=2)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster" in plan

    shifted = emb.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    write_sq_store(shifted, store, mode="append")
    after = sq_store_topk(spark, store, probes, k=5, nprobe=4).collect()
    top0 = [r for r in after if r["probe_id"] == 0 and r["rank"] == 1][0]
    # the exact copy shares cell and codes: rank 1 at the probe's own
    # quantization error
    assert top0["neighbor_id"] == 100000


def test_sq_store_residual_flag_persists(spark, tmp_path):
    from haplorec_spark.operators.similarity import (
        ivf_sq_topk,
        sq_store_topk,
        write_sq_store,
    )

    store = str(tmp_path / "sq_res_store")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 5)
    write_sq_store(emb, store, n_clusters=4, residual=True)
    got = sq_store_topk(spark, store, probes, k=5, nprobe=2)
    want = ivf_sq_topk(
        emb, probes, k=5, n_clusters=4, nprobe=2, residual=True
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # append claiming residual=False: the STORED True wins — an exact
    # copy of vec 2 encodes to vec 2's codes and ranks first
    write_sq_store(
        emb.filter(F.col("vec_id") == 2).select(
            (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
        ),
        store, mode="append", residual=False,
    )
    after = sq_store_topk(
        spark, store, emb.filter(F.col("vec_id") == 2), k=1, nprobe=4
    ).collect()
    assert after[0]["neighbor_id"] == 100002


# ------------------------------------- store maintenance under drift

import pytest  # noqa: E402


def _blob(center, n, start_id, spread=1.0, dim=16):
    import random

    rng = random.Random(start_id)  # deterministic per blob
    return [
        (
            start_id + i,
            [center[d] + rng.uniform(-spread, spread) for d in range(dim)],
        )
        for i in range(n)
    ]


def test_store_cell_stats_counts_and_empty_cells(spark, tmp_path):
    from haplorec_spark.operators.similarity import (
        store_cell_stats,
        write_pq_store,
    )

    dim = 16
    rows = _blob([0.0] * dim, 40, 0) + _blob([10.0] * dim, 20, 1000)
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    store = str(tmp_path / "pq")
    write_pq_store(emb, store, n_clusters=4, m=4, pq_k=8)
    stats = {
        r["cluster"]: (r["n_codes"], r["skew"])
        for r in store_cell_stats(spark, store).collect()
    }
    assert len(stats) == 4  # every pinned cell reported, filled or not
    assert sum(n for n, _ in stats.values()) == 60
    for n, skew in stats.values():
        assert skew == pytest.approx(round(n * 4 / 60, 6), abs=1e-9)


def test_compact_pq_store_parity_and_layout(spark, tmp_path):
    """Compaction must preserve query results exactly and fold the
    streaming store's ingest_batch partitions into one (-1) while
    keeping the partition depth (later batches still append)."""
    from haplorec_spark.operators.similarity import (
        compact_pq_store,
        pq_store_topk,
    )
    from haplorec_spark.streaming import stream_pq_index_ingest

    dim = 16
    rows = _blob([0.0] * dim, 60, 0) + _blob([8.0] * dim, 60, 1000)
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    emb.filter("vec_id < 500").coalesce(1).write.mode("append").parquet(src)
    q = stream_pq_index_ingest(
        spark.readStream.schema(emb.schema).parquet(src),
        store_path=store, checkpoint_dir=str(tmp_path / "ck"),
        n_clusters=2, m=4, pq_k=8,
    )
    q.awaitTermination()
    emb.filter("vec_id >= 500").coalesce(1).write.mode("append").parquet(src)
    q = stream_pq_index_ingest(
        spark.readStream.schema(emb.schema).parquet(src),
        store_path=store, checkpoint_dir=str(tmp_path / "ck"),
        n_clusters=2, m=4, pq_k=8,
    )
    q.awaitTermination()

    probes = emb.filter("vec_id in (3, 1004)")
    before = sorted(
        map(tuple, pq_store_topk(spark, store, probes, k=5).collect())
    )
    compact_pq_store(spark, store)
    after = sorted(
        map(tuple, pq_store_topk(spark, store, probes, k=5).collect())
    )
    assert after == before
    codes = spark.read.parquet(f"{store}/codes")
    assert [
        r["ingest_batch"]
        for r in codes.select("ingest_batch").distinct().collect()
    ] == [-1]


def test_rebalance_recovers_recall_after_drift(spark, tmp_path):
    """The r9-verdict drift scenario end-to-end: stream a shifted
    distribution into a pinned IVF-PQ store (residual mode), watch
    recall@10 collapse (the drifted mass piles into one frozen cell
    whose centroid is far away, so residual codes lose all
    resolution), rebalance, watch it recover — with cold cells
    untouched and no member lost."""
    from pyspark.sql import functions as F

    from haplorec_spark.operators.similarity import (
        brute_force_topk,
        compact_pq_store,
        pq_store_topk,
        rebalance_pq_store,
        store_cell_stats,
    )
    from haplorec_spark.streaming import stream_pq_index_ingest

    dim = 16
    init = _blob([0.0] * dim, 150, 0) + _blob([10.0] * dim, 150, 1000)
    drift = _blob([25.0] * dim, 400, 5000, spread=3.0)
    init_df = spark.createDataFrame(
        init, "vec_id long, embedding array<double>"
    )
    drift_df = spark.createDataFrame(
        drift, "vec_id long, embedding array<double>"
    )
    all_df = init_df.unionByName(drift_df)
    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    init_df.coalesce(1).write.mode("append").parquet(src)
    kw = dict(
        store_path=store, checkpoint_dir=str(tmp_path / "ck"),
        n_clusters=4, m=4, pq_k=16, residual=True,
    )
    stream_pq_index_ingest(
        spark.readStream.schema(init_df.schema).parquet(src), **kw
    ).awaitTermination()
    drift_df.coalesce(1).write.mode("append").parquet(src)
    stream_pq_index_ingest(
        spark.readStream.schema(init_df.schema).parquet(src), **kw
    ).awaitTermination()

    probes = drift_df.filter("vec_id < 5050")

    def recall_at_10():
        exact: dict = {}
        for r in brute_force_topk(all_df, probes, k=10).collect():
            exact.setdefault(r["probe_id"], set()).add(r["neighbor_id"])
        got: dict = {}
        for r in pq_store_topk(spark, store, probes, k=10).collect():
            got.setdefault(r["probe_id"], set()).add(r["neighbor_id"])
        recs = [
            len(exact[p] & got.get(p, set())) / len(exact[p]) for p in exact
        ]
        return sum(recs) / len(recs)

    stats = {
        r["cluster"]: r["n_codes"]
        for r in store_cell_stats(spark, store).collect()
    }
    hot = max(stats, key=stats.get)
    assert stats[hot] >= 400  # the drifted mass piled into one cell
    degraded = recall_at_10()
    assert degraded < 0.1

    compact_pq_store(spark, store)
    out = rebalance_pq_store(
        all_df, store, skew_threshold=1.5, split_factor=4
    )
    assert out["split_cells"] == [hot]
    assert out["n_reencoded"] == stats[hot]
    after = {
        r["cluster"]: r["n_codes"]
        for r in store_cell_stats(spark, store).collect()
    }
    # cold cells untouched; no member lost
    for c, n in stats.items():
        if c != hot:
            assert after[c] == n
    assert sum(after.values()) == sum(stats.values())
    recovered = recall_at_10()
    assert recovered > degraded + 0.25

    # --- the rebuild rung (round-11): full re-train + re-encode must
    # reach the FRESH-BUILD recall ceiling exactly — rebuild trains on
    # the same corpus with the same deterministic k-means init as a
    # fresh write, so the rebuilt store and a from-scratch store are
    # the same index. This is the measured when-to-escalate rule: the
    # split repair recovers part of the gap cheaply, the rebuild
    # closes it.
    from haplorec_spark.operators.similarity import (
        rebuild_pq_store,
        write_pq_store,
    )

    out = rebuild_pq_store(all_df, store)
    assert out["residual"] is True and out["m"] == 4 and out["pq_k"] == 16
    rebuilt = recall_at_10()
    assert rebuilt >= recovered - 1e-9

    fresh = str(tmp_path / "fresh")
    write_pq_store(
        all_df, fresh,
        n_clusters=out["n_cells"], m=4, pq_k=16, residual=True,
    )
    got_fresh: dict = {}
    for r in pq_store_topk(spark, fresh, probes, k=10).collect():
        got_fresh.setdefault(r["probe_id"], set()).add(r["neighbor_id"])
    truth: dict = {}
    for r in brute_force_topk(all_df, probes, k=10).collect():
        truth.setdefault(r["probe_id"], set()).add(r["neighbor_id"])
    fresh_recall = sum(
        len(truth[p] & got_fresh.get(p, set())) / len(truth[p])
        for p in truth
    ) / len(truth)
    assert rebuilt == pytest.approx(fresh_recall, abs=1e-9)

    # streaming layout preserved: rebuilt codes live in ingest_batch=-1
    codes = spark.read.parquet(f"{store}/codes")
    assert [
        r["ingest_batch"]
        for r in codes.select("ingest_batch").distinct().collect()
    ] == [-1]
    assert codes.count() == all_df.count()


def test_rebuild_pq_store_catchup_backups_and_validation(spark, tmp_path):
    """Batch-layout rebuild: new corpus ids not yet in the store are
    indexed (a rebuild is also a catch-up), the old pinned tables are
    backed up to __prev, the staging dir is gone, and the honesty
    checks raise on a short corpus or a bad train_fraction."""
    from haplorec_spark.operators.similarity import (
        pq_store_topk,
        rebuild_pq_store,
        write_pq_store,
    )

    dim = 8
    rows = _blob([0.0] * dim, 30, 0, dim=dim) + _blob(
        [9.0] * dim, 30, 1000, dim=dim
    )
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    store = str(tmp_path / "pq")
    write_pq_store(emb, store, n_clusters=2, m=4, pq_k=8)

    with pytest.raises(ValueError, match="missing"):
        rebuild_pq_store(emb.filter("vec_id < 500"), store)
    with pytest.raises(ValueError, match="train_fraction"):
        rebuild_pq_store(emb, store, train_fraction=0.0)

    grown = emb.unionByName(
        spark.createDataFrame(
            _blob([4.5] * dim, 5, 7000, dim=dim),
            "vec_id long, embedding array<double>",
        )
    )
    out = rebuild_pq_store(grown, store, n_clusters=3)
    assert out == {"n_cells": 3, "m": 4, "pq_k": 8, "residual": False}
    codes = spark.read.parquet(f"{store}/codes")
    assert codes.count() == 65  # catch-up: the 5 new ids are indexed
    assert spark.read.parquet(f"{store}/centroids").count() == 3
    assert spark.read.parquet(f"{store}/centroids__prev").count() == 2
    assert spark.read.parquet(f"{store}/codebooks__prev").count() > 0
    import os

    assert not os.path.exists(f"{store}/rebuild__pending")
    probe = grown.filter("vec_id = 7000")
    got = pq_store_topk(spark, store, probe, k=3).collect()
    assert {r["neighbor_id"] for r in got} <= set(range(7000, 7005)) | set(
        range(0, 30)
    ) | set(range(1000, 1030))
    assert len(got) == 3


def test_rebuild_sq_store_reaches_fresh_build(spark, tmp_path):
    """SQ rung: rebuild re-trains centroids AND bounds and equals a
    fresh build's answers on the same corpus."""
    from haplorec_spark.operators.similarity import (
        rebuild_sq_store,
        sq_store_topk,
        write_sq_store,
    )

    dim = 8
    rows = _blob([0.0] * dim, 40, 0, dim=dim) + _blob(
        [9.0] * dim, 40, 1000, dim=dim
    ) + _blob([20.0] * dim, 40, 3000, dim=dim)
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    store = str(tmp_path / "sq")
    fresh = str(tmp_path / "sq_fresh")
    # stale store: trained on the first blob only, then appended
    write_sq_store(emb.filter("vec_id < 100"), store, n_clusters=3,
                   residual=True)
    write_sq_store(emb.filter("vec_id >= 100"), store, mode="append")
    out = rebuild_sq_store(emb, store)
    assert out == {"n_cells": 3, "residual": True}
    write_sq_store(emb, fresh, n_clusters=3, residual=True)
    probes = emb.filter("vec_id in (5, 1005, 3005)")
    got = sorted(
        map(tuple, sq_store_topk(spark, store, probes, k=4).collect())
    )
    want = sorted(
        map(tuple, sq_store_topk(spark, fresh, probes, k=4).collect())
    )
    assert got == want


def test_rebalance_requires_compaction_and_full_corpus(spark, tmp_path):
    from haplorec_spark.operators.similarity import (
        rebalance_pq_store,
        write_pq_store,
    )

    dim = 8
    rows = _blob([0.0] * dim, 30, 0, dim=dim) + _blob(
        [9.0] * dim, 150, 1000, dim=dim
    )
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    store = str(tmp_path / "pq")
    write_pq_store(emb, store, n_clusters=2, m=4, pq_k=8)
    with pytest.raises(ValueError, match="missing"):
        rebalance_pq_store(
            emb.filter("vec_id < 500"), store,
            skew_threshold=1.2, split_factor=2,
        )


def test_rebalance_member_read_is_partition_pruned(spark, tmp_path):
    """The hot-cell member read inside rebalance is the codes scan
    filtered on the partition column — assert the physical plan prunes
    partitions rather than filtering after a full scan (the verdict's
    plan-assert for the re-encode path)."""
    from pyspark.sql import functions as F

    from haplorec_spark.operators.similarity import write_pq_store

    dim = 8
    rows = _blob([0.0] * dim, 40, 0, dim=dim) + _blob(
        [9.0] * dim, 20, 1000, dim=dim
    )
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    store = str(tmp_path / "pq")
    write_pq_store(emb, store, n_clusters=4, m=4, pq_k=8)
    scan = (
        spark.read.parquet(f"{store}/codes")
        .filter(F.col("cluster").isin([0, 1]))
        .select("vec_id", "cluster")
    )
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster" in plan.split(
        "PartitionFilters"
    )[1][:200]


def test_rebalance_sq_store_recovers_recall(spark, tmp_path):
    """SQ-store twin of the drift test: residual-mode bounds trained
    pre-drift clamp the far cell's residuals into saturated codes;
    splitting the hot cell restores resolution. Cold cells untouched,
    no member lost."""
    from haplorec_spark.operators.similarity import (
        brute_force_topk,
        rebalance_sq_store,
        sq_store_topk,
        store_cell_stats,
        write_sq_store,
    )

    dim = 16
    init = _blob([0.0] * dim, 120, 0) + _blob([10.0] * dim, 120, 1000)
    drift = _blob([30.0] * dim, 300, 5000, spread=2.0)
    init_df = spark.createDataFrame(
        init, "vec_id long, embedding array<double>"
    )
    drift_df = spark.createDataFrame(
        drift, "vec_id long, embedding array<double>"
    )
    all_df = init_df.unionByName(drift_df)
    store = str(tmp_path / "sq")
    write_sq_store(init_df, store, n_clusters=4, residual=True)
    write_sq_store(drift_df, store, mode="append")

    probes = drift_df.filter("vec_id < 5030")

    def recall_at_10():
        exact: dict = {}
        for r in brute_force_topk(all_df, probes, k=10).collect():
            exact.setdefault(r["probe_id"], set()).add(r["neighbor_id"])
        got: dict = {}
        for r in sq_store_topk(spark, store, probes, k=10).collect():
            got.setdefault(r["probe_id"], set()).add(r["neighbor_id"])
        return sum(
            len(exact[p] & got.get(p, set())) / len(exact[p]) for p in exact
        ) / len(exact)

    stats = {
        r["cluster"]: r["n_codes"]
        for r in store_cell_stats(spark, store).collect()
    }
    hot = max(stats, key=stats.get)
    assert stats[hot] >= 300
    degraded = recall_at_10()
    out = rebalance_sq_store(
        all_df, store, skew_threshold=1.5, split_factor=4
    )
    assert out["split_cells"] == [hot]
    after = {
        r["cluster"]: r["n_codes"]
        for r in store_cell_stats(spark, store).collect()
    }
    for c, n in stats.items():
        if c != hot:
            assert after[c] == n
    assert sum(after.values()) == sum(stats.values())
    recovered = recall_at_10()
    assert recovered > degraded + 0.2, (degraded, recovered)


def test_rebuild_recovers_interrupted_promotion(spark, tmp_path):
    """promote_dir never deletes a table before its replacement lands:
    the worst crash state is a table renamed aside (__replaced). A
    rebuild on such a store must first restore the aside copy (so the
    store is readable again) and then rebuild normally; an aside left
    NEXT TO a live table (crash after rename-in) is cleared."""
    import os

    from haplorec_spark.operators.similarity import (
        pq_store_topk,
        rebuild_pq_store,
        write_pq_store,
    )

    dim = 8
    rows = _blob([0.0] * dim, 30, 0, dim=dim) + _blob(
        [9.0] * dim, 30, 1000, dim=dim
    )
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    store = str(tmp_path / "pq")
    write_pq_store(emb, store, n_clusters=2, m=4, pq_k=8)

    # crash state 1: codes renamed aside, new copy never landed
    os.rename(f"{store}/codes", f"{store}/codes__replaced")
    # crash state 2: stale aside next to a live table
    import shutil

    shutil.copytree(f"{store}/centroids", f"{store}/centroids__replaced")

    out = rebuild_pq_store(emb, store)
    assert out["n_cells"] == 2
    assert not os.path.exists(f"{store}/codes__replaced")
    assert not os.path.exists(f"{store}/centroids__replaced")
    got = pq_store_topk(spark, store, emb.filter("vec_id = 3"), k=3)
    assert got.count() == 3  # store fully functional after recovery


def test_promote_dir_keeps_old_until_new_lands(spark, tmp_path):
    """The aside-rename contract: promoting onto an existing dir never
    has a moment with neither copy on disk, and a missing staging dir
    raises without touching the live table."""
    import os

    import pytest as _pytest

    from haplorec_spark.operators.stores import promote_dir

    live = tmp_path / "t"
    live.mkdir()
    (live / "data.txt").write_text("old")
    stage = tmp_path / "t__new"
    stage.mkdir()
    (stage / "data.txt").write_text("new")

    promote_dir(spark, str(stage), str(live))
    assert (live / "data.txt").read_text() == "new"
    assert not os.path.exists(str(stage))
    assert not os.path.exists(str(live) + "__replaced")

    with _pytest.raises(IOError, match="missing"):
        promote_dir(spark, str(tmp_path / "absent"), str(live))
    assert (live / "data.txt").read_text() == "new"  # live untouched


def test_rebalance_multi_hot_cells_matches_sequential_procedure(
    spark, tmp_path
):
    """The grouped k-means that replaced the per-cell driver loop must
    reproduce the sequential procedure EXACTLY with several hot cells
    in one rebalance: per split cell, the surviving sub-centroids,
    id→cell assignment, and largest-sub-keeps-the-id rule are computed
    here with the original per-cell kmeans_centroids/assign_clusters
    calls and compared against the store the batched path wrote."""
    from pyspark.sql import functions as F

    from haplorec_spark.operators.similarity import (
        assign_clusters,
        kmeans_centroids,
        rebalance_pq_store,
        write_pq_store,
    )

    dim = 8
    # four far-apart blobs; ids 0..3 are one seed vector per blob so
    # the 4-cell k-means init lands one centroid in each blob — two
    # blobs are HOT (120 members, internally bimodal so the split is
    # non-trivial), two cold
    centers = ([0.0] * dim, [40.0] * dim, [100.0] * dim, [-100.0] * dim)
    rows = [(i, list(c)) for i, c in enumerate(centers)]
    rows += _blob([0.0] * dim, 60, 100, dim=dim)
    rows += _blob([6.0] * dim, 60, 1000, dim=dim)       # hot cell 0's far mode
    rows += _blob([40.0] * dim, 60, 10000, dim=dim)
    rows += _blob([46.0] * dim, 60, 15000, dim=dim)     # hot cell 1's far mode
    rows += _blob([100.0] * dim, 5, 20000, dim=dim)
    rows += _blob([-100.0] * dim, 5, 25000, dim=dim)
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    store = str(tmp_path / "pq")
    write_pq_store(emb, store, n_clusters=4, m=4, pq_k=8)

    from haplorec_spark.operators.similarity import store_cell_stats

    before = {
        r["cluster"]: r["n_codes"]
        for r in store_cell_stats(spark, store).collect()
    }
    hot = sorted(c for c, n in before.items() if n >= 100)
    assert len(hot) >= 2, before  # the scenario must produce >=2 hot cells

    codes_before = spark.read.parquet(f"{store}/codes").select(
        "vec_id", "cluster"
    ).collect()
    cell_of = {r["vec_id"]: r["cluster"] for r in codes_before}

    out = rebalance_pq_store(
        emb, store, skew_threshold=1.5, split_factor=2, iterations=2
    )
    assert sorted(out["split_cells"]) == hot

    # sequential replica: per hot cell, kmeans + assign + the
    # largest-keeps-id rule — must equal the store's new assignment
    got_cells = {
        r["vec_id"]: r["cluster"]
        for r in spark.read.parquet(f"{store}/codes")
        .select("vec_id", "cluster")
        .collect()
    }
    new_ids = iter(sorted(out["new_cells"]))
    for c in hot:
        ids = [v for v, cc in cell_of.items() if cc == c]
        cell_members = emb.filter(F.col("vec_id").isin(ids))
        sub = kmeans_centroids(cell_members, 2, 2)
        local = {
            r["vec_id"]: r["cluster"]
            for r in assign_clusters(cell_members, sub).collect()
        }
        sizes = {}
        for v in local.values():
            sizes[v] = sizes.get(v, 0) + 1
        order = sorted(sizes, key=lambda s: -sizes[s])
        mapping = {order[0]: c}
        for sid in order[1:]:
            mapping[sid] = next(new_ids)
        for v, sid in local.items():
            assert got_cells[v] == mapping[sid], (c, v)


def test_store_health_goldens_on_measured_drift_states():
    """The escalation rule on the MEASURED drift states (SCALE.md
    r10/r11 ladder), driven through the pure decision half so the
    goldens pin the rule itself: balanced fresh store → ok; the r10
    drift state (454 of 700 codes in one skew-2.59 cell — where
    rebalance plateaued at 0.286 recall and rebuild reached the 0.318
    ceiling) → rebuild; a hot minority cell → rebalance; balanced with
    per-batch file litter → compact; a half-starved store → rebuild."""
    from haplorec_spark.operators.similarity import _store_health_decision

    kw = dict(
        skew_threshold=2.0, hot_mass_threshold=0.5,
        empty_fraction_threshold=0.5, files_per_cell_threshold=8.0,
    )

    def cells(counts):
        total = sum(counts) or 1
        k = len(counts)
        return [(n, n / total, n * k / total) for n in counts]

    fresh = _store_health_decision(cells([175, 175, 175, 175]), 4, **kw)
    assert fresh.recommendation == "ok" and fresh.reasons == ()

    # the r10 scenario: drifted mass piled into one frozen cell
    drifted = _store_health_decision(cells([82, 84, 80, 454]), 4, **kw)
    assert drifted.recommendation == "rebuild"
    assert drifted.max_skew == round(454 * 4 / 700, 6)  # 2.594286
    assert drifted.hot_mass == round(454 / 700, 6)      # 0.648571
    assert "hot_mass" in drifted.reasons[0]

    # hot cell holding a MINORITY of the mass: split repair suffices
    warm = _store_health_decision(
        cells([100, 100, 100, 100, 100, 100, 100, 300]), 8, **kw
    )
    assert warm.recommendation == "rebalance"
    assert warm.hot_mass == 0.3

    # balanced but littered with per-batch files
    littered = _store_health_decision(cells([100, 100, 100, 100]), 40, **kw)
    assert littered.recommendation == "compact"
    assert littered.files_per_cell == 10.0

    # half the cells starved: the training distribution is gone
    starved = _store_health_decision(cells([500, 500, 0, 0]), 4, **kw)
    assert starved.recommendation == "rebuild"
    assert starved.empty_fraction == 0.5


def test_store_health_reads_a_real_store(spark, tmp_path):
    """End-to-end on a freshly written IVF-PQ store: the advisor reads
    only metadata (cell stats + file listing) and reports ok with the
    true cell/code/file counts."""
    from haplorec_spark.operators.similarity import (
        store_health,
        write_pq_store,
    )

    dim = 16
    rows_ = (
        _blob([0.0] * dim, 50, 0)
        + _blob([10.0] * dim, 50, 1000)
        + _blob([-10.0] * dim, 50, 2000)
    )
    corpus = spark.createDataFrame(
        rows_, "vec_id long, embedding array<double>"
    )
    path = str(tmp_path / "health_store")
    write_pq_store(corpus, path, n_clusters=3, m=4, pq_k=16)
    h = store_health(spark, path)
    assert h.recommendation == "ok"
    assert h.n_cells == 3
    assert h.n_codes == 150
    assert h.n_files >= 3
    assert h.reasons == ()


def test_round6_helper_matches_spark_round(spark):
    """_round6_like_spark must reproduce F.round(x, 6) on doubles —
    including the decimal-repr half-up boundaries where np.round
    (half-even on a scaled binary intermediate) differs, and the
    non-finite passthroughs. This is the rounding contract the
    within-cell Arrow kernel rides."""
    import math

    import numpy as np

    from haplorec_spark.operators.similarity import _round6_like_spark

    vals = [
        0.1234565, 0.1234575, 0.12345650000000001, 0.1234564999999999,
        0.9999995, 0.99999949999999994, 1.0000005, -0.1234565,
        0.8, 0.7999995, 0.80000049999, 0.5e-6, 1.5e-6, 2.5e-6,
        0.0, -0.0, 1.0, -1.0,
        float("nan"), float("inf"), float("-inf"),
    ]
    expected = [
        r["r"]
        for r in spark.createDataFrame([(v,) for v in vals], "x double")
        .selectExpr("round(x, 6) as r")
        .collect()
    ]
    got = _round6_like_spark(np.array(vals, dtype=np.float64))
    for v, e, g in zip(vals, expected, got):
        if isinstance(e, float) and math.isnan(e):
            assert math.isnan(g), v
        else:
            assert g == e, (v, e, float(g))


def test_within_cell_pairs_matches_join_spelling_on_edges(spark):
    """The round-12 grouped Arrow kernel must be row-identical to the
    former cluster-keyed HOF self-join on every edge the join's
    semantics defined: ragged lengths (NULL dot, dropped), NULL
    vector / NULL id / NULL element (never pair), duplicate ids
    (strict a < b), zero-norm pairs (zero divisor -> NULL under
    ansi=false, dropped; the join ERRORS under ansi=true, so the
    kernel's drop is the one total mode-neutral reading), NaN
    elements (NaN divisor divides IEEE -> NaN cosine, KEPT: Spark
    orders NaN above every double), empty vectors, nprobe fan-out.
    The kernel must also be ANSI-invariant."""
    import math

    from haplorec_spark.operators.similarity import (
        _collect_codebook,
        _project_with_cells,
        within_cell_pairs,
    )

    def old_join_spelling(vectors, centroids, *, threshold, nprobe=1):
        with_cell = _project_with_cells(
            vectors, _collect_codebook(centroids),
            vec_col="embedding", id_col="vec_id", nprobe=nprobe,
        )
        a = with_cell.select(
            F.col("vec_id").alias("vec_id_a"),
            F.col("embedding").alias("va"), F.col("nrm").alias("na"),
            "cluster")
        b = with_cell.select(
            F.col("vec_id").alias("vec_id_b"),
            F.col("embedding").alias("vb"), F.col("nrm").alias("nb"),
            "cluster")
        dot = F.expr(
            "aggregate(zip_with(va, vb, (x, y) ->"
            " cast(x as double) * cast(y as double)),"
            " cast(0.0 as double), (acc, v) -> acc + v)")
        scored = (
            a.join(b, on="cluster")
            .filter(F.col("vec_id_a") < F.col("vec_id_b"))
            .select(
                "vec_id_a", "vec_id_b",
                F.round(dot / (F.col("na") * F.col("nb")), 6)
                .alias("cosine"))
            .filter(F.col("cosine") >= threshold))
        return scored.distinct() if nprobe > 1 else scored

    def norm(rows_):
        return sorted(
            (
                r["vec_id_a"], r["vec_id_b"],
                "NaN"
                if isinstance(r["cosine"], float) and math.isnan(r["cosine"])
                else r["cosine"],
            )
            for r in rows_
        )

    fx = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [1.0, 0.0, 0.0, 0.0]),
            (3, [0.9, 0.1, 0.0, 0.0]),
            (4, [1.0, 0.0, 0.0]),            # ragged
            (5, [1.0, 0.0, 0.0]),
            (6, None),                       # null vector
            (None, [1.0, 0.0, 0.0, 0.0]),    # null id
            (7, [0.0, 0.0, 0.0, 0.0]),       # zero norm
            (8, [0.0, 0.0, 0.0, 0.0]),
            (9, [float("nan"), 1.0, 0.0, 0.0]),  # NaN element
            (2, [1.0, 0.0, 0.0, 0.0]),       # duplicate id
            (10, []),                        # empty vector
            (11, []),
            (12, [1.0, None, 0.0, 0.0]),     # null element
        ],
        "vec_id long, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])],
        "centroid_id int, centroid array<double>",
    )
    ansi0 = spark.conf.get("spark.sql.ansi.enabled")
    try:
        for kw in (
            dict(threshold=0.9),
            dict(threshold=0.5, nprobe=2),
        ):
            spark.conf.set("spark.sql.ansi.enabled", "false")
            old = norm(old_join_spelling(fx, cents, **kw).collect())
            new_off = norm(within_cell_pairs(fx, cents, **kw).collect())
            spark.conf.set("spark.sql.ansi.enabled", "true")
            new_on = norm(within_cell_pairs(fx, cents, **kw).collect())
            assert new_off == old, kw
            assert new_on == old, kw
            # the NaN-element family must actually be present (kept)
            assert any(c == "NaN" for _, _, c in old), kw
    finally:
        spark.conf.set("spark.sql.ansi.enabled", ansi0)
