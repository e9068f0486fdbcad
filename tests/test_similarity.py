"""Similarity-search operator tests: brute force as ground truth, LSH
and IVF recall, k-means codebook invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from haplorec_spark.operators.similarity import (
    assign_clusters,
    brute_force_topk,
    ivf_topk,
    kmeans_centroids,
)

SF = "/root/testdata/sf0.001"


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
