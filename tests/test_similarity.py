"""ANN quality gates (VERDICT r01 item 6): trained-centroid IVF must beat
placeholder recall and multi-probe must not hurt."""

import os

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _recall_maps(rows):
    d = {}
    for r in rows:
        d.setdefault(r.query_id, set()).add(r.neighbor_id)
    return d


def test_ivf_recall_vs_bruteforce(spark):
    from image_ocr_spark.operators.similarity import brute_force_topk, ivf_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 16)
    bf = _recall_maps(brute_force_topk(emb, q, k=5).collect())
    iv2 = _recall_maps(
        ivf_topk(emb, q, k=5, num_centroids=8, iters=2, nprobe=2).collect()
    )
    iv1 = _recall_maps(
        ivf_topk(emb, q, k=5, num_centroids=8, iters=2, nprobe=1).collect()
    )
    rec2 = sum(len(bf[i] & iv2.get(i, set())) / 5 for i in bf) / len(bf)
    rec1 = sum(len(bf[i] & iv1.get(i, set())) / 5 for i in bf) / len(bf)
    # a query's own cell is always its top probe -> it must find itself
    assert all(i in iv2.get(i, set()) for i in bf)
    # measured 0.79 @ sf0.01 / 0.66+ @ sf0.001 on random (clusterless)
    # vectors; gate well below to keep the test robust, but far above the
    # ~nprobe/C = 0.25 a broken assignment would produce
    assert rec2 >= 0.5, f"recall@5 collapsed: {rec2}"
    assert rec2 >= rec1 - 1e-9, "multi-probe made recall worse"


def test_kmeans_centroids_deterministic(spark):
    """Integer-exact accumulation: same centroids regardless of input
    partitioning (the property the SQL oracle depends on)."""
    from image_ocr_spark.operators.similarity import kmeans_centroids

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    c1 = kmeans_centroids(emb.repartition(13), num_centroids=8, iters=2).collect()
    c2 = kmeans_centroids(emb.coalesce(1), num_centroids=8, iters=2).collect()
    m1 = {r.centroid_id: list(r.centv) for r in c1}
    m2 = {r.centroid_id: list(r.centv) for r in c2}
    assert m1 == m2  # bitwise-equal doubles


def test_ivf_assignment_is_shuffle_free(spark):
    """The corpus->cell assignment must be a per-row expression (no
    Exchange): the old crossJoin+groupBy(vid) form shuffled k copies of the
    corpus per k-means iteration."""
    from image_ocr_spark.operators.similarity import _assign_cells, kmeans_train
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents = kmeans_train(emb, num_centroids=8, iters=1)
    vecs = emb.select(F.col("vec_id").alias("vid"), F.col("embedding").alias("v"))
    plan = _assign_cells(vecs, cents)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
