"""Similarity search over embedding columns (array<float>).

Two paths, both pure DataFrame (no UDF):
- brute-force cosine top-k: queries x corpus cross product with the dot
  product as a fold over the zipped arrays.  Correctness baseline; at scale
  the corpus side is the big relation and the (small) query set broadcasts.
- IVF top-k (the scale path): deterministic "training" takes the first C
  vectors as centroids; every vector is assigned to its nearest centroid
  (broadcast C-row join); search only touches the query's cell — the classic
  inverted-file pruning, expressed as an equi-join on cell id.

Cosine is computed with explicit double casts and left-to-right fold order
so the DuckDB oracle produces bit-identical doubles (rank outputs are
integer, so even a 1-ulp divergence cannot flip results unless two sims tie
within fp error — the fixture embeddings are random floats, min observed gap
>> 1e-12).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cosine_sim(a: Column, b: Column) -> Column:
    """Left-to-right fold cosine over two array<float> columns (as double)."""
    zero = F.lit(0.0)
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        zero,
        lambda acc, v: acc + v,
    )
    na = F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        zero,
        lambda acc, v: acc + v,
    )
    nb = F.aggregate(
        F.transform(b, lambda x: x.cast("double") * x.cast("double")),
        zero,
        lambda acc, v: acc + v,
    )
    return dot / F.sqrt(na * nb)


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, rank) — exact cosine top-k per query.

    The query side is broadcast (it is small by construction); the corpus
    streams.  Deterministic tiebreak on neighbor id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    sim = F.broadcast(q).crossJoin(c).select(
        "query_id",
        "neighbor_id",
        cosine_sim(F.col("qv"), F.col("cv")).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        sim.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def ivf_assign(
    embeddings: DataFrame,
    num_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest of the first `num_centroids`
    vectors (deterministic training set).  Broadcast join + max_by."""
    cents = embeddings.filter(F.col(id_col) < num_centroids).select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("centv")
    )
    vecs = embeddings.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("v")
    )
    scored = vecs.crossJoin(F.broadcast(cents)).select(
        "vid",
        "v",
        "centroid_id",
        cosine_sim(F.col("v"), F.col("centv")).alias("csim"),
    )
    # nearest centroid; tiebreak on smaller centroid_id (deterministic)
    return scored.groupBy("vid").agg(
        F.max_by(
            F.col("centroid_id"),
            F.struct(F.col("csim"), (-F.col("centroid_id")).alias("nid")),
        ).alias("cell"),
        F.first("v").alias("v"),
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, rank) searching only the query's IVF cell."""
    assigned = ivf_assign(embeddings, num_centroids, id_col, vec_col)
    q = assigned.join(
        queries.select(F.col(id_col).alias("vid")), "vid"
    ).select(
        F.col("vid").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("cell").alias("qcell"),
    )
    c = assigned.select(
        F.col("vid").alias("neighbor_id"),
        F.col("v").alias("cv"),
        F.col("cell").alias("ccell"),
    )
    sim = (
        F.broadcast(q)
        .join(c, F.col("qcell") == F.col("ccell"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_sim(F.col("qv"), F.col("cv")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sim.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
