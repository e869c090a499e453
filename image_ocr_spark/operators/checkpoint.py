"""Per-partition checkpoint manifests + resume (north rule: a killed run
resumes with lineage and counters intact).

Without Iceberg jars in the sandbox, the same semantics are hand-rolled on
parquet (SURVEY.md §4 custom piece 3); the writer interface is
format-agnostic so a real Iceberg `writeTo` slots in:

  {root}/data/bucket=N/part-*.parquet     output, dir-partitioned by bucket
  {root}/_manifests/bucket-N.json         commit record, atomic tmp+rename

- bucket = pmod(xxhash64(url), num_buckets): deterministic, uniform (defuses
  host skew), and stable across runs — the unit of lineage.
- Buckets are processed in batches; each batch is one Spark job writing with
  dynamic partition overwrite (idempotent on retry), then one manifest per
  bucket is committed.  A kill between batches loses at most the in-flight
  batch, which the next run redoes; committed buckets are never reread.
- Manifest carries the counters the north rule asks for: input rows, output
  rows, output bytes, wall seconds, and the bucket's url-hash lineage key.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Dict, List, Optional

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

BUCKET_COL = "_bucket"


def bucket_expr(num_buckets: int, key: str = "url"):
    return F.pmod(F.xxhash64(F.col(key)), F.lit(num_buckets)).cast("int")


class BucketedCheckpoint:
    """Checkpointed, resumable bucket-wise materialization of a transform."""

    def __init__(self, root: str, num_buckets: int = 64, key: str = "url"):
        self.root = root
        self.num_buckets = num_buckets
        self.key = key
        self.data_dir = os.path.join(root, "data")
        self.manifest_dir = os.path.join(root, "_manifests")
        os.makedirs(self.manifest_dir, exist_ok=True)

    # -- manifest bookkeeping ------------------------------------------------

    def _manifest_path(self, bucket: int) -> str:
        return os.path.join(self.manifest_dir, f"bucket-{bucket:05d}.json")

    def committed(self) -> List[int]:
        out = []
        for name in os.listdir(self.manifest_dir):
            if name.startswith("bucket-") and name.endswith(".json"):
                out.append(int(name[len("bucket-"):-len(".json")]))
        return sorted(out)

    def pending(self) -> List[int]:
        done = set(self.committed())
        return [b for b in range(self.num_buckets) if b not in done]

    def _commit(self, bucket: int, record: Dict) -> None:
        path = self._manifest_path(bucket)
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(record, fh)
        os.replace(tmp, path)  # atomic on POSIX

    def metrics(self) -> Dict:
        """Aggregated counters across committed manifests."""
        total = {"buckets": 0, "input_rows": 0, "output_rows": 0,
                 "output_bytes": 0, "wall_s": 0.0}
        for b in self.committed():
            with open(self._manifest_path(b)) as fh:
                m = json.load(fh)
            total["buckets"] += 1
            total["input_rows"] += m["input_rows"]
            total["output_rows"] += m["output_rows"]
            total["output_bytes"] += m["output_bytes"]
            total["wall_s"] += m["wall_s"]
        return total

    # -- execution -----------------------------------------------------------

    def _batch_bucket_dirs(self, batch: List[int]) -> List[str]:
        """Existing data dirs for exactly the batch's buckets — the ONLY
        paths the per-batch stats scan may touch (scan cost must stay
        O(batch), not O(all committed output))."""
        dirs = [
            os.path.join(self.data_dir, f"{BUCKET_COL}={b}") for b in batch
        ]
        return [d for d in dirs if os.path.isdir(d)]

    def run(
        self,
        source: DataFrame,
        transform: Callable[[DataFrame], DataFrame],
        buckets_per_batch: int = 16,
        max_batches: Optional[int] = None,
    ) -> List[int]:
        """Process pending buckets in batches; returns buckets committed now.

        ``transform`` maps a pages-shaped DataFrame to the output DataFrame
        (must retain the key column), and must consume its input in ONE
        linear scan: input_rows counters ride ``observe()`` on the write
        job, so a transform that self-joins or re-reads its input would
        count each source row once per scan.  Idempotent: dynamic partition
        overwrite redoes an uncommitted bucket cleanly after a kill.
        """
        spark = source.sparkSession
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        bucketed = source.withColumn(BUCKET_COL, bucket_expr(self.num_buckets, self.key))
        done_now: List[int] = []
        pending = self.pending()
        batches = [
            pending[i : i + buckets_per_batch]
            for i in range(0, len(pending), buckets_per_batch)
        ]
        if max_batches is not None:
            batches = batches[:max_batches]
        for batch in batches:
            t0 = time.time()
            src = bucketed.filter(F.col(BUCKET_COL).isin(batch))
            # input counters ride the write job itself via observe() — one
            # conditional count per bucket in the batch — instead of a second
            # full scan of the raw source per batch (VERDICT r01 item 8; at
            # 100 TB that second pass dominated).  Valid because `transform`
            # consumes the source once (linear pipeline, no self-join).
            obs = Observation(f"ckpt-in-{batch[0]}")
            src = src.observe(
                obs,
                *[
                    F.count(F.when(F.col(BUCKET_COL) == b, 1)).alias(f"in_{b}")
                    for b in batch
                ],
            )
            out = transform(src.drop(BUCKET_COL)).withColumn(
                BUCKET_COL, bucket_expr(self.num_buckets, self.key)
            )
            out.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(self.data_dir)
            wall = time.time() - t0
            in_by_bucket = {b: obs.get[f"in_{b}"] for b in batch}
            # per-bucket counters: row counts from parquet footers of THIS
            # batch's bucket dirs ONLY (VERDICT r02 wrong #2: listing the
            # whole output dir grew linearly with committed output — the
            # final batches of a 100 TB run re-listed millions of files).
            # An all-empty batch writes no bucket dirs at all — commit
            # zero-row manifests so resume still converges.
            stats = {}
            batch_dirs = self._batch_bucket_dirs(batch)
            if batch_dirs:
                stats_df = (
                    spark.read.option("basePath", self.data_dir)
                    .parquet(*batch_dirs)
                    .groupBy(BUCKET_COL)
                    .agg(F.count(F.lit(1)).alias("rows"))
                )
                stats = {r[BUCKET_COL]: r["rows"] for r in stats_df.collect()}
            for b in batch:
                rows = stats.get(b, 0)
                bdir = os.path.join(self.data_dir, f"{BUCKET_COL}={b}")
                nbytes = sum(
                    os.path.getsize(os.path.join(bdir, f))
                    for f in os.listdir(bdir)
                ) if os.path.isdir(bdir) else 0
                self._commit(
                    b,
                    {
                        "bucket": b,
                        "key": self.key,
                        "num_buckets": self.num_buckets,
                        "input_rows": in_by_bucket.get(b, 0),
                        "output_rows": rows,
                        "output_bytes": int(nbytes or 0),
                        "wall_s": round(wall / max(1, len(batch)), 3),
                        "committed_at": time.time(),
                    },
                )
                done_now.append(b)
        return done_now

    def result(self, spark: SparkSession) -> DataFrame:
        """Committed output only (uncommitted bucket dirs are filtered out)."""
        df = spark.read.parquet(self.data_dir)
        return df.filter(F.col(BUCKET_COL).isin(self.committed())).drop(BUCKET_COL)
