#!/usr/bin/env python
"""bench_extra.py — r07 optimization-round instrumentation (bench.py is
FROZEN for measurement; every extra number cited in OPTIMIZATION_r07.md
comes from here).

Modes:
  --queries [SF_DIR] [names...]   time every declared query with a noop
        sink (guide §1.4) and write plans/r07/<name>_{before,after}.txt
        explain("formatted") captures (PLANS_TAG=before|after env).
  --tokenize-ab                   old-vs-new tokenizer A/B in ONE process
        (same host window): HEAD implementation exec'd from git vs the
        current module, over the bench corpus sample.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 32)))
PLANS_DIR = os.environ.get(
    "PLANS_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r07"),
)
PLANS_TAG = os.environ.get("PLANS_TAG", "before")


def _noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def queries_main(sf_dir: str, only: list, plans_only: bool = False) -> None:
    import __spark_entry__ as entry
    from image_ocr_spark.session import get_spark

    spark = get_spark(f"local[{CPUS}]", app_name="bench-extra-queries",
                      shuffle_partitions=CPUS)
    os.makedirs(PLANS_DIR, exist_ok=True)
    qs = entry.queries()
    if only:
        qs = {k: v for k, v in qs.items() if k in only}
    out = {}
    if not plans_only:
        # materialize the shared extraction persist first so per-query
        # numbers measure the query, not the shared pipeline
        spark.sparkContext.setJobDescription("shared: extract persist")
        t0 = time.time()
        entry._extracted(spark, sf_dir).count()
        out["_shared_extract_persist"] = round(time.time() - t0, 3)
    for name, fn in qs.items():
        spark.sparkContext.setJobDescription(f"query: {name}")
        try:
            df = fn(spark, sf_dir)
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(PLANS_DIR, f"{name}_{PLANS_TAG}.txt"), "w") as fh:
                fh.write(plan)
            if plans_only:
                out[name] = "plan"
                continue
            walls = []
            for _ in range(2):
                walls.append(_noop(fn(spark, sf_dir)))
            out[name] = round(min(walls), 3)
        except Exception as exc:  # noqa: BLE001
            out[name] = f"ERR {type(exc).__name__}: {exc}"[:200]
        print(json.dumps({name: out[name]}), flush=True)
    spark.stop()
    print(json.dumps({"metric": f"query_walls_{sf_dir.rstrip('/').split('/')[-1]}",
                      "cpus": CPUS, "tag": PLANS_TAG, "walls": out}))


def tokenize_ab_main() -> None:
    """Old (HEAD~ as of r07 start: 8cc1ac9) vs current tokenizer, one
    process, interleaved — immune to host-tenancy swings."""
    import subprocess
    import types

    import duckdb

    rows = duckdb.sql(
        "SELECT html FROM read_parquet('/root/repo/.bench/pages_sf0.1_r3_x120/*.parquet') LIMIT 16000"
    ).fetchall()
    htmls = [h for (h,) in rows]
    old_src = subprocess.run(
        ["git", "show", "8cc1ac9:image_ocr_spark/pycore/htmltok.py"],
        capture_output=True, text=True, cwd=os.path.dirname(os.path.abspath(__file__)),
    ).stdout
    old = types.ModuleType("old_htmltok")
    exec(old_src, old.__dict__)  # noqa: S102 — our own committed code
    from image_ocr_spark.pycore.htmltok import scan_html_cols, tokenize_html
    from image_ocr_spark.operators.tokenize import detect_engine

    hd = [h for h in htmls if detect_engine(h) == "html"]
    for h in hd[:500]:
        old.tokenize_html(h), scan_html_cols(h)
    mism = sum(1 for h in hd if old.tokenize_html(h) != tokenize_html(h))
    t_old, t_new = [], []
    for _ in range(3):
        t0 = time.time()
        for h in hd:
            old.tokenize_html(h)
        t_old.append(time.time() - t0)
        t0 = time.time()
        for h in hd:
            scan_html_cols(h)
        t_new.append(time.time() - t0)
    print(json.dumps({
        "metric": "tokenizer_ab_same_process",
        "docs": len(hd),
        "mismatches": mism,
        "old_s": round(min(t_old), 3),
        "new_s": round(min(t_new), 3),
        "speedup": round(min(t_old) / min(t_new), 3),
    }))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--queries":
        sf = sys.argv[2] if len(sys.argv) > 2 else SF_DIR
        queries_main(sf, sys.argv[3:])
    elif len(sys.argv) > 1 and sys.argv[1] == "--plans":
        sf = sys.argv[2] if len(sys.argv) > 2 else SF_DIR
        queries_main(sf, sys.argv[3:], plans_only=True)
    elif len(sys.argv) > 1 and sys.argv[1] == "--tokenize-ab":
        tokenize_ab_main()
    else:
        print(__doc__)
