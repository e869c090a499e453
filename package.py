#!/usr/bin/env python
"""Build the spark-submit artifact: a zip of the image_ocr_spark package.

    python package.py            -> dist/image_ocr_spark.zip
    spark-submit --py-files dist/image_ocr_spark.zip your_job.py

The package is pure Python (no native deps beyond pyspark/pyarrow on the
cluster), so a single zip shipped via --py-files is the whole deployment —
the north rule's spark-submit path.
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.abspath(__file__))
PKG = "image_ocr_spark"
OUT = os.path.join(ROOT, "dist", f"{PKG}.zip")


def build() -> str:
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(os.path.join(ROOT, PKG)):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for name in sorted(filenames):
                if not name.endswith(".py"):
                    continue
                full = os.path.join(dirpath, name)
                rel = os.path.relpath(full, ROOT)
                zf.write(full, rel)
    return OUT


if __name__ == "__main__":
    path = build()
    size = os.path.getsize(path)
    print(f"{path} ({size} bytes)")
