#!/usr/bin/env python
"""Build dist/newocr_spark.zip for spark-submit --py-files.

The engine is pure Python + numpy (no native extensions of its own), so a
zip of the package plus the pretrained model parquet under
newocr_spark/data/ is a complete executor-side payload:

  python scripts/package.py
  spark-submit --py-files dist/newocr_spark.zip \\
      --conf spark.sql.adaptive.enabled=true \\
      --conf spark.sql.execution.arrow.maxRecordsPerBatch=64 \\
      jobs/extract_job.py --input <docs> --media <media> --output <out>
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "newocr_spark.zip")
    pkg = os.path.join(REPO, "newocr_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for fn in files:
                if fn.endswith(".pyc"):
                    continue
                path = os.path.join(root, fn)
                z.write(path, os.path.relpath(path, REPO))
    print(f"wrote {out} ({os.path.getsize(out)} bytes)")


if __name__ == "__main__":
    main()
