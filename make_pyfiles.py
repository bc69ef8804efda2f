"""Build ocr_spark.zip for spark-submit --py-files (BASELINE.json:14)."""

from __future__ import annotations

import os
import zipfile


def build(out: str = "ocr_spark.zip") -> str:
    root = os.path.dirname(os.path.abspath(__file__))
    with zipfile.ZipFile(os.path.join(root, out), "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(root, "ocr_spark")
        for dirpath, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    return os.path.join(root, out)


if __name__ == "__main__":
    print(build())
