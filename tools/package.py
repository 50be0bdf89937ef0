"""Build the spark-submit distribution: olake_spark.zip.

BASELINE.json ships the engine as ``spark-submit --py-files``; the
package is pure Python (numpy/pandas/pyarrow come from the cluster
image), so a source zip is the whole artifact:

    python tools/package.py [out.zip]
    spark-submit --py-files olake_spark.zip your_job.py
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str) -> str:
    pkg = os.path.join(REPO, "olake_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirs, names in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for name in names:
                if not name.endswith(".py"):
                    continue
                p = os.path.join(dirpath, name)
                z.write(p, os.path.relpath(p, REPO))
    return out


if __name__ == "__main__":
    dest = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "olake_spark.zip")
    print(build(dest))
