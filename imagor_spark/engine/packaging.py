"""Package the engine for executor distribution (spark-submit --py-files).

Executors run their own Python workers and do NOT inherit the driver's
``sys.path`` — verified empirically: a consumer outside the repo dies with
``ModuleNotFoundError: imagor_spark`` in every task. On a real cluster the
package ships via ``spark-submit --py-files imagor_spark.zip``; for
driver-side programmatic use, :func:`ensure_shipped` builds the zip and
registers it on the running SparkContext (equivalent effect).
"""

from __future__ import annotations

import os
import zipfile

_PKG_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(dest: str | None = None) -> str:
    """Zip the imagor_spark package → path usable with --py-files."""
    dest = dest or os.path.join(os.path.dirname(_PKG_ROOT), "imagor_spark.zip")
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(_PKG_ROOT):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.join(
                    "imagor_spark", os.path.relpath(full, _PKG_ROOT)
                )
                zf.write(full, rel)
    return dest


def ensure_shipped(spark) -> str:
    """Make imagor_spark importable on every executor of this session."""
    path = build_zip()
    spark.sparkContext.addPyFile(path)
    return path
