"""Ship the package to executors (the spark-submit --py-files story).

Kernel closures (pandas UDFs, applyInPandas blocks) reference
``liken_spark`` modules, so executors must be able to import the package.
On a real cluster you pass the zip explicitly:

    spark-submit --py-files $(python -m liken_spark.shipping) job.py

For interactive/driver-built sessions, ``ensure_on_workers(spark)`` zips
the installed package once and registers it via ``sc.addPyFile`` — the
same mechanism, automated. Idempotent per session.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED_FLAG = "liken_spark.shipped"


def package_zip(out_dir: str | None = None) -> str:
    """Build (or reuse) a zip of the liken_spark package; returns its path."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    out_dir = out_dir or tempfile.gettempdir()
    out_path = os.path.join(out_dir, "liken_spark_pyfiles.zip")
    src_mtime = max(
        os.path.getmtime(os.path.join(root, f))
        for root, _, files in os.walk(pkg_dir)
        for f in files
        if f.endswith(".py")
    )
    if not os.path.exists(out_path) or os.path.getmtime(out_path) < src_mtime:
        tmp = out_path + ".tmp"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, _, files in os.walk(pkg_dir):
                for f in sorted(files):
                    if not f.endswith(".py"):
                        continue
                    full = os.path.join(root, f)
                    rel = os.path.join("liken_spark", os.path.relpath(full, pkg_dir))
                    zf.write(full, rel)
        os.replace(tmp, out_path)
    return out_path


def ensure_on_workers(spark: SparkSession) -> None:
    sc = spark.sparkContext
    conf_key = "spark.liken.shipped"
    if sc.getLocalProperty(conf_key) == "1":
        return
    sc.addPyFile(package_zip())
    sc.setLocalProperty(conf_key, "1")


if __name__ == "__main__":
    print(package_zip())
