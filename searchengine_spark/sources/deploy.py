"""Self-shipping of the package to Spark Python workers.

On a real cluster the engine runs via `spark-submit --py-files engine.zip`
(north_rule). For interactive/driver-launched sessions this module provides
the same thing programmatically: zip the installed package once per
SparkContext and `addPyFile` it, so mapInPandas closures that reference
searchengine_spark import cleanly on every worker regardless of the
driver's cwd.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_MARKER = "_searchengine_spark_shipped"


def ship_package(spark) -> None:
    """Idempotently make searchengine_spark importable on all workers."""
    sc = spark.sparkContext
    if getattr(sc, _MARKER, False):
        return
    import searchengine_spark

    pkg_dir = os.path.dirname(os.path.abspath(searchengine_spark.__file__))
    fd, zpath = tempfile.mkstemp(suffix=".zip", prefix="searchengine_spark_")
    os.close(fd)
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for fn in files:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                rel = os.path.join("searchengine_spark",
                                   os.path.relpath(full, pkg_dir))
                zf.write(full, rel)
    sc.addPyFile(zpath)
    setattr(sc, _MARKER, True)
