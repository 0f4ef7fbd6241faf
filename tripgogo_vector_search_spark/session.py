"""SparkSession factory tuned for the engine.

Local test profile: single JVM, ``local[$SPARK_GRAFT_CPUS]``. Cluster
profile: same confs apply; AQE handles runtime re-planning and skew.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "tripgogo-vector-search-spark",
              shuffle_partitions: int | None = None) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder
        .master(os.environ.get("SPARK_MASTER", f"local[{cpus}]"))
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Make this package importable on executor Python workers even when
    the driver process found it via a bare sys.path entry (e.g. a harness
    running from another cwd). Pandas-UDF kernels are pickled by module
    reference, so workers must be able to import us; addPyFile ships a
    zip of the package once per session and extends every worker's path.
    On a real cluster this is exactly how the package would be deployed
    (--py-files); in local mode it is a no-op cost after the first call.
    """
    if getattr(spark, "_tripgogo_pkg_shipped", False):
        return
    import atexit
    import shutil
    import tempfile
    import warnings
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    # addPyFile copies the zip into the session's file server, so the
    # staging dir is safe to delete at interpreter exit.
    tmp_dir = tempfile.mkdtemp(prefix="tripgogo_pkg_")
    atexit.register(shutil.rmtree, tmp_dir, ignore_errors=True)
    zip_path = os.path.join(tmp_dir, "tripgogo_vector_search_spark.zip")
    try:
        with zipfile.ZipFile(zip_path, "w") as zf:
            for dirpath, _dirnames, filenames in os.walk(pkg_dir):
                if "__pycache__" in dirpath:
                    continue
                for fn in filenames:
                    if fn.endswith(".py"):
                        full = os.path.join(dirpath, fn)
                        zf.write(full, os.path.relpath(full, root))
        spark.sparkContext.addPyFile(zip_path)
        spark._tripgogo_pkg_shipped = True
    except Exception as exc:
        # Session may forbid addPyFile (e.g. Connect); workers then rely
        # on the package being installed, which is the normal deployment.
        # Surface the cause: if the failure was transient instead, later
        # pandas-UDF tasks die with ModuleNotFoundError on executors and
        # this warning is the only breadcrumb back to the root cause.
        warnings.warn(f"addPyFile of engine package failed ({exc!r}); "
                      "executors must have it installed/importable",
                      RuntimeWarning, stacklevel=2)
        spark._tripgogo_pkg_shipped = True


def prepare(spark: SparkSession) -> SparkSession:
    """Runtime confs we depend on, for sessions we did not create.

    The correctness driver hands us its own session; pin the
    timezone (timestamp comparisons vs the UTC-naive DuckDB oracle) and
    make sure AQE is on.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    _ship_package(spark)
    return spark
