"""SparkSession factory tuned for the engine.

Local-mode settings mirror what we would set on a real cluster: AQE on
(runtime re-plan + skew-join splitting), Arrow enabled for the pandas-UDF
hot path, shuffle partitions sized to cores (not the 200 default), UTC
session timezone so date/timestamp semantics match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def iceberg_jar() -> str | None:
    """Path to an iceberg-spark-runtime jar if one is reachable, else None.

    Probe order: $SPARK_GRAFT_ICEBERG_JAR, then pyspark's bundled jars dir.
    The engine's snapshot layer (plans/snapshots.py) is a faithful stand-in
    when this returns None (this container ships no Iceberg jar); when a
    jar appears, get_spark wires the catalog so the same call sites can use
    `df.writeTo(...)` + snapshot reads."""
    env = os.environ.get("SPARK_GRAFT_ICEBERG_JAR")
    if env and os.path.exists(env):
        return env
    try:
        import glob

        import pyspark

        hits = glob.glob(os.path.join(os.path.dirname(pyspark.__file__), "jars", "iceberg-spark-runtime*.jar"))
        return hits[0] if hits else None
    except Exception:
        return None


def get_spark(
    master: str | None = None,
    app_name: str = "terrakit_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    On a real cluster these configs ride along unchanged; only ``master``
    and memory sizing differ (spark-submit provides those).
    """
    # glibc tuning for the Arrow/numpy hot path: without it every large
    # numpy temp is mmap'd and munmap'd, paying first-touch page faults on
    # EVERY allocation (measured ~60x slowdown in sandboxed kernels). Must
    # be set before the JVM (and its python workers) are spawned.
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "1073741824")

    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    if shuffle_partitions is None:
        # match parallelism of the master when local, else a cluster default
        if master.startswith("local["):
            inner = master[len("local[") : -1]
            shuffle_partitions = os.cpu_count() or 32 if inner == "*" else int(inner)
        else:
            shuffle_partitions = 200

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "32768")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.executorEnv.MALLOC_MMAP_THRESHOLD_", "1073741824")
        .config("spark.executorEnv.MALLOC_TRIM_THRESHOLD_", "1073741824")
    )
    jar = iceberg_jar()
    if jar:
        # real Iceberg catalog (hadoop, warehouse under ./spark-warehouse or
        # $SPARK_GRAFT_ICEBERG_WAREHOUSE); the snapshot stand-in remains the
        # default path — callers opt in via writeTo("iceberg.<table>")
        builder = (
            builder.config("spark.jars", jar)
            .config("spark.sql.extensions", "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions")
            .config("spark.sql.catalog.iceberg", "org.apache.iceberg.spark.SparkCatalog")
            .config("spark.sql.catalog.iceberg.type", "hadoop")
            .config(
                "spark.sql.catalog.iceberg.warehouse",
                os.environ.get("SPARK_GRAFT_ICEBERG_WAREHOUSE", "spark-warehouse/iceberg"),
            )
        )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
