"""SparkSession factory.

Local-mode defaults tuned for the sandbox (local[32], single JVM) but every
setting is the one you'd also want on a 1000-executor cluster: AQE on
(runtime re-planning + skew-join splitting), Arrow transport for the pandas
UDF kernels, UTC session timezone (oracle comparability), shuffle
partitions sized to parallelism rather than the 200 default.

Iceberg: the runtime jars are not present in this sandbox, so the catalog
config is applied only when ``TSN_ICEBERG_JARS`` is set; the pipeline's
checkpoint/lineage layer (sources/catalog.py) degrades to Parquet-dir
tables with the same table-name API either way.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "text_similarity_node_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("TSN_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        # signature tables (1 KiB/row) up to ~250k rows should broadcast in
        # the prefilter joins — at 64 MB the multi-hundred-MB candidate
        # table was the side being shuffled twice instead.  512 MB was
        # measured WORSE: collecting a 343 MB table to the driver for a
        # broadcast is single-threaded and cost more than the shuffle.
        .config("spark.sql.autoBroadcastJoinThreshold", str(256 * 1024 * 1024))
    )
    iceberg_jars = os.environ.get("TSN_ICEBERG_JARS")
    if iceberg_jars:
        builder = (
            builder.config("spark.jars", iceberg_jars)
            .config(
                "spark.sql.extensions",
                "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
            )
            .config("spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog")
            .config("spark.sql.catalog.local.type", "hadoop")
            .config(
                "spark.sql.catalog.local.warehouse",
                os.environ.get("TSN_WAREHOUSE", "/tmp/tsn_warehouse"),
            )
        )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
