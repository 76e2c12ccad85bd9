"""SparkSession factory with scale-oriented defaults.

Tests/bench run on ``local[$SPARK_GRAFT_CPUS]`` (single JVM), but every
config here is chosen so the same code runs unchanged on a 1000-executor
cluster: AQE for runtime re-planning (skew joins, partition coalescing),
Arrow for any Python exchange, and a shuffle-partition count that AQE can
coalesce downward rather than a hand-tuned magic number.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "rust_graph_db_spark", **extra_conf: str) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # AQE: runtime partition coalescing + skew-join splitting. At 100 TB
        # the static shuffle.partitions value is a ceiling AQE trims, not a
        # hand-tuned constant.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 8)))
        # Arrow-batched transfer for every Pandas UDF / toPandas path.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Dimension tables (region/nation/label catalogs) should broadcast.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        # broadcast BUILDS collect through the driver and are charged
        # against maxResultSize (default 1g): a model-sized broadcast
        # (kn_perplexity's count frames run ~1.4 GB at 59M types) dies
        # there long before the 8 GB broadcast cap. 8g matches the cap;
        # NOT 0/unlimited — a runaway collect should still error.
        .config("spark.driver.maxResultSize", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        # testdata events.parquet carries TIMESTAMP(NANOS); read as long
        # and convert (see load_events)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # bucketed tables (co-located joins) land outside any repo cwd
        .config("spark.sql.warehouse.dir", "/tmp/rgds_warehouse")
        # storage.save_graph writes exactly ONE pre-sorted file per
        # bucket (repartition on the bucket key precedes bucketBy), so
        # the sorted-scan ordering is valid and the SMJ elides its Sorts
        # as well as its Exchanges; Spark only trusts it when every
        # bucket has a single file, which it verifies per scan.
        .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in extra_conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_tables(spark: SparkSession, sf_dir: str) -> dict:
    """Load the driver's parquet tables from ``sf_dir`` as DataFrames."""
    out = {}
    for name in TPCH_TABLES:
        out[name] = (load_events(spark, sf_dir) if name == "events"
                     else spark.read.parquet(f"{sf_dir}/{name}.parquet"))
    return out


def load_events(spark: SparkSession, sf_dir: str):
    """events.parquet stores TIMESTAMP(NANOS), which Spark's parquet
    reader rejects; read nanos as long and truncate to microseconds
    (exactly what DuckDB's micro-resolution TIMESTAMP does, so oracles
    agree)."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    return df
