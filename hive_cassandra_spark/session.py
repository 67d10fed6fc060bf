"""SparkSession factory with scale-aware defaults.

The reference relied on Hadoop MR job conf for parallelism knobs
(`cassandra.input.split.size` = 65536 keys/split,
/root/reference/src/main/java/org/apache/hadoop/hive/cassandra/serde/AbstractColumnSerDe.java:42,69).
Here the equivalents are Spark SQL confs: AQE (runtime re-plan + skew join +
partition coalescing), shuffle partitions sized to the cluster, Arrow for the
Python boundary, and UTC session time so results are oracle-comparable.

All settings are chosen to survive a 1000-executor / 100 TB deployment:
nothing below hardcodes local paths or collect()s to the driver; local[N]
is only the test harness default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults that are correct on a real cluster too; shuffle partition count is
# overridable because the right value is data-dependent (~2-3x total cores,
# or let AQE coalesce down from a high initial number).
_BASE_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    # HiveQL-0.9 (non-ANSI) semantics, matching the reference's engine:
    # silent null on bad casts, no overflow errors (Hive 0.9 via
    # CassandraStorageHandler; see SURVEY.md §2.B).
    "spark.sql.ansi.enabled": "false",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    # the events fixture stores TIMESTAMP(NANOS); Spark only reads it as a
    # long — converted back to timestamp in the loader (queries.load_events)
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # fixtures store naive timestamps (isAdjustedToUTC=false); Spark 4
    # infers TIMESTAMP_NTZ for those by default, which breaks the
    # LTZ-only functions (unix_micros/unix_timestamp/watermarks) and
    # diverges from DuckDB's naive-read + UTC-session equivalence the
    # oracle gate depends on. Read them as TIMESTAMP (UTC session).
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # decode() replaces malformed bytes instead of raising (Spark 4 made it
    # strict): the expression codecs (codecs.decode_col) rely on replacement
    # — U+FFFD then fails the numeric-text regexes, netting NULL, exactly
    # the reference's text-fallback failure mode (SURVEY.md §1.3)
    "spark.sql.legacy.codingErrorAction": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # the cassandra_cells Python data source (datasource.py) pushes slice
    # predicates through DataSourceReader.pushFilters — gated off by default
    "spark.sql.python.filterPushdown.enabled": "true",
    # 128 MB input partitions — the parquet analogue of the reference's
    # 64k-keys-per-split sizing (one task ≈ one comfortably-memory-resident
    # chunk at any scale factor).
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.ui.enabled": "false",
    "spark.sql.shuffle.partitions": "32",
    # Wide aggregates (SimHash's 64 per-bit vote sums) exceed the default
    # 100-field limit and silently fall back to interpreted row-at-a-time
    # aggregation — measured 2.2 s vs 0.9 s for the simhash signature pass
    # at sf0.1. 256 keeps every plan in this repo inside WholeStageCodegen.
    "spark.sql.codegen.maxFields": "256",
    # Sorted-bucket scans: expose the in-bucket sort order to the planner
    # so co-located SMJs over Catalog.create_bucketed_table tables drop
    # their per-side Sort too (off by default since 3.0 because it lists
    # files per bucket at planning time; create_bucketed_table writes one
    # file per bucket, which is both the layout this needs and the
    # small-file posture a 100 TB lake wants anyway).
    "spark.sql.legacy.bucketedTableScan.outputOrdering": "true",
}


# Correctness-critical runtime confs. Every query function must hold these
# regardless of who built the SparkSession (the driver rig builds its own,
# without session.get_spark): UTC so date_format strings are stable, ANSI off
# for HiveQL-0.9 null-on-bad-cast semantics, nanosAsLong so events.parquet
# (TIMESTAMP(NANOS)) is readable at all, and codingErrorAction so decode()
# replaces malformed bytes (the expression codecs rely on replacement).
# All four are runtime-settable SQLConfs.
_REQUIRED_RUNTIME_CONF: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.ansi.enabled": "false",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.legacy.codingErrorAction": "true",
    # naive parquet timestamps must surface as TIMESTAMP (LTZ @ UTC), not
    # TIMESTAMP_NTZ: LTZ is what unix_micros/watermarks accept and what
    # matches the DuckDB oracle's naive reading under a UTC session.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # the cassandra_cells data source refuses to run with its pushFilters
    # hook disabled (fail-closed in Spark 4.1) — required wherever a
    # query reads through the connector seam.
    "spark.sql.python.filterPushdown.enabled": "true",
}


def ensure_session_confs(spark: SparkSession) -> None:
    """Pin the correctness-critical SQL confs on an already-built session.

    Idempotent and cheap (reads before writing); tolerates confs that a
    particular deployment refuses to set rather than failing the query.
    """
    for key, want in _REQUIRED_RUNTIME_CONF.items():
        try:
            if spark.conf.get(key, None) != want:
                spark.conf.set(key, want)
        except Exception:
            pass


def local_df(spark: SparkSession, rows, schema):
    """Small literal DataFrame planned as a JVM ``LocalTableScan`` instead
    of a Python-RDD scan.

    ``spark.createDataFrame([tuples], schema)`` parallelizes the rows into
    a pickled Python RDD, so the physical plan is ``Scan ExistingRDD`` and
    EVERY action that touches it pays a JVM→Python-worker round trip —
    measured 4.2 s to write a ONE-ROW table to parquet on local[32]
    (vs 0.15 s for a LocalTableScan), because the write job re-evaluates
    the scan through a fresh Python runner. Routing the same rows through
    a pandas DataFrame hands them to Arrow, which materializes a local
    relation on the JVM side once at plan time — no Python evaluation at
    action time at all. Values are unchanged (the explicit schema is
    applied either way); any conversion the Arrow path refuses falls back
    to the classic path, so this is a plan-shape optimization only.
    """
    import pandas as pd
    from pyspark.sql import types as T

    try:
        st = T.StructType.fromDDL(schema) if isinstance(schema, str) else schema
        names = [f.name for f in st.fields]
        pdf = pd.DataFrame.from_records(list(rows), columns=names)
        return spark.createDataFrame(pdf, schema=st)
    except Exception:
        return spark.createDataFrame(rows, schema)


def get_spark(
    app_name: str = "hive_cassandra_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults applied.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default ``*``)
    so the same entry point works under the driver rig and on a cluster
    (where ``master`` comes from spark-submit and must not be set here).
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master is None and not os.environ.get("SPARK_MASTER"):
        master = "local[*]"
    if master:
        builder = builder.master(master)
    conf = dict(_BASE_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
