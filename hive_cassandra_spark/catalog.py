"""Keyspace / column-family style catalog over parquet directories.

The reference's DDL surface (CassandraStorageHandler.preCreateTable /
commitDropTable, /root/reference/.../cassandra/CassandraStorageHandler.java:235-283,
CassandraManager.java:139-363) maps a Hive database to a Cassandra keyspace
and a Hive table to a column family, creating them on demand.  Here a
*keyspace* is a directory of parquet tables and a *column family* is one
parquet table registered as a Spark temp view; DDL manages directories and
catalog entries instead of Thrift system calls.

The driver's fixture dirs (/root/testdata/sf*) are read-only keyspaces.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
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


@dataclass
class Catalog:
    """Register parquet-backed tables as Spark views, keyspace-style.

    ≙ reference keyspace↔database / CF↔table resolution
    (CassandraStorageHandler.java:41-53, CassandraManager.java:302-329):
    unset names default to the Hive-side name; dotted ``db.table`` names are
    stripped to the table part (AbstractColumnSerDe.java:284-302).
    """

    spark: SparkSession
    registered: dict[str, str] = field(default_factory=dict)

    @staticmethod
    def table_name(name: str) -> str:
        """Strip a dotted ``keyspace.table`` to the table part
        (≙ AbstractColumnSerDe.java:284-302)."""
        return name.rsplit(".", 1)[-1]

    def register_keyspace(self, path: str, tables: tuple[str, ...] = TESTDATA_TABLES) -> None:
        """Register every ``<path>/<table>.parquet`` present as a temp view."""
        for t in tables:
            p = os.path.join(path, f"{t}.parquet")
            if os.path.exists(p):
                self.register_table(t, p)

    def register_table(self, name: str, path: str) -> DataFrame:
        name = self.table_name(name)
        df = self.spark.read.parquet(path)
        df.createOrReplaceTempView(name)
        self.registered[name] = path
        return df

    def register_cells_table(
        self, name: str, path: str, **options
    ) -> DataFrame:
        """Expose a cell store through the ``cassandra_cells`` data source
        as a SQL-queryable temp view — the working analogue of the
        reference's ``CREATE EXTERNAL TABLE ... STORED BY
        CassandraStorageHandler`` DDL (CassandraStorageHandler.java:26).

        A direct ``CREATE TABLE ... USING cassandra_cells OPTIONS(...)``
        parses, but Spark 4.1 does not forward SQL OPTIONS (path included)
        to a PYTHON data source reader — the options dict arrives empty
        (measured; JVM DSv2 sources don't have this gap). Until upstream
        closes it, view registration is the honest SQL-DDL seam: the scan
        still runs through the full datasource path (splits, pushdown,
        paging). ``options`` forwards reader options (reversed,
        split_size, page_size, ...).
        """
        from hive_cassandra_spark import datasource as _ds

        _ds.register(self.spark)
        name = self.table_name(name)
        reader = self.spark.read.format("cassandra_cells")
        for k, v in options.items():
            reader = reader.option(k, v)
        df = reader.load(path)
        df.createOrReplaceTempView(name)
        self.registered[name] = path
        return df

    def table(self, name: str) -> DataFrame:
        return self.spark.table(self.table_name(name))

    # --- writable keyspaces (DDL; ≙ preCreateTable/commitDropTable) ---

    def create_table(self, name: str, df: DataFrame, path: str, mode: str = "error") -> None:
        """CREATE TABLE: write parquet + register.  ≙ create-CF-if-absent
        (CassandraManager.createCFIfNotFound, CassandraManager.java:184-191)."""
        df.write.mode(mode).parquet(path)
        self.register_table(name, path)

    def drop_table(self, name: str, delete_data: bool = False) -> None:
        """DROP TABLE.  The reference only deletes data for managed tables
        (unreachable — tables must be external, CassandraStorageHandler.java:267-283),
        so the default here is likewise metadata-only."""
        name = self.table_name(name)
        path = self.registered.pop(name, None)
        self.spark.catalog.dropTempView(name)
        if delete_data and path and os.path.isdir(path):
            shutil.rmtree(path)

    # --- scale layouts: bucketing and partitioning ---

    def create_bucketed_table(
        self,
        name: str,
        df: DataFrame,
        bucket_cols: list[str],
        n_buckets: int = 32,
        path: str | None = None,
    ) -> DataFrame:
        """CREATE TABLE ... CLUSTERED BY (cols) INTO n BUCKETS.

        The Spark analogue of Cassandra's token-partitioned placement
        (≙ one split per token range,
        HiveCassandraStandardColumnInputFormat.java:131-189): two tables
        bucketed the same way join with **no Exchange at all** — the
        shuffle is prepaid at write time. This is the co-located-join
        layout a 100 TB fact/fact join needs; verified by plan assertion
        in tests/test_scale_plans.py. Bucketing metadata needs a catalog
        table, not a bare parquet dir: files go to the session warehouse,
        or to ``path`` (external table) when given — reading the files by
        path alone would lose the layout. Returns the re-read table."""
        name = self.table_name(name)
        self.spark.sql(f"DROP TABLE IF EXISTS {name}")
        # Pre-shuffle onto the bucket key with one partition per bucket:
        # repartition's HashPartitioning is the same murmur hash bucketing
        # uses, so every write task holds exactly one bucket → one file per
        # bucket. That is what (a) lets the scan trust the in-bucket sort
        # (Spark drops the sorted-bucket property when a bucket spans
        # files, re-inserting a Sort before every SMJ) and (b) stops a
        # W-task writer from emitting W×n_buckets small files at scale.
        writer = (
            df.repartition(n_buckets, *[df[c] for c in bucket_cols])
            .write.mode("overwrite")
            .format("parquet")
            .bucketBy(n_buckets, *bucket_cols)
            .sortBy(*bucket_cols)
        )
        if path is not None:
            writer = writer.option("path", path)
        writer.saveAsTable(name)
        self.registered[name] = path or f"<warehouse>/{name}"
        return self.spark.table(name)

    def create_partitioned_table(
        self, name: str, df: DataFrame, path: str, partition_cols: list[str]
    ) -> None:
        """CREATE TABLE ... PARTITIONED BY (cols): hive-style directory
        partitioning, the layout that gives static + dynamic partition
        pruning on the partition key (the reference scans every token range
        — partition elimination is one of the strict upgrades, SURVEY.md §4).
        """
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
        self.register_table(name, path)
