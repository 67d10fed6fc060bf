"""Keyspace/CF-style catalog DDL + the multi-insert write pattern
(≙ CassandraStorageHandler preCreateTable/commitDropTable and Hive 0.9's
FROM t INSERT OVERWRITE TABLE a ... INSERT ... TABLE b)."""

import os

from pyspark.sql import functions as F

from hive_cassandra_spark.catalog import Catalog


def test_register_keyspace_and_read(spark, sf_dir):
    cat = Catalog(spark)
    cat.register_keyspace(sf_dir)
    assert cat.table("nation").count() == 25
    # dotted keyspace.table resolves to the table part
    # (AbstractColumnSerDe.java:284-302)
    assert cat.table("ks0.nation").count() == 25


def test_create_and_drop_table(spark, sf_dir, tmp_path):
    cat = Catalog(spark)
    cat.register_keyspace(sf_dir)
    p = str(tmp_path / "nation_copy")
    cat.create_table("nation_copy", cat.table("nation").limit(10), p)
    assert cat.table("nation_copy").count() == 10
    # drop is metadata-only by default (external-table semantics,
    # CassandraStorageHandler.java:267-283)
    cat.drop_table("nation_copy")
    assert os.path.isdir(p)
    # managed-style drop deletes data
    cat.register_table("nation_copy", p)
    cat.drop_table("nation_copy", delete_data=True)
    assert not os.path.isdir(p)


def test_multi_insert_pattern(spark, sf_dir, tmp_path):
    """FROM orders INSERT ... TABLE a INSERT ... TABLE b: one cached source
    feeding two sinks (the Spark shape of Hive multi-insert)."""
    cat = Catalog(spark)
    cat.register_keyspace(sf_dir)
    src = cat.table("orders").persist()
    try:
        a = src.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))
        b = src.filter(F.col("o_totalprice") > 100000).select("o_orderkey", "o_totalprice")
        cat.create_table("by_status", a, str(tmp_path / "by_status"))
        cat.create_table("big_orders", b, str(tmp_path / "big_orders"))
        assert cat.table("by_status").count() == a.count()
        assert cat.table("big_orders").count() == b.count()
    finally:
        src.unpersist()


def test_register_cells_table_sql_over_datasource(spark, sf_dir, tmp_path):
    """SQL over the cassandra_cells seam via view registration — the
    working CREATE EXTERNAL TABLE analogue (direct CREATE TABLE ... USING
    a PYTHON data source parses but Spark 4.1 forwards it an EMPTY
    options dict, path included — measured; so the view IS the seam)."""
    from pyspark.sql import functions as F

    from hive_cassandra_spark import codecs, datasource
    from hive_cassandra_spark.catalog import Catalog

    datasource.register(spark)
    store = str(tmp_path / "cells")
    df = spark.range(50).select(
        codecs.encode_col(F.col("id"), "bigint").alias("row_key"),
        codecs.encode_col(F.lit("c"), "string").alias("column_name"),
        codecs.encode_col(F.col("id") * 2, "bigint").alias("value"),
        F.lit(1).cast("long").alias("ts"),
    )
    df.write.format("cassandra_cells").mode("overwrite").save(store)
    cat = Catalog(spark)
    cat.register_cells_table("cf_sql", store)
    n = spark.sql("SELECT count(*) AS n FROM cf_sql").collect()[0].n
    assert n == 50
    # bigint cells are 8-byte big-endian binary: hex → decimal in pure SQL
    total = spark.sql(
        "SELECT sum(cast(conv(hex(value), 16, 10) as bigint)) AS s FROM cf_sql"
    ).collect()[0].s
    assert total == sum(i * 2 for i in range(50))
    cat.drop_table("cf_sql")
