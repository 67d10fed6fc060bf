"""Storage-handler facade: define/write/read as the single integration seam
(≙ CassandraStorageHandler.configureTableJobProperties)."""

import pytest
from pyspark.sql import functions as F

from hive_cassandra_spark import handler
from hive_cassandra_spark.mapping import MappingError


def test_define_table_synthesizes_mapping_and_normalizes_options(tmp_path):
    tdef = handler.define_table(
        "t", str(tmp_path / "t"), ["id", "a", "b"], ["bigint", "string", "double"],
        consistency="quorum",
    )
    assert tdef.mapping.entries == (":key", "a", "b")
    assert tdef.consistency == "QUORUM"
    assert tdef.cf_type == "Standard"


def test_define_table_arity_checked(tmp_path):
    with pytest.raises(MappingError):
        handler.define_table(
            "t", str(tmp_path / "t"), ["id", "a"], ["bigint", "string"],
            mapping=":key,a,b",
        )


def test_roundtrip_through_facade(spark, sf_dir, tmp_path):
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )
    tdef = handler.define_table(
        "supplier_cf", str(tmp_path / "supplier_cf"),
        ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
        ["bigint", "string", "bigint", "double"],
    )
    handler.write_table(sup, tdef, clock_millis=7)
    back = handler.read_table(spark, tdef)
    want = {r.s_suppkey: (r.s_name, r.s_nationkey, round(r.s_acctbal, 2))
            for r in sup.collect()}
    got = {r.s_suppkey: (r.s_name, r.s_nationkey, round(r.s_acctbal, 2))
           for r in back.collect()}
    assert got == want


def test_read_table_projection_pushdown(spark, sf_dir, tmp_path):
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_acctbal", "s_name"
    )
    tdef = handler.define_table(
        "sup2", str(tmp_path / "sup2"),
        ["s_suppkey", "s_acctbal", "s_name"], ["bigint", "double", "string"],
    )
    handler.write_table(sup, tdef, clock_millis=7)
    pruned = handler.read_table(spark, tdef, wanted_columns=["s_acctbal"])
    assert set(pruned.columns) == {"s_suppkey", "s_acctbal"}
    # the column_name IN-filter reaches the parquet scan
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "column_name" in plan


def test_lww_across_two_writes(spark, tmp_path):
    df1 = spark.createDataFrame([(1, "old")], "id long, v string")
    df2 = spark.createDataFrame([(1, "new")], "id long, v string")
    tdef = handler.define_table(
        "lww", str(tmp_path / "lww"), ["id", "v"], ["bigint", "string"],
    )
    handler.write_table(df1, tdef, mode="overwrite", clock_millis=1)
    handler.write_table(df2, tdef, mode="append", clock_millis=2)
    back = handler.read_table(spark, tdef)
    assert [(r.id, r.v) for r in back.collect()] == [(1, "new")]
