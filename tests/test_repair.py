"""Anti-entropy repair: digest exchange finds exactly the divergent token
ranges, and repair resolves them LWW while never touching in-sync ranges."""

from pyspark.sql import functions as F

from hive_cassandra_spark import repair

CELL_COLS = ["k", "c", "ts", "v"]


def _cells(spark, rows):
    return spark.createDataFrame(rows, "k long, c string, ts long, v string")


def _base(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("k"),
        F.lit("col").alias("c"),
        F.lit(1).cast("long").alias("ts"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
    )


def test_in_sync_replicas_no_mismatch_no_repair(spark):
    a = _base(spark)
    diff = repair.merkle_diff(
        repair.range_digests(a, "k", CELL_COLS, 8),
        repair.range_digests(a, "k", CELL_COLS, 8),
    )
    rows = diff.collect()
    assert rows and all(not r.mismatch for r in rows)
    assert all(r.a_cells == r.b_cells for r in rows)
    repaired = repair.repair_ranges(
        a, a, diff, "k", ["k", "c"], "ts", ["v"], 8
    )
    assert repaired.count() == 0


def test_missing_cell_detected_and_restored(spark):
    a_full = _base(spark)
    dropped_key = 42
    a = a_full.filter(F.col("k") != dropped_key)
    diff = repair.merkle_diff(
        repair.range_digests(a, "k", CELL_COLS, 8),
        repair.range_digests(a_full, "k", CELL_COLS, 8),
    )
    bad = [r for r in diff.collect() if r.mismatch]
    assert len(bad) == 1
    assert bad[0].a_cells + 1 == bad[0].b_cells
    repaired = repair.repair_ranges(
        a, a_full, diff, "k", ["k", "c"], "ts", ["v"], 8
    )
    got = {(r.k, r.c, r.ts, r.v) for r in repaired.collect()}
    # the dropped cell is back, with its original content
    assert (dropped_key, "col", 1, f"v{dropped_key}") in got
    # repair only contains cells of the one mismatched bucket
    assert {r.bucket for r in repaired.select("bucket").distinct().collect()} \
        == {bad[0].bucket}


def test_stale_version_loses_lww(spark):
    fresh = _cells(spark, [(1, "c", 5, "new")])
    stale = _cells(spark, [(1, "c", 3, "old")])
    diff = repair.merkle_diff(
        repair.range_digests(fresh, "k", CELL_COLS, 4),
        repair.range_digests(stale, "k", CELL_COLS, 4),
    )
    assert [r.mismatch for r in diff.collect()] == [True]
    repaired = repair.repair_ranges(
        fresh, stale, diff, "k", ["k", "c"], "ts", ["v"], 4
    )
    rows = repaired.collect()
    assert len(rows) == 1 and rows[0].ts == 5 and rows[0].v == "new"


def test_same_count_different_content_still_mismatches(spark):
    """A corrupted value with unchanged cardinality: counts agree, the xor
    digest does not — the case a count-only comparison would miss."""
    a = _base(spark, 50)
    b = a.withColumn(
        "v", F.when(F.col("k") == 7, F.lit("corrupt")).otherwise(F.col("v"))
    )
    diff = repair.merkle_diff(
        repair.range_digests(a, "k", CELL_COLS, 8),
        repair.range_digests(b, "k", CELL_COLS, 8),
    )
    bad = [r for r in diff.collect() if r.mismatch]
    assert len(bad) == 1
    assert bad[0].a_cells == bad[0].b_cells


def test_digest_is_order_and_partition_independent(spark):
    a = _base(spark, 300)
    shuffled = a.repartition(13).sortWithinPartitions(F.col("v").desc())
    da = {r.bucket: (r.n_cells, r.xor_digest)
          for r in repair.range_digests(a, "k", CELL_COLS, 8).collect()}
    ds = {r.bucket: (r.n_cells, r.xor_digest)
          for r in repair.range_digests(shuffled, "k", CELL_COLS, 8).collect()}
    assert da == ds
