"""Temporal joins: as-of (latest prior match) and bucketed range join —
brute-force-checked semantics plus the plan-shape guarantees that make them
scale (single exchange for as-of; equi-join, not nested loop, for range).
"""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from hive_cassandra_spark.operators import temporal

T0 = datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes: float) -> datetime:
    return T0 + timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [
            (100, "u1", _ts(5), "l"),
            (101, "u1", _ts(10), "l"),   # exactly at a right ts → inclusive
            (102, "u1", _ts(0), "l"),    # before any right row → NULL match
            (103, "u2", _ts(30), "l"),
            (104, "u3", _ts(30), "l"),   # key with no right rows at all
        ],
        "event_id long, user_id string, ts timestamp, payload string",
    )
    right = spark.createDataFrame(
        [
            (1, "u1", _ts(1), 10.0),
            (2, "u1", _ts(10), 20.0),
            (3, "u1", _ts(10), 30.0),    # tie at ts=10 → max event_id (3) wins
            (4, "u1", _ts(20), 40.0),    # after every left row → never matched
            (5, "u2", _ts(29), 50.0),
        ],
        "event_id long, user_id string, ts timestamp, value double",
    )
    return left, right


def test_asof_join_semantics(sides):
    left, right = sides
    out = temporal.asof_join(
        left, right, keys=["user_id"], right_values=["event_id", "value"],
        tie_col="event_id",
    )
    got = {r.event_id: (r.asof_event_id, r.asof_value) for r in out.collect()}
    assert got == {
        100: (1, 10.0),     # latest right at/before 5min is ts=1
        101: (3, 30.0),     # inclusive <=, tie broken to max event_id
        102: (None, None),  # no prior right row
        103: (5, 50.0),
        104: (None, None),  # key absent from right side
    }
    # every left row survives (left-join contract)
    assert out.count() == left.count()


def test_asof_join_single_exchange(sides):
    left, right = sides
    plan = temporal.asof_join(
        left, right, keys=["user_id"], right_values=["event_id"]
    )._jdf.queryExecution().executedPlan().toString()
    # one shuffle total: the window's hash partitioning on the key; the
    # history side must NOT be shuffled separately (no pre-compaction agg)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SortMergeJoin" not in plan and "NestedLoop" not in plan


def test_asof_join_hot_key_bucketed_matches_default(sides, spark):
    """One key with the whole history (the skew case): the time-bucketed
    plan must return exactly what the single-partition plan returns, while
    partitioning the window by (key, time bucket) so no task ever holds a
    full key history."""
    left, right = sides
    base = temporal.asof_join(
        left, right, keys=["user_id"], right_values=["event_id", "value"],
        tie_col="event_id",
    )
    bucketed = temporal.asof_join(
        left, right, keys=["user_id"], right_values=["event_id", "value"],
        tie_col="event_id", hot_key_bucket_s=300,
    )
    key = lambda r: (r.event_id, r.asof_event_id, r.asof_value)  # noqa: E731
    assert sorted(map(key, base.collect())) == sorted(map(key, bucketed.collect()))

    # skewed synthetic: EVERY row on one key, history long relative to bucket
    hot_left = spark.range(200).select(
        F.col("id").alias("event_id"),
        F.lit("hot").alias("user_id"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"),
        F.lit("l").alias("payload"),
    )
    hot_right = spark.range(100).select(
        (F.col("id") + 1000).alias("event_id"),
        F.lit("hot").alias("user_id"),
        F.timestamp_seconds(F.col("id") * 120 + 30).alias("ts"),
        (F.col("id") * 1.0).alias("value"),
    )
    b = temporal.asof_join(
        hot_left, hot_right, keys=["user_id"],
        right_values=["event_id", "value"], tie_col="event_id",
        hot_key_bucket_s=600,
    )
    d = temporal.asof_join(
        hot_left, hot_right, keys=["user_id"],
        right_values=["event_id", "value"], tie_col="event_id",
    )
    assert sorted(map(key, b.collect())) == sorted(map(key, d.collect()))
    # plan assertion: the main window partitions on (user_id, _b) — the
    # hot key's history is spread across bucket partitions, bounding task
    # state by bucket width instead of history length
    plan = b._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(user_id" in plan and "_b" in plan


def test_range_join_bucketed_matches_bruteforce(spark):
    points = spark.createDataFrame(
        [(i, f"u{i % 3}", _ts(i * 7.5)) for i in range(40)],
        "pid long, user_id string, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (200, "u0", _ts(0), _ts(45)),
            (201, "u1", _ts(100), _ts(130)),    # spans multiple buckets
            (202, "u1", _ts(100), _ts(101)),    # sub-bucket interval
            (203, "u2", _ts(500), _ts(600)),    # matches nothing
        ],
        "iid long, user_id string, start_ts timestamp, end_ts timestamp",
    )
    got = temporal.range_join_bucketed(
        points, intervals, keys=["user_id"],
        point_ts="ts", start_col="start_ts", end_col="end_ts",
        bucket_width_s=600,
    )
    brute = points.join(intervals, "user_id").filter(
        F.col("ts").between(F.col("start_ts"), F.col("end_ts"))
    )
    key = lambda r: (r.pid, r.iid)
    assert sorted(map(key, got.collect())) == sorted(map(key, brute.collect()))
    assert got.count() > 0


def test_range_join_is_equi_join(spark):
    points = spark.createDataFrame(
        [(1, "u", _ts(1))], "pid long, user_id string, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [(2, "u", _ts(0), _ts(5))],
        "iid long, user_id string, start_ts timestamp, end_ts timestamp",
    )
    plan = temporal.range_join_bucketed(
        points, intervals, ["user_id"], "ts", "start_ts", "end_ts"
    )._jdf.queryExecution().executedPlan().toString()
    # containment must run as a hash-joinable equi-join on (key, bucket),
    # never a nested-loop / cartesian over the inequality
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_range_join_guard_rejects_runaway_intervals(spark):
    points = spark.createDataFrame(
        [(1, "u", _ts(1))], "pid long, user_id string, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [(2, "u", _ts(0), _ts(60 * 24 * 365))],  # a year-long interval
        "iid long, user_id string, start_ts timestamp, end_ts timestamp",
    )
    with pytest.raises(Exception, match="buckets"):
        temporal.range_join_bucketed(
            points, intervals, ["user_id"], "ts", "start_ts", "end_ts",
            bucket_width_s=60, max_buckets_per_interval=100,
        ).collect()


def test_hypertable_rollup_reaggregates_partials(spark, sf_dir):
    from hive_cassandra_spark import queries as q

    out = q.QUERIES["q64_hypertable_rollup"].fn(spark, sf_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # two-level rollup = exactly two aggregation exchanges (hour, then day);
    # a third would mean the daily level rescanned raw events
    assert plan.count("Exchange hashpartitioning") == 2
    rows = {(r.day, r.event_type): r for r in out.collect()}
    assert rows and all(r.n_events >= r.hours_active for r in rows.values())


def test_batch_sessionize_single_exchange(spark, sf_dir):
    from hive_cassandra_spark import queries as q

    out = q.QUERIES["q65_batch_sessionize"].fn(spark, sf_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # both window frames and the (user_id, session_no) aggregate must reuse
    # the single user_id exchange — a second corpus shuffle would double the
    # dominant cost at scale
    assert plan.count("Exchange hashpartitioning") == 1
    rows = out.collect()
    # no HAVING threshold anymore (it made the small-SF oracle comparison
    # vacuous): every session has >= 1 event and a non-negative duration
    assert rows
    assert all(r.n_events >= 1 and r.duration_s >= 0 for r in rows)
