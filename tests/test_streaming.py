"""Streaming == batch equivalence on bounded replay (SURVEY.md §7 step 6)."""

from pyspark.sql import functions as F

from hive_cassandra_spark.queries import load_events
from hive_cassandra_spark.streaming import events as se


def _norm(rows):
    return sorted(tuple(r) for r in rows)


def test_tumbling_equals_batch(spark, sf_dir):
    stream = se.run_bounded(
        se.tumbling_counts(se.read_events_stream(spark, sf_dir), "1 hour"),
        spark,
        "complete",
    )
    ev = load_events(spark, sf_dir)
    batch = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
    assert _norm(stream.collect()) == _norm(batch.collect())


def test_session_window_equals_batch(spark, sf_dir):
    stream = se.run_bounded(
        se.session_aggregate(se.read_events_stream(spark, sf_dir), "30 minutes"),
        spark,
        "complete",
    )
    ev = load_events(spark, sf_dir)
    batch = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
            "total_value",
        )
    )
    assert _norm(stream.collect()) == _norm(batch.collect())


def test_stream_dedup_keeps_unique_ids(spark, sf_dir):
    out = se.run_bounded(se.stream_dedup(se.read_events_stream(spark, sf_dir)), spark, "append")
    n_events = load_events(spark, sf_dir).count()
    assert out.select("event_id").distinct().count() == out.count() == n_events


def test_stateful_counts_equal_batch(spark, sf_dir):
    out = se.run_bounded(
        se.stateful_user_counts(se.read_events_stream(spark, sf_dir)), spark, "update"
    )
    final = {r.user_id: (r.n_events, r.total_value) for r in out.collect()}
    batch = {
        r.user_id: (r.n, r.v)
        for r in load_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("v"))
        .collect()
    }
    assert final == batch
