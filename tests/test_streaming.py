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


def test_stream_to_cell_store_lww(spark, tmp_path):
    """Streaming writes append cells; LWW read reconciles versions — the
    streaming face of the connector (sink.stream_to_cells)."""
    import datetime

    from hive_cassandra_spark import sink, source
    from hive_cassandra_spark.mapping import parse_mapping

    m = parse_mapping(":key,name,score,flag,ts", 5)
    types = ["bigint", "string", "double", "boolean", "timestamp"]
    schema = "id bigint, name string, score double, flag boolean, ts timestamp"
    v1 = spark.createDataFrame(
        [(1, "old", 1.0, True, datetime.datetime(2024, 1, 1))], schema
    )
    v2 = spark.createDataFrame(
        [(1, "new", 2.0, True, datetime.datetime(2024, 1, 2))], schema
    )
    store = str(tmp_path / "cells")
    # batch write v1 at t=1000, then stream v2 in at t=2000
    sink.write_cells(sink.to_cells(v1, m, types, clock_millis=1000), store, mode="overwrite")
    src_dir = str(tmp_path / "incoming")
    v2.write.parquet(src_dir)
    stream = spark.readStream.schema(schema).parquet(src_dir)
    q = sink.stream_to_cells(
        stream, mapping=m, hive_types=types, path=store,
        checkpoint=str(tmp_path / "ckpt"), clock_millis=2000,
    )
    q.awaitTermination()
    back = source.cells_to_table(
        source.read_cells(spark, store), m,
        ["id", "name", "score", "flag", "ts"], types,
    )
    row = {r.id: (r.name, r.score) for r in back.collect()}
    assert row[1] == ("new", 2.0)


def test_watermark_drops_late_data(spark, tmp_path):
    """An event arriving behind the watermark is dropped from the windowed
    aggregate; an in-horizon late event still lands. Batches are driven
    explicitly (processAllAvailable between file writes) so the watermark
    genuinely advances between micro-batches."""
    import datetime as dt
    import uuid as _uuid

    src = str(tmp_path / "late_src")
    schema = "event_id bigint, ts timestamp, value double"
    base = dt.datetime(2024, 1, 1, 0, 0, 0)

    def write_file(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    # batch 1: events at 9:00 and 10:00 → watermark afterwards = 9:50
    write_file([(1, base + dt.timedelta(hours=10), 1.0),
                (2, base + dt.timedelta(hours=9), 1.0)])

    stream = spark.readStream.schema(schema).parquet(src)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.date_format("w.start", "HH:mm").alias("h"), "n")
    )
    name = f"late_{_uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            agg.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .start()
        )
        q.processAllAvailable()  # watermark → 9:50
        # batch 2: 5:00 is far behind the watermark → dropped;
        # 9:55 is within the 10-minute horizon → lands in the 9:00 window
        write_file([(3, base + dt.timedelta(hours=5), 1.0),
                    (4, base + dt.timedelta(hours=9, minutes=55), 1.0)])
        q.processAllAvailable()
        # batch 3: advance the watermark past 11:00 so the 9:00/10:00
        # windows close and append-mode emits them
        write_file([(5, base + dt.timedelta(hours=12), 1.0)])
        q.processAllAvailable()
        q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    got = {r.h: r.n for r in spark.table(name).collect()}
    # the 5:00 event was dropped pre-aggregation: its window never exists
    assert "05:00" not in got
    # the in-horizon late event landed: 9:00 window counts both
    assert got.get("09:00") == 2
    assert got.get("10:00") == 1


def test_stream_stream_join_equals_batch(spark, sf_dir):
    stream = se.run_bounded(
        se.stream_stream_join(se.read_events_stream(spark, sf_dir), "6 hours"),
        spark,
        "append",
        state_partitions=8,
    )
    ev = load_events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id"),
        F.col("ts").alias("view_ts"),
    )
    batch = clicks.join(views, "user_id").filter(
        (F.col("view_ts") >= F.col("click_ts") - F.expr("INTERVAL 6 HOURS"))
        & (F.col("view_ts") <= F.col("click_ts"))
    ).select("click_id", "view_id", "user_id")
    assert _norm(stream.collect()) == _norm(batch.collect())


def test_stream_static_join_equals_batch(spark, sf_dir):
    """The stream-static dimension join on bounded input must equal the
    batch broadcast join row-for-row (stateless, append-safe)."""
    from pyspark.sql import functions as F

    from hive_cassandra_spark.queries import load_events
    from hive_cassandra_spark.streaming import events as se

    ev = se.read_events_stream(spark, sf_dir).withColumn(
        "n_nationkey", F.pmod(F.col("user_id"), F.lit(25)).cast("bigint")
    )
    dim = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    out = se.run_bounded(
        se.stream_static_join(ev, dim, "n_nationkey").select(
            "event_id", "n_name"
        ),
        spark,
        "append",
    )
    batch = (
        load_events(spark, sf_dir)
        .withColumn("n_nationkey", F.pmod(F.col("user_id"), F.lit(25)).cast("bigint"))
        .join(dim, "n_nationkey")
        .select("event_id", "n_name")
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, batch.collect()))


def test_stream_kmv_equals_batch_sketch(spark, sf_dir):
    """The streaming KMV state must land on exactly the batch sketch's
    numbers: same bottom-k hashes, same integer estimator."""
    from hive_cassandra_spark.operators import sketches

    stream = se.run_bounded(
        se.stream_kmv_distinct(se.read_events_stream(spark, sf_dir)),
        spark,
        "update",
    ).select("window_start", "event_type", "k_used", "est_distinct")
    ev = load_events(spark, sf_dir)
    bucket = F.to_timestamp(F.floor(F.unix_timestamp("ts") / 3600) * 3600)
    keyed = ev.select(
        F.date_format(bucket, "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "user_id",
    )
    batch = sketches.kmv_distinct(
        keyed, ["window_start", "event_type"], "user_id", k=64
    ).select("window_start", "event_type", "k_used", "est_distinct")
    assert _norm(stream.collect()) == _norm(batch.collect())


def test_stream_kmv_multi_batch_state_converges(spark, sf_dir, tmp_path):
    """Split the fixture into two files and replay one file per
    micro-batch: the per-key FINAL state (max k_used, then max estimate —
    k_used is monotone and the kth hash only shrinks) must equal the
    serial batch sketch, proving the state merge is batching-independent."""
    from hive_cassandra_spark.operators import sketches

    ev = load_events(spark, sf_dir)
    half = str(tmp_path / "halves")
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    a.coalesce(1).write.parquet(half)
    b.coalesce(1).write.mode("append").parquet(half)
    stream_src = (
        spark.readStream.schema(se.EVENTS_SCHEMA_TS)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(f"{half}/*.parquet")
    )
    out = se.run_bounded(
        se.stream_kmv_distinct(stream_src), spark, "update"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("window_start", "event_type").orderBy(
        F.col("k_used").desc(), F.col("est_distinct").desc()
    )
    final = (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("window_start", "event_type", "k_used", "est_distinct")
    )
    bucket = F.to_timestamp(F.floor(F.unix_timestamp("ts") / 3600) * 3600)
    keyed = ev.select(
        F.date_format(bucket, "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "user_id",
    )
    batch = sketches.kmv_distinct(
        keyed, ["window_start", "event_type"], "user_id", k=64
    ).select("window_start", "event_type", "k_used", "est_distinct")
    assert _norm(final.collect()) == _norm(batch.collect())


def test_rocksdb_state_store_matches_default_at_10x_keys(spark, sf_dir, tmp_path):
    """r05 verdict item 7: the bounded-state claims must survive BOTH a
    10x key-cardinality fixture and the RocksDB state store provider —
    the off-heap store a 100 TB deployment runs (the default HDFS-backed
    provider keeps each partition's state map on-heap, which caps key
    cardinality at executor heap). Results must be provider-independent
    for both stateful shapes: the applyInPandasWithState KMV sketch (q85)
    and the watermarked stream-stream join (q62)."""
    ev = load_events(spark, sf_dir)
    tenx = ev.crossJoin(spark.range(10).withColumnRenamed("id", "i")).select(
        (F.col("event_id") * 10 + F.col("i")).alias("event_id"),
        "ts",
        (F.col("user_id") * 10 + F.col("i")).alias("user_id"),
        "event_type",
        "value",
        "props",
    )
    src_dir = str(tmp_path / "tenx")
    tenx.coalesce(2).write.parquet(src_dir)
    assert tenx.select("user_id").distinct().count() >= 10 * ev.select(
        "user_id"
    ).distinct().count()

    def read_src():
        return (
            spark.readStream.schema(se.EVENTS_SCHEMA_TS)
            .format("parquet")
            .load(f"{src_dir}/*.parquet")
        )

    for build, mode, cols in (
        (
            se.stream_kmv_distinct,
            "update",
            ["window_start", "event_type", "k_used", "est_distinct"],
        ),
        (se.stream_stream_join, "append", ["click_id", "view_id", "user_id"]),
    ):
        default = se.run_bounded(
            build(read_src()), spark, mode, state_partitions=8
        ).select(*cols)
        rocks = se.run_bounded(
            build(read_src()),
            spark,
            mode,
            state_partitions=8,
            state_store_provider=se.ROCKSDB_PROVIDER,
        ).select(*cols)
        d, r = _norm(default.collect()), _norm(rocks.collect())
        assert len(d) > 0 and d == r
    # the override never leaks into the shared session
    assert (
        spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
        is None
    )


def test_stream_incremental_dedup_equals_batch_and_exact(spark, sf_dir):
    """The streamed (maybe_member, is_new) flags must equal a batch replay
    of the same bloom + exact membership; no false negatives; every event
    appears exactly once (append-mode exactness through the union)."""
    ev = se.read_events_stream(spark, sf_dir).select(
        "event_id", F.col("event_id").cast("string").alias("__key")
    )
    corpus = (
        load_events(spark, sf_dir)
        .filter(F.col("event_id") % 37 == 0)
        .select(F.col("event_id").cast("string").alias("__key"))
    )
    out = se.run_bounded(
        se.stream_incremental_dedup(ev, corpus), spark, "append"
    ).collect()
    n_events = load_events(spark, sf_dir).count()
    assert len(out) == n_events  # exactly once per event
    for r in out:
        assert r.is_new == (r.event_id % 37 != 0)  # exact verdict
        if not r.maybe_member:
            assert r.is_new  # bloom has no false negatives


def test_stream_quantile_equals_batch_sketch(spark, sf_dir):
    """The streaming bottom-k row-sample state must land on exactly the
    batch quantile sketch's numbers: same sampled rows, same discrete
    estimator."""
    from hive_cassandra_spark.operators import sketches

    stream = se.run_bounded(
        se.stream_quantile_sketch(se.read_events_stream(spark, sf_dir)),
        spark,
        "update",
    ).select("window_start", "event_type", "n_sample", "p25", "p50", "p75")
    ev = load_events(spark, sf_dir)
    bucket = F.to_timestamp(F.floor(F.unix_timestamp("ts") / 3600) * 3600)
    keyed = ev.select(
        F.date_format(bucket, "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "event_id",
        "value",
    )
    batch = sketches.quantile_estimate(
        sketches.quantile_sketch(
            keyed, ["window_start", "event_type"], "value", "event_id", k=256
        ),
        ["window_start", "event_type"],
    ).select("window_start", "event_type", "n_sample", "p25", "p50", "p75")
    assert _norm(stream.collect()) == _norm(batch.collect())


def test_stream_quantile_multi_batch_state_converges(spark, sf_dir, tmp_path):
    """Two micro-batches (one fixture half each): the per-key FINAL emit
    (max n_sample, which is monotone) must equal the serial batch sketch —
    bottom-k-of-union is batching-order-independent."""
    from pyspark.sql import Window
    from hive_cassandra_spark.operators import sketches

    ev = load_events(spark, sf_dir)
    half = str(tmp_path / "halves_q")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(half)
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(half)
    stream_src = (
        spark.readStream.schema(se.EVENTS_SCHEMA_TS)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(f"{half}/*.parquet")
    )
    out = se.run_bounded(se.stream_quantile_sketch(stream_src), spark, "update")
    w = Window.partitionBy("window_start", "event_type").orderBy(
        F.col("n_sample").desc()
    )
    final = (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("window_start", "event_type", "n_sample", "p25", "p50", "p75")
    )
    bucket = F.to_timestamp(F.floor(F.unix_timestamp("ts") / 3600) * 3600)
    keyed = ev.select(
        F.date_format(bucket, "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "event_id",
        "value",
    )
    batch = sketches.quantile_estimate(
        sketches.quantile_sketch(
            keyed, ["window_start", "event_type"], "value", "event_id", k=256
        ),
        ["window_start", "event_type"],
    ).select("window_start", "event_type", "n_sample", "p25", "p50", "p75")
    assert _norm(final.collect()) == _norm(batch.collect())


def test_stream_countmin_multi_batch_equals_batch_sketch(spark, sf_dir, tmp_path):
    """Two-file replay, one file per micro-batch: per-cell counters are
    monotone (cell-wise addition), so the FINAL emission per cell (max cnt)
    must be cell-for-cell identical to the batch CountMin over the same
    rows — the mergeability contract carried into streaming state."""
    from pyspark.sql import Window

    from hive_cassandra_spark.operators import sketches

    ev = load_events(spark, sf_dir)
    half = str(tmp_path / "halves")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(half)
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(half)
    stream_src = (
        spark.readStream.schema(se.EVENTS_SCHEMA_TS)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(f"{half}/*.parquet")
    )
    out = se.run_bounded(
        se.stream_countmin(stream_src, depth=2, width=32), spark, "update"
    )
    final = out.groupBy("window_start", "event_type", "d", "pos").agg(
        F.max("cnt").alias("cnt")
    )
    bucket = F.to_timestamp(F.floor(F.unix_timestamp("ts") / 3600) * 3600)
    keyed = ev.select(
        F.date_format(bucket, "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "user_id",
    )
    batch = sketches.countmin_sketch(
        keyed, ["window_start", "event_type"], "user_id", depth=2, width=32
    )
    got = {
        (r.window_start, r.event_type, r.d, r.pos): r.cnt
        for r in final.collect()
    }
    want = {
        (r.window_start, r.event_type, r.d, r.pos): r.cnt
        for r in batch.collect()
    }
    assert got == want


def test_stream_histogram_multi_batch_equals_batch(spark, sf_dir, tmp_path):
    """Two-file replay: built-in streaming agg state must land the
    complete-mode histogram exactly on the batch histogram."""
    from hive_cassandra_spark.operators.relational import histogram

    ev = load_events(spark, sf_dir)
    half = str(tmp_path / "halves")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(half)
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(half)
    stream_src = (
        spark.readStream.schema(se.EVENTS_SCHEMA_TS)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(f"{half}/*.parquet")
    )
    out = se.run_bounded(
        se.stream_histogram(stream_src, "1 hour", 0.0, 400.0, 8),
        spark,
        "complete",
    )
    bucket = F.to_timestamp(F.floor(F.unix_timestamp("ts") / 3600) * 3600)
    keyed = ev.select(
        F.date_format(bucket, "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "value",
    )
    want = histogram(
        keyed, ["window_start", "event_type"], "value", 0.0, 400.0, 8
    )
    got = {(r.window_start, r.event_type, r.bin): r.cnt for r in out.collect()}
    exp = {(r.window_start, r.event_type, r.bin): r.cnt for r in want.collect()}
    assert got == exp


def test_stream_funnel_out_of_order_batches_equal_batch_funnel(
    spark, sf_dir, tmp_path
):
    """The adversarial replay: the SECOND half of the timeline arrives in
    the FIRST micro-batch and vice versa. A keep-the-min state machine
    binds later stages against a provisional stage-1 minimum and cannot
    un-bind them when the true (earlier) first event arrives; the
    candidate-buffer design must land on exactly the batch funnel."""
    from hive_cassandra_spark.operators import temporal

    ev = load_events(spark, sf_dir)
    mid = ev.agg(
        F.to_timestamp(
            F.from_unixtime(
                (F.min(F.unix_timestamp("ts")) + F.max(F.unix_timestamp("ts")))
                / 2
            )
        ).alias("m")
    ).collect()[0].m
    half = str(tmp_path / "halves")
    ev.filter(F.col("ts") >= F.lit(mid)).coalesce(1).write.parquet(half)
    ev.filter(F.col("ts") < F.lit(mid)).coalesce(1).write.mode(
        "append"
    ).parquet(half)
    stream_src = (
        spark.readStream.schema(se.EVENTS_SCHEMA_TS)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(f"{half}/*.parquet")
    )
    out = se.run_bounded(se.stream_funnel(stream_src), spark, "update")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("seq").desc())
    final = (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "view_ts", "click_ts", "purchase_ts")
    )
    batch = temporal.funnel(
        ev,
        steps=[
            ("view", F.col("event_type") == "view"),
            ("click", F.col("event_type") == "click"),
            ("purchase", F.col("event_type") == "purchase"),
        ],
        within="24 hours",
    ).select("user_id", "view_ts", "click_ts", "purchase_ts")
    assert _norm(final.collect()) == _norm(batch.collect())


def test_stream_funnel_state_buffers_stay_pruned(spark, sf_dir):
    """State rows carry at most one stage-1 candidate and only
    within-horizon candidates for later stages — the bound that keeps
    per-entity state O(conversion-horizon events) at scale."""
    src = se.read_events_stream(spark, sf_dir)
    out = se.run_bounded(se.stream_funnel(src), spark, "update")
    # final answer parity with the registered batch query is covered by
    # the oracle; here: every user appears, and reached stages are
    # strictly increasing in time where present
    rows = out.collect()
    assert rows
    for r in rows:
        if r.click_ts is not None:
            assert r.view_ts is not None and r.click_ts > r.view_ts
        if r.purchase_ts is not None:
            assert r.click_ts is not None and r.purchase_ts > r.click_ts


def test_stream_anomaly_out_of_order_batches_equal_batch(
    spark, sf_dir, tmp_path
):
    """Adversarial replay for the streaming z-score: the SECOND half of
    the timeline arrives FIRST. A verdict-as-you-go state machine scores
    late-half events against empty baselines and never repairs them; the
    re-resolve design must land on exactly the batch operator — including
    RETRACTING any provisional anomaly the first micro-batch emitted
    (the tombstone/keep-last-seq contract)."""
    from hive_cassandra_spark.operators import temporal

    ev = load_events(spark, sf_dir)
    mid = ev.agg(
        F.to_timestamp(
            F.from_unixtime(
                (F.min(F.unix_timestamp("ts")) + F.max(F.unix_timestamp("ts")))
                / 2
            )
        ).alias("m")
    ).collect()[0].m
    half = str(tmp_path / "halves_a")
    ev.filter(F.col("ts") >= F.lit(mid)).coalesce(1).write.parquet(half)
    ev.filter(F.col("ts") < F.lit(mid)).coalesce(1).write.mode(
        "append"
    ).parquet(half)
    stream_src = (
        spark.readStream.schema(se.EVENTS_SCHEMA_TS)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(f"{half}/*.parquet")
    )
    out = se.run_bounded(se.stream_anomaly(stream_src), spark, "update")
    from pyspark.sql import Window

    final = (
        out.withColumn(
            "mx", F.max("seq").over(Window.partitionBy("user_id"))
        )
        .filter((F.col("seq") == F.col("mx")) & (F.col("event_id") >= 0))
        .select("user_id", "event_id", "ts", "value",
                "baseline_mean", "zscore")
    )
    batch = temporal.rolling_zscore(ev).select(
        "user_id", "event_id", "ts", "value", "baseline_mean", "zscore"
    )
    assert _norm(final.collect()) == _norm(batch.collect())
    # the stream actually ran multi-batch (else the test proves nothing)
    assert out.agg(F.max("seq")).collect()[0][0] >= 2
