"""Streaming operators over the events fixture.

The reference has **no** streaming surface (batch MR scans only —
/root/reference/.../input/HiveCassandraStandardColumnInputFormat.java:38-39
extends Hadoop InputFormat); Structured Streaming is offered as the
superset (SURVEY.md §2.B). Every operator here is watermark-correct for
unbounded input; the test/oracle path replays the bounded parquet fixture
through the same plan (streaming result == batch result on bounded input).

State scale: windowed aggs and dropDuplicates keep state bounded by the
watermark horizon; `stateful_user_counts` keeps O(|users|) state via
applyInPandasWithState — all fine for 1000-executor deployments since
state is hash-partitioned by key.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# Evidence from the most recent run_bounded() stream, for the plan audit:
# {"plan": <last micro-batch physical plan str>, "progress": <lastProgress>}
LAST_BOUNDED_RUN: dict = {}

# ts declared bigint: for TIMESTAMP(NANOS) fixtures Spark reads ts as a
# nanos long (legacy.parquet.nanosAsLong) — converted in the reader.
EVENTS_SCHEMA = (
    "event_id bigint, ts bigint, user_id bigint, event_type string, "
    "value double, props string"
)

# ts declared timestamp: for TIMESTAMP(MICROS) fixtures (naive,
# isAdjustedToUTC=false) read directly as LTZ under the pinned UTC session.
EVENTS_SCHEMA_TS = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-replay streaming source over the events parquet.

    The path is a glob (FileStreamSource wants a directory or pattern, not
    a bare file). The fixture's physical ts layout is probed via a batch
    footer read (cheap, no data scan): TIMESTAMP(NANOS) surfaces as bigint
    (nanosAsLong) and gets the nanos → micros truncation matching the batch
    loader; TIMESTAMP(MICROS) streams directly as TimestampType.
    """
    from hive_cassandra_spark.session import ensure_session_confs

    ensure_session_confs(spark)
    batch_ts = dict(spark.read.parquet(f"{sf_dir}/events.parquet").dtypes)["ts"]
    if batch_ts == "bigint":
        raw = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .format("parquet")
            .load(f"{sf_dir}/events.parque*")
        )
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA_TS)
        .format("parquet")
        .load(f"{sf_dir}/events.parque*")
    )
    return raw


def tumbling_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Tumbling-window counts/sums per event_type with a 10 min watermark."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_counts(events: DataFrame, width: str = "2 hours", slide: str = "1 hour") -> DataFrame:
    """Sliding-window event counts per type (each event lands in
    width/slide windows)."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
        )
    )


def session_aggregate(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user: sessions close after `gap` of inactivity.
    Emits (user_id, session_start, n_events, total_value)."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
            "total_value",
        )
    )


def stream_dedup(events: DataFrame) -> DataFrame:
    """Streaming exact dedup on event_id within the watermark horizon —
    the streaming face of dedup.exact_dedup."""
    return events.withWatermark("ts", "10 minutes").dropDuplicates(["event_id"])


def stateful_user_counts(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: running
    per-user event count + value sum. The arbitrary-state API is the escape
    hatch the reference never had (its engine was stateless MR)."""
    import pandas as pd

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id bigint, n_events bigint, total_value double",
        stateStructType="n bigint, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_kmv_distinct(
    events: DataFrame, width_s: int = 3600, k: int = 64
) -> DataFrame:
    """Streaming approximate distinct-count: per (tumbling window,
    event_type), the number of distinct users estimated by the KMV
    bottom-k sketch (operators/sketches.py) maintained as arbitrary
    per-key state.

    The state is the k smallest 52-bit hashes seen for the key — ~k·8
    bytes, NEVER the user set itself — and the merge (set-union then
    re-take the k smallest) is order- and batching-independent, so the
    final estimate is deterministic however the stream is micro-batched:
    exactly the mergeability contract q76/q77 pin for the batch sketches,
    now carried across batches as streaming state. The reference's
    stateless MR engine had no streaming face at all (SURVEY.md §2.B);
    this is the superset's sketch tier. A production deployment bounds
    the key space with a state timeout (GroupStateTimeout) or window
    retention; the bounded-replay harness needs neither.
    """
    import pandas as pd

    from hive_cassandra_spark.operators.sketches import HASH_SPACE, hash52

    bucket = F.to_timestamp(
        F.floor(F.unix_timestamp("ts") / width_s) * width_s
    )
    keyed = events.select(
        F.date_format(bucket, "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        hash52(F.col("user_id")).alias("h"),
    )

    def update(key, pdfs, state: GroupState):
        seen = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            seen.update(int(x) for x in pdf["h"])
        best = sorted(seen)[:k]
        state.update((best,))
        n = len(best)
        est = n if n < k else (k - 1) * HASH_SPACE // max(best[-1], 1)
        yield pd.DataFrame(
            {
                "window_start": [key[0]],
                "event_type": [key[1]],
                "k_used": [n],
                "est_distinct": [est],
            }
        )

    return keyed.groupBy("window_start", "event_type").applyInPandasWithState(
        update,
        outputStructType=(
            "window_start string, event_type string, "
            "k_used bigint, est_distinct bigint"
        ),
        stateStructType="hs array<bigint>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_quantile_sketch(
    events: DataFrame, width_s: int = 3600, k: int = 256
) -> DataFrame:
    """Streaming approximate quantiles: per (tumbling window, event_type),
    p25/p50/p75 of ``value`` from the bottom-k ROW sample
    (operators/sketches.quantile_sketch) maintained as per-key state —
    the q82 sketch tier carried across micro-batches exactly as
    ``stream_kmv_distinct`` carries the KMV tier.

    State per key is the ≤ k (h, v) pairs with the smallest (h, v) —
    ~16·k bytes, never the value set — and bottom-k-of-union is order-
    and batching-independent, so the emitted quantiles are deterministic
    however the stream is micro-batched AND equal to the batch sketch
    over the same rows (pinned in test_streaming). The estimator is the
    same discrete ⌊(n−1)·p⌋ pick as the batch path: an actual sampled
    value, bit-exact across engines, no interpolation, no floats beyond
    the values themselves."""
    import pandas as pd

    from hive_cassandra_spark.operators.sketches import hash52

    bucket = F.to_timestamp(
        F.floor(F.unix_timestamp("ts") / width_s) * width_s
    )
    keyed = events.select(
        F.date_format(bucket, "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        hash52(F.col("event_id")).alias("h"),
        F.col("value").alias("v"),
    )

    def update(key, pdfs, state: GroupState):
        if state.exists:
            hs, vs = state.get
            pairs = list(zip(hs, vs))
        else:
            pairs = []
        for pdf in pdfs:
            pairs.extend(
                (int(h), float(v)) for h, v in zip(pdf["h"], pdf["v"])
            )
        pairs.sort()
        pairs = pairs[:k]
        state.update(([h for h, _ in pairs], [v for _, v in pairs]))
        byv = sorted((v, h) for h, v in pairs)
        n = len(byv)
        qs = {
            name: byv[((n - 1) * num) // 100][0] if n else None
            for name, num in (("p25", 25), ("p50", 50), ("p75", 75))
        }
        yield pd.DataFrame(
            {
                "window_start": [key[0]],
                "event_type": [key[1]],
                "n_sample": [n],
                "p25": [qs["p25"]],
                "p50": [qs["p50"]],
                "p75": [qs["p75"]],
            }
        )

    return keyed.groupBy("window_start", "event_type").applyInPandasWithState(
        update,
        outputStructType=(
            "window_start string, event_type string, n_sample bigint, "
            "p25 double, p50 double, p75 double"
        ),
        stateStructType="hs array<bigint>, vs array<double>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_stream_join(events: DataFrame, max_delay: str = "6 hours") -> DataFrame:
    """Watermarked stream-stream self-join: each click paired with every
    view by the same user in the preceding ``max_delay``.

    Both sides carry a watermark and the join predicate bounds the event-time
    range, so Spark can expire buffered rows on BOTH sides — state stays
    O(keys × max_delay window), the requirement for an unbounded deployment.
    The reference's engine (stateless MR scans) had no such operator.
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("click_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "10 minutes")
    )
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("view_user"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "10 minutes")
    )
    joined = clicks.join(
        views,
        F.expr(
            f"""
            click_user = view_user AND
            view_ts >= click_ts - INTERVAL {max_delay} AND
            view_ts <= click_ts
            """
        ),
    )
    return joined.select(
        "click_id", "view_id", F.col("click_user").alias("user_id")
    )


def stream_static_join(stream: DataFrame, dim: DataFrame, key: str) -> DataFrame:
    """Stream-static dimension join: each streaming row enriched from a
    broadcast static table (the classic fact-stream × dimension pattern).
    Both sides must already carry the equi-join column ``key``.

    Stateless — no watermark needed, nothing buffered: the static side is
    broadcast once per micro-batch plan and the join is append-safe. At
    scale the dimension must fit the broadcast threshold; bigger dims
    become a stream-stream join with a slowly-changing-dimension feed.
    """
    return stream.join(F.broadcast(dim), key)


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def run_bounded(
    df: DataFrame,
    spark: SparkSession,
    output_mode: str = "complete",
    state_partitions: int | None = None,
    state_store_provider: str | None = None,
) -> DataFrame:
    """Drive a streaming DataFrame over its bounded source to completion
    via an in-memory sink; return the materialized result as a batch
    DataFrame. Test/oracle harness only — production would writeStream to
    a real sink.

    ``state_partitions`` sizes the stateful-operator partition count for
    this query (captured from ``spark.sql.shuffle.partitions`` at stream
    start). State partitioning is the knob that must track key cardinality:
    each partition pays a state-store commit + Python-worker round-trip per
    micro-batch, so 32 partitions over the small bounded fixture is pure
    overhead (benched 15s → 1.3s for applyInPandasWithState at sf0.01),
    while a 1000-executor deployment wants hundreds — results are identical
    either way. Restored after the stream finishes.

    ``state_store_provider`` overrides
    ``spark.sql.streaming.stateStore.providerClass`` for this query (e.g.
    ``ROCKSDB_PROVIDER``). The default HDFS-backed store keeps every
    partition's state map ON-HEAP — at 100 TB key cardinalities that is an
    OOM, so a long-lived deployment runs RocksDB (off-heap, spills to
    local SSD, bounded memory regardless of key count); results are
    provider-independent, pinned by test_streaming. Restored after the
    stream finishes. The provider is captured when the stream STARTS, so
    per-query override is safe even on a shared session.
    """
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    conf = spark.conf
    prev = conf.get("spark.sql.shuffle.partitions")
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev_provider = conf.get(provider_key, None)
    if state_partitions is not None:
        conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    if state_store_provider is not None:
        conf.set(provider_key, state_store_provider)
    try:
        q = (
            df.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # audit evidence for tools/plan_audit.py: the last micro-batch's
        # physical plan plus the final progress (state-operator
        # numRowsTotal/numRowsUpdated/memoryUsedBytes are the bounded-
        # state proof the batch-side plan audit can't see)
        try:
            LAST_BOUNDED_RUN["plan"] = q._jsq.explainInternal(False)
        except Exception:
            LAST_BOUNDED_RUN["plan"] = ""
        LAST_BOUNDED_RUN["progress"] = q.lastProgress
    finally:
        if state_partitions is not None:
            conf.set("spark.sql.shuffle.partitions", prev)
        if state_store_provider is not None:
            if prev_provider is None:
                conf.unset(provider_key)
            else:
                conf.set(provider_key, prev_provider)
    return spark.table(name)


def stream_incremental_dedup(
    stream: DataFrame,
    corpus_keys: DataFrame,
    key_col: str = "__key",
    n_words: int = 128,
    k: int = 4,
) -> DataFrame:
    """Streaming incremental dedup: flag each streaming row against an
    existing static corpus — the continuous form of
    ``dedup.incremental_dedup`` for a live ingest feed.

    The corpus reduces to a bloom filter whose words are embedded as PLAN
    LITERALS (``sketches.bloom_words`` — one bounded ≤n_words driver
    collect at plan build, the IVF-centroid precedent), so the
    ``maybe_member`` verdict is a pure zero-state streaming projection:
    no join, no shuffle, no watermark. Only probe-positive rows take the
    exact stream-static confirmation join (static side broadcast), so
    per-micro-batch work is candidates only. Output is exact and
    append-mode safe: every input row exactly once with
    (maybe_member, is_new); (false, false) rows are impossible.
    """
    from hive_cassandra_spark.operators import sketches

    bloom = sketches.bloom_build(corpus_keys, key_col, n_words=n_words, k=k)
    words = sketches.bloom_words(bloom, n_words)
    probed = stream.withColumn(
        "maybe_member",
        sketches.bloom_probe_expr(
            F.col(key_col), words, n_words=n_words, k=k
        ),
    )
    hits = corpus_keys.distinct().withColumn("__hit", F.lit(True))
    cand = probed.filter(F.col("maybe_member")).join(
        F.broadcast(hits), key_col, "left"
    )
    clean = probed.filter(~F.col("maybe_member")).withColumn(
        "__hit", F.lit(None).cast("boolean")
    )
    return (
        clean.unionByName(cand)
        .withColumn("is_new", F.col("__hit").isNull())
        .drop("__hit")
    )


def stream_countmin(
    events: DataFrame, width_s: int = 3600, depth: int = 2, width: int = 32
) -> DataFrame:
    """Streaming CountMin: per (tumbling window, event_type), the d×w
    counter sketch over ``user_id`` maintained as per-key state — the q105
    frequency-sketch tier carried across micro-batches exactly as
    ``stream_kmv_distinct`` carries KMV and ``stream_quantile_sketch`` the
    bottom-k sample.

    State per key is the flat depth·width counter list (~dw·8 bytes —
    never per-user anything), and cell-wise addition is order- and
    batching-independent, so the final sketch equals the batch
    ``sketches.countmin_sketch`` over the same rows however the stream is
    micro-batched (pinned in test_streaming). Cell coordinates are
    computed IN THE STREAMING PLAN by the same md5 hash52 expression as
    the batch path (codegen, engine-replayable); the Python state update
    only bin-counts them. Emits the nonzero cells (d, pos, cnt) on every
    update — downstream, ``sketches.countmin_query`` probes them exactly
    like a batch-built sketch."""
    import pandas as pd

    from hive_cassandra_spark.operators.sketches import hash52

    bucket = F.to_timestamp(
        F.floor(F.unix_timestamp("ts") / width_s) * width_s
    )
    rows = F.array(*[F.lit(d) for d in range(depth)])
    keyed = events.select(
        F.date_format(bucket, "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        F.explode(rows).alias("d"),
        F.col("user_id").cast("string").alias("__v"),
    ).select(
        "window_start",
        "event_type",
        (
            F.col("d") * width
            + hash52(
                F.concat(F.col("d").cast("string"), F.lit(":"), F.col("__v"))
            )
            % width
        ).alias("cell"),
    )

    def update(key, pdfs, state: GroupState):
        cnt = list(state.get[0]) if state.exists else [0] * (depth * width)
        for pdf in pdfs:
            for cell, n in pdf["cell"].value_counts().items():
                cnt[int(cell)] += int(n)
        state.update((cnt,))
        nz = [(i, c) for i, c in enumerate(cnt) if c]
        yield pd.DataFrame(
            {
                "window_start": [key[0]] * len(nz),
                "event_type": [key[1]] * len(nz),
                "d": [i // width for i, _ in nz],
                "pos": [i % width for i, _ in nz],
                "cnt": [c for _, c in nz],
            }
        )

    return keyed.groupBy("window_start", "event_type").applyInPandasWithState(
        update,
        outputStructType=(
            "window_start string, event_type string, "
            "d bigint, pos bigint, cnt bigint"
        ),
        stateStructType="cs array<bigint>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_histogram(
    events: DataFrame,
    width: str = "1 hour",
    lo: float = 0.0,
    hi: float = 400.0,
    n_bins: int = 8,
) -> DataFrame:
    """Streaming distribution monitoring: per (tumbling window,
    event_type), the clamped equi-width histogram of ``value`` — the
    streaming face of ``relational.histogram`` using ONLY built-in
    streaming aggregation (state per key is one counter row per
    non-empty bin, bounded by windows × types × n_bins; no custom
    stateful operator needed — bins are just grouping keys). Identical
    bin arithmetic to the batch operator, so the bounded replay equals
    the batch histogram exactly."""
    v = F.col("value").cast("double")
    raw = F.floor((v - F.lit(float(lo))) * n_bins / F.lit(float(hi - lo)))
    bin_ = F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1)).cast("long")
    return (
        events.filter(v.isNotNull())
        .withWatermark("ts", "10 minutes")
        .groupBy(
            F.window("ts", width).alias("w"),
            "event_type",
            bin_.alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "bin",
            "cnt",
        )
    )


def stream_funnel(
    events: DataFrame,
    stage_types: tuple[str, ...] = ("view", "click", "purchase"),
    within_s: int = 24 * 3600,
    entity_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming strict-order funnel — the stateful face of
    ``temporal.funnel`` (q136): per entity, the earliest time each stage
    was reached, stage i+1 strictly after stage i and within
    ``within_s`` seconds of it.

    Order-insensitive by construction, so the bounded replay matches the
    batch funnel exactly no matter how the source splits micro-batches:
    state per entity is a small CANDIDATE BUFFER per stage, and the
    funnel is re-resolved from the buffers on every update (the minima
    are not monotone under out-of-order arrival — an earlier first-stage
    event arriving late SHIFTS every later conversion window, so a
    naive keep-the-min state machine silently corrupts; buffering the
    few candidates inside the conversion horizon is the price of
    exactness).

    State bound: stage 1 keeps exactly one timestamp (the min is
    order-insensitive on its own); stage i>1 keeps only candidates
    ``<= t_{i-1} + within_s`` — as t_{i-1} only ever decreases, that
    prune is monotone-safe and caps each buffer at the events inside
    one conversion window (plus everything seen before stage i-1 first
    resolves). At 100 TB the watermark bounds how long buffers can
    grow, and state stays O(entities x horizon-events), hash-partitioned
    by entity like every other stateful operator here.
    """
    import pandas as pd

    n = len(stage_types)
    w_ns = int(within_s) * 1_000_000_000
    type_to_stage = {t: i for i, t in enumerate(stage_types)}

    def _resolve(buffers: list[list[int]]) -> list[int | None]:
        reached: list[int | None] = []
        prev: int | None = None
        for i, cands in enumerate(buffers):
            if i == 0:
                t = min(cands) if cands else None
            elif prev is None:
                t = None
            else:
                valid = [x for x in cands if prev < x <= prev + w_ns]
                t = min(valid) if valid else None
            reached.append(t)
            prev = t
        return reached

    def update(key, pdfs, state: GroupState):
        if state.exists:
            stored = state.get
            seq = stored[0]
            buffers = [list(b) for b in stored[1:]]
        else:
            seq = 0
            buffers = [[] for _ in range(n)]
        for pdf in pdfs:
            stages = pdf["event_type"].map(type_to_stage)
            ts_ns = pdf[ts_col].astype("int64")
            for stage, t in zip(stages, ts_ns):
                if pd.notna(stage):
                    buffers[int(stage)].append(int(t))
        reached = _resolve(buffers)
        # prune: stage 1 needs only its min; stage i>1 keeps candidates
        # inside the (monotone-shrinking) window bound of stage i-1
        buffers[0] = [reached[0]] if reached[0] is not None else []
        for i in range(1, n):
            prev = reached[i - 1]
            if prev is not None:
                buffers[i] = [x for x in buffers[i] if x <= prev + w_ns]
        seq += 1
        state.update((seq, *buffers))
        out = {entity_col: [key[0]], "seq": [seq]}
        for name, t in zip(stage_types, reached):
            out[f"{name}_ts"] = [pd.Timestamp(t) if t is not None else pd.NaT]
        yield pd.DataFrame(out)

    out_fields = ", ".join(f"{name}_ts timestamp" for name in stage_types)
    state_fields = ", ".join(f"s{i} array<bigint>" for i in range(n))
    return events.groupBy(entity_col).applyInPandasWithState(
        update,
        outputStructType=f"{entity_col} bigint, seq bigint, {out_fields}",
        stateStructType=f"seq bigint, {state_fields}",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_anomaly(
    events: DataFrame,
    lookback: int = 20,
    min_periods: int = 8,
    threshold: int = 3,
    scale: int = 100,
    entity_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming rolling z-score anomaly detection — the stateful face of
    ``temporal.rolling_zscore`` (q150): per entity, flag events more than
    ``threshold`` sample stddevs from the mean of their ``lookback``
    ts-predecessors, with the same fixed-point integer-exact verdict.

    Order-insensitive by construction (the q138 candidate-buffer
    discipline): an event's baseline is its 20 TS-predecessors, so a
    late-arriving earlier event SHIFTS the baseline of up to ``lookback``
    later events — verdicts are not monotone under out-of-order arrival
    and a verdict-as-you-go state machine silently corrupts. State per
    entity therefore buffers the (ts, event_id, x, value) stream, and
    every update re-sorts and re-resolves ALL verdicts, emitting the
    entity's full current anomaly set tagged with an update ``seq``; the
    consumer keeps each entity's last seq (``q138``'s contract), which
    the bounded replay hash-matches to the BATCH operator's oracle
    however micro-batches split.

    State bound: the fixture replay keeps the full per-entity stream
    (event-scale per user, vectorized numpy re-resolution). A 100 TB
    deployment bounds it with a watermark: events older than
    ``watermark + lookback`` positions can no longer change any verdict
    — their prefix sums are frozen and the buffer prefix is evictable;
    that finalize-and-evict variant trades the re-emit contract for
    O(lookback) state and is the documented production shape.
    """
    import math

    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np
    import pandas as pd

    t2 = threshold * threshold
    q4 = Decimal("0.0001")

    def _round4(x: float) -> float:
        # Spark round(DOUBLE, 4) quantizes the SHORTEST decimal repr
        # (BigDecimal.valueOf → Double.toString) HALF_UP; Python round()
        # quantizes the exact binary value half-even — they disagree
        # whenever the shortest repr lands on a tie (measured: z =
        # 23.83625 → 23.8363 vs 23.8362 at sf0.01). repr() is the same
        # shortest round-trip string, so this replays Spark bit-for-bit.
        return float(Decimal(repr(x)).quantize(q4, ROUND_HALF_UP))

    def update(key, pdfs, state: GroupState):
        if state.exists:
            seq, ts_b, eid_b, x_b, v_b = state.get
            ts_l, eid_l = list(ts_b), list(eid_b)
            x_l, v_l = list(x_b), list(v_b)
        else:
            seq, ts_l, eid_l, x_l, v_l = 0, [], [], [], []
        for pdf in pdfs:
            ts_l.extend(int(t) for t in pdf[ts_col].astype("int64"))
            eid_l.extend(int(e) for e in pdf["event_id"])
            # fixed-point EXACTLY as the batch side: Spark round() is
            # HALF-AWAY-FROM-ZERO on the double product — pandas .round()
            # is half-even and WOULD diverge on exact .5 products
            prod = pdf["value"].to_numpy() * float(scale)
            x_l.extend(
                int(x) for x in np.where(
                    prod >= 0, np.floor(prod + 0.5), np.ceil(prod - 0.5)
                ).astype("int64")
            )
            v_l.extend(float(v) for v in pdf["value"])
        seq += 1
        order = sorted(range(len(ts_l)), key=lambda i: (ts_l[i], eid_l[i]))
        ts_s = [ts_l[i] for i in order]
        eid_s = [eid_l[i] for i in order]
        x_s = np.array([x_l[i] for i in order], dtype=np.int64)
        v_s = [v_l[i] for i in order]
        cs1 = np.concatenate([[0], np.cumsum(x_s)])
        cs2 = np.concatenate([[0], np.cumsum(x_s * x_s)])
        rows = []
        for i in range(len(x_s)):
            lo = max(0, i - lookback)
            n = i - lo
            if n < min_periods:
                continue
            s1 = int(cs1[i] - cs1[lo])
            s2 = int(cs2[i] - cs2[lo])
            dv = n * int(x_s[i]) - s1
            a = n * s2 - s1 * s1
            if a > 0 and dv * dv * (n - 1) > t2 * n * a:
                # identical IEEE op sequence to the batch expression
                # (math.sqrt is correctly rounded; ** 0.5 via libm pow
                # carries no such guarantee)
                z = float(dv) * math.sqrt((n - 1) / (n * a))
                rows.append(
                    (
                        key[0],
                        seq,
                        eid_s[i],
                        pd.Timestamp(ts_s[i]),
                        v_s[i],
                        _round4(s1 / (float(scale) * n)),
                        _round4(z),
                    )
                )
        state.update((seq, ts_s, eid_s, [int(x) for x in x_s], v_s))
        cols = [entity_col, "seq", "event_id", ts_col, "value",
                "baseline_mean", "zscore"]
        if not rows:
            # tombstone marker: a late arrival can INVALIDATE previously
            # emitted anomalies, so an update that resolves to zero
            # anomalies must still advance the entity's visible seq —
            # otherwise the consumer's keep-last-seq filter would revive
            # the stale verdict set. event_id = -1, filtered post-select.
            rows = [(key[0], seq, -1, pd.NaT, None, None, None)]
        yield pd.DataFrame(rows, columns=cols)

    return events.groupBy(entity_col).applyInPandasWithState(
        update,
        outputStructType=(
            f"{entity_col} bigint, seq bigint, event_id bigint, "
            f"{ts_col} timestamp, value double, baseline_mean double, "
            "zscore double"
        ),
        stateStructType=(
            "seq bigint, ts array<bigint>, eid array<bigint>, "
            "x array<bigint>, v array<double>"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
