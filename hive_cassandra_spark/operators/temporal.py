"""Temporal joins: as-of and range joins over event streams (SURVEY.md §2.C
adjacency — no reference analogue; these are the time-series operators a
training-data pipeline needs that Spark SQL lacks as built-ins).

Both are compositions of existing DataFrame ops (SURVEY.md's preferred
custom-operator tier) with explicitly scale-safe plan shapes:

- ``asof_join`` — for each left row, the latest right row with
  ``right.ts <= left.ts`` on the same key. Implemented as tagged
  union → ONE shuffle on the key → one window sort — the distributed
  sort-merge as-of (pandas ``merge_asof`` per key group, Flink temporal-join
  shape). Never builds the (left × right-history) pair space, so it survives
  arbitrarily long histories; state per key is a single carried struct.

- ``range_join_bucketed`` — points ⋈ intervals containment. A naive
  ``ON p.ts BETWEEN i.start AND i.end`` is a broadcast-nested-loop (or worse,
  a cartesian) in Spark; instead intervals are replicated to each fixed-width
  time bucket they overlap and points map to exactly one bucket, so the join
  is an equi-join on (key, bucket) — shuffle-hash-joinable, AQE-skew-safe —
  followed by the exact containment filter. Bucket width trades replication
  factor against join selectivity; intervals spanning b buckets emit b rows
  (bounded by ``max_buckets_per_interval``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_values: list[str] | None = None,
    tie_col: str | None = None,
    prefix: str = "asof_",
    hot_key_bucket_s: int | None = None,
) -> DataFrame:
    """Left as-of join: every left row, plus the ``right_values`` columns of
    the latest right row with ``right_ts <= left_ts`` and equal ``keys``
    (NULLs when no prior right row exists).

    Determinism: when several right rows share the boundary timestamp, the
    greatest ``tie_col`` wins (default: first of ``right_values``) — encoded
    purely in the window sort order, costing no extra shuffle, and matching
    a (keys, ts)-compacted oracle.

    Plan: union(tagged left, tagged right) → window over (keys) ordered by
    (ts, side, tie) carrying ``last(right_struct, ignoreNulls)`` — right
    sorts before left at equal ts, giving <= (inclusive) semantics. ONE
    exchange, one sort; the history never fans out.

    Hot-key hardening: with the default plan, ONE key carrying a 100 M-row
    history lands a single window partition on a single task.
    ``hot_key_bucket_s`` opts into time-bucket pre-partitioning: rows
    partition on (keys, floor(ts / bucket)), each bucket merges locally,
    and the carried struct crosses bucket boundaries via a per-bucket
    summary table (max_by per bucket, then a prefix-carry window over the
    tiny bucket grid, broadcast back). Costs two extra small-side shuffles
    and bounds task state by bucket width instead of history length.
    """
    right_values = right_values or [c for c in right.columns if c not in keys and c != right_ts]
    tie_col = tie_col or right_values[0]

    rt = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(tie_col).alias("_tie"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("_l"),
        F.struct(*right_values).alias("_r"),
    )
    lt = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(rt.schema["_tie"].dataType).alias("_tie"),
        F.struct(*[c for c in left.columns]).alias("_l"),
        F.lit(None).cast(rt.schema["_r"].dataType).alias("_r"),
    )
    union = lt.unionByName(rt)
    if hot_key_bucket_s is None:
        w = (
            W.partitionBy(*keys)
            .orderBy(F.col("_ts"), F.col("_side"), F.col("_tie"))
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        merged = union.withColumn("_m", F.last("_r", ignorenulls=True).over(w))
    else:
        # (keys, time-bucket) partitioning: the big relation shuffles ONCE on
        # the composite key; everything else operates on the per-key bucket
        # grid, which has one row per occupied bucket (tiny at any scale).
        bucket = F.floor(F.col("_ts").cast("double") / F.lit(int(hot_key_bucket_s)))
        union = union.withColumn("_b", bucket)
        # last right struct of each occupied bucket (right rows only)
        summ = (
            union.filter(F.col("_side") == 0)
            .groupBy(*keys, "_b")
            .agg(F.max_by("_r", F.struct("_ts", "_tie")).alias("_last"))
        )
        # every bucket the union touches, so left-only buckets still get a
        # carry-in; prefix-carry of the last summary from earlier buckets
        grid = union.select(*keys, "_b").distinct()
        wseq = (
            W.partitionBy(*keys)
            .orderBy("_b")
            .rowsBetween(W.unboundedPreceding, -1)
        )
        carry = (
            grid.join(summ, [*keys, "_b"], "left")
            .withColumn("_carry", F.last("_last", ignorenulls=True).over(wseq))
            .select(*keys, "_b", "_carry")
        )
        w2 = (
            W.partitionBy(*keys, "_b")
            .orderBy(F.col("_ts"), F.col("_side"), F.col("_tie"))
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        # no forced broadcast: AQE broadcasts the grid when it is small and
        # falls back to a co-partitioned join (same (keys,_b) hash as the
        # window) when a pathological grid outgrows the threshold
        merged = (
            union.join(carry, [*keys, "_b"], "left")
            .withColumn("_m_local", F.last("_r", ignorenulls=True).over(w2))
            .withColumn("_m", F.coalesce("_m_local", "_carry"))
        )
    out = merged.filter(F.col("_side") == 1).select(
        *[F.col("_l")[c].alias(c) for c in left.columns],
        *[F.col("_m")[c].alias(f"{prefix}{c}") for c in right_values],
    )
    return out


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    keys: list[str],
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_width_s: int = 600,
    max_buckets_per_interval: int = 1000,
) -> DataFrame:
    """All (point, interval) pairs with ``start <= point_ts <= end`` and
    equal ``keys``, as an equi-join.

    Intervals are exploded to every ``bucket_width_s``-wide epoch bucket they
    overlap (``sequence`` — bounded by ``max_buckets_per_interval``; longer
    intervals raise at plan build rather than silently exploding); points map
    to exactly one bucket. The join key (keys…, bucket) is then hashable —
    co-partitioned shuffle join, broadcastable when the interval side is
    small — and the exact ``BETWEEN`` runs as a post-join filter. No row
    dedup is needed: a (point, interval) pair meets in exactly the point's
    single bucket.
    """
    b = F.lit(int(bucket_width_s))
    i_start = F.floor(F.unix_timestamp(F.col(start_col)) / b)
    i_end = F.floor(F.unix_timestamp(F.col(end_col)) / b)
    guard = F.when(
        i_end - i_start < max_buckets_per_interval, i_end
    ).otherwise(
        F.raise_error(
            F.lit(
                f"interval spans >{max_buckets_per_interval} buckets of "
                f"{bucket_width_s}s — widen bucket_width_s"
            )
        )
    )
    iv = intervals.select(
        "*", F.explode(F.sequence(i_start, guard)).alias("_bucket")
    )
    pt = points.withColumn(
        "_bucket", F.floor(F.unix_timestamp(F.col(point_ts)) / b)
    )
    joined = pt.join(iv, [*keys, "_bucket"]).filter(
        F.col(point_ts).between(F.col(start_col), F.col(end_col))
    )
    return joined.drop("_bucket")


def funnel(
    df: DataFrame,
    steps: list[tuple[str, Column]],
    entity_col: str = "user_id",
    ts_col: str = "ts",
    within: str | None = None,
) -> DataFrame:
    """Strict-order funnel: per entity, the earliest time each step was
    reached, where step *i+1* must occur strictly after step *i* (and,
    if ``within`` is set, no later than ``step_i_ts + within``).

    ``steps`` is an ordered list of ``(name, predicate)`` pairs; the
    result has one row per entity with a ``<name>_ts`` timestamp column
    per step (NULL from the first unreached step onward).

    Plan shape — the scale contract: every step is a *conditional
    window min* over the same ``partitionBy(entity)`` window, so the N
    chained steps stack N Window operators on ONE exchange of the
    events (Catalyst reuses the child partitioning; no per-step
    self-join, no shuffle per step — the naive formulation joins the
    event table to itself once per funnel stage and re-shuffles each
    time). The final per-entity collapse is a groupBy over columns that
    are constant within the partition, which AQE coalesces off the same
    exchange. State is O(steps) per entity — this is exactly the
    hand-written funnel a streaming engine would run, expressed
    relationally so it also runs as one batch pass over 100 TB of
    events.

    ``within`` is a SQL interval literal body (e.g. ``"24 hours"``)
    bounding each *hop*, not the whole funnel — the common product-
    analytics definition (Amplitude-style "conversion window per
    step").
    """
    prev_ts: Column | None = None
    w = W.partitionBy(entity_col)
    out = df
    names = []
    for name, pred in steps:
        col_name = f"{name}_ts"
        cond = pred
        if prev_ts is not None:
            cond = cond & (F.col(ts_col) > prev_ts)
            if within is not None:
                cond = cond & (
                    F.col(ts_col) <= prev_ts + F.expr(f"INTERVAL {within}")
                )
        out = out.withColumn(
            col_name, F.min(F.when(cond, F.col(ts_col))).over(w)
        )
        prev_ts = F.col(col_name)
        names.append(col_name)
    return out.groupBy(entity_col).agg(
        *[F.min(n).alias(n) for n in names]
    )


def funnel_summary(
    reached: DataFrame, step_names: list[str], entity_col: str = "user_id"
) -> DataFrame:
    """Per-stage conversion counts from a ``funnel()`` result: one row
    per step with the entities reaching it and the integer-exact mean
    seconds from the previous step (sum of whole-second deltas ``div``
    converters — deterministic BIGINT arithmetic, no float mean).

    Shape: unpivot (explode a step-struct array) → one hash aggregate
    on the step key. ONE pass over the funnel table — a union of
    per-stage aggregates would recompute the funnel subtree (and its
    fact-table scan) once per stage, which is exactly the plan this
    module's operators exist to avoid. Stages an entity never reached
    explode to NULL timestamps and are filtered before the aggregate.
    """
    structs = []
    for i, name in enumerate(step_names):
        ts = F.col(f"{name}_ts")
        prev = F.col(f"{step_names[i - 1]}_ts") if i else None
        delta = (
            (ts.cast("long") - prev.cast("long"))
            if prev is not None
            else F.lit(0).cast("long")
        )
        structs.append(
            F.struct(
                F.lit(i + 1).cast("long").alias("step"),
                F.lit(name).alias("stage"),
                ts.alias("ts"),
                delta.alias("delta"),
            )
        )
    exploded = reached.select(
        F.explode(F.array(*structs)).alias("s")
    ).select("s.step", "s.stage", "s.ts", "s.delta")
    return (
        exploded.filter(F.col("ts").isNotNull())
        .groupBy("step", "stage")
        .agg(
            F.count(F.lit(1)).alias("entities"),
            F.sum("delta").cast("long").alias("__sum_secs"),
        )
        .select(
            "step",
            "stage",
            "entities",
            # entities > 0 by construction (unreached stages were
            # filtered out above, so they emit no row at all)
            F.expr("__sum_secs div entities").alias("avg_secs_from_prev"),
        )
    )


def cohort_retention(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: entities grouped by the ISO week
    (Monday-truncated date) of their first event; one row per
    ``(cohort_week, week_offset)`` with distinct active entities and
    total events in that offset week.

    Two exchanges total, both unavoidable and both keyed correctly at
    scale: (1) the per-entity first-event time is a window min over
    ``partitionBy(entity)`` — same single-exchange shape as ``funnel``;
    (2) the cohort roll-up is a hash aggregate on the (tiny) composite
    ``(cohort_week, week_offset)`` key with a distinct-count on the
    entity, which Spark expands map-side. No self-join of events to a
    first-seen dim table (the textbook formulation), which would
    shuffle the fact table twice.

    ``week_offset`` is integer ``datediff div 7`` from the cohort week
    Monday, so both engines bucket identically (no interval
    arithmetic, no timezone edge: the session pins UTC).
    """
    w = W.partitionBy(entity_col)
    withc = (
        df.withColumn("__first_ts", F.min(F.col(ts_col)).over(w))
        .withColumn(
            "cohort_week", F.date_trunc("week", F.col("__first_ts")).cast("date")
        )
        .withColumn(
            "week_offset",
            F.expr(
                f"datediff(CAST({ts_col} AS DATE), cohort_week) div 7"
            ).cast("long"),
        )
    )
    return withc.groupBy("cohort_week", "week_offset").agg(
        F.countDistinct(entity_col).alias("active_entities"),
        F.count(F.lit(1)).alias("events"),
    )


def rolling_zscore(
    df: DataFrame,
    value_col: str = "value",
    entity_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    lookback: int = 20,
    min_periods: int = 8,
    threshold: int = 3,
    scale: int = 100,
) -> DataFrame:
    """Rolling z-score anomaly detection: flag events whose value is more
    than ``threshold`` sample standard deviations from the mean of the
    entity's previous ``lookback`` events — the standard streaming-metrics
    outlier pass (spend spikes, latency regressions, sensor faults).

    The baseline window is *strictly preceding* (``ROWS BETWEEN lookback
    PRECEDING AND 1 PRECEDING``) so the point under test never pollutes
    its own baseline — the classic self-masking bug in naive
    implementations that include the current row and shrink every spike's
    apparent z. Entities with fewer than ``min_periods`` preceding events
    or a zero-variance baseline emit nothing (no division by ~0 noise).

    Determinism contract — the part a naive ``stddev(...) OVER w`` gets
    wrong: values are fixed-pointed to integers (``round(value·scale)``,
    the money convention) and the frame carries only BIGINT sums S1/S2,
    so with dv = n·x − S1 and A = n·S2 − S1² (the scaled variance
    numerator) the anomaly verdict is the EXACT integer comparison
    ``dv²·(n−1) > t²·n·A`` — engines differing at the 8th significant
    digit of a streamed variance (observed: Spark's central-moments vs
    the oracle's sum-of-squares path) can never flip it. The reported
    ``zscore = dv·√((n−1)/(n·A))`` is computed from those identical
    integers in a fixed sequence of correctly-rounded IEEE ops, so it is
    bit-identical cross-engine before rounding. Magnitude guard: |S1| ≤
    frame·max|x|·scale and A ≤ frame·S2 must fit int64 — at scale=100
    that is values up to ~10⁶ with frames up to ~10⁴, comfortably inside
    any metrics stream; larger domains pick a smaller ``scale``.

    Scale shape: ONE exchange on the entity key carries all three window
    aggregates (count/S1/S2 share the identical window spec, so Catalyst
    computes them in a single Window operator on a single sort); the
    anomaly filter is a post-window projection. Frame ordering includes a
    unique tie-break key — without it equal-timestamp rows make the frame
    (and thus the verdict) nondeterministic across runs and engines.
    """
    w = (
        W.partitionBy(entity_col)
        .orderBy(F.col(ts_col), F.col(tiebreak_col))
        .rowsBetween(-lookback, -1)
    )
    x = F.round(F.col(value_col) * scale).cast("long")
    scored = df.select(
        entity_col,
        tiebreak_col,
        ts_col,
        value_col,
        x.alias("__x"),
        F.count(x).over(w).alias("__n"),
        F.sum(x).over(w).alias("__s1"),
        F.sum(x * x).over(w).alias("__s2"),
    )
    n = F.col("__n")
    dv = n * F.col("__x") - F.col("__s1")
    a = n * F.col("__s2") - F.col("__s1") * F.col("__s1")
    return (
        scored.where(
            (n >= min_periods)
            & (a > 0)
            & (dv * dv * (n - 1) > F.lit(threshold * threshold) * n * a)
        )
        .select(
            entity_col,
            tiebreak_col,
            ts_col,
            value_col,
            F.round(
                F.col("__s1").cast("double") / (F.lit(float(scale)) * n), 4
            ).alias("baseline_mean"),
            F.round(
                dv.cast("double") * F.sqrt((n - 1) / (n * a)), 4
            ).alias("zscore"),
        )
    )


def gapfill_hourly(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    scale: int = 100,
) -> DataFrame:
    """Hourly resample with gap filling — the ``time_bucket_gapfill``
    every time-series/hypertable engine ships: one row per (entity,
    hour) over each entity's OWN observed span, zero-filled where no
    events landed, so downstream window math (moving averages, uptime
    ratios, burn rates) sees a dense regular grid instead of silently
    skipping empty buckets.

    The spine is per-entity (min-hour → max-hour via ``sequence`` +
    ``explode``), NOT entity × global-span — an entity active for a day
    in a year-long corpus contributes 24 rows, not 8 760; total output
    is Σ per-entity span-hours, and the fill join is an equi-join on
    (entity, hour), co-keyed with the hourly aggregate's own exchange.
    Values aggregate as fixed-point BIGINT cents (the q64/q150 money
    convention), so sums are order-independent and engine-exact.

    Output: (entity, hour, n_events, sum_value_cents) — filled hours
    carry (0, 0), distinguishable by ``n_events = 0``.
    """
    cents = F.round(F.col(value_col) * scale).cast("long")
    bounds = df.groupBy(entity_col).agg(
        F.date_trunc("hour", F.min(ts_col)).alias("__h0"),
        F.date_trunc("hour", F.max(ts_col)).alias("__h1"),
    )
    spine = bounds.select(
        entity_col,
        F.explode(
            F.sequence("__h0", "__h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour"),
    )
    hourly = df.groupBy(
        entity_col, F.date_trunc("hour", ts_col).alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(cents).alias("__sc"),
    )
    return spine.join(hourly, [entity_col, "hour"], "left").select(
        entity_col,
        "hour",
        F.coalesce("__n", F.lit(0)).cast("long").alias("n_events"),
        F.coalesce("__sc", F.lit(0)).cast("long").alias("sum_value_cents"),
    )


def locf(
    df: DataFrame,
    entity_col: str = "user_id",
    order_col: str = "hour",
    value_col: str = "sum_value_cents",
    present_col: str = "n_events",
    out_col: str = "value_cents_locf",
) -> DataFrame:
    """Last-observation-carried-forward over a dense grid — the ``locf()``
    fill mode of ``time_bucket_gapfill``: rows where ``present_col`` says
    nothing was observed inherit the most recent observed value within
    their entity, so dashboards and downstream deltas see a step-held
    series instead of zeros. Rows before an entity's first observation
    stay NULL (there is nothing to carry — the honest answer, not 0).

    One window (partition by entity, order by the grid column, unbounded
    preceding → current) with ``last(..., ignorenulls=True)``: a single
    exchange + sort per call, running state is one value per entity —
    bounded however long the grid is. Composes with ``gapfill_hourly``,
    whose output is already keyed (entity, hour).
    """
    w = (
        W.partitionBy(entity_col)
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    observed = F.when(F.col(present_col) > 0, F.col(value_col))
    return df.withColumn(out_col, F.last(observed, ignorenulls=True).over(w))


def ewma_smoothing(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    value_col: str = "value",
    window: int = 8,
    scale: int = 100,
) -> DataFrame:
    """EWMA control-chart smoothing with binary decay — the classic
    anomaly-detection statistic (Roberts 1959): each event's smoothed
    level is a weighted sum of the last ``window`` values where the
    weight HALVES with age, so the statistic tracks level shifts fast
    while averaging out single-event noise. The z-score family (q150)
    flags deviation from a rolling mean; the EWMA chart flags sustained
    drift — the two standard complementary control charts.

    Exactness contract: the usual recursive EWMA (α·x + (1-α)·prev) is
    a float recurrence with no cross-engine reproducibility. This is the
    truncated binary-decay form instead — values as fixed-point cents,
    weights 2^(window-1) … 2^0 over the last ``window`` events via
    explicit ``lag`` columns (absent history contributes 0, the standard
    warm-up convention), summed in BIGINT:

        decayed_cents[t] = Σ_{j=0..W-1}  lag(cents, j, 0) · 2^(W-1-j)

    Every term is exact; any engine replays it bit-for-bit. All W lags
    share ONE window spec (partition by entity, order by ts + tiebreak),
    so the physical plan is a single exchange + sort + Window operator
    with W frame readers — per-row state is W values regardless of
    series length, and the entity partitioning shards freely at 100 TB.

    Output: input row keys + ``cents`` + ``decayed_cents`` (divide by
    2^window - ... downstream if a normalized level is wanted; kept
    scaled here to stay in exact integers).
    """
    w = W.partitionBy(entity_col).orderBy(ts_col, tiebreak_col)
    cents = F.round(F.col(value_col) * scale).cast("long")
    base = df.withColumn("cents", cents)
    decayed = None
    for j in range(window):
        term = F.lag("cents", j, 0).over(w) * F.lit(2 ** (window - 1 - j))
        decayed = term if decayed is None else decayed + term
    return base.select(
        entity_col,
        tiebreak_col,
        ts_col,
        "cents",
        decayed.cast("long").alias("decayed_cents"),
    )


def scd2_intervals(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Slowly-changing-dimension Type-2 history build: collapse a change
    log into validity intervals — one row per (entity, state run) with
    ``valid_from`` / ``valid_to`` / ``is_current`` — the standard
    warehouse shape for "what was this entity's state at time T" joins
    (which then hit ``asof_join`` / ``range_join_bucketed``).

    Two steps on ONE entity exchange and one sort: (1) keep only run
    heads (rows whose state differs from ``lag(state)`` — the
    gaps-and-islands first-of-run filter), (2) ``lead(valid_from)``
    over the same (key, order) window closes each interval; the last
    run stays open (``valid_to`` NULL, ``is_current`` true). Both
    windows share the partitioning and sort, so the physical plan is
    Exchange → Sort → Window → Filter → Window — no second shuffle,
    per-row state is one lag/lead value, and the entity key shards
    freely at 100 TB. Ties at equal timestamps break on
    ``tiebreak_col`` so the run structure is total-ordered and
    engine-exact (no floats anywhere).
    """
    w = W.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    heads = (
        df.select(key_col, ts_col, tiebreak_col, state_col)
        .withColumn("__prev", F.lag(state_col).over(w))
        .filter(
            F.col("__prev").isNull()
            | (F.col(state_col) != F.col("__prev"))
        )
    )
    out = heads.withColumn("__valid_to", F.lead(ts_col).over(w))
    return out.select(
        key_col,
        F.col(state_col).alias("state"),
        F.col(ts_col).alias("valid_from"),
        F.col("__valid_to").alias("valid_to"),
        F.col("__valid_to").isNull().alias("is_current"),
    )


def state_durations(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Time-in-state analytics over the SCD2 history: for every
    (entity, state), the total microseconds spent in that state and the
    number of intervals — the "how long was each user premium / each
    device offline" metric the history table exists to answer. Open
    (current) intervals close at the GLOBAL horizon (max event time
    across the corpus), so every row's time is accounted for and totals
    are conserved per entity.

    Exactness: durations are epoch-microsecond differences summed as
    BIGINT — no float seconds, no per-interval rounding, so per-state
    totals are engine-exact and additive. Plan: ``scd2_intervals``'s
    single entity exchange + one-row broadcast horizon probe + one
    map-side-combinable (entity, state) aggregate.
    """
    iv = scd2_intervals(df, key_col, ts_col, state_col, tiebreak_col)
    horizon = df.groupBy().agg(F.max(ts_col).alias("__horizon"))
    closed = iv.crossJoin(F.broadcast(horizon)).select(
        key_col,
        "state",
        (
            F.unix_micros(F.coalesce("valid_to", "__horizon"))
            - F.unix_micros("valid_from")
        ).alias("__dur_us"),
    )
    return closed.groupBy(key_col, "state").agg(
        F.sum("__dur_us").cast("long").alias("total_us"),
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
    )
