"""Driver-contract smoke: entry() runs, queries()/oracle_sql() are consistent."""

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_oracle_keys_subset_of_queries():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 45
    assert all(isinstance(sql, str) and sql.strip() for sql in oracles.values())


def test_all_queries_run_at_smoke_sf(spark, sf_dir):
    # every callable must at least build a valid plan; execute the cheap ones
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, name


def test_queries_survive_driver_like_session(spark, sf_dir):
    """The driver builds its own SparkSession without session.get_spark's
    confs (round-1 failure: PARQUET_TYPE_ILLEGAL on events.parquet). Simulate
    it by unsetting every correctness-critical conf, then run the queries
    that depend on them — the register() wrapper must restore the confs."""
    from hive_cassandra_spark.session import _REQUIRED_RUNTIME_CONF

    saved = {k: spark.conf.get(k, None) for k in _REQUIRED_RUNTIME_CONF}
    # a driver session would also plausibly run non-UTC / ANSI-on defaults
    hostile = {
        "spark.sql.session.timeZone": "America/New_York",
        "spark.sql.ansi.enabled": "true",
    }
    try:
        for k in _REQUIRED_RUNTIME_CONF:
            spark.conf.unset(k)
        for k, v in hostile.items():
            spark.conf.set(k, v)
        qs = entrymod.queries()
        # events family (round-1 red): must read TIMESTAMP(NANOS) parquet
        df = qs["q64_hypertable_rollup"](spark, sf_dir)
        assert df.count() > 0
        # timestamp formatting must come out UTC despite the hostile tz
        df2 = qs["q01_pricing_summary"](spark, sf_dir)
        assert df2.count() > 0
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
