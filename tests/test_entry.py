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
