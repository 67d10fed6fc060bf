"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same sf dir, then compares row count, sorted column names, and the
full sorted value multiset (exact equality after string normalization —
stricter than any reasonable hash, so passing here should pass the driver).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
import traceback

sys.path.insert(0, "/root/repo")


def normalize(v):
    if v is None:
        return "␀"
    if isinstance(v, float):
        if v != v:
            return "nan"
        # driver-style: repr floats; we require exact equality
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def rows_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(normalize(r[i]) for i in order) for r in rows)


def main():
    import duckdb

    from hive_cassandra_spark.session import get_spark
    import __spark_entry__ as entrymod

    args = [a for a in sys.argv[1:] if a != "--vanilla"]
    vanilla = "--vanilla" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    if vanilla:
        # driver-parity mode: a bare session with NONE of session.py's
        # confs — every query must self-pin what it needs
        # (session.ensure_session_confs via the register() wrapper)
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("oracle-check-vanilla")
            .master("local[32]")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:
            failures.append(name)
            print(f"FAIL {name}: spark error\n{traceback.format_exc()}")
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows={len(srows)} (no oracle — rows-only)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception:
            failures.append(name)
            print(f"FAIL {name}: duckdb error\n{traceback.format_exc()}")
            continue
        dt = time.time() - t0
        if sorted(scols) != sorted(ocols):
            failures.append(name)
            print(f"FAIL {name}: schema spark={sorted(scols)} oracle={sorted(ocols)}")
            continue
        if len(srows) != len(orows):
            failures.append(name)
            print(f"FAIL {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            continue
        sk, ok_ = rows_key(srows, scols), rows_key(orows, ocols)
        if sk != ok_:
            failures.append(name)
            diff = [(a, b) for a, b in zip(sk, ok_) if a != b][:3]
            print(f"FAIL {name}: values differ; first diffs: {diff}")
            continue
        print(f"PASS {name}: rows={len(srows)} ({dt:.1f}s)")

    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL PASS")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
