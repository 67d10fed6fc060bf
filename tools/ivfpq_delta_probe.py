"""Root-cause probe for MAINT_SCALING_r12's one open number (r12
verdict item 3): ``ivfpq_delta_vs_corpus`` read 1.32x/1.36x wall at
5x/10x bootstrap corpus while its shuffle stayed FLAT (0.1 MB) and the
postings analogue was flat-to-falling.

Hypothesis under test: the inflation is ACCUMULATED-SESSION residue
from the immediately-preceding 5x/10x bootstrap build (heap /
ContextCleaner / block-manager state — the same mechanism TIER_DRIFT
root-caused for the bench heavy tier), not a corpus-dependent scan in
``update_ivfpq_index_occ`` (whose only corpus-adjacent reads are the
one-part quantizer tables and the marker listing, both O(versions) not
O(corpus)).

Design: the SAME fixed-200-vector delta against 1x/5x/10x bootstrap
corpora, but each corpus's indexes are built FIRST, then every timed
delta runs in a FRESH recycled SparkSession (build residue shed), 5
trials, idle-stamped. If the fresh-session ratios are flat within the
tier's ±20% noise, the in-harness reading was session residue; if they
still climb, the dependence is real and the next step is a stage-level
profile of the delta plan.

Writes IVFPQ_PROBE_r13.json and prints one JSON line.
Usage: python tools/ivfpq_delta_probe.py [--trials 5]
"""

from __future__ import annotations

import functools
import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def replicate(src: DataFrame, n: int, key: str) -> DataFrame:
    return functools.reduce(
        DataFrame.unionByName,
        [
            src.withColumn(key, F.col(key) + F.lit(i * 100_000_000))
            if i
            else src
            for i in range(n)
        ],
    )


def main() -> None:
    from hive_cassandra_spark.operators import similarity
    from hive_cassandra_spark.session import get_spark

    trials = 5
    if "--trials" in sys.argv:
        trials = int(sys.argv[sys.argv.index("--trials") + 1])
    base = f"/tmp/hcs_ivfpq_probe_{os.getpid()}"
    shutil.rmtree(base, ignore_errors=True)
    out: dict = {
        "metric": "ivfpq_delta_corpus_probe",
        "trials": trials,
        "load1_at_start": round(os.getloadavg()[0], 2),
        "rows": {},
    }

    # phase 1: build all three corpus indexes + the delta batch in ONE
    # session (build cost is untimed nightly work)
    spark = get_spark(
        "ivfpq-probe", extra_conf={"spark.driver.memory": "12g"}
    )
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    delta_dir = f"{base}/delta_200"
    emb.orderBy("vec_id").limit(200).withColumn(
        "vec_id", F.col("vec_id") + F.lit(10_000_000_000)
    ).write.parquet(delta_dir)
    for mult in (1, 5, 10):
        idx = f"{base}/ivf_c{mult}"
        r = similarity.build_ivfpq_index_occ(
            spark, replicate(emb, mult, "vec_id"), idx,
            n_cells=8, m=4, k_codes=8,
        )
        assert r["committed"], r
    spark.stop()

    # phase 2: per corpus point, a FRESH session times the same delta
    # (one warm commit excluded — codegen/JVM warmup — then `trials`
    # timed commits)
    for mult in (1, 5, 10):
        idx = f"{base}/ivf_c{mult}"
        spark = get_spark(
            "ivfpq-probe", extra_conf={"spark.driver.memory": "12g"}
        )
        delta = spark.read.parquet(delta_dir)
        similarity.update_ivfpq_index_occ(
            spark, idx,
            delta.withColumn("vec_id", F.col("vec_id") + F.lit(999)),
            batch_id="warm",
        )
        secs = []
        for t in range(trials):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            r = similarity.update_ivfpq_index_occ(
                spark, idx,
                delta.withColumn(
                    "vec_id", F.col("vec_id") + F.lit((t + 1) * 1_000_000)
                ),
                batch_id=f"c-{t}",
            )
            secs.append(round(time.perf_counter() - t0, 3))
            assert r["vecs_added"] == 200, r
        spark.stop()
        out["rows"][f"corpus_{mult}x"] = {
            "trials": secs,
            "sec": round(statistics.median(secs), 3),
        }
        print(
            f"# corpus_{mult}x: median {statistics.median(secs):.3f}s "
            f"trials={secs}",
            file=sys.stderr,
        )
    for mult in (5, 10):
        out["rows"][f"sec_ratio_{mult}x_vs_1x"] = round(
            out["rows"][f"corpus_{mult}x"]["sec"]
            / max(out["rows"]["corpus_1x"]["sec"], 1e-9),
            2,
        )
    out["load1_at_end"] = round(os.getloadavg()[0], 2)
    with open("/root/repo/IVFPQ_PROBE_r13.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
