"""Multi-point scaling evidence for the most expensive headline queries
(r05 verdict item 6): every "O(groups x k) shuffle" claim in PLANS.md was
argued from the plan and verified at one scale point. This harness turns
the assertions into measurements.

It synthesizes an N-replica scale-up of sf0.1 under /tmp (keys offset per
replica so CARDINALITIES scale with volume — near-dup text perturbed so
the dedup pair structure doesn't degenerate into N-way identical
clusters), then runs the most expensive headline queries at every point,
recording wall-clock AND actual shuffle-write bytes (REST status API on a
UI-enabled session). A bounded-shuffle plan must scale shuffle bytes
sub-linearly — or, where the shuffle carries the data (dedup pipelines),
no worse than linearly — in input volume.

Writes SCALING_r06.json at the repo root (rendered into PLANS.md by
tools/plan_audit.py) and prints it.

Usage: python tools/scaling_check.py [--replicas N[,M...]] [--trials T]
"""

from __future__ import annotations

import functools
import json
import os
import statistics
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
QUERIES_UNDER_TEST = [
    "q33_dedup_minhash_lsh",
    "q47_similarity_ivf",
    "q62_stream_stream_join",
    "q82_quantile_sketch",
    "q34_dedup_simhash",
    "q92_semantic_dedup",
    # round-6 second batch: the new heavy shapes over documents. The
    # Caesar substitution makes replica token/chunk spaces disjoint, so
    # chunk-dup structure scales per replica (q97), candidate vocab grows
    # with volume while MG state stays capped (q98), the corpus-side bloom
    # build carries 5x keys into the same 64-word filter (q95), and the
    # grouped prefix sum ships 5x narrow bookkeeping rows (q96).
    "q95_incremental_dedup",
    "q96_corpus_mixing",
    "q97_chunk_dedup",
    "q98_heavy_hitters",
    # round-6 fourth batch: the bucketed write+join (both write exchanges
    # and the zero-shuffle SMJ scale with the fact volume — the claim is
    # the JOIN adds no shuffle on top of the writes) and the Merkle
    # repair (digest exchanges stay 16 rows; repair shuffle tracks the
    # divergent fraction, which replication keeps proportional)
    "q106_bucketed_join",
    "q107_merkle_repair",
]
# which table each query reads (only these get synthesized)
TABLES = ["documents", "embeddings", "events", "lineitem", "orders"]


def build_scaled_dir(spark, n: int) -> str:
    dst = f"/tmp/hcs_scale{n}x_{os.getpid()}"

    def replicate(name: str, perturb) -> None:
        src = spark.read.parquet(f"{SF_DIR}/{name}.parquet")
        reps = [perturb(src, i) if i else src for i in range(n)]
        out = functools.reduce(DataFrame.unionByName, reps)
        out.write.mode("overwrite").parquet(f"{dst}/{name}.parquet")

    # documents: ids offset; replica text runs through a PER-REPLICA
    # Caesar substitution — a character bijection preserves the
    # within-replica near-dup structure exactly while making every
    # replica's shingle space disjoint from every other's, so pair counts
    # scale ~linearly with volume. A mere suffix would leave each replica
    # a near-twin of its original (measured: 23x pair blowup at 2x
    # volume) — a harder workload, not a bigger one.
    alpha = "abcdefghijklmnopqrstuvwxyz"
    replicate(
        "documents",
        lambda df, i: df.withColumn(
            "doc_id", F.col("doc_id") + F.lit(i * 100_000_000)
        ).withColumn(
            "text",
            F.translate(
                "text",
                alpha + alpha.upper(),
                (alpha[i:] + alpha[:i]) + (alpha[i:] + alpha[:i]).upper(),
            ),
        ),
    )
    # embeddings: ids offset, vectors deterministically jittered so ANN
    # cells fill with distinct points
    replicate(
        "embeddings",
        lambda df, i: df.withColumn(
            "vec_id", F.col("vec_id") + F.lit(i * 100_000_000)
        ).withColumn(
            "embedding",
            F.transform(
                "embedding", lambda x: (x * (1.0 + i * 1e-3)).cast("float")
            ),
        ),
    )
    # events: user/event ids offset — per-window key cardinality scales
    # with volume (the state-size axis for the streaming queries)
    replicate(
        "events",
        lambda df, i: df.withColumn(
            "event_id", F.col("event_id") + F.lit(i * 1_000_000_000)
        ).withColumn("user_id", F.col("user_id") + F.lit(i * 10_000_000)),
    )
    replicate(
        "lineitem",
        lambda df, i: df.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.lit(i * 1_000_000_000)
        ),
    )
    # orders: keys offset in lockstep with lineitem so the q106 join keeps
    # its 1:N structure at every scale point
    replicate(
        "orders",
        lambda df, i: df.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(i * 1_000_000_000)
        ),
    )
    return dst


def shuffle_write_bytes(spark) -> int:
    url = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{url}/api/v1/applications/{app}/stages") as r:
        stages = json.load(r)
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def main() -> None:
    from hive_cassandra_spark.queries import QUERIES
    from hive_cassandra_spark.session import get_spark

    replicas, trials = [5, 10], 2
    if "--replicas" in sys.argv:
        replicas = [
            int(x)
            for x in sys.argv[sys.argv.index("--replicas") + 1].split(",")
        ]
    if "--trials" in sys.argv:
        trials = int(sys.argv[sys.argv.index("--trials") + 1])
    spark = get_spark(
        "scaling-check",
        extra_conf={
            "spark.ui.enabled": "true",  # the shuffle-bytes probe needs REST
            "spark.ui.port": "4242",
            # the 10x point broadcasts 10x-sized build sides; the default
            # 1g local heap can't hold them (fresh process → effective)
            "spark.driver.memory": "12g",
            # the shuffle-bytes probe sums CUMULATIVE per-stage counters;
            # with the default ~1000 retained stages a long run evicts
            # early stages and deltas go negative — retain everything
            "spark.ui.retainedStages": "100000",
        },
    )
    labels = [chr(ord("b") + i) for i in range(len(replicas))]
    dirs = {"a": SF_DIR}
    points = {"a": SF_DIR}
    for lab, n in zip(labels, replicas):
        d = build_scaled_dir(spark, n)
        dirs[lab] = d
        points[lab] = f"{d} ({n}x sf0.1)"
    out: dict = {
        "metric": "multi_point_scaling",
        "points": points,
        "trials": trials,
        "queries": {},
    }
    for name in QUERIES_UNDER_TEST:
        fn = QUERIES[name].fn
        rec: dict = {}
        for label, sf_dir in dirs.items():
            fn(spark, sf_dir).count()  # warm: codegen + footers
            secs, rows, shuf = [], 0, 0
            for _ in range(trials):
                spark.catalog.clearCache()
                s0 = shuffle_write_bytes(spark)
                t0 = time.perf_counter()
                rows = fn(spark, sf_dir).count()
                secs.append(time.perf_counter() - t0)
                shuf = shuffle_write_bytes(spark) - s0
                if shuf < 0:
                    raise RuntimeError(
                        "stage store evicted mid-run — raise "
                        "spark.ui.retainedStages"
                    )
            rec[label] = {
                "sec": round(statistics.median(secs), 3),
                "rows": rows,
                "shuffle_mb": round(shuf / 1e6, 2),
            }
        sa = rec["a"]["shuffle_mb"]
        for lab in labels:
            rec[f"sec_ratio_{lab}"] = round(
                rec[lab]["sec"] / max(rec["a"]["sec"], 1e-9), 2
            )
            rec[f"shuffle_ratio_{lab}"] = (
                round(rec[lab]["shuffle_mb"] / sa, 2) if sa > 0 else None
            )
        out["queries"][name] = rec
        print(f"# {name}: {json.dumps(rec)}", file=sys.stderr)
    with open("/root/repo/SCALING_r06.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
