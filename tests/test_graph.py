"""Fixed-iteration PageRank: hand-checked two-node semantics, dangling-
mass conservation, and the no-action-in-loop plan contract."""

from pyspark.sql import functions as F

from hive_cassandra_spark.operators import graph


def test_pagerank_two_node_hand_computed(spark):
    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    # N=2, deg(a)=1, b dangling. r0=(1,1); dangle=1 →
    # r1(a)=0.15+0.85·(0+1/2)=0.575, r1(b)=0.15+0.85·(1+1/2)=1.425
    # iter2: dangle=1.425 → r2(a)=0.15+0.85·1.425/2=0.755625
    #        r2(b)=0.15+0.85·(0.575+0.7125)=1.244375
    got = {r.node: r.rank for r in graph.pagerank(edges, iterations=2).collect()}
    assert abs(got["a"] - 0.755625) < 1e-12
    assert abs(got["b"] - 1.244375) < 1e-12


def test_pagerank_conserves_mass_with_sinks(spark):
    # bipartite all-sinks-right graph: dropping dangling mass would leak
    # ~half the total every round; conservation pins sum(rank) == N
    edges = spark.createDataFrame(
        [(f"p{i}", f"s{i % 3}") for i in range(12)],
        "src string, dst string",
    )
    ranks = graph.pagerank(edges, iterations=3)
    total = ranks.agg(F.sum("rank").alias("t")).collect()[0].t
    n = 15  # 12 sources + 3 sinks
    assert abs(total - n) < 1e-9


def test_pagerank_dedupes_edges_and_truncates_lineage(spark):
    # duplicate (src, dst) pairs count once; per-round checkpointing
    # keeps the RETURNED plan free of the source subtree — a fully lazy
    # recursion re-expands it multiplicatively (measured: 65 scans at
    # K=3 on the fixture before truncation was added)
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("a", "c"), ("b", "c")],
        "src string, dst string",
    )
    ranks = graph.pagerank(edges, iterations=3)
    plan = ranks._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in plan       # reads checkpoint blocks
    assert "Exchange" not in plan           # all shuffles already ran
    got = {r.node: r.rank for r in ranks.collect()}
    assert set(got) == {"a", "b", "c"}
    # duplicate a→b edges don't double a's contribution: deg(a)=2 strictly
    single = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c")], "src string, dst string"
    )
    want = {r.node: r.rank for r in graph.pagerank(single, iterations=3).collect()}
    assert got == want
