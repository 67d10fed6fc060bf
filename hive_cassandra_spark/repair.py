"""Anti-entropy repair between divergent cell-store replicas.

The reference assumes replica divergence exists — its proxy client fails
over between ring nodes (CassandraProxyClient.java:32-313) and its writes
carry consistency levels precisely because replicas drift — but it leaves
reconciliation to Cassandra's own anti-entropy machinery (Merkle-tree
repair between replicas of a token range). A lake-backed cell store has no
daemon doing that, so the engine provides the same protocol as a batch
operator pair:

1. ``range_digests`` — per token-range bucket, a tiny commutative summary
   (cell count + XOR of per-cell 52-bit hashes). This is the Merkle-leaf
   exchange: two replicas compare O(n_ranges) rows, NOT their data.
2. ``merkle_diff`` — full outer join of two digest tables; a bucket whose
   (count, xor) differ (or that one side lacks) is out of sync.
3. ``repair_ranges`` — re-read ONLY the mismatched buckets from both
   replicas (the bucket list is ≤ n_ranges rows → broadcast semi-join;
   in-sync ranges are never rescanned), union, and resolve each cell
   last-write-wins with a deterministic tie-break.

Scale posture: the digest pass is one map-side-combinable aggregation per
replica (shuffle carries n_ranges rows); the repair pass scans only
divergent ranges — at 100 TB with 0.1% drift, 99.9% of the store moves
zero bytes. XOR is the associative/commutative combiner that cannot
overflow (sums of 2^52-bit hashes overflow BIGINT after ~2048 cells);
count rides along so a bucket where two cell-swaps cancel in XOR still
mismatches on cardinality unless the swap is hash-colliding (52-bit
probabilistic guarantee, same tier as the md5 fingerprints in
operators/text.py).

Cell identity here is the STRING form of caller-named columns joined with
'|' (NULL → ''), so the operator works over raw binary cells (hex them
first) or decoded logical cells alike, and an ANSI-SQL oracle replays the
digests bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from hive_cassandra_spark.operators.sketches import hash52

DEFAULT_RANGES = 16


def _cell_str(cols: list[str]) -> F.Column:
    parts: list[F.Column] = []
    for i, c in enumerate(cols):
        if i:
            parts.append(F.lit("|"))
        parts.append(F.coalesce(F.col(c).cast("string"), F.lit("")))
    return F.concat(*parts)


def token_bucket(key_col: str, n_ranges: int = DEFAULT_RANGES) -> F.Column:
    """Token-range bucket of a cell: hash52 of the row key's string form,
    modulo ``n_ranges`` (≙ the ring's token ranges; the reference sizes
    scan splits on exactly this partitioning,
    HiveCassandraStandardSplit.java:13-158)."""
    return (hash52(F.col(key_col).cast("string")) % n_ranges).alias("bucket")


def range_digests(
    cells: DataFrame,
    key_col: str,
    cell_cols: list[str],
    n_ranges: int = DEFAULT_RANGES,
) -> DataFrame:
    """(bucket, n_cells, xor_digest) per token range. One aggregation,
    map-side combined; output is ≤ n_ranges rows no matter the store
    size — the thing two replicas actually exchange."""
    return (
        cells.select(
            token_bucket(key_col, n_ranges),
            hash52(_cell_str(cell_cols)).alias("__h"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.bit_xor("__h").alias("xor_digest"),
        )
    )


def merkle_diff(da: DataFrame, db: DataFrame) -> DataFrame:
    """Compare two digest tables: one row per bucket present on either
    side, with both sides' summaries and ``mismatch`` = the bucket needs
    repair. Joins two ≤ n_ranges-row frames — negligible at any scale."""
    a = da.select(
        "bucket",
        F.col("n_cells").alias("a_cells"),
        F.col("xor_digest").alias("a_xor"),
    )
    b = db.select(
        "bucket",
        F.col("n_cells").alias("b_cells"),
        F.col("xor_digest").alias("b_xor"),
    )
    return a.join(b, "bucket", "full_outer").select(
        "bucket",
        F.coalesce("a_cells", F.lit(0)).alias("a_cells"),
        F.coalesce("b_cells", F.lit(0)).alias("b_cells"),
        (
            ~(
                F.coalesce("a_cells", F.lit(-1)).eqNullSafe(
                    F.coalesce("b_cells", F.lit(-2))
                )
                & F.coalesce("a_xor", F.lit(-1)).eqNullSafe(
                    F.coalesce("b_xor", F.lit(-2))
                )
            )
        ).alias("mismatch"),
    )


def repair_ranges(
    cells_a: DataFrame,
    cells_b: DataFrame,
    diff: DataFrame,
    key_col: str,
    id_cols: list[str],
    ts_col: str,
    value_cols: list[str],
    n_ranges: int = DEFAULT_RANGES,
) -> DataFrame:
    """The repaired content of every mismatched range: union both
    replicas' cells WITHIN those ranges only, resolve each cell key
    (``id_cols``) last-write-wins on ``ts_col`` (ties broken by the
    value columns descending, then by which replica, so the outcome is
    deterministic — the reference's writer-assigned-timestamp LWW,
    RegularTableMapping.java:84,94, never sees ties because one writer
    owns the clock; two drifted replicas can).

    The mismatched-bucket list is broadcast (≤ n_ranges rows); in-sync
    buckets are filtered out AT THE SCAN of both replicas, so repair I/O
    is proportional to divergence, not store size. Output: the winning
    cells, tagged with their bucket."""
    bad = diff.filter("mismatch").select("bucket")
    order = [F.col(ts_col).desc()] + [F.col(c).desc() for c in value_cols]
    out_cols = list(
        dict.fromkeys([*id_cols, ts_col, *value_cols, "__replica"])
    )

    def tagged(cells: DataFrame, replica: str) -> DataFrame:
        return cells.select(
            token_bucket(key_col, n_ranges),
            *[F.col(c) for c in out_cols if c != "__replica"],
            F.lit(replica).alias("__replica"),
        ).join(F.broadcast(bad), "bucket")

    merged = tagged(cells_a, "a").unionByName(tagged(cells_b, "b"))
    w = Window.partitionBy("bucket", *id_cols).orderBy(
        *order, F.col("__replica").asc()
    )
    return (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__replica")
    )
