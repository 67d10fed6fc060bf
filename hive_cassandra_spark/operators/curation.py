"""Training-corpus curation operators beyond the basic text suite
(SURVEY.md §2.C extensions): sequence packing, benchmark decontamination,
PII detection/redaction, keyword extraction.

Scale posture:

- **pack_sequences** is the GPT-style concat-and-chunk packer. Its core is
  a GLOBAL prefix sum of token counts, which a naive single-key window
  would funnel through one task; here it is the classic two-phase
  distributed prefix sum — per-partition running sums (window keyed by the
  range-partition id) plus a tiny broadcast table of per-partition offsets
  — so no task ever sees more than its own partition.
- **contamination** broadcasts the benchmark's distinct shingle set (small
  by definition — benchmarks are thousands of items, not billions) against
  the corpus shingle explode: one broadcast join + one groupBy(doc).
- **pii_stats / pii_redact** are pure per-row regex projections — zero
  shuffle, codegen'd, no Python.
- **keywords** is two hash aggregations plus an aggregated-side equi-join;
  ranking is INTEGER-ONLY (tf desc, doc-frequency asc, term asc) — the
  tf-idf ordering without the float idf, so results are bit-exact across
  engines and immune to log() libm drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from hive_cassandra_spark.operators import relational
from hive_cassandra_spark.operators.dedup import shingle_table
from hive_cassandra_spark.operators.sketches import hash52
from hive_cassandra_spark.operators.text import tokens

# Regexes chosen to behave identically under Java regex (Spark) and RE2
# (DuckDB): no lookaround, no backrefs.
EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z][a-z]+"
PHONE_RE = "555-[0-9][0-9][0-9][0-9]"


def pack_sequences(
    df: DataFrame,
    capacity: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """GPT-style sequence packing: conceptually concatenate every document's
    tokens in ``id_col`` order and cut the stream into fixed ``capacity``
    token chunks; documents may straddle a cut. Returns one row per doc:
    (doc_id, tok_count, start_offset, first_chunk, last_chunk, n_chunks).

    The global offset is a distributed two-phase prefix sum:

    1. ``repartitionByRange(id)`` so partition p holds an id range wholly
       before partition p+1 (RangePartitioner assigns ascending ranges to
       ascending partition ids), then a window prefix sum WITHIN each
       partition (keyed by the partition id — parallel across partitions).
    2. One tiny aggregation (#partitions rows) produces per-partition token
       totals; their exclusive prefix sum — computed in the same window
       form over the one-row-per-partition table — broadcast-joins back as
       each partition's base offset.

    No task ever windows over more than its own partition; the only
    all-to-one structure is the #partitions-row offset table.
    """
    if capacity <= 0:
        raise ValueError("capacity must be a positive token count")
    sess = df.sparkSession
    nparts = int(sess.conf.get("spark.sql.shuffle.partitions", "32"))
    # Persist the narrow (id, tok, pid) projection: both the in-partition
    # cumsum and the per-partition totals derive from it, and without the
    # persist each branch re-scans, re-TOKENIZES, and re-range-exchanges
    # the full corpus (plan-verified: 2 scans + 2 range exchanges → 1 of
    # each). ~16 bytes/doc — negligible next to the text it replaces, but
    # CALLER CONTRACT for long-lived sessions: it stays cached until LRU
    # eviction; unpersist via spark.catalog.clearCache() between corpora
    # if that matters. (Unlike relational.prefix_sum_by_group, the keyed
    # order here is the raw id and the value is a tokenization — caching
    # the narrow projection beats recomputing the tokenizer twice, and
    # pid-consistency is safe under eviction because recomputes reuse the
    # materialized shuffle's fixed range bounds.)
    base = (
        df.repartitionByRange(nparts, F.col(id_col))
        .select(
            F.col(id_col),
            F.size(tokens(F.col(text_col))).alias("tok"),
            F.spark_partition_id().alias("pid"),
        )
        .persist()
    )
    w_in = (
        Window.partitionBy("pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = base.withColumn("cum_in", F.sum("tok").over(w_in) - F.col("tok"))
    w_off = (
        Window.orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = (
        base.groupBy("pid")
        .agg(F.sum("tok").alias("part_tok"))
        .withColumn("part_off", F.sum("part_tok").over(w_off) - F.col("part_tok"))
        .select("pid", "part_off")
    )
    packed = local.join(F.broadcast(offsets), "pid").select(
        F.col(id_col),
        F.col("tok").alias("tok_count"),
        (F.col("part_off") + F.col("cum_in")).alias("start_offset"),
    )
    first = F.expr(f"start_offset div {capacity}")
    last = F.when(
        F.col("tok_count") > 0,
        F.expr(f"(start_offset + tok_count - 1) div {capacity}"),
    ).otherwise(first)
    return packed.select(
        id_col,
        "tok_count",
        F.col("start_offset").cast("long"),
        first.cast("long").alias("first_chunk"),
        last.cast("long").alias("last_chunk"),
        F.when(F.col("tok_count") > 0, (last - first + 1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_chunks"),
    )


def contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination signal: for every corpus document, how many
    of its distinct word n-gram shingles appear anywhere in the benchmark
    set (the GPT-3-style n-gram-collision test). Returns
    (doc_id, n_shingles, overlap, contaminated).

    Shape: the benchmark's DISTINCT shingles broadcast (benchmarks are
    small); corpus shingles explode once, inner-broadcast-join, one
    groupBy(doc); docs with zero collisions are restored by a left join
    against the compact per-doc shingle table. The corpus is never
    shuffled except by the aggregate on doc — and that input is already
    collision rows only.
    """
    corp_tbl = shingle_table(corpus, text_col, id_col, n).persist()
    bench_sh = (
        shingle_table(benchmark, text_col, id_col, n)
        .select(F.explode("shs").alias("sh"))
        .distinct()
    )
    hits = (
        corp_tbl.select("doc", F.explode("shs").alias("sh"))
        .join(F.broadcast(bench_sh), "sh")
        .groupBy("doc")
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    return (
        corp_tbl.select("doc", F.size("shs").alias("n_shingles"))
        .join(hits, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            "n_shingles",
            F.coalesce(F.col("overlap"), F.lit(0)).cast("long").alias("overlap"),
            (F.coalesce(F.col("overlap"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


# Case-insensitive flag shared by detection and redaction: `(?i)` is inline
# syntax in BOTH Java regex (Spark) and RE2 (DuckDB), so the operators can
# run on the ORIGINAL-case text — non-PII characters keep their casing in
# the redacted output (r03 ADVICE item 1; the old version lowered the whole
# document before redacting, lossy for every PII-free doc too).
_CI = "(?i)"


def pii_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII hit counts (emails, phone numbers) — a pure regex
    projection, zero shuffle. The patterns are the dual-engine-safe subset
    (no lookaround, inline ``(?i)`` for case-insensitivity); real
    deployments extend the list the same way."""
    t = F.col(text_col)
    return df.select(
        "*",
        F.size(F.regexp_extract_all(t, F.lit(_CI + EMAIL_RE), F.lit(0))).alias("email_count"),
        F.size(F.regexp_extract_all(t, F.lit(_CI + PHONE_RE), F.lit(0))).alias("phone_count"),
    )


def pii_redact(df: DataFrame, text_col: str = "text", out_col: str = "redacted") -> DataFrame:
    """Replace detected PII spans with typed placeholders, preserving the
    original casing of everything outside the spans (patterns carry inline
    ``(?i)``). Emails first, so a phone-like digit run inside an address
    can't be double-redacted."""
    t = F.col(text_col)
    red = F.regexp_replace(
        F.regexp_replace(t, _CI + EMAIL_RE, "[EMAIL]"), _CI + PHONE_RE, "[PHONE]"
    )
    return df.withColumn(out_col, red)


# HTML boilerplate removal: ordered regex passes, dual-engine-safe (Java
# regex and RE2 both support inline (?is) flags and lazy quantifiers; no
# lookaround, no backrefs). Script/style/comment BLOCKS go first so their
# contents (which may contain bare '<' comparisons) never reach the
# generic tag pass. Entities are LITERAL replaces — '&amp;' is decoded
# LAST so '&amp;lt;' yields the text '&lt;', never a second decode.
HTML_BLOCK_PATTERNS = [
    "(?is)<script\\b[^>]*>.*?</script>",
    "(?is)<style\\b[^>]*>.*?</style>",
    "(?s)<!--.*?-->",
    "<[^>]+>",
]
HTML_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", "\""),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def strip_html(
    df: DataFrame, text_col: str = "text", out_col: str = "clean"
) -> DataFrame:
    """Main-text extraction from HTML/markup (the trafilatura/jusText slot
    in a crawl pipeline, as a deterministic regex cascade): drop script,
    style, and comment blocks wholesale, strip remaining tags, decode the
    six ubiquitous entities, collapse whitespace. A pure per-row codegen
    projection — zero shuffle, no Python — so it runs at scan speed over
    100 TB of raw crawl. Plain text passes through unchanged (modulo
    whitespace collapse), so the operator is safe to run unconditionally."""
    col = F.col(text_col)
    for pat in HTML_BLOCK_PATTERNS:
        col = F.regexp_replace(col, pat, " ")
    for ent, ch in HTML_ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(ch))
    col = F.trim(F.regexp_replace(col, "\\s+", " "))
    return df.withColumn(out_col, col)


def length_batches(
    df: DataFrame,
    batch_size: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Length-bucketed batching for transformer inference: order documents
    by token count DESC (tie: id) and cut consecutive runs of
    ``batch_size`` docs into batches, so each batch pads to its own max
    length instead of the corpus max — the standard dynamic-batching trick
    that turns O(corpus_max) padding into O(batch_max). Returns per batch:

    - ``n_docs / max_tok / min_tok / sum_tok``
    - ``padded_tok`` = n_docs·max_tok — tokens actually computed
    - ``waste_pct``  = 100·(padded−sum) ÷ padded (integer) — the fraction
      of FLOPs spent on padding; length-sorted batching drives this toward
      zero, which is the operator's whole point.

    Scale shape: the global ordering is ``relational.global_row_number``
    (range repartition + per-partition window + broadcast offsets — no
    single-task window anywhere), then one map-side-combinable
    groupBy(batch_id). The text column is dropped before any exchange; the
    shuffle carries (id, tok, rn) triples only."""
    if batch_size <= 0:
        raise ValueError("batch_size must be a positive doc count")
    toks = df.select(
        F.col(id_col), F.size(tokens(F.col(text_col))).alias("tok")
    )
    rn = relational.global_row_number(
        toks, [("tok", "desc"), (id_col, "asc")]
    )
    b = rn.withColumn("batch_id", F.expr(f"rn div {batch_size}"))
    padded = (F.count(F.lit(1)) * F.max("tok")).cast("long")
    waste = padded - F.sum("tok").cast("long")
    return b.groupBy("batch_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.max("tok").cast("long").alias("max_tok"),
        F.min("tok").cast("long").alias("min_tok"),
        F.sum("tok").cast("long").alias("sum_tok"),
        padded.alias("padded_tok"),
        F.floor(waste * 100 / F.greatest(padded, F.lit(1)))
        .cast("long")
        .alias("waste_pct"),
    )


def keywords(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k characteristic terms per document, ranked by
    (term frequency DESC, document frequency ASC, term ASC) — the tf-idf
    ordering with the float idf replaced by its integer monotone surrogate
    (df asc ≡ idf desc), so ranking is bit-exact across engines with no
    log() in sight. Returns (doc_id, term, tf, df, rank).

    Two hash aggregations (doc×term, then term) and one equi-join on term;
    the join's right side is already aggregated to term granularity so the
    exchange carries one row per distinct term, not per occurrence.
    """
    tok = df.select(
        F.col(id_col).alias("doc"), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = tok.groupBy("doc", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    return (
        tf.join(dfreq, "term")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("doc").alias(id_col), "term", "tf", "df", "rank")
    )


# URL structure shared by the Spark parser and the oracle SQL: scheme,
# host, then everything to end-of-string or the first /?# . No lookaround
# (Java regex and RE2 agree).
URL_HOST_RE = "^[a-z][a-z0-9+.-]*://([^/?#]+)"


def parse_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Split a URL column into host and top-level domain — the grouping
    keys of crawl-style curation (per-domain caps, blocklists, domain
    mixing). Pure regex projection, zero shuffle. Adds ``host`` (empty
    string when the URL does not parse) and ``tld`` (the host's last
    dot-segment, or the whole host when it has no dot)."""
    host = F.regexp_extract(F.lower(F.col(url_col)), URL_HOST_RE, 1)
    return df.withColumn("host", host).withColumn(
        "tld", F.element_at(F.split(F.col("host"), "\\."), -1)
    )


def quality_cascade(
    df: DataFrame,
    rules: list[tuple[str, F.Column]],
) -> DataFrame:
    """Explainable quality filtering: apply an ORDERED list of
    (reason_name, reject_predicate) rules and emit ``kept`` plus
    ``reject_reason`` — the FIRST rule that fired, or NULL when the
    document survives. Production curation runs dozens of such rules
    (Gopher/C4-style); attributing every drop to a specific rule is what
    makes the pipeline auditable and lets rule hit-rates be monitored per
    batch. Pure expression cascade (one CASE chain), zero shuffle, no
    Python."""
    if not rules:
        raise ValueError("quality_cascade needs at least one rule")
    expr = None
    for name, pred in rules:
        expr = F.when(pred, F.lit(name)) if expr is None else expr.when(
            pred, F.lit(name)
        )
    reason = expr.otherwise(F.lit(None).cast("string"))
    return df.withColumn("reject_reason", reason).withColumn(
        "kept", F.col("reject_reason").isNull()
    )


def domain_cap(
    df: DataFrame,
    k: int,
    domain_col: str = "host",
    order_cols: list | None = None,
    blocked_tlds: list[str] | None = None,
) -> DataFrame:
    """Crawl-curation domain policy: drop documents from blocklisted TLDs,
    then keep at most ``k`` documents per domain, preferring by
    ``order_cols`` (a deterministic total order — callers include a unique
    key as the final tiebreak). The standard defense against a single
    boilerplate-heavy domain dominating a 100 TB crawl mix.

    Shape: one narrow blocklist filter (the blocklist is a literal
    in-plan set, not a join), then one rank window keyed by domain —
    a single hash-partitioned sort, spillable, no collect. Adds ``rank``.
    """
    if order_cols is None:
        raise ValueError("order_cols must define a deterministic total order")
    out = df
    if blocked_tlds:
        # NULL tld (unparseable host) is not blocklisted — keep it. A bare
        # ~isin() would drop NULLs via three-valued logic (r03 ADVICE 2).
        out = out.filter(
            F.col("tld").isNull() | ~F.col("tld").isin(*blocked_tlds)
        )
    w = Window.partitionBy(domain_col).orderBy(*order_cols)
    return (
        out.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def mixture_select(
    df: DataFrame,
    total_budget: int,
    weight: F.Column,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Data-mixture selection: fill a global token budget from many
    sources in proportion to per-source weights — the operator that turns
    a raw multi-source crawl into a training mix ("40% web, 30% code, ...")
    without materializing or shuffling the full corpus more than once.

    Per source s with weight w_s, the token budget is
    ``floor(total_budget * w_s / sum(w))``. Within a source, documents are
    ranked by a deterministic md5 hash of (source, id) — a stable
    pseudo-random order, reproducible across runs and cluster sizes — and
    a document is kept while the tokens of the docs ranked before it
    (``cum_before``) are still under the source's budget (greedy fill: the
    document that crosses the boundary is included).

    Scale shape: the per-source running token sum is
    ``relational.prefix_sum_by_group`` — the two-phase distributed prefix
    sum — NOT a ``Window.partitionBy(source)``, which would funnel each
    source (one of maybe a dozen, each carrying terabytes) through a
    single task. Weights reduce to one ≤#sources-row broadcast table.
    ``weight`` must be a deterministic expression over the input row
    (constant within a source).

    Output: one row per input doc — (id, source, tok_count, cum_before,
    source_budget, keep).
    """
    if total_budget <= 0:
        raise ValueError("total_budget must be a positive token count")
    base = df.select(
        F.col(id_col),
        F.col(source_col),
        weight.cast("long").alias("__w"),
        F.size(tokens(F.col(text_col))).alias("tok_count"),
        hash52(
            F.concat(F.col(source_col), F.lit(":"), F.col(id_col).cast("string"))
        ).alias("__rank"),
    )
    cum = relational.prefix_sum_by_group(
        base, [source_col], "__rank", "tok_count", out_col="cum_before",
        uniform52=True,  # __rank is hash52: static splits, no sample job
    )
    # one row per source + the scalar weight total: both broadcast-sized
    per_source = cum.groupBy(source_col).agg(F.max("__w").alias("__w"))
    total_w = per_source.groupBy().agg(F.sum("__w").alias("__sum_w"))
    budgets = per_source.crossJoin(F.broadcast(total_w)).select(
        source_col,
        F.expr(f"cast({total_budget} as bigint) * __w div __sum_w").alias(
            "source_budget"
        ),
    )
    return (
        cum.join(F.broadcast(budgets), source_col)
        .withColumn("keep", F.col("cum_before") < F.col("source_budget"))
        .drop("__w", "__rank")
    )


# Gopher rule thresholds (Rae et al. 2021, table A1 — the repetition
# rules live in text.repetition_stats; these are the document-shape and
# symbol rules). Ratio thresholds are expressed as integer cross-products
# in the predicates below, so the keep verdict never touches a float.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """Gopher-style document-shape quality rules: word-count bounds, mean
    word length 3–10, symbol-to-word ratio (# and …) ≤ 0.1, ≥ 80% of words
    containing a letter, ≥ 2 stopword hits, ≤ 90% bullet-point lines,
    ≤ 30% ellipsis-terminated lines. The canonical first-pass filter every
    web-crawl training pipeline runs (C4/Gopher/RefinedWeb lineage);
    complements ``quality_cascade`` (which attributes drops to rules) by
    emitting the full metric row per document for monitoring.

    Every threshold is evaluated in INTEGER arithmetic — e.g. symbol
    ratio < 0.1 is ``10·symbols < words``, mean word length ∈ [3,10] is
    ``3·words ≤ chars ≤ 10·words`` — so the keep verdict is bit-identical
    across engines and immune to float rounding at the boundary; the
    rounded float ratios in the output are for reporting only.

    Shape: ONE codegen'd projection over the corpus — token/line arrays
    are built and folded per row, nothing shuffles, no Python. At 100 TB
    this runs at scan speed with whatever parallelism the source had.
    """
    t = F.col(text_col)
    toks = tokens(t)
    n_words = F.size(toks).cast("long")
    word_chars = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    n_hash = F.length(t) - F.length(F.regexp_replace(t, "#", ""))
    n_ellipsis = F.floor(
        (F.length(t) - F.length(F.regexp_replace(t, "\\.\\.\\.", ""))) / 3
    ).cast("long")
    n_symbols = (n_hash + n_ellipsis).cast("long")
    alpha_words = F.size(
        F.filter(toks, lambda x: x.rlike("[a-z]"))
    ).cast("long")
    stop_lit = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    stop_hits = F.size(
        F.filter(toks, lambda x: F.array_contains(stop_lit, x))
    ).cast("long")
    lines = F.filter(
        F.split(t, "\n"), lambda x: F.length(F.trim(x)) > 0
    )
    n_lines = F.size(lines).cast("long")
    bullet_lines = F.size(
        F.filter(
            lines,
            lambda x: F.ltrim(x).startswith("- ") | F.ltrim(x).startswith("* "),
        )
    ).cast("long")
    ellipsis_lines = F.size(
        F.filter(lines, lambda x: F.rtrim(x).endswith("..."))
    ).cast("long")

    metrics = df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        word_chars.alias("__word_chars"),
        n_symbols.alias("__n_symbols"),
        alpha_words.alias("__alpha_words"),
        stop_hits.alias("stopword_hits"),
        n_lines.alias("__n_lines"),
        bullet_lines.alias("__bullet_lines"),
        ellipsis_lines.alias("__ellipsis_lines"),
    )
    nw = F.col("n_words")
    keep = (
        (nw >= min_words)
        & (nw <= max_words)
        & (F.lit(3) * nw <= F.col("__word_chars"))
        & (F.col("__word_chars") <= F.lit(10) * nw)
        & (F.lit(10) * F.col("__n_symbols") < nw)
        & (F.lit(5) * F.col("__alpha_words") > F.lit(4) * nw)
        & (F.col("stopword_hits") >= 2)
        & (F.lit(10) * F.col("__bullet_lines") <= F.lit(9) * F.col("__n_lines"))
        & (F.lit(10) * F.col("__ellipsis_lines") <= F.lit(3) * F.col("__n_lines"))
    )
    one_w = F.greatest(nw, F.lit(1))
    one_l = F.greatest(F.col("__n_lines"), F.lit(1))
    return metrics.select(
        id_col,
        "n_words",
        F.round(F.col("__word_chars") / one_w, 4).alias("mean_word_len"),
        F.round(F.col("__n_symbols") / one_w, 4).alias("symbol_word_ratio"),
        F.round(F.col("__alpha_words") / one_w, 4).alias("alpha_word_ratio"),
        "stopword_hits",
        F.round(F.col("__bullet_lines") / one_l, 4).alias("bullet_line_ratio"),
        F.round(F.col("__ellipsis_lines") / one_l, 4).alias("ellipsis_line_ratio"),
        keep.alias("keep"),
    )


def k_anonymity_assign(
    df: DataFrame,
    qi_levels: list[list[str]],
    k: int,
) -> DataFrame:
    """k-anonymity generalization assignment (Sweeney 2002; the
    Mondrian-style multi-level variant, public algorithms): given a
    ladder of quasi-identifier column sets from finest to coarsest,
    assign every record the FINEST level at which its QI group reaches
    size ≥ k; records anonymous at no level get level -1 (suppression
    candidates). Appends:

    - ``__level``    — chosen generalization level (or -1),
    - ``__group_n``  — the chosen level's group size (coarsest if -1),
    - ``__group_key``— the chosen level's QI tuple as a string key.

    The release-gating primitive a training pipeline runs before
    publishing user-derived data: any record released at its assigned
    level is indistinguishable from ≥ k−1 others on the released QIs.

    Scale shape: group sizes per level are plain count aggregates —
    group-cardinality-sized tables joined back on the QI columns
    (Catalyst/AQE broadcasts them while small; at 100 TB they become
    shuffle joins on the same keys the aggregate already hashed). One
    fact scan feeds all levels; no window over the fact table, no
    driver collect."""
    out = df
    for i, cols in enumerate(qi_levels):
        g = df.groupBy(*cols).agg(F.count(F.lit(1)).alias(f"__n{i}"))
        out = out.join(g, cols, "left")
    last = len(qi_levels) - 1
    level = F.lit(-1)
    group_n = F.col(f"__n{last}")
    group_key = F.concat_ws("|", *qi_levels[last])
    for i in reversed(range(len(qi_levels))):
        ok = F.col(f"__n{i}") >= k
        level = F.when(ok, F.lit(i)).otherwise(level)
        group_n = F.when(ok, F.col(f"__n{i}")).otherwise(group_n)
        group_key = F.when(
            ok, F.concat_ws("|", *qi_levels[i])
        ).otherwise(group_key)
    out = (
        out.withColumn("__level", level)
        .withColumn("__group_n", group_n.cast("long"))
        .withColumn("__group_key", group_key)
    )
    return out.drop(*[f"__n{i}" for i in range(len(qi_levels))])


def _char_ngrams(norm_col, n: int):
    """All overlapping character n-grams of an (already normalized)
    string column as an array — empty for strings shorter than n. The
    sequence/transform/substring composition stays in one codegen span
    (the q149 chunking shape); both Spark and DuckDB index substrings by
    codepoint, so the grams agree cross-engine."""
    return F.when(
        F.length(norm_col) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(norm_col) - (n - 1)),
            lambda i: F.substring(norm_col, i, n),
        ),
    ).otherwise(F.array().cast("array<string>"))


def quality_model_train(
    df: DataFrame,
    n: int = 3,
    top_k: int = 256,
    good_min_tokens: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Train a fastText-style linear quality scorer over char n-grams —
    the learned third leg of public LLM-data curation pipelines (CCNet /
    Gopher cite linear classifiers over character n-grams; fastText,
    Joulin et al. 2016). Returns the weight table ``(g, w)``: the
    ``top_k`` n-grams by discriminative strength.

    Determinism contract (the q74-keywords precedent): weights are
    INTEGER document-frequency log-odds surrogates — ``w = df_good −
    df_bad`` — and selection is (|w| DESC, g ASC), so training is
    bit-exact across engines with no log()/libm drift; a production
    deployment would drop trained float weights into the same table
    shape. Labels come from a declarative rule (token count ≥
    ``good_min_tokens``), standing in for human labels.

    Scale: ONE corpus scan; the (doc, gram) dedup happens per-doc
    INSIDE the n-gram array (array_distinct before the explode), so the
    only shuffle is the per-gram count aggregate — map-side combined,
    vocabulary-sized per task; no occurrence-sized exchange exists. The
    final top-k ranks the VOCABULARY (corpus-independent size), not the
    corpus.
    """
    from hive_cassandra_spark.operators.text import normalize

    lab = df.select(
        F.col(id_col).alias("__d"),
        normalize(F.col(text_col)).alias("__t"),
    ).select(
        "__d",
        "__t",
        (F.size(F.filter(F.split("__t", " "), lambda x: x != F.lit("")))
         >= good_min_tokens).alias("__good"),
    )
    # per-doc dedup BEFORE the explode (guide: aggregate before you
    # shuffle): array_distinct makes (doc, gram) rows unique by
    # construction, so the global DISTINCT — a full exchange of every
    # gram occurrence in the corpus — disappears and the df aggregate
    # below partial-aggregates map-side. explode_outer, not explode:
    # plain explode lets InferFiltersFromGenerate push a size(arr)>0
    # filter that re-inlines the whole n-gram transform per row (the
    # winnowing-kernel lesson, dedup.py); the post-explode null filter
    # restores plain-explode semantics (gram elements are never null,
    # only empty arrays produce a null row).
    grams = lab.select(
        "__d",
        "__good",
        F.explode_outer(
            F.array_distinct(_char_ngrams(F.col("__t"), n))
        ).alias("g"),
    ).filter(F.col("g").isNotNull())
    df_counts = grams.groupBy("g").agg(
        F.sum(F.when(F.col("__good"), 1).otherwise(0)).alias("dfg"),
        F.sum(F.when(F.col("__good"), 0).otherwise(1)).alias("dfb"),
    )
    w = df_counts.select(
        "g", (F.col("dfg") - F.col("dfb")).cast("long").alias("w")
    ).filter(F.col("w") != 0)
    rank = Window.orderBy(F.abs(F.col("w")).desc(), F.col("g").asc())
    # single-partition window over the VOCABULARY only — bounded by the
    # n-gram space, never by corpus rows (documented training-side cost)
    return (
        w.withColumn("__rn", F.row_number().over(rank))
        .filter(F.col("__rn") <= top_k)
        .select("g", "w")
    )


def quality_model_train_hashed(
    df: DataFrame,
    n: int = 3,
    n_buckets: int = 4096,
    good_min_tokens: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``quality_model_train`` with fastText's HASHING TRICK (Joulin et
    al. 2016 §2.1; the q78 OOV md5-bucket precedent): features are hash
    buckets of the char n-grams, so the weight table is AT MOST
    ``n_buckets`` rows — a hard parameter at ANY corpus, closing the
    r09-verdict item-8 vocabulary question (the top-k variant's weight
    table is corpus-independent too, but its training-side ranking runs
    over the open n-gram vocabulary; here even that is bucket-bounded).
    Colliding grams share a weight — the fastText trade, harmless in
    practice because discriminative mass concentrates and collisions
    average out.

    Same determinism contract: bucket = first 8 md5 hex digits of the
    gram mod ``n_buckets`` (exact integer, both engines agree);
    ``w = df_good − df_bad`` per bucket over distinct (doc, bucket)
    occurrences; no ranking step at all — every non-zero bucket weight
    ships. Returns ``(b, w)``. Scale: ONE corpus scan, all aggregations
    map-side-combinable, weight table ≤ ``n_buckets`` rows broadcast."""
    from hive_cassandra_spark.operators.text import normalize

    lab = df.select(
        F.col(id_col).alias("__d"),
        normalize(F.col(text_col)).alias("__t"),
    ).select(
        "__d",
        "__t",
        (F.size(F.filter(F.split("__t", " "), lambda x: x != F.lit("")))
         >= good_min_tokens).alias("__good"),
    )
    # same pre-explode dedup as quality_model_train: hash every gram to
    # its bucket INSIDE the array (one md5 per occurrence, as before),
    # array_distinct the bucket array per doc, and the global DISTINCT
    # exchange over every occurrence disappears — the df aggregate
    # partial-aggregates map-side. explode_outer + null filter for the
    # InferFiltersFromGenerate reason documented in quality_model_train
    # (measured: plain explode re-inlined the md5 transform into an
    # inferred filter and ran 4x slower than the shipped shape).
    barr = F.array_distinct(
        F.transform(
            _char_ngrams(F.col("__t"), n),
            lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10)
            .cast("long")
            % F.lit(int(n_buckets)),
        )
    )
    buckets = lab.select(
        "__d", "__good", F.explode_outer(barr).alias("b")
    ).filter(F.col("b").isNotNull())
    df_counts = buckets.groupBy("b").agg(
        F.sum(F.when(F.col("__good"), 1).otherwise(0)).alias("dfg"),
        F.sum(F.when(F.col("__good"), 0).otherwise(1)).alias("dfb"),
    )
    return df_counts.select(
        "b", (F.col("dfg") - F.col("dfb")).cast("long").alias("w")
    ).filter(F.col("w") != 0)


def quality_model_score_hashed(
    df: DataFrame,
    weights: DataFrame,
    n: int = 3,
    n_buckets: int = 4096,
    threshold: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score documents with a ``quality_model_train_hashed`` weight
    table: every n-gram occurrence hashes to its bucket, the ≤
    ``n_buckets``-row weight table broadcast-joins BEFORE the only
    shuffle (the per-doc sum), and the keep verdict is the same
    float-free integer logit threshold as ``quality_model_score``."""
    from hive_cassandra_spark.operators.text import normalize

    base = df.select(F.col(id_col), normalize(F.col(text_col)).alias("__t"))
    occ = base.select(
        id_col, F.explode(_char_ngrams(F.col("__t"), n)).alias("g")
    ).select(
        id_col,
        F.expr(
            "cast(conv(substring(md5(g), 1, 8), 16, 10) as bigint) "
            f"% {int(n_buckets)}"
        ).alias("b"),
    )
    scores = (
        occ.join(F.broadcast(weights), "b")
        .groupBy(id_col)
        .agg(F.sum("w").alias("__s"))
    )
    return (
        base.join(scores, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("__s"), F.lit(0)).cast("long").alias("score"),
        )
        .withColumn("keep", (F.col("score") >= threshold).cast("boolean"))
    )


def quality_model_score(
    df: DataFrame,
    weights: DataFrame,
    n: int = 3,
    threshold: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score documents with a ``quality_model_train`` weight table:
    ``score = Σ w(g)`` over every n-gram OCCURRENCE, ``keep = score ≥
    threshold``. Because the logistic sigmoid is monotone, thresholding
    the sigmoid at σ(τ) is EXACTLY thresholding this integer logit at τ
    — the keep verdict never touches a float.

    Scale: the exploded grams inner-join the BROADCAST weight table
    first (≤ top_k rows), which prunes every non-model occurrence
    before the only shuffle — one map-side-combinable sum keyed by
    document; docs with no model gram come back via the left join with
    score 0. No per-gram-per-doc counting state ever materializes
    (Σ_g w_g·count_g ≡ Σ_occurrences w)."""
    from hive_cassandra_spark.operators.text import normalize

    base = df.select(F.col(id_col), normalize(F.col(text_col)).alias("__t"))
    occ = base.select(
        id_col, F.explode(_char_ngrams(F.col("__t"), n)).alias("g")
    )
    scores = (
        occ.join(F.broadcast(weights), "g")
        .groupBy(id_col)
        .agg(F.sum("w").alias("__s"))
    )
    return (
        base.join(scores, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("__s"), F.lit(0)).cast("long").alias("score"),
        )
        .withColumn("keep", (F.col("score") >= threshold).cast("boolean"))
    )


def dsir_weights(
    df: DataFrame,
    target,
    n: int = 3,
    n_buckets: int = 4096,
    scale: int = 10**9,
    text_col: str = "text",
) -> DataFrame:
    """Per-bucket importance weights for DSIR — Data Selection via
    Importance Resampling (Xie et al., NeurIPS 2023): estimate a
    bag-of-hashed-n-grams unigram model for the TARGET distribution
    (the reference corpus the pretraining mix should look like) and for
    the RAW pool, and weight each feature by how much likelier it is
    under the target. ``target`` is a boolean Column marking the
    reference rows (e.g. ``F.col("lang") == "en"``).

    Determinism contract (the q169 fixed-point precedent): instead of
    ``log p_t(b) − log p_r(b)`` (libm drift), the weight is the
    FIXED-POINT RATE DIFFERENCE ``w(b) = (n_t(b)·scale) div T_t −
    (n_r(b)·scale) div T_r`` with +1 smoothing on every present bucket
    — exact integer arithmetic both engines replay bit-for-bit, same
    sign as the log-ratio, and magnitude bounded by ``scale`` per
    bucket REGARDLESS of corpus size. The count-times-scale products
    are widened through decimal(38,0) (Spark) / HUGEINT (oracle)
    before the floor division, so they cannot wrap int64 even when a
    bucket holds ~1e10+ occurrences (the 100 TB regime); only the
    bounded quotient returns to BIGINT.

    Scale: ONE corpus scan; occurrence counts (not document
    frequencies — this is the unigram LM, so repeats count) are
    map-side-combinable into ≤ ``n_buckets`` rows; the totals are a
    1-row broadcast scalar attach. Returns ``(b, w)``, ≤ n_buckets
    rows — broadcastable at any corpus."""
    from hive_cassandra_spark.operators.text import normalize

    # NULL target predicate means "not in the reference corpus": coalesce
    # to false so NULL rows count as raw-pool occurrences in BOTH the
    # engine and the oracle (a bare WHEN would also map NULL->raw here,
    # but dsir_select's ~target filter would DROP the same rows — the
    # coalesce pins one semantics across both halves).
    tgt = F.coalesce(target.cast("boolean"), F.lit(False))
    occ = df.select(
        tgt.alias("__tgt"), normalize(F.col(text_col)).alias("__t")
    ).select(
        "__tgt",
        F.explode(_char_ngrams(F.col("__t"), n)).alias("g"),
    ).select(
        "__tgt",
        F.expr(
            "cast(conv(substring(md5(g), 1, 8), 16, 10) as bigint) "
            f"% {int(n_buckets)}"
        ).alias("b"),
    )
    cnt = occ.groupBy("b").agg(
        (F.sum(F.when(F.col("__tgt"), 1).otherwise(0)) + 1)
        .cast("long").alias("nt"),
        (F.sum(F.when(F.col("__tgt"), 0).otherwise(1)) + 1)
        .cast("long").alias("nr"),
    )
    tot = cnt.agg(
        F.sum("nt").cast("long").alias("tt"),
        F.sum("nr").cast("long").alias("tr"),
    )
    # The rate products run through decimal(38,0): a bucket's occurrence
    # count times scale=1e9 leaves int64 once the count passes ~9.2e9
    # (a 100 TB corpus puts ~1e10 occurrences in each of 4096 buckets),
    # and with ANSI off the overflow would WRAP silently, flipping weight
    # signs. decimal(38,0) holds count*scale up to 1e29; `div` on
    # decimals returns BIGINT, and the quotient is rate*scale <= scale,
    # so the OUTPUT stays long. The oracle mirrors with HUGEINT.
    return cnt.crossJoin(F.broadcast(tot)).select(
        "b",
        F.expr(
            f"cast((cast(nt as decimal(38,0)) * {int(scale)}) div tt "
            f"as bigint) - "
            f"cast((cast(nr as decimal(38,0)) * {int(scale)}) div tr "
            f"as bigint)"
        ).cast("long").alias("w"),
    )


def dsir_select(
    df: DataFrame,
    weights: DataFrame,
    budget: int,
    target,
    n: int = 3,
    n_buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Select ``budget`` documents from the RAW pool (rows where
    ``target`` is false) whose hashed-n-gram profile scores highest
    under a ``dsir_weights`` table — the DSIR selection step, with the
    paper's Gumbel-noise resampling replaced by deterministic top-k by
    importance score (the paper's own ablation; noise would break the
    cross-engine replay). ``score(d) = Σ_occurrences w(bucket)`` — the
    linearized importance log-ratio of the doc under target vs raw.

    Scale: the ≤ ``n_buckets``-row weight table broadcast-joins the
    exploded occurrences BEFORE the only shuffle (per-doc sum); the
    top-``budget`` cut is TakeOrderedAndProject (per-partition partial
    top-k, never a global sort) and membership flows back as a
    budget-sized broadcast semi-probe. For FRACTIONAL budgets at scale
    (keep the top p%), swap the cut for the q145 two-phase global-rank;
    the score column is unchanged. Returns every pool doc:
    ``(doc_id, score, selected)``."""
    from hive_cassandra_spark.operators.text import normalize

    # Same NULL semantics as dsir_weights: NULL target = raw pool.
    pool = df.filter(
        ~F.coalesce(target.cast("boolean"), F.lit(False))
    ).select(
        F.col(id_col), normalize(F.col(text_col)).alias("__t")
    )
    occ = pool.select(
        id_col, F.explode(_char_ngrams(F.col("__t"), n)).alias("g")
    ).select(
        id_col,
        F.expr(
            "cast(conv(substring(md5(g), 1, 8), 16, 10) as bigint) "
            f"% {int(n_buckets)}"
        ).alias("b"),
    )
    scores = (
        occ.join(F.broadcast(weights), "b")
        .groupBy(id_col)
        .agg(F.sum("w").alias("__s"))
    )
    scored = pool.join(scores, id_col, "left").select(
        id_col,
        F.coalesce(F.col("__s"), F.lit(0)).cast("long").alias("score"),
    )
    chosen = (
        scored.orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(int(budget))
        .select(F.col(id_col), F.lit(1).alias("__sel"))
    )
    return scored.join(F.broadcast(chosen), id_col, "left").select(
        id_col,
        "score",
        F.coalesce(F.col("__sel"), F.lit(0)).cast("long").alias("selected"),
    )


def quality_score_col(
    weights_rows,
    n: int = 3,
    n_buckets: int = 4096,
    text_col: str = "text",
):
    """The hashed quality score as ONE STATELESS column expression —
    the streaming-ingest face of ``quality_model_score_hashed``: the
    ≤ ``n_buckets``-row weight table folds into a literal map (the
    ≤k-centroid-LUT precedent — bounded by the bucket parameter, never
    the corpus), and the score is an ``aggregate(transform(grams, …))``
    fold entirely inside codegen. No explode, no join, no groupBy — so
    a stream can score-and-filter documents as a pure projection with
    ZERO state (where the batch formulation's per-doc aggregation
    would grow streaming state with every doc ever seen).

    ``weights_rows`` is the collected list of (b, w) Rows from
    ``quality_model_train_hashed`` (collect is bounded by n_buckets).
    Returns a long Column; identical arithmetic to the batch scorer,
    so verdicts hash-match it."""
    from hive_cassandra_spark.operators.text import normalize

    pairs = ",".join(
        f"{int(r['b'])}L,{int(r['w'])}L" for r in weights_rows
    )
    lut = F.expr(
        f"map({pairs})" if pairs else "cast(map() as map<bigint,bigint>)"
    )
    grams = _char_ngrams(normalize(F.col(text_col)), n)

    def contrib(g):
        b = (
            F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("bigint")
            % F.lit(int(n_buckets))
        )
        return F.coalesce(F.element_at(lut, b), F.lit(0).cast("long"))

    return F.aggregate(
        F.transform(grams, contrib),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
