"""Curation operators (packing, decontamination, PII, keywords) vs
driver-side brute force on the documents fixture."""

import pytest
from pyspark.sql import functions as F

from hive_cassandra_spark.operators import curation
from hive_cassandra_spark.operators.text import tokens


def _docs(spark, sf_dir, n=200):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") < n)
    )


def test_pack_sequences_matches_serial_packing(spark, sf_dir):
    """The distributed two-phase prefix sum must equal a driver-side serial
    concat-and-chunk walk in id order — offsets, chunk spans, straddling."""
    docs = _docs(spark, sf_dir)
    toks = {
        r.doc_id: r.n
        for r in docs.select("doc_id", F.size(tokens(F.col("text"))).alias("n")).collect()
    }
    cap = 100
    out = {r.doc_id: r for r in curation.pack_sequences(docs, capacity=cap).collect()}
    offset = 0
    for doc_id in sorted(toks):
        r = out[doc_id]
        assert r.tok_count == toks[doc_id]
        assert r.start_offset == offset
        assert r.first_chunk == offset // cap
        if toks[doc_id] > 0:
            assert r.last_chunk == (offset + toks[doc_id] - 1) // cap
            assert r.n_chunks == r.last_chunk - r.first_chunk + 1
        else:
            assert r.n_chunks == 0
        offset += toks[doc_id]
    # at least one doc must straddle a chunk boundary for the test to bite
    assert any(r.n_chunks > 1 for r in out.values())
    with pytest.raises(ValueError, match="capacity"):
        curation.pack_sequences(docs, capacity=0)


def test_contamination_matches_set_overlap(spark, sf_dir):
    from hive_cassandra_spark.operators.dedup import shingles

    docs = _docs(spark, sf_dir, 120)
    sets = {
        r.doc_id: set(r.sh)
        for r in docs.select("doc_id", shingles(F.col("text")).alias("sh")).collect()
    }
    bench_union = set().union(*(sets[d] for d in sets if d < 20))
    out = {
        r.doc_id: r
        for r in curation.contamination(
            docs.filter(F.col("doc_id") >= 20), docs.filter(F.col("doc_id") < 20)
        ).collect()
    }
    for doc_id, s in sets.items():
        if doc_id < 20:
            assert doc_id not in out
            continue
        r = out[doc_id]
        assert r.n_shingles == len(s)
        assert r.overlap == len(s & bench_union)
        assert r.contaminated == (r.overlap > 0)


def test_pii_detect_and_redact(spark):
    rows = [
        (1, "mail me at John.Doe+spam@Example.COM please"),
        (2, "call 555-0199 or 555-1234 now"),
        (3, "nothing sensitive here"),
        (4, "two mails a@b.io and c.d@e-f.org plus 555-0000"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    stats = {r.doc_id: r for r in curation.pii_stats(df).collect()}
    assert (stats[1].email_count, stats[1].phone_count) == (1, 0)
    assert (stats[2].email_count, stats[2].phone_count) == (0, 2)
    assert (stats[3].email_count, stats[3].phone_count) == (0, 0)
    assert (stats[4].email_count, stats[4].phone_count) == (2, 1)
    red = {r.doc_id: r.redacted for r in curation.pii_redact(df).collect()}
    assert red[1] == "mail me at [EMAIL] please"
    assert red[2] == "call [PHONE] or [PHONE] now"
    assert "[EMAIL]" in red[4] and "[PHONE]" in red[4]
    assert "a@b.io" not in red[4] and "555-0000" not in red[4]


def test_keywords_integer_ordering(spark):
    rows = [
        (1, "apple apple apple banana banana cherry"),
        (2, "banana banana banana date date cherry"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = [
        (r.doc_id, r.term, r.tf, r.df, r.rank)
        for r in curation.keywords(df, k=3).orderBy("doc_id", "rank").collect()
    ]
    # doc 1: apple tf=3 (df 1) > banana tf=2 (df 2) > cherry tf=1 (df 2)
    # doc 2: banana tf=3 > date tf=2 (df 1) > cherry tf=1 (df 2)
    assert out == [
        (1, "apple", 3, 1, 1),
        (1, "banana", 2, 2, 2),
        (1, "cherry", 1, 2, 3),
        (2, "banana", 3, 2, 1),
        (2, "date", 2, 1, 2),
        (2, "cherry", 1, 2, 3),
    ]


def test_keywords_df_breaks_tf_ties(spark):
    """Equal tf → the rarer-across-corpus term (lower df) ranks first."""
    rows = [
        (1, "zebra common"),
        (2, "common filler"),
        (3, "common filler"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r.doc_id, r.rank): r.term for r in curation.keywords(df, k=2).collect()}
    # doc 1: zebra (df=1) beats common (df=3) despite equal tf=1
    assert out[(1, 1)] == "zebra" and out[(1, 2)] == "common"


def test_parse_urls_host_and_tld(spark):
    df = spark.createDataFrame(
        [
            (1, "https://a.example.com/x?q=1"),
            (2, "http://plain/path"),
            (3, "not a url"),
        ],
        "id long, url string",
    )
    rows = {r.id: r for r in curation.parse_urls(df).collect()}
    assert rows[1].host == "a.example.com" and rows[1].tld == "com"
    assert rows[2].host == "plain" and rows[2].tld == "plain"  # no dot
    assert rows[3].host == ""


def test_domain_cap_blocklist_and_k(spark):
    df = spark.createDataFrame(
        [
            (1, "a.com", "com", 50),
            (2, "a.com", "com", 90),
            (3, "a.com", "com", 70),
            (4, "b.biz", "biz", 99),
            (5, None, None, 10),
        ],
        "doc_id long, host string, tld string, n_chars long",
    )
    out = curation.domain_cap(
        df, k=2, order_cols=[F.col("n_chars").desc(), F.col("doc_id")],
        blocked_tlds=["biz"],
    )
    got = sorted((r.doc_id, r.rank) for r in out.collect())
    # largest two of a.com; b.biz dropped; NULL tld (unparseable host)
    # survives the blocklist — three-valued-logic regression guard
    assert got == [(2, 1), (3, 2), (5, 1)]


def test_domain_cap_requires_order(spark):
    df = spark.createDataFrame([(1, "a.com", "com", 5)],
                               "doc_id long, host string, tld string, n_chars long")
    with pytest.raises(ValueError):
        curation.domain_cap(df, k=1)


def test_quality_cascade_first_rule_wins(spark):
    df = spark.createDataFrame(
        [(1, 10, 0), (2, 10, 9), (3, 500, 9), (4, 100, 0)],
        "doc_id long, n long, digits long",
    )
    out = curation.quality_cascade(
        df,
        [
            ("too_short", F.col("n") < 50),
            ("digit_heavy", F.col("digits") > 5),
        ],
    )
    got = {r.doc_id: (r.reject_reason, r.kept) for r in out.collect()}
    # doc 2 trips BOTH rules -> attributed to the FIRST in order
    assert got == {
        1: ("too_short", False),
        2: ("too_short", False),
        3: ("digit_heavy", False),
        4: (None, True),
    }


def test_quality_cascade_requires_rules(spark):
    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError):
        curation.quality_cascade(df, [])


# ------------------------------------------------------------ mixture select


def test_mixture_select_greedy_fill_matches_serial(spark):
    """The distributed greedy fill must equal a serial replay: per source,
    rank docs by the md5 hash, keep while cum_before < budget (the
    boundary-crossing doc is included)."""
    import hashlib

    rows = [
        (i, f"s{i % 2}", " ".join(["w"] * (5 + i % 7))) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    total = 100
    out = curation.mixture_select(
        df, total, weight=F.when(F.col("source") == "s0", 3).otherwise(1)
    )
    got = {r.doc_id: (r.keep, r.cum_before, r.source_budget)
           for r in out.collect()}
    # serial replay
    h = lambda s: int(hashlib.md5(s.encode()).hexdigest()[:13], 16)
    budgets = {"s0": total * 3 // 4, "s1": total * 1 // 4}
    for src in ("s0", "s1"):
        docs = sorted(
            [r for r in rows if r[1] == src],
            key=lambda r: h(f"{src}:{r[0]}"),
        )
        cum = 0
        for doc_id, _, txt in docs:
            tok = len(txt.split())
            keep, cum_before, budget = got[doc_id]
            assert budget == budgets[src]
            assert cum_before == cum
            assert keep == (cum < budgets[src])
            cum += tok
    assert len(got) == len(rows)


def test_mixture_select_partition_invariant_and_validates(spark):
    rows = [(i, f"s{i % 3}", " ".join(["x"] * (3 + i % 5))) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    w = F.lit(1)
    a = sorted(
        (r.doc_id, r.keep)
        for r in curation.mixture_select(df, 50, weight=w).collect()
    )
    b = sorted(
        (r.doc_id, r.keep)
        for r in curation.mixture_select(
            df.repartition(13), 50, weight=w
        ).collect()
    )
    assert a == b
    with pytest.raises(ValueError, match="total_budget"):
        curation.mixture_select(df, 0, weight=w)


def test_strip_html_blocks_tags_entities(spark):
    from hive_cassandra_spark.operators import curation as C

    df = spark.createDataFrame(
        [
            (1, '<p>Hello <b>world</b></p>'),
            # script body with a bare '<' comparison: must vanish wholesale,
            # never reach the generic tag pass
            (2, '<script>if (x<2 && y>1) { alert("hi"); }</script>after'),
            (3, '<style>p {color: red}</style>styled'),
            (4, 'keep <!-- secret comment --> these'),
            # single-decode: '&amp;lt;' is the TEXT '&lt;', not '<'
            (5, '&quot;q&quot; &amp;lt; &#39;a&#39; &nbsp;x'),
            (6, 'plain   text\n\nuntouched'),
        ],
        "id long, text string",
    )
    out = {r.id: r.clean for r in C.strip_html(df).collect()}
    assert out[1] == "Hello world"
    assert out[2] == "after"
    assert out[3] == "styled"
    assert out[4] == "keep these"
    assert out[5] == '"q" &lt; \'a\' x'
    assert out[6] == "plain text untouched"


def test_strip_html_zero_shuffle(spark, sf_dir):
    from hive_cassandra_spark.operators import curation as C

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = C.strip_html(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_length_batches_vs_serial_replay(spark):
    import pytest
    from hive_cassandra_spark.operators import curation as C

    docs = [(i, " ".join(["tok"] * ((i * 7) % 13))) for i in range(100)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.batch_id: r for r in C.length_batches(df, 8).collect()}
    toks = sorted(((-((i * 7) % 13), i) for i, _ in docs))
    batches = {}
    for rn, (neg, i) in enumerate(toks):
        batches.setdefault(rn // 8, []).append(-neg)
    assert set(out) == set(batches)
    for b, ts in batches.items():
        r = out[b]
        assert (r.n_docs, r.max_tok, r.min_tok, r.sum_tok) == (
            len(ts), max(ts), min(ts), sum(ts)
        )
        padded = len(ts) * max(ts)
        assert r.padded_tok == padded
        assert r.waste_pct == (padded - sum(ts)) * 100 // max(padded, 1)
    # sorted batching must waste no more than the id-order baseline
    sorted_waste = sum(r.padded_tok - r.sum_tok for r in out.values())
    id_batches = {}
    for rn, (i, _) in enumerate(docs):
        id_batches.setdefault(rn // 8, []).append((i * 7) % 13)
    id_waste = sum(len(t) * max(t) - sum(t) for t in id_batches.values())
    assert sorted_waste <= id_waste
    with pytest.raises(ValueError):
        C.length_batches(df, 0)


def test_temperature_mixture_upweights_small_sources(spark, sf_dir):
    """alpha=0.5 weighting gives a small source a LARGER budget share
    than its proportional share (the whole point of temperature mixing),
    and the weights are exactly floor(sqrt(n*2^20)) — IEEE sqrt is
    correctly rounded, so this is bit-stable."""
    import math

    from hive_cassandra_spark.queries import QUERIES

    out = {r.source: r for r in
           QUERIES["q132_temperature_mixture"].fn(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    counts = {r.source: r.n for r in
              docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    for s, n in counts.items():
        assert out[s].temp_weight == math.floor(math.sqrt(n * 1048576))
    total_n = sum(counts.values())
    total_b = sum(r.source_budget for r in out.values())
    smallest = min(counts, key=counts.get)
    biggest = max(counts, key=counts.get)
    if counts[smallest] < counts[biggest]:  # non-degenerate fixture
        prop_share = counts[smallest] / total_n
        temp_share = out[smallest].source_budget / total_b
        assert temp_share > prop_share  # small source up-weighted


def test_gopher_rules_metrics_and_verdict(spark):
    good = ("the quick brown fox jumps over the lazy dog and then "
            "that other fox went off to have dinner with a friend " * 3)
    short = "too short to keep"
    symbols = "the of and that have with " + "# " * 40 + "word " * 30
    df = spark.createDataFrame(
        [(1, good), (2, short), (3, symbols)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in curation.gopher_rules(df).collect()}
    g = out[1]
    assert g.n_words == len(good.split())
    assert g.n_words >= 50 and g.keep
    assert g.stopword_hits >= 2 and g.alpha_word_ratio == 1.0
    assert not out[2].keep            # word-count floor
    s = out[3]
    # 40 '#' marks vs 76 words → 10·40 ≥ 76: symbol rule fires
    assert s.n_words == 76 and not s.keep
    assert s.symbol_word_ratio == round(40 / 76, 4)


def test_gopher_rules_line_ratios_and_integer_boundaries(spark):
    line = "- premium quality products that have with the included"
    tail = "the conversation and that have with the structure of analysis "
    bullets = "\n".join([line] * 9 + [tail * 8])
    df = spark.createDataFrame([(1, bullets)], "doc_id long, text string")
    r = curation.gopher_rules(df).collect()[0]
    # 9 of 10 lines are bullets → 10·9 ≤ 9·10 holds EXACTLY (boundary):
    # the integer predicate keeps it; a float 0.9-threshold compare
    # could flip on rounding
    assert r.bullet_line_ratio == 0.9
    assert 3 <= r.mean_word_len <= 10 and r.n_words >= 50
    assert r.keep


def test_gopher_rules_zero_shuffle(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = (
        curation.gopher_rules(df)._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_k_anonymity_assign_levels_and_invariant(spark):
    """Hand-checkable ladder: level = finest QI set whose group reaches
    k, -1 when even the coarsest fails; every released (level >= 0)
    group really has >= k members sharing the released tuple."""
    from hive_cassandra_spark.operators import curation as cur

    rows = []
    # region A / city A1: 5 records -> anonymous at the finest level
    rows += [(i, "A", "A1") for i in range(5)]
    # region A / city A2: 2 records -> fails city level, but region A
    # has 7 total -> level 1
    rows += [(10 + i, "A", "A2") for i in range(2)]
    # region B: 3 records across cities -> fails both -> -1
    rows += [(20, "B", "B1"), (21, "B", "B2"), (22, "B", "B3")]
    df = spark.createDataFrame(rows, "id long, region string, city string")
    out = cur.k_anonymity_assign(
        df, [["region", "city"], ["region"]], k=5
    ).collect()
    lv = {r.id: (r["__level"], r["__group_n"]) for r in out}
    assert all(lv[i] == (0, 5) for i in range(5))
    assert all(lv[10 + i] == (1, 7) for i in range(2))
    assert all(lv[i] == (-1, 3) for i in (20, 21, 22))
    # invariant: released groups are genuinely >= k on the released key
    import collections

    groups = collections.Counter(
        (r["__level"], r["__group_key"]) for r in out if r["__level"] >= 0
    )
    for (level, key), n in groups.items():
        assert n >= 5 or level == 1  # level-1 key pools records whose
        # finer siblings were released at level 0 — group_n counts ALL
        # region members (7), releases only the 2 unreleased-at-0 rows
    # and __group_n matches the full population of the released tuple
    pop = collections.Counter()
    for r in out:
        pop[(r.region,)] += 1
        pop[(r.region, r.city)] += 1
    for r in out:
        if r["__level"] == 0:
            assert r["__group_n"] == pop[(r.region, r.city)]
        else:
            assert r["__group_n"] == pop[(r.region,)]


def test_quality_model_train_score_vs_python(spark):
    """quality_model_train/score vs a from-scratch Python replay: integer
    df-difference weights, (|w| DESC, g ASC) top-k, per-occurrence sum,
    logit-threshold keep — exact equality on a corpus constructed so that
    good/bad classes have overlapping AND disjoint trigrams, short docs
    (< n chars) score 0, and a tie at the top-k boundary exercises the
    deterministic cut."""
    import collections
    import re

    from hive_cassandra_spark.operators import curation as cur

    min_tokens = 4
    corpus = [
        (0, "alpha beta gamma delta epsilon"),     # good (5 tokens)
        (1, "alpha beta gamma delta"),              # good (4)
        (2, "zeta eta theta iota kappa"),           # good (5)
        (3, "alpha zeta"),                          # bad (2)
        (4, "beta"),                                # bad (1)
        (5, "xy"),                                  # bad, shorter than n
        (6, "gamma gamma gamma"),                   # bad (3), repeats
    ]

    def norm(t):
        return re.sub(r"\s+", " ", t.lower()).strip()

    def grams(t, n=3):
        t = norm(t)
        return [t[i:i + n] for i in range(len(t) - n + 1)]

    def py_model(top_k):
        dfg, dfb = collections.Counter(), collections.Counter()
        for _, t in corpus:
            good = len(norm(t).split(" ")) >= min_tokens
            for g in set(grams(t)):
                (dfg if good else dfb)[g] += 1
        w = {
            g: dfg[g] - dfb[g]
            for g in set(dfg) | set(dfb)
            if dfg[g] != dfb[g]
        }
        cut = sorted(w.items(), key=lambda kv: (-abs(kv[1]), kv[0]))[:top_k]
        weights = dict(cut)
        out = {}
        for d, t in corpus:
            s = sum(weights.get(g, 0) for g in grams(t))
            out[d] = (s, s >= 0)
        return weights, out

    df = spark.createDataFrame(corpus, "doc_id long, text string")
    for top_k in (5, 10_000):  # tie-boundary cut AND the everything case
        exp_w, exp_scores = py_model(top_k)
        got_w = {
            r.g: r.w
            for r in cur.quality_model_train(
                df, n=3, top_k=top_k, good_min_tokens=min_tokens
            ).collect()
        }
        assert got_w == exp_w, top_k
        scored = cur.quality_model_score(
            df,
            cur.quality_model_train(
                df, n=3, top_k=top_k, good_min_tokens=min_tokens
            ),
            n=3,
        )
        got = {r.doc_id: (r.score, r.keep) for r in scored.collect()}
        assert got == exp_scores, top_k
    # the sub-n doc is present with score exactly 0
    assert got[5] == (0, True)


def test_quality_model_hashed_bounded_and_deterministic(spark, sf_dir):
    """The hashing-trick quality model: the weight table never exceeds
    n_buckets (a HARD parameter — the r09 verdict item-8 contract), the
    verdicts are deterministic across runs, and colliding features
    aside, strongly-good docs keep."""
    from pyspark.sql import functions as F2

    from hive_cassandra_spark.operators import curation as cu

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = cu.quality_model_train_hashed(docs, n=3, n_buckets=64)
    assert w.count() <= 64
    assert w.select("b").distinct().count() == w.count()
    scored1 = cu.quality_model_score_hashed(
        docs, w, n=3, n_buckets=64, threshold=0
    )
    scored2 = cu.quality_model_score_hashed(
        docs, w, n=3, n_buckets=64, threshold=0
    )
    assert sorted(scored1.collect()) == sorted(scored2.collect())
    # every document is scored exactly once (left join keeps no-feature docs)
    assert scored1.count() == docs.count()
    assert scored1.select("doc_id").distinct().count() == docs.count()


def test_dsir_weights_and_select_vs_python(spark):
    """dsir_weights/dsir_select vs a from-scratch Python replay: hashed
    trigram occurrence counts (+1 smoothing on present buckets),
    fixed-point rate-difference weights, occurrence-weighted pool doc
    scores, and the deterministic top-budget cut — exact equality on a
    corpus with overlapping target/raw trigrams, a no-gram short doc,
    and a score tie at the budget boundary."""
    import hashlib
    import re

    from pyspark.sql import functions as F2

    from hive_cassandra_spark.operators import curation as cur

    corpus = [
        (0, "alpha beta gamma delta", "en"),
        (1, "alpha beta gamma", "en"),
        (2, "zeta eta theta", "en"),
        (3, "alpha beta gamma delta epsilon", "de"),
        (4, "zeta eta theta iota", "de"),
        (5, "completely different words here", "fr"),
        (6, "xy", "fr"),                      # shorter than n=3 after norm
        (7, "alpha beta gamma", "es"),        # near-exact target text
    ]
    n_buckets, scale, budget = 64, 10**9, 2

    def norm(t):
        return re.sub(r"\s+", " ", t.lower()).strip()

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % n_buckets

    def grams(t):
        t = norm(t)
        return [t[i:i + 3] for i in range(len(t) - 2)] if len(t) >= 3 else []

    nt, nr = {}, {}
    for _, t, lang in corpus:
        for g in grams(t):
            b = bucket(g)
            (nt if lang == "en" else nr).setdefault(b, 0)
            nt.setdefault(b, 0)
            nr.setdefault(b, 0)
            (nt if lang == "en" else nr)[b] += 1
    tt = sum(v + 1 for v in nt.values())
    tr = sum(v + 1 for v in nr.values())
    w = {
        b: ((nt[b] + 1) * scale) // tt - ((nr[b] + 1) * scale) // tr
        for b in nt
    }
    exp_scores = {}
    for d, t, lang in corpus:
        if lang == "en":
            continue
        exp_scores[d] = sum(w[bucket(g)] for g in grams(t))
    order = sorted(exp_scores, key=lambda d: (-exp_scores[d], d))
    exp_sel = set(order[:budget])

    df = spark.createDataFrame(corpus, "doc_id long, text string, lang string")
    tgt = F2.col("lang") == "en"
    weights = cur.dsir_weights(df, tgt, n=3, n_buckets=n_buckets)
    got_w = {r.b: r.w for r in weights.collect()}
    assert got_w == {b: v for b, v in w.items()}, "weight table drift"
    out = {
        r.doc_id: (r.score, r.selected)
        for r in cur.dsir_select(
            df, weights, budget=budget, target=tgt, n=3, n_buckets=n_buckets
        ).collect()
    }
    assert set(out) == set(exp_scores)
    for d, s in exp_scores.items():
        assert out[d] == (s, int(d in exp_sel)), d
    # the short no-gram doc is in the pool with score exactly 0
    assert out[6][0] == 0


def test_dsir_weight_table_bounded_and_budget_exhaustive(spark, sf_dir):
    """The weight table never exceeds n_buckets at any corpus (the hard
    DSIR parameter), and a budget >= pool size selects everything."""
    from pyspark.sql import functions as F2

    from hive_cassandra_spark.operators import curation as cur

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tgt = F2.col("lang") == "en"
    w = cur.dsir_weights(docs, tgt, n=3, n_buckets=32)
    assert w.count() <= 32
    assert w.select("b").distinct().count() == w.count()
    pool_n = docs.filter(~tgt).count()
    out = cur.dsir_select(docs, w, budget=pool_n + 10, target=tgt,
                          n=3, n_buckets=32)
    assert out.count() == pool_n
    assert out.filter("selected = 0").count() == 0


def test_stream_quality_filter_stateless_and_equals_batch(spark, sf_dir, tmp_path):
    """The streaming-ingest face of the hashed quality model: the
    literal-LUT projection must equal the batch join/groupBy scorer
    row-for-row, and the streaming query must run with ZERO stateful
    operators (pure projection — state cannot grow with the corpus)."""
    from pyspark.sql import functions as F2

    from hive_cassandra_spark.operators import curation as cur
    from hive_cassandra_spark.streaming import events as se

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F2.col("doc_id") < 150
    )
    wdf = cur.quality_model_train_hashed(docs, n=3, n_buckets=256)
    batch = {
        (r.doc_id): (r.score, bool(r.keep))
        for r in cur.quality_model_score_hashed(
            docs, wdf, n=3, n_buckets=256, threshold=0
        ).collect()
    }
    src = str(tmp_path / "qsrc")
    docs.repartition(3).write.parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    scored = stream.select(
        "doc_id",
        cur.quality_score_col(wdf.collect(), n=3, n_buckets=256)
        .alias("score"),
    ).withColumn("keep", F2.col("score") >= 0)
    out = se.run_bounded(scored, spark, output_mode="append")
    got = {r.doc_id: (r.score, r.keep) for r in out.collect()}
    assert got == batch
    # stateless: the final progress reports no state operators with rows
    prog = se.LAST_BOUNDED_RUN.get("progress")
    ops = (prog or {}).get("stateOperators") or []
    assert all(int(o.get("numRowsTotal", 0)) == 0 for o in ops), ops
