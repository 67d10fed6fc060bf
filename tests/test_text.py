"""Text-analysis operators: deterministic pure-function semantics."""

import hashlib

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
