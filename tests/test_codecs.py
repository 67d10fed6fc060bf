"""Codec unit + property tests: the reference's dual binary/text decode rule
is the most fragile surface (SURVEY.md §7 risk register)."""

import struct
from datetime import datetime, timezone

from hypothesis import given, strategies as st

from hive_cassandra_spark import codecs


def test_int_binary_and_text():
    assert codecs.decode_int(struct.pack(">i", 42)) == 42
    assert codecs.decode_int(b"42") == 42  # text fallback (len != 4)
    assert codecs.decode_int(b"abc") is None
    assert codecs.decode_int(None) is None


def test_long_eight_char_ambiguity():
    # The documented try-binary-first rule (CassandraLazyLong.java:18-32):
    # an 8-byte ASCII numeral decodes as BINARY, not text.
    assert codecs.decode_long(b"12345678") == struct.unpack(">q", b"12345678")[0]
    assert codecs.decode_long(b"1234567") == 1234567  # 7 bytes → text


def test_boolean():
    assert codecs.decode_boolean(b"\x01") is True
    assert codecs.decode_boolean(b"\x00") is False
    assert codecs.decode_boolean(b"true") is True
    assert codecs.decode_boolean(b"FALSE") is False
    assert codecs.decode_boolean(b"nope") is None


def test_timestamp_epoch_millis():
    ts = datetime(2020, 5, 17, 12, 30, 45, tzinfo=timezone.utc)
    assert codecs.decode_timestamp(codecs.encode_timestamp(ts)) == ts


def test_binary_base64_sniff():
    # alphabet-valid payload is silently decoded (CassandraLazyBinary.java:26-51)
    assert codecs.decode_binary(b"aGVsbG8=") == b"hello"
    # opt-out keeps raw bytes (our documented extension)
    assert codecs.decode_binary(b"aGVsbG8=", base64_sniff=False) == b"aGVsbG8="
    # non-alphabet bytes pass through
    assert codecs.decode_binary(b"\x00\xff") == b"\x00\xff"


def test_validator_decode():
    assert codecs.decode_validator_string(struct.pack(">i", 7), "Int32Type") == "7"
    assert codecs.decode_validator_string(b"\xde\xad", "BytesType") == "dead"
    assert codecs.decode_validator_string(b"hi", "UTF8Type") == "hi"


@given(st.integers(min_value=-(2**31), max_value=2**31 - 1))
def test_int_roundtrip(v):
    assert codecs.decode_int(codecs.encode_int(v)) == v


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_long_roundtrip(v):
    assert codecs.decode_long(codecs.encode_long(v)) == v


@given(st.floats(allow_nan=False, allow_infinity=False))
def test_double_roundtrip(v):
    assert codecs.decode_double(codecs.encode_double(v)) == v


@given(st.text())
def test_string_roundtrip(v):
    assert codecs.decode_string(codecs.encode_string(v)) == v


@given(st.binary(min_size=1).filter(lambda b: not (len(b) % 4 == 0 and all(c in codecs._B64_ALPHABET for c in b))))
def test_binary_roundtrip_non_b64(v):
    assert codecs.decode_binary(codecs.encode_binary(v)) == v


def test_spark_decode_col(spark):
    from pyspark.sql import functions as F

    rows = [
        (codecs.encode_long(7),),
        (b"123",),  # text fallback
        (None,),
    ]
    df = spark.createDataFrame(rows, "cell binary")
    out = df.select(codecs.decode_col(F.col("cell"), "bigint").alias("v")).collect()
    assert [r.v for r in out] == [7, 123, None]


def test_spark_encode_col_roundtrip(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1234567890123,), (None,)], "v long")
    out = df.select(
        codecs.decode_col(codecs.encode_col(F.col("v"), "bigint"), "bigint").alias("v")
    ).collect()
    assert [r.v for r in out] == [1234567890123, None]
