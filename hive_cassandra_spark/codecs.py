"""Cassandra-validator byte codecs with the reference's dual decode rule.

The reference decodes Cassandra's raw cell bytes per declared Hive type with
lazy primitives (factory at
/root/reference/src/main/java/org/apache/hadoop/hive/cassandra/serde/CassandraLazyFactory.java:49-77).
The load-bearing semantic (SURVEY.md §1.3) is **dual decode**: every
fixed-width type first tries the Cassandra-marshaled binary form and falls
back to ASCII text parse on wrong length or failure — so data written by
Hive as text and data written by native clients both read correctly
(e.g. CassandraLazyLong.java:18-32, CassandraLazyInteger.java:18-32).

Two tiers here:

- pure-Python ``decode_*`` / ``encode_*`` — the semantic ground truth,
  unit- and hypothesis-tested;
- ``decode_col(col, hive_type)`` — a vectorized Arrow ``pandas_udf`` for
  DataFrame pipelines (binary cells are the cold path of this engine; hot
  paths read typed parquet and never touch these).

Encodings follow LazyCassandraUtils.getCassandraType
(serde2/lazy/LazyCassandraUtils.java:17-41): boolean→1 byte, int→4 BE,
bigint→8 BE, float/double→IEEE BE, string→UTF-8, timestamp→8-byte epoch
millis (DateType), binary→raw bytes.
"""

from __future__ import annotations

import base64
import struct
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import Column, functions as F, types as T

# ---------------------------------------------------------------- encode ---


def encode_boolean(v: bool) -> bytes:
    return b"\x01" if v else b"\x00"


def encode_int(v: int) -> bytes:
    return struct.pack(">i", v)


def encode_long(v: int) -> bytes:
    return struct.pack(">q", v)


def encode_float(v: float) -> bytes:
    return struct.pack(">f", v)


def encode_double(v: float) -> bytes:
    return struct.pack(">d", v)


def encode_string(v: str) -> bytes:
    return v.encode("utf-8")


def encode_timestamp(v: datetime) -> bytes:
    """8-byte big-endian epoch millis (≙ Cassandra DateType;
    CassandraLazyTimestamp.java:19-33)."""
    if v.tzinfo is None:
        v = v.replace(tzinfo=timezone.utc)
    return struct.pack(">q", int(v.timestamp() * 1000))


def encode_binary(v: bytes) -> bytes:
    return bytes(v)


# ---------------------------------------------------------------- decode ---
# Each decoder returns None on undecodable input (the reference marks the
# lazy object null in that case).


def _text_fallback(data: bytes, parse):
    try:
        return parse(data.decode("ascii").strip())
    except (UnicodeDecodeError, ValueError):
        return None


def decode_boolean(data: bytes) -> bool | None:
    """1 binary byte, else text parse (CassandraLazyBoolean.java:20-34)."""
    if data is None:
        return None
    if len(data) == 1:
        return data[0] != 0
    s = _text_fallback(data, str)
    if s is None:
        return None
    low = s.lower()
    return True if low == "true" else False if low == "false" else None


def decode_int(data: bytes) -> int | None:
    """4 big-endian bytes, else text (CassandraLazyInteger.java:18-32)."""
    if data is None:
        return None
    if len(data) == 4:
        return struct.unpack(">i", data)[0]
    return _text_fallback(data, int)


def decode_long(data: bytes) -> int | None:
    """8 big-endian bytes, else text (CassandraLazyLong.java:18-32).
    NB the documented ambiguity (SURVEY.md §7): an 8-char ASCII numeral like
    b"12345678" decodes as *binary* — try-binary-first, same as the
    reference."""
    if data is None:
        return None
    if len(data) == 8:
        return struct.unpack(">q", data)[0]
    return _text_fallback(data, int)


def decode_float(data: bytes) -> float | None:
    """4 IEEE bytes, else text (CassandraLazyFloat.java:19-33)."""
    if data is None:
        return None
    if len(data) == 4:
        return struct.unpack(">f", data)[0]
    return _text_fallback(data, float)


def decode_double(data: bytes) -> float | None:
    """8 IEEE bytes, else text (CassandraLazyDouble.java:18-32)."""
    if data is None:
        return None
    if len(data) == 8:
        return struct.unpack(">d", data)[0]
    return _text_fallback(data, float)


def decode_string(data: bytes) -> str | None:
    if data is None:
        return None
    try:
        return data.decode("utf-8")
    except UnicodeDecodeError:
        return None


def decode_timestamp(data: bytes) -> datetime | None:
    """8-byte epoch-millis long, else ISO text
    (CassandraLazyTimestamp.java:19-33)."""
    if data is None:
        return None
    if len(data) == 8:
        millis = struct.unpack(">q", data)[0]
        return datetime.fromtimestamp(millis / 1000.0, tz=timezone.utc)
    try:
        return datetime.fromisoformat(data.decode("ascii").strip())
    except (UnicodeDecodeError, ValueError):
        return None


_B64_ALPHABET = frozenset(
    b"ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/="
)


def decode_binary(data: bytes, base64_sniff: bool = True) -> bytes | None:
    """Raw bytes, with the reference's opportunistic Base64 sniff: a payload
    made entirely of Base64-alphabet bytes is silently decoded
    (CassandraLazyBinary.java:26-51). ``base64_sniff=False`` opts out — a
    deliberate extension, since the sniff corrupts genuine text that happens
    to be alphabet-valid (flagged in SURVEY.md §7)."""
    if data is None:
        return None
    if (
        base64_sniff
        and len(data) > 0
        and len(data) % 4 == 0
        and all(b in _B64_ALPHABET for b in data)
    ):
        try:
            return base64.b64decode(data, validate=True)
        except (ValueError, TypeError):
            return bytes(data)
    return bytes(data)


def decode_validator_string(data: bytes, validator: str = "BytesType") -> str | None:
    """Validator-driven decode-to-string (≙ CassandraLazyValidator.java:24-35,
    CassandraValidatorObjectInspector.java:16-48): any cell rendered as a
    string through its declared validator; BytesType renders hex."""
    if data is None:
        return None
    v = validator.rsplit(".", 1)[-1]
    if v == "BytesType":
        return data.hex()
    if v == "UTF8Type" or v == "AsciiType":
        return decode_string(data)
    if v == "Int32Type":
        r = decode_int(data)
    elif v in ("LongType", "CounterColumnType"):
        r = decode_long(data)
    elif v == "FloatType":
        r = decode_float(data)
    elif v == "DoubleType":
        r = decode_double(data)
    elif v == "BooleanType":
        b = decode_boolean(data)
        return None if b is None else str(b).lower()
    elif v == "DateType":
        t = decode_timestamp(data)
        return None if t is None else t.isoformat()
    else:
        return data.hex()
    return None if r is None else str(r)


DECODERS = {
    "boolean": decode_boolean,
    "tinyint": lambda b: _text_fallback(b, int) if b is not None else None,
    "smallint": lambda b: _text_fallback(b, int) if b is not None else None,
    "int": decode_int,
    "bigint": decode_long,
    "float": decode_float,
    "double": decode_double,
    "string": decode_string,
    "binary": decode_binary,
    "timestamp": decode_timestamp,
}

ENCODERS = {
    "boolean": encode_boolean,
    "tinyint": lambda v: str(v).encode("ascii"),
    "smallint": lambda v: str(v).encode("ascii"),
    "int": encode_int,
    "bigint": encode_long,
    "float": encode_float,
    "double": encode_double,
    "string": encode_string,
    "binary": encode_binary,
    "timestamp": encode_timestamp,
}

_SPARK_TYPES = {
    "boolean": T.BooleanType(),
    "tinyint": T.ByteType(),
    "smallint": T.ShortType(),
    "int": T.IntegerType(),
    "bigint": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "binary": T.BinaryType(),
    "timestamp": T.TimestampType(),
}


def decode_col(col: Column, hive_type: str) -> Column:
    """Vectorized dual-decode of a BinaryType column to ``hive_type``.

    Arrow-batched ``pandas_udf`` (not row-at-a-time): the whole batch
    crosses the JVM↔Python boundary once. Used only on byte-cell paths;
    typed parquet scans bypass codecs entirely.
    """
    decoder = DECODERS[hive_type]
    spark_type = _SPARK_TYPES[hive_type]

    @F.pandas_udf(spark_type)
    def _decode(s: pd.Series) -> pd.Series:
        return s.map(lambda b: None if b is None else decoder(bytes(b)))

    return _decode(col)


def _coerce(v, hive_type: str):
    """Arrow hands nullable numeric batches to pandas as float64 — restore
    the python-native type the struct encoders expect."""
    if hive_type in ("int", "bigint", "tinyint", "smallint"):
        return int(v)
    if hive_type in ("float", "double"):
        return float(v)
    if hive_type == "boolean":
        return bool(v)
    return v


def encode_col(col: Column, hive_type: str) -> Column:
    """Vectorized encode of a typed column to Cassandra-marshaled bytes
    (≙ TableMapping.serialize + validator.fromString re-marshal,
    serde/TableMapping.java:139-166)."""
    encoder = ENCODERS[hive_type]

    @F.pandas_udf(T.BinaryType())
    def _encode(s: pd.Series) -> pd.Series:
        def enc(v):
            # Arrow surfaces SQL NULLs as None/NaN/NaT depending on dtype;
            # all encode to NULL cells (NaN-as-value is not representable in
            # the reference's text-remarshal path either)
            if v is None or (not isinstance(v, (bytes, str, list, dict)) and pd.isna(v)):
                return None
            return encoder(_coerce(v, hive_type))

        return s.map(enc)

    return _encode(col)


def decode_validator_col(col: Column, validator: str = "BytesType") -> Column:
    """Vectorized validator-driven decode-to-string (≙ the factory's
    validator mode, CassandraLazyFactory.java:118-162: when a per-column
    validator list is declared, *all* columns read back as strings)."""

    @F.pandas_udf(T.StringType())
    def _decode(s: pd.Series) -> pd.Series:
        return s.map(
            lambda b: None if b is None else decode_validator_string(bytes(b), validator)
        )

    return _decode(col)
