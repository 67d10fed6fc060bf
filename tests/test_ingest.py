"""Schema-on-read JSONL/CSV ingest + corrupt-record quarantine
(ingest.py). Pipelines start at raw text interchange; malformed lines
must surface as an auditable bucket, never vanish or kill the job."""

from __future__ import annotations

import os
import tempfile
import uuid

import pytest

from hive_cassandra_spark import ingest


def _tmpdir(tag: str) -> str:
    return os.path.join(
        tempfile.gettempdir(), f"hcs_test_{tag}_{uuid.uuid4().hex[:8]}"
    )


def test_jsonl_roundtrip_lossless(spark):
    df = spark.createDataFrame(
        [
            (1, 'quote " and \\ backslash', "en", 10),
            (2, "newline\nand\ttab", "de", 20),
            (3, "unicode é中文", None, 30),
        ],
        "doc_id long, text string, lang string, n_chars long",
    )
    path = _tmpdir("jsonl_rt")
    ingest.write_jsonl(df, path)
    back = ingest.read_jsonl(
        spark, path, "doc_id long, text string, lang string, n_chars long"
    )
    rows = {r.doc_id: r for r in back.collect()}
    assert all(r[ingest.CORRUPT_COL] is None for r in rows.values())
    assert rows[1].text == 'quote " and \\ backslash'
    assert rows[2].text == "newline\nand\ttab"
    assert rows[3].text == "unicode é中文" and rows[3].lang is None


def test_jsonl_quarantines_malformed(spark):
    path = _tmpdir("jsonl_bad")
    spark.createDataFrame(
        [
            ('{"doc_id": 1, "n_chars": 5}',),
            ("not json at all",),
            ('{"doc_id": 3, "n_chars": }',),  # syntax error
        ],
        "value string",
    ).write.mode("overwrite").text(path)
    back = ingest.read_jsonl(spark, path, "doc_id long, n_chars long")
    good = [r for r in back.collect() if r[ingest.CORRUPT_COL] is None]
    bad = [r for r in back.collect() if r[ingest.CORRUPT_COL] is not None]
    assert [r.doc_id for r in good] == [1]
    assert len(bad) == 2
    # quarantined rows carry the raw line for forensics
    assert {r[ingest.CORRUPT_COL] for r in bad} == {
        "not json at all", '{"doc_id": 3, "n_chars": }'
    }


def test_csv_quarantines_type_malformation(spark):
    path = _tmpdir("csv_bad")
    df = spark.createDataFrame(
        [(1, "en", "7"), (2, "de", "BAD"), (3, "fr", "9")],
        "doc_id long, lang string, n_chars string",
    )
    ingest.write_csv(df, path)
    back = ingest.read_csv(
        spark, path, "doc_id long, lang string, n_chars long"
    )
    rows = sorted(back.collect(), key=lambda r: (r.doc_id is None, r.doc_id))
    good = [r for r in rows if r[ingest.CORRUPT_COL] is None]
    bad = [r for r in rows if r[ingest.CORRUPT_COL] is not None]
    assert {(r.doc_id, r.n_chars) for r in good} == {(1, 7), (3, 9)}
    assert len(bad) == 1 and "BAD" in bad[0][ingest.CORRUPT_COL]


def test_quarantine_summary_one_pass(spark):
    path = _tmpdir("jsonl_sum")
    spark.createDataFrame(
        [
            ('{"lang": "en", "n_chars": 5}',),
            ('{"lang": "en", "n_chars": 7}',),
            ('{"lang": null, "n_chars": 1}',),
            ("broken",),
        ],
        "value string",
    ).write.mode("overwrite").text(path)
    back = ingest.read_jsonl(spark, path, "lang string, n_chars long")
    out = {r.bucket: (r.n_rows, r.sum_n_chars)
           for r in ingest.quarantine_summary(back, "lang", "n_chars").collect()}
    assert out == {"en": (2, 12), "?": (1, 1), "__quarantined__": (1, 0)}
    # single classifying aggregate: exactly one scan of the raw files
    plan = (
        ingest.quarantine_summary(back, "lang", "n_chars")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("FileScan json") == 1


def test_explicit_schema_required():
    with pytest.raises(TypeError):
        ingest.read_jsonl(None, "/nowhere")  # schema_ddl is not optional


def test_stream_jsonl_matches_batch_classification(spark):
    from hive_cassandra_spark.streaming import events as streaming_events

    path = _tmpdir("jsonl_stream")
    spark.createDataFrame(
        [
            ('{"lang": "en", "n_chars": 5}',),
            ('{"lang": "de", "n_chars": 7}',),
            ("broken line",),
            ('{"lang": "en", "n_chars": 2}',),
        ],
        "value string",
    ).write.mode("overwrite").text(path)
    ddl = "lang string, n_chars long"
    batch = {r.bucket: (r.n_rows, r.sum_n_chars)
             for r in ingest.quarantine_summary(
                 ingest.read_jsonl(spark, path, ddl), "lang", "n_chars"
             ).collect()}
    stream = ingest.quarantine_summary(
        ingest.read_jsonl_stream(spark, path, ddl), "lang", "n_chars"
    )
    out = {r.bucket: (r.n_rows, r.sum_n_chars)
           for r in streaming_events.run_bounded(
               stream, spark, output_mode="complete", state_partitions=4
           ).collect()}
    assert out == batch == {
        "en": (2, 7), "de": (1, 7), "__quarantined__": (1, 0)
    }
