"""Fixture-timestamp-layout regression guard.

The driver's events.parquet has shipped with two physical ts layouts across
rounds: TIMESTAMP(NANOS) (rounds 1-3; Spark can only read it as a nanos
long via legacy.parquet.nanosAsLong) and naive TIMESTAMP(MICROS)
(round 4+; Spark 4 infers TIMESTAMP_NTZ for it unless
parquet.inferTimestampNTZ is disabled). The round-4 regression — q65/q58
hard-failing on TIMESTAMP_NTZ and every streaming query reading micros as
if they were nanos — is exactly what these tests pin: both loaders must
normalize EITHER layout to TimestampType with identical wall-clock values.
"""

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hive_cassandra_spark import queries
from hive_cassandra_spark.streaming import events as streaming_events

_ROWS = [
    (1, datetime.datetime(2024, 1, 1, 0, 0, 0), 10, "click", 1.5, "{}"),
    (2, datetime.datetime(2024, 1, 1, 0, 30, 0), 10, "view", 2.5, "{}"),
    (3, datetime.datetime(2024, 1, 1, 2, 0, 0), 11, "click", 3.5, "{}"),
]


def _write_events(tmp_path, unit):
    cols = list(zip(*_ROWS))
    table = pa.table(
        {
            "event_id": pa.array(cols[0], pa.int64()),
            "ts": pa.array(cols[1], pa.timestamp(unit)),
            "user_id": pa.array(cols[2], pa.int64()),
            "event_type": pa.array(cols[3], pa.string()),
            "value": pa.array(cols[4], pa.float64()),
            "props": pa.array(cols[5], pa.string()),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))
    return str(tmp_path)


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_load_events_normalizes_both_layouts(spark, tmp_path, unit):
    sf_dir = _write_events(tmp_path, unit)
    ev = queries.load_events(spark, sf_dir)
    assert dict(ev.dtypes)["ts"] == "timestamp"
    got = sorted(
        (r.event_id, r.ts.strftime("%Y-%m-%d %H:%M:%S")) for r in ev.collect()
    )
    assert got == [
        (1, "2024-01-01 00:00:00"),
        (2, "2024-01-01 00:30:00"),
        (3, "2024-01-01 02:00:00"),
    ]


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_stream_reader_matches_batch_on_both_layouts(spark, tmp_path, unit):
    sf_dir = _write_events(tmp_path, unit)
    stream = streaming_events.read_events_stream(spark, sf_dir)
    assert dict(stream.dtypes)["ts"] == "timestamp"
    out = streaming_events.run_bounded(
        streaming_events.tumbling_counts(stream, "1 hour"), spark
    )
    got = sorted((r.window_start, r.event_type, r.n) for r in out.collect())
    # wall-clock-correct windows: events 1+2 in the 00:00 hour, 3 in 02:00
    assert got == [
        ("2024-01-01 00:00:00", "click", 1),
        ("2024-01-01 00:00:00", "view", 1),
        ("2024-01-01 02:00:00", "click", 1),
    ]
