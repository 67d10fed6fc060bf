"""Early-warning contract on the driver-generated fixtures.

Round 4 regressed because events.parquet silently changed physical ts
layout between rounds (TIMESTAMP(NANOS) → naive TIMESTAMP(MICROS)) and the
breakage only surfaced in the external correctness gate. This pins every
table's column names and the *family* of each type (footer-only, no Spark)
so the next fixture drift fails loudly here first. Types are matched
loosely on purpose: any integer width, any float width, any timestamp
unit/zone — the loaders must adapt within a family (and do, see
test_timestamps) — but a renamed/dropped column or a wholesale type-family
change is a real contract break.
"""

import pyarrow.parquet as pq
import pytest

import pyarrow as pa

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

# column -> type family: 'int', 'float', 'str', 'ts', 'list_float'
EXPECTED = {
    "region": {"r_regionkey": "int", "r_name": "str"},
    "nation": {"n_nationkey": "int", "n_name": "str", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "int", "c_name": "str", "c_nationkey": "int",
        "c_acctbal": "float", "c_mktsegment": "str",
    },
    "supplier": {"s_suppkey": "int", "s_name": "str", "s_nationkey": "int"},
    "part": {
        "p_partkey": "int", "p_name": "str", "p_brand": "str",
        "p_retailprice": "float",
    },
    "orders": {
        "o_orderkey": "int", "o_custkey": "int", "o_orderstatus": "str",
        "o_totalprice": "float", "o_orderdate": "ts", "o_orderpriority": "str",
    },
    "lineitem": {
        "l_orderkey": "int", "l_partkey": "int", "l_suppkey": "int",
        "l_linenumber": "int", "l_quantity": "float", "l_extendedprice": "float",
        "l_discount": "float", "l_tax": "float", "l_returnflag": "str",
        "l_linestatus": "str", "l_shipdate": "ts",
    },
    "events": {
        "event_id": "int", "ts": "ts", "user_id": "int",
        "event_type": "str", "value": "float", "props": "str",
    },
    "documents": {"doc_id": "int", "text": "str", "n_chars": "int"},
    "embeddings": {"vec_id": "int", "embedding": "list_float"},
}


def _family(t: pa.DataType) -> str:
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_timestamp(t):
        return "ts"
    if (pa.types.is_list(t) or pa.types.is_large_list(t)) and pa.types.is_floating(
        t.value_type
    ):
        return "list_float"
    return str(t)


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_fixture_schema_contract(sf_dir, table):
    schema = pq.read_schema(f"{sf_dir}/{table}.parquet")
    got = {f.name: _family(f.type) for f in schema}
    want = EXPECTED[table]
    missing = {c: fam for c, fam in want.items() if c not in got}
    assert not missing, f"{table}: expected columns vanished: {missing}"
    drifted = {
        c: (want[c], got[c]) for c in want if c in got and got[c] != want[c]
    }
    assert not drifted, (
        f"{table}: type-family drift (expected, got): {drifted} — "
        "check the loaders (queries.load_events, codecs) before trusting "
        "the correctness gate"
    )
