"""Mapping DSL semantics (≙ AbstractColumnSerDe.java:182-274,373-408)."""

import pytest

from hive_cassandra_spark import mapping as m


def test_key_defaulting_prepends_key():
    cm = m.parse_mapping(":key,col_a,col_b")
    assert cm.key_index == 0 and not cm.transposed
    # :key absent → prepended; listed entries stay value-column names and
    # arity grows by one (AbstractColumnSerDe.java:190-196, "counting the
    # key if implicit")
    cm2 = m.parse_mapping("col_a,col_b")
    assert cm2.entries == (m.KEY, "col_a", "col_b")
    assert cm2.key_index == 0
    m.parse_mapping("col_a,col_b", n_columns=3)  # ok: implicit key counted
    with pytest.raises(m.MappingError):
        m.parse_mapping("col_a,col_b", n_columns=2)


def test_key_position():
    cm = m.parse_mapping("col_a,:key,col_b")
    assert cm.key_index == 1


def test_transposed_detection():
    cm = m.parse_mapping(":key,:column,:value")
    assert cm.transposed and not cm.has_subcolumn
    cm3 = m.parse_mapping(":key,:column,:subcolumn,:value")
    assert cm3.transposed and cm3.has_subcolumn
    assert m.cf_type_for_mapping(cm3) == "Super"
    assert m.cf_type_for_mapping(cm) == "Standard"


def test_transposed_must_be_all_virtual():
    with pytest.raises(m.MappingError):
        m.parse_mapping(":key,:column,:value,extra")
    # no explicit :key → prepended, yielding the canonical transposed form
    cm = m.parse_mapping(":column,:value")
    assert cm.transposed and cm.entries == (m.KEY, m.COLUMN, m.VALUE)


def test_arity_validation():
    with pytest.raises(m.MappingError):
        m.parse_mapping(":key,a,b", n_columns=2)
    m.parse_mapping(":key,a,b", n_columns=3)  # ok


def test_cf_map_entries():
    cm = m.parse_mapping(":key,cfname:")
    assert cm.cf_map_indexes == (1,)


def test_synthesize_auto_transposed():
    assert m.synthesize_mapping(["row_key", "column_name", "value"]) == ":key,:column,:value"
    assert (
        m.synthesize_mapping(["row_key", "column_name", "sub_column_name", "value"])
        == ":key,:column,:subcolumn,:value"
    )
    # order-preserving for shuffled virtual names
    assert m.synthesize_mapping(["value", "row_key", "column_name"]) == ":value,:key,:column"


def test_synthesize_regular():
    assert m.synthesize_mapping(["id", "a", "b"]) == ":key,a,b"
    with pytest.raises(m.MappingError):
        m.synthesize_mapping([])
