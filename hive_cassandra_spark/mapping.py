"""Column-mapping spec: the reference's ``cassandra.columns.mapping`` DSL.

Reimplements the *semantics* (not the code) of
/root/reference/src/main/java/org/apache/hadoop/hive/cassandra/serde/AbstractColumnSerDe.java:

- ``:key`` names the row key; if absent, ``:key`` is **prepended** — arity
  grows by one ("counting the key if implicit") and every listed entry
  remains a Cassandra value-column name (parseColumnMapping,
  AbstractColumnSerDe.java:182-198; arity check
  CassandraColumnSerDe.java:57-63);
- a mapping of *only* virtual columns ``:key,:column,[:subcolumn,]:value``
  is **transposed** — one relational row per cell (isTransposed,
  AbstractColumnSerDe.java:373-408);
- Hive column names ``row_key, column_name, [sub_column_name,] value``
  auto-synthesize the transposed mapping; otherwise the synthesized mapping
  is ``:key, <col2>, <col3>, ...`` (createColumnMappingString,
  AbstractColumnSerDe.java:200-274);
- an entry ending in ``:`` binds the whole column family to one map-typed
  column (validated map<string,?> in CassandraColumnSerDe.java:66-81);
- mapping arity must equal the declared column arity
  (CassandraColumnSerDe.java:57-63).

Pure functions — no Spark dependency — so the rules are unit-testable
exactly as the risk register demands (SURVEY.md §5.2).
"""

from __future__ import annotations

from dataclasses import dataclass

KEY = ":key"
COLUMN = ":column"
SUBCOLUMN = ":subcolumn"
VALUE = ":value"
VIRTUAL = {KEY, COLUMN, SUBCOLUMN, VALUE}

# Hive column names that auto-trigger transposed mode
# (AbstractColumnSerDe.java:56-59).
AUTO_TRANSPOSED_2 = ["row_key", "column_name", "value"]
AUTO_TRANSPOSED_3 = ["row_key", "column_name", "sub_column_name", "value"]


class MappingError(ValueError):
    pass


@dataclass(frozen=True)
class ColumnMapping:
    """Parsed mapping: ``entries[i]`` maps relational column *i*."""

    entries: tuple[str, ...]
    key_index: int
    transposed: bool
    has_subcolumn: bool

    @property
    def cf_map_indexes(self) -> tuple[int, ...]:
        """Indexes of whole-CF map columns (entries ending in ``:``)."""
        return tuple(i for i, e in enumerate(self.entries) if e.endswith(":"))


def parse_mapping(mapping: str, n_columns: int | None = None) -> ColumnMapping:
    """Parse a ``cassandra.columns.mapping`` string.

    Raises MappingError on arity mismatch (≙ CassandraColumnSerDe.java:57-63),
    duplicate/malformed virtuals, or a transposed mapping mixing real column
    names with virtuals (AbstractColumnSerDe.java:373-408 requires all-virtual).
    """
    entries = [e.strip() for e in mapping.split(",")]
    if any(e == "" for e in entries):
        raise MappingError(f"empty entry in mapping {mapping!r}")

    # Key defaulting: when :key is absent it is PREPENDED — arity grows by
    # one and all listed entries stay Cassandra value-column names
    # (parseColumnMapping, AbstractColumnSerDe.java:190-196).
    if KEY not in entries:
        entries = [KEY] + entries

    # Arity is validated against the list INCLUDING the implicit key
    # ("counting the key if implicit", CassandraColumnSerDe.java:57-63).
    if n_columns is not None and len(entries) != n_columns:
        raise MappingError(
            f"mapping arity {len(entries)} (counting the key if implicit) "
            f"!= declared column arity {n_columns}"
        )

    virtuals = [e for e in entries if e in VIRTUAL]
    if virtuals.count(KEY) > 1 or virtuals.count(VALUE) > 1:
        raise MappingError(f"duplicate virtual column in {mapping!r}")

    key_index = entries.index(KEY)

    has_col, has_val = COLUMN in entries, VALUE in entries
    has_sub = SUBCOLUMN in entries
    if has_col != has_val:
        raise MappingError(f":column and :value must appear together: {mapping!r}")
    if has_sub and not has_col:
        raise MappingError(f":subcolumn requires :column/:value: {mapping!r}")

    transposed = has_col and has_val
    if transposed:
        expected = 4 if has_sub else 3
        if len(entries) != expected or any(e not in VIRTUAL for e in entries):
            # Transposed mappings must be all-virtual
            # (AbstractColumnSerDe.java:373-408).
            raise MappingError(
                f"transposed mapping must be exactly :key,:column,"
                f"{':subcolumn,' if has_sub else ''}:value — got {mapping!r}"
            )
        if KEY not in entries:
            raise MappingError(f"transposed mapping requires :key: {mapping!r}")

    return ColumnMapping(
        entries=tuple(entries),
        key_index=key_index,
        transposed=transposed,
        has_subcolumn=has_sub,
    )


def synthesize_mapping(column_names: list[str]) -> str:
    """Auto-synthesize a mapping from relational column names
    (≙ createColumnMappingString, AbstractColumnSerDe.java:200-274).

    ``row_key/column_name/[sub_column_name/]value`` (any order) ⇒ transposed;
    else first column becomes ``:key`` and the rest map by name.
    """
    lowered = [c.lower() for c in column_names]
    if sorted(lowered) == sorted(AUTO_TRANSPOSED_3):
        order = {"row_key": KEY, "column_name": COLUMN,
                 "sub_column_name": SUBCOLUMN, "value": VALUE}
        return ",".join(order[c] for c in lowered)
    if sorted(lowered) == sorted(AUTO_TRANSPOSED_2):
        order = {"row_key": KEY, "column_name": COLUMN, "value": VALUE}
        return ",".join(order[c] for c in lowered)
    if not column_names:
        raise MappingError("cannot synthesize mapping for zero columns")
    return ",".join([KEY] + list(column_names[1:]))


def cf_type_for_mapping(m: ColumnMapping) -> str:
    """Standard vs Super CF inference from mapping shape
    (≙ CassandraManager.getColumnFamily type branch,
    CassandraManager.java:215-263)."""
    return "Super" if m.has_subcolumn else "Standard"
