"""a3_kv_flatten — the json2hbase core operator (SURVEY.md §2 A3).

Flattens an arbitrarily nested DataFrame row (struct/array/map/scalar)
into HBase-cell long format::

    rowkey STRING | cf STRING | qualifier STRING | value STRING

Semantics (pinned by the golden fixture in FIXTURES.md §2):
- nested object keys concatenate into a dotted qualifier path
  (``address.geo.lat``)
- array elements get 0-based index segments (``tags.0``, ``orders.1.qty``)
- map entries contribute their key as a path segment
- scalar leaves are canonical strings (booleans ``true``/``false``,
  numbers via CAST AS STRING, binary as base64, timestamps ISO)
- null leaves / empty objects / empty arrays produce NO cell
- a literal ``.`` inside a field or map key is escaped as ``\\.`` so the
  flattened path stays unambiguous (golden-tested)
- duplicate-after-flatten collisions are kept as distinct cells (the
  HBase sink's last-write-wins applies at write time, not here)

Architecture note (100 TB posture): this is a *plan-construction-time*
schema walk in Python that emits only native Catalyst expressions
(``transform``/``flatten``/``map_entries``/``explode``) — zero Python
UDFs, zero shuffles. The operator is a narrow map over the input, so it
scales linearly with input splits and whole-stage codegen applies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DataType,
    DateType,
    MapType,
    StructType,
    TimestampType,
)

CELL_TYPE = "array<struct<qualifier:string,value:string>>"
SEP = "."


def _empty_cells() -> Column:
    # built lazily: Column construction needs an active SparkSession
    return F.expr(f"CAST(array() AS {CELL_TYPE})")


def _escape_static(key: str) -> str:
    """Escape a plan-time field name so '.' inside a key can't collide
    with the path separator."""
    return key.replace("\\", "\\\\").replace(SEP, "\\.")


def _escape_runtime(key: Column) -> Column:
    """Same escaping for runtime map keys."""
    key = F.regexp_replace(key, r"\\", r"\\\\")
    return F.regexp_replace(key, r"\.", r"\\.")


def _canonical(col: Column, dtype: DataType) -> Column:
    """Canonical string form of a scalar leaf."""
    if isinstance(dtype, BinaryType):
        return F.base64(col)
    if isinstance(dtype, BooleanType):
        return F.when(col, F.lit("true")).otherwise(F.lit("false"))
    if isinstance(dtype, (TimestampType, DateType)):
        return col.cast("string")
    return col.cast("string")


def _child_path(prefix: Column | None, segment: Column) -> Column:
    if prefix is None:
        return segment
    return F.concat(prefix, F.lit(SEP), segment)


def _cells(col: Column, dtype: DataType, prefix: Column | None) -> Column:
    """Recursive schema walk returning array<struct<qualifier,value>>
    for every non-null scalar leaf under ``col``."""
    if isinstance(dtype, StructType):
        parts = [
            _cells(col[f.name], f.dataType, _child_path(prefix, F.lit(_escape_static(f.name))))
            for f in dtype.fields
        ]
        if not parts:
            return _empty_cells()
        merged = F.concat(*parts) if len(parts) > 1 else parts[0]
        # a NULL struct yields NULL children -> empty parts, but concat of
        # empties is already empty; coalesce guards the all-NULL edge.
        return F.coalesce(merged, _empty_cells())
    if isinstance(dtype, ArrayType):
        nested = F.transform(
            col,
            lambda x, i: _cells(x, dtype.elementType, _child_path(prefix, i.cast("string"))),
        )
        return F.coalesce(F.flatten(nested), _empty_cells())
    if isinstance(dtype, MapType):
        nested = F.transform(
            F.map_entries(col),
            lambda e: _cells(
                e["value"], dtype.valueType, _child_path(prefix, _escape_runtime(e["key"].cast("string")))
            ),
        )
        return F.coalesce(F.flatten(nested), _empty_cells())
    # scalar leaf
    value = _canonical(col, dtype)
    qualifier = prefix if prefix is not None else F.lit("")
    return F.when(
        col.isNotNull(),
        F.array(F.struct(qualifier.alias("qualifier"), value.alias("value"))),
    ).otherwise(_empty_cells())


def kv_flatten(
    df: DataFrame,
    rowkey_col: str,
    cf: str = "d",
    exclude: tuple[str, ...] = (),
) -> DataFrame:
    """Flatten every column except ``rowkey_col``/``exclude`` into
    HBase-cell long format (rowkey, cf, qualifier, value)."""
    skip = set(exclude) | {rowkey_col}
    fields = [f for f in df.schema.fields if f.name not in skip]

    def _top(name: str):  # quote so literal '.' in a column name isn't a path
        return F.col("`" + name.replace("`", "``") + "`")

    parts = [
        _cells(_top(f.name), f.dataType, F.lit(_escape_static(f.name))) for f in fields
    ]
    if not parts:
        cells = _empty_cells()
    else:
        cells = F.concat(*parts) if len(parts) > 1 else parts[0]
        cells = F.coalesce(cells, _empty_cells())
    exploded = df.select(
        _top(rowkey_col).cast("string").alias("rowkey"),
        F.explode(cells).alias("cell"),
    )
    return exploded.select(
        "rowkey",
        F.lit(cf).alias("cf"),
        F.col("cell.qualifier").alias("qualifier"),
        F.col("cell.value").alias("value"),
    )
