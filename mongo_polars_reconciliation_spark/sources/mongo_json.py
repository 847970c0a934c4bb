"""Mongo extended-JSON (mongoexport) file source.

The reference's raw inputs are mongoexport documents — string object ids
wrapped as ``{"$oid": ...}``, longs as ``{"$numberLong": "..."}``, nested
sub-documents like ``metadata_object`` (files/2024-05-01_sales_v_for_test
.json) — which its server-side ``$project`` flattens to a scalar, mostly
string schema before the engine sees them (src/expression_builder.py:29-43,
SURVEY.md §1.2). This source reproduces that boundary for users who have the
export *files* instead of a live collection: ``spark.read.json`` then a pure
projection that unwraps the type wrappers, flattens one level of nesting and
applies the reference's string-default / int64 / float64 coercions.

Scale notes: ``schema`` should be passed explicitly in production (inference
scans the data once); the unwrap/flatten is a narrow ``select`` — no shuffle,
and unreferenced JSON fields are pruned at the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# mongoexport extended-JSON type wrappers → the wrapped scalar field
_WRAPPERS = ("$oid", "$numberLong", "$numberInt", "$numberDouble", "$date")


def _unwrap(df_schema: T.StructType, name: str) -> Column:
    """Column for a (possibly dotted) field, unwrapping a type-wrapper struct
    if the inferred schema shows one."""
    parts = name.split(".")
    field: T.DataType = df_schema
    for p in parts:
        if not isinstance(field, T.StructType) or p not in field.fieldNames():
            # absent in this export: project as null (Mongo's schemaless
            # reads do the same; the cast below types it)
            return F.lit(None)
        field = field[p].dataType
    col = F.col(".".join(f"`{p}`" for p in parts))
    if isinstance(field, T.StructType):
        for w in _WRAPPERS:
            if w in field.fieldNames():
                return col.getField(w)
    return col


def read_mongo_extended_json(
    spark: SparkSession,
    path: str,
    fields: dict[str, str],
    schema: T.StructType | None = None,
) -> DataFrame:
    """Read mongoexport JSON into the reference's flat engine schema.

    ``fields`` maps output column name → ``"source[:type]"`` where source is
    a (possibly dotted) document path and type is ``string`` (default,
    mirroring the ``$toString`` projection), ``long`` or ``double``
    (INTEGER_FIELDS / DOUBLE_FIELDS, src/config.py:35-36).
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    raw = reader.json(path)
    cols = []
    for out_name, spec in fields.items():
        src, _, typ = spec.partition(":")
        cols.append(_unwrap(raw.schema, src).cast(typ or "string").alias(out_name))
    return raw.select(*cols)
