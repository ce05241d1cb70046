"""JVM-side literal relations for tiny lookup/dimension tables.

``spark.createDataFrame(rows)`` routes local data through the Python-RDD
path (``applySchemaToPythonRDD``): it pickles the rows, launches Python
worker processes, and plans a ``Scan ExistingRDD`` whose partitioning is
unknown to Catalyst. Inside a timed query that worker spin-up dominates
(measured ~1.5-2 s of a 3 s query at sf0.1), and on a real cluster the
RDD scan blocks constant folding.

``literal_df`` instead builds the same relation as a pure Catalyst
expression — ``explode`` of a literal array of structs over ``range(1)``
— so the "table" lives entirely in the JVM plan: no Python workers, no
pickling, broadcast-friendly, and foldable.

Intended for small dimension/lookup/quota tables (≲ thousands of rows);
large frames should come from real sources.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _split_schema(schema: str) -> list[tuple[str, str]]:
    """Parse ``"name type, name type"`` honoring nested ``<...>`` brackets
    (``array<double>``, ``map<string,int>``)."""
    fields: list[tuple[str, str]] = []
    depth = 0
    start = 0
    parts: list[str] = []
    for i, ch in enumerate(schema):
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(schema[start:i])
            start = i + 1
    parts.append(schema[start:])
    for p in parts:
        name, typ = p.strip().split(None, 1)
        fields.append((name, typ.strip()))
    return fields


def literal_df(
    spark: SparkSession, rows: Sequence[Sequence], schema: str
) -> DataFrame:
    """Build a tiny DataFrame from driver-side rows without touching the
    Python-RDD path. ``schema`` is the usual DDL string, e.g.
    ``"event_type string, category string"``."""
    fields = _split_schema(schema)
    if not rows:
        return spark.createDataFrame([], schema=schema)
    structs = [
        F.struct(
            *[
                F.lit(v).cast(typ).alias(name)
                for v, (name, typ) in zip(row, fields)
            ]
        )
        for row in rows
    ]
    return (
        spark.range(1)
        .select(F.explode(F.array(*structs)).alias("__r"))
        .select("__r.*")
    )
