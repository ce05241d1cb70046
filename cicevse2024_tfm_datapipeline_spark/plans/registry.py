"""Query registry: every implemented operator ships as a named query over
the synthetic tables plus (where SQL-expressible) a DuckDB oracle twin.

This is the engine's correctness gate (SURVEY §5): the driver runs each
``queries()[name]`` and hash-compares against ``oracle_sql()[name]``.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    spark: SparkQuery
    oracle: str | None  # DuckDB SQL twin; None → rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()):
    def deco(fn: SparkQuery) -> SparkQuery:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        if oracle is not None:
            # normalize round() to the portable floor form (see
            # plans.common.pround — engine round() semantics diverge at
            # half-boundaries)
            from cicevse2024_tfm_datapipeline_spark.plans.common import portable_round_sql

            normalized = portable_round_sql(oracle)
        else:
            normalized = None
        _REGISTRY[name] = Query(name, fn, normalized, doc, tags)
        return fn

    return deco


def registry() -> dict[str, Query]:
    return dict(_REGISTRY)
