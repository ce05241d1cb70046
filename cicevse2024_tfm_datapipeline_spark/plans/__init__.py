"""Query-plan surface: importing this package registers every query."""

from __future__ import annotations

import importlib

from cicevse2024_tfm_datapipeline_spark.plans.registry import Query, registry

_MODULES = [
    "core_relational",
    "windows_ts",
    "metrics_queries",
    "extensions",
    "rows_only",
    "advanced",
]


def load_all() -> dict[str, Query]:
    for m in _MODULES:
        importlib.import_module(f"cicevse2024_tfm_datapipeline_spark.plans.{m}")
    return registry()


__all__ = ["load_all", "Query", "registry"]
