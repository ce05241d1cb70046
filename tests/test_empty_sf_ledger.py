"""FIXTURES.md section C is executable, not prose: the queries documented
as empty-at-one-SF must stay POPULATED at their evidence SF, so a fixture
or plan regression that silently degenerates them trips here rather than
surfacing as a matching-0 driver row nobody questions."""

from __future__ import annotations

import pytest

#: (query, populated_sf_dir) — the SF each section-C row cites as its
#: populated evidence. g_adamic_adar is the sf0.01-empty mirror case.
_POPULATED_AT = [
    ("a_apriori_triples", "/root/testdata/sf0.01"),
    ("a_association_rules", "/root/testdata/sf0.01"),
    ("pipeline_fuzzy_corpus", "/root/testdata/sf0.01"),
    ("sim_embedding_near_dup", "/root/testdata/sf0.01"),
    ("tpch_q11_important_value", "/root/testdata/sf0.01"),
    ("g_adamic_adar", "/root/testdata/sf0.1"),
]


@pytest.mark.parametrize("name,sf_dir", _POPULATED_AT)
def test_documented_empty_queries_stay_populated_at_evidence_sf(
    spark, name, sf_dir
):
    from cicevse2024_tfm_datapipeline_spark.plans import load_all

    qs = load_all()
    n = qs[name].spark(spark, sf_dir).count()
    assert n > 0, (
        f"{name} returns 0 rows at {sf_dir} — FIXTURES.md §C cites this "
        f"SF as its populated evidence; the query has degenerated"
    )
