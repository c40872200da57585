"""Physical-plan hygiene across the ENTIRE query catalog.

Correctness tests prove the right rows come back; these prove the
right PLAN produces them -- the difference between working at sf0.01
and working at 100 TB. Every catalog query is checked for accidental
cartesian products; the flagship queries additionally pin their
broadcast/pushdown shape.
"""

from __future__ import annotations

import pytest

from s3_parquet_to_postgres_spark.plans import all_queries
from s3_parquet_to_postgres_spark.plans.registry import get_registry

SF = "/root/testdata/sf0.001"

# Queries whose plan legitimately contains a nested-loop or cartesian
# stage (tiny broadcast side by construction, or an explicit cross).
NESTED_LOOP_OK = {
    "join_cross",        # explicit crossJoin of two LIMIT-ed frames
    "join_theta",        # non-equi predicate over two small filtered sides
    "similarity_topk_cosine",  # corpus x broadcast(5 queries), by design
    "similarity_ann_lsh",      # bucket probe includes a broadcast BNLJ dedup
    "similarity_ann_ivf",      # centroid assignment: corpus x broadcast(16)
}


def _plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", sorted(all_queries().keys()))
def test_no_accidental_cartesian(name, spark):
    df = all_queries()[name](spark, SF)
    plan = _plan_of(df)
    if name in NESTED_LOOP_OK:
        return
    assert "CartesianProduct" not in plan, f"{name}: cartesian product!"
    if "BroadcastNestedLoopJoin" in plan:
        # BNLJ is tolerable only with a broadcast build side (bounded);
        # reaching it without broadcast would be a scale bug.
        assert "BroadcastExchange" in plan, f"{name}: non-broadcast BNLJ"


def test_flagship_q3_plan_shape(spark):
    q3 = all_queries()["tpch_q3_shipping_priority"](spark, SF)
    plan = _plan_of(q3)
    # Dimension sides broadcast; no sort-merge join of dimensions.
    assert plan.count("BroadcastHashJoin") >= 2, plan[:2000]
    # Filters reached the parquet scans.
    assert "PushedFilters: [IsNotNull" in plan
    # Projection pruned the fact scan to the referenced columns only.
    assert "l_comment" not in plan


def test_ref_pipeline_is_scan_only(spark):
    plan = _plan_of(all_queries()["ref_project_rename_cast"](spark, SF))
    assert "Exchange" not in plan, "narrow pipeline must not shuffle"


# Queries rewritten from aggregate-join-back to window form so their
# expensive input is scanned exactly once (Catalyst does not dedupe
# shared subplans). A second lineitem scan here is a regression.
SINGLE_LINEITEM_SCAN = [
    "tpch_q2_min_cost_supplier",
    "tpch_q11_important_stock",
    "tpch_q15_top_supplier",
    "tpch_q17_small_qty_revenue",
    "tpch_q21_waiting_suppliers",
    "tpch_q18_large_volume",
]


@pytest.mark.parametrize("name", SINGLE_LINEITEM_SCAN)
def test_single_lineitem_scan(name, spark):
    plan = _plan_of(all_queries()[name](spark, SF))
    scans = plan.count("lineitem.parquet")
    assert scans == 1, f"{name}: {scans} lineitem scans (want 1)"


# Sketch pipelines group band/chunk buckets instead of self-joining on
# the bucket key precisely so the expensive signature aggregation runs
# once; a second documents scan is that optimization regressing.
@pytest.mark.parametrize(
    "name", ["dedup_minhash_lsh", "dedup_simhash", "dedup_passage_pairs"]
)
def test_single_documents_scan(name, spark):
    plan = _plan_of(all_queries()[name](spark, SF))
    scans = plan.count("documents.parquet")
    assert scans == 1, f"{name}: {scans} documents scans (want 1)"


def test_correlated_subquery_decorrelates(spark):
    # Catalyst must rewrite the scalar subquery + EXISTS into joins;
    # a surviving per-row subquery plan would re-execute orders per
    # customer row at scale.
    plan = _plan_of(all_queries()["subquery_correlated"](spark, SF))
    assert "Subquery" not in plan, plan[:2000]
    assert "LeftSemi" in plan, plan[:2000]


def test_every_query_has_doc_or_oracle():
    # Catalog invariant: an entry either has a DuckDB oracle or an
    # explicit doc string explaining why it is rows-only.
    for name, spec in get_registry().items():
        assert spec.oracle or spec.doc, f"{name}: rows-only without rationale"


def test_doc_counts_match_registry():
    # CAPABILITIES.md / README.md state catalog sizes; keep them honest.
    import pathlib
    import re

    repo = pathlib.Path(__file__).resolve().parents[1]
    total = len(all_queries())
    oracled = sum(1 for s in get_registry().values() if s.oracle)
    cap = (repo / "CAPABILITIES.md").read_text()
    m = re.search(r"(\d+) declared queries in `__spark_entry__.py` "
                  r"\((\d+) DuckDB-oracle-checked", cap)
    assert m and (int(m.group(1)), int(m.group(2))) == (total, oracled), (
        f"CAPABILITIES.md says {m and m.groups()}, registry has "
        f"({total}, {oracled})"
    )
    readme = (repo / "README.md").read_text()
    m = re.search(r"`queries\(\)` \((\d+) named", readme)
    assert m and int(m.group(1)) == total
    m = re.search(r"All (\d+) declared capabilities", readme)
    assert m and int(m.group(1)) == total
