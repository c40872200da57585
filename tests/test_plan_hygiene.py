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


# Entries whose executed plan contains a Window with EMPTY partitioning
# (after constant-folding) — every row of that window's input through
# ONE task. Tolerable only when the input is bounded by construction,
# independent of corpus size; each entry documents its bound. Anything
# not listed here that plans an unpartitioned, non-rank-limited Window
# is a 100 TB scale bug (the ml_rfm_segments class — fixed via
# operators/ranking.global_row_number; tpch_q11/q15's rollup windows
# were the same class, fixed via lazy checkpoint + broadcast join-back).
GLOBAL_WINDOW_OK = {
    "agg_benford",              # 9 leading-digit bins
    "agg_bootstrap_ci",         # fixed bootstrap replicate count
    "agg_entropy_categorical",  # |event_type| category rows
    "agg_exact_median_twophase",  # 64/4096 histogram bins (two-phase)
    "agg_histogram_quantiles",  # fixed histogram bins
    "agg_timeseries_acf",       # daily series (observation-window days)
    "event_changepoint",        # daily series
    "event_seasonality",        # 7 weekday rows
    "event_survival",           # per-day churn table (window days)
    # ml_adaboost_stumps left this list in r11: its per-round best
    # stump is now a lexicographic min(struct) aggregation, not a
    # global-order window.
    "ml_auc_eval",              # <=1e6+1 distinct quantized scores
    "ml_ndcg_eval",             # top-k-limited ranking per query
    "ml_pr_curve",              # <=1e6+1 distinct quantized scores
    "ml_tree_stump",            # quantized threshold candidates
    "sample_contrastive_pairs",  # |langs| rotation table
    "similarity_rrf",           # top-k-limited ranked lists
    "table_drift_ks",           # distinct quantized cent values
    "table_drift_psi",          # fixed PSI bins
    "text_collocations",        # LIMIT-25 frame rank
}


def _empty_partition_windows(plan: str) -> list[str]:
    """Window nodes whose windowspecdefinition has no partition
    columns: the first argument is already an order column
    (`... ASC/DESC NULLS ...`) or the frame itself."""
    import re

    hits = []
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "Window" not in ln:
            continue
        for m in re.finditer(r"windowspecdefinition\(", ln):
            depth, cur = 0, []
            for ch in ln[m.end():]:
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    if depth == 0:
                        break
                    depth -= 1
                elif ch == "," and depth == 0:
                    break
                cur.append(ch)
            first = "".join(cur).strip()
            if (" ASC" in first or " DESC" in first
                    or first.startswith("specifiedwindowframe")):
                # Rank-limited global windows are rescued at runtime:
                # the executed plan inserts WindowGroupLimit beside
                # the Window, bounding each task's input to k.
                ctx = "\n".join(lines[max(0, i - 2):i + 3])
                if "WindowGroupLimit" not in ctx:
                    hits.append(ln.strip()[:140])
    return hits


@pytest.mark.parametrize("name", sorted(all_queries().keys()))
def test_no_unpartitioned_corpus_window(name, spark):
    df = all_queries()[name](spark, SF)
    hits = _empty_partition_windows(_plan_of(df))
    if name in GLOBAL_WINDOW_OK:
        assert hits, (
            f"{name}: allowlisted but plans no unpartitioned Window "
            "anymore — remove it from GLOBAL_WINDOW_OK"
        )
        return
    assert not hits, (
        f"{name}: unpartitioned non-rank-limited Window — every row "
        f"through ONE task at scale:\n" + "\n".join(hits)
    )


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
    if scans == 0:
        # q11/q15 route both consumers through a lazily-checkpointed
        # rollup: the single lineitem scan lives in the checkpoint
        # materialization job, and the final plan reads the RDD.
        assert "ExistingRDD" in plan, f"{name}: no lineitem scan at all"
        return
    assert scans == 1, f"{name}: {scans} lineitem scans (want 1)"


# Sketch pipelines group band/chunk buckets instead of self-joining on
# the bucket key precisely so the expensive signature aggregation runs
# once; a second documents scan is that optimization regressing.
@pytest.mark.parametrize(
    "name", ["dedup_simhash"]
)
def test_single_documents_scan(name, spark):
    plan = _plan_of(all_queries()[name](spark, SF))
    scans = plan.count("documents.parquet")
    assert scans == 1, f"{name}: {scans} documents scans (want 1)"


def test_minhash_single_scan_behind_checkpoint(spark):
    # r11 shape: the signature pipeline lives inside ONE
    # lazily-checkpointed subtree (it feeds both the banding and the
    # duplication discriminator). Two-sided invariant, mirroring the
    # passage-pairs test below: the un-truncated signature subtree
    # scans the corpus exactly once, and the entry plan scans it zero
    # times (banding reads the checkpoint, never re-derives).
    from s3_parquet_to_postgres_spark.operators.dedup import (
        minhash_signatures,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    inner = _plan_of(minhash_signatures(docs))
    assert inner.count("documents.parquet") == 1, inner[:2000]
    outer = _plan_of(all_queries()["dedup_minhash_lsh"](spark, SF))
    assert outer.count("documents.parquet") == 0, outer[:2000]


def test_passage_pairs_single_scan_behind_checkpoint(spark):
    # r10 shape: the whole winnowing pipeline lives inside ONE
    # lazily-checkpointed doc-set subtree. Two-sided invariant: the
    # un-truncated subtree (winnow_doc_sets) scans the corpus exactly
    # once, and the entry plan scans it zero times (every consumer
    # reads the checkpoint, never re-derives the pipeline).
    from s3_parquet_to_postgres_spark.operators.textstats import (
        winnow_doc_sets,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    inner = _plan_of(winnow_doc_sets(docs))
    assert inner.count("documents.parquet") == 1, inner[:2000]
    outer = _plan_of(all_queries()["dedup_passage_pairs"](spark, SF))
    assert outer.count("documents.parquet") == 0, outer[:2000]


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
