"""Partition-layout invariance: the catalog's reproducibility claim.

At 100 TB the same logical dataset arrives as different file layouts
on different days (compaction, ingest batching, cluster size). Every
declared result must be EXACTLY identical regardless -- that is what
the scaled-integer sums, quantized transcendentals, content-stable
md5 draws, and total-ordered limits exist for. This test rewrites the
sf0.001 tables as 1-file and 13-file layouts and requires bit-equal
canonical results from a risk-prone sample of the catalog: float
aggregations, window functions, sampling, sketches, LM scoring, and
iterative graph ops.
"""

from __future__ import annotations

import os

import pytest

from s3_parquet_to_postgres_spark.plans import get_registry

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# Entries chosen for order/partitioning sensitivity risk.
SAMPLE = [
    "agg_pricing_summary",          # exact scaled-int float sums
    "agg_stats",                    # stddev/corr quantization
    "agg_approx",                   # sketch bounds as booleans
    "agg_count_min",                # counter-table sketch
    "window_topk_per_group",        # rank + limit determinism
    "window_frames",                # running frames
    "sort_multi_key_nulls",         # null ordering
    "ref_sort_limit",               # global top-k
    "tpch_q3_shipping_priority",
    "tpch_q18_large_volume",
    "dedup_exact",
    "dedup_minhash_lsh",            # hash sketches + bucket grouping
    "dedup_ngram_jaccard",
    "dedup_exact_spans",            # islands over positions
    "similarity_topk_cosine",       # float dot products + rank
    "similarity_mips",
    "sample_weighted",              # exponential-race keys
    "sample_mixture",
    "sample_token_budget",          # two-phase prefix sum
    "text_unigram_lm",              # quantized logprob sums
    "text_perplexity_buckets",      # percentile boundaries
    "text_tfidf",
    "event_ewma",                   # frame folds
    "event_sessionize",
    "graph_pagerank",               # 10 iterations of float updates
    "corpus_report",
]


@pytest.fixture(scope="module")
def layouts(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("layouts")
    dirs = []
    for n_files, name in ((1, "one"), (13, "many")):
        d = os.path.join(str(base), name)
        os.makedirs(d)
        for tbl in TABLES:
            (
                spark.read.parquet(os.path.join(sf_dir, f"{tbl}.parquet"))
                .repartition(n_files)
                .write.parquet(os.path.join(d, f"{tbl}.parquet"))
            )
        dirs.append(d)
    return dirs


def _canon(df):
    rows = []
    for r in df.collect():
        vals = []
        for v in r:
            if isinstance(v, float):
                vals.append(f"{v!r}")
            else:
                vals.append(str(v))
        rows.append("\x1f".join(vals))
    return sorted(df.columns), sorted(rows)


@pytest.mark.parametrize("name", SAMPLE)
def test_layout_invariant(name, spark, layouts):
    spec = get_registry()[name]
    a = _canon(spec.fn(spark, layouts[0]))
    b = _canon(spec.fn(spark, layouts[1]))
    assert a[0] == b[0]
    assert a[1] == b[1], f"{name}: results differ across file layouts"
