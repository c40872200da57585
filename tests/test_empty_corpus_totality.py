"""Totality sweep: every catalog query must execute (possibly to an
empty or NULL-filled result) over a dataset whose ten tables exist but
hold ZERO rows.

Why this matters at 100 TB: a real lake has empty partitions, empty
daily shards, and filters that eliminate every row before an
aggregate. Under Spark 4's default ANSI mode a ratio computed off a
zero count throws DIVIDE_BY_ZERO instead of going NULL, and
driver-side kernels that collect bounded state can meet None/zero
rows -- so "works on the test corpus" does not imply "total". The
round-3 advisor found exactly this class in ml_pca_power; this sweep
found and pinned three more (event_funnel_windowed, ml_logreg_train,
agg_bootstrap_ci rate/mean divisions; ml_kmeans_embeddings MLlib fit
on zero rows).

One test, all queries: per-query parametrization would pay the
fixture/session bookkeeping 230x; a single pass with a collected
failure list keeps the sweep ~a couple of minutes and reports every
offender at once.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from s3_parquet_to_postgres_spark.plans import all_queries

SRC = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


@pytest.fixture(scope="session")
def empty_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        schema = pq.read_schema(f"{SRC}/{t}.parquet")
        pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
    return str(d)


def test_every_catalog_query_is_total_on_empty_tables(spark, empty_sf_dir):
    failures = []
    for name, fn in all_queries().items():
        try:
            fn(spark, empty_sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as e:  # noqa: BLE001 - collecting, not masking
            failures.append(f"{name}: {type(e).__name__}: {str(e)[:160]}")
    assert not failures, (
        f"{len(failures)} catalog queries crash on empty input:\n  "
        + "\n  ".join(failures)
    )
