"""CLI entry-point parity with the reference binary (reference:
src/main.rs:1-23, src/cmd_args.rs:16-28): YAML config in, work-list
drain to a sink, fail-fast exit codes for bad input."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from s3_parquet_to_postgres_spark.__main__ import main

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def staged_cli(spark, tmp_path):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    keys = []
    for i in range(2):
        path = tmp_path / f"obj{i}.parquet"
        orders.filter(F.col("o_orderkey") % 2 == i).coalesce(1).write.parquet(
            str(path)
        )
        keys.append(str(path))
    work = tmp_path / "work"
    work.mkdir()
    (work / "todo").write_text("\n".join(keys) + "\n")
    cfg = tmp_path / "config.yml"
    cfg.write_text(
        f"""
s3:
  download_batch_size: 1
  work_lists_dir: {work}
parquet:
  desired_fields: [o_orderkey, o_totalprice, o_orderstatus]
  parquet_to_db:
    o_orderkey: id
    o_totalprice: price
    o_orderstatus: null
"""
    )
    return tmp_path, cfg, orders


def test_cli_drains_to_parquet_sink(spark, staged_cli):
    tmp_path, cfg, orders = staged_cli
    out_dir = tmp_path / "out"
    rc = main([str(cfg), "--sink", "parquet", "--output-dir", str(out_dir)])
    assert rc == 0
    got = spark.read.parquet(str(out_dir))
    assert sorted(got.columns) == ["id", "o_orderstatus", "price"]
    assert got.count() == orders.count()
    completed = (tmp_path / "work" / "completed").read_text().strip()
    assert len(completed.splitlines()) == 2


def test_cli_batch_write_is_single_job(spark, staged_cli):
    """The per-batch row count must ride the write job via the
    Observation API, never a second full scan (reference parity: the
    one-pass loop in src/runner.rs:17-45). Measured: each batch costs
    exactly TWO jobs -- the parquet schema/footer read at
    spark.read time plus the observed write. Replacing _observed with
    a df.count() would add a third job per batch and trip the bound.
    Job-group attribution is thread-local, so main() running in this
    thread inherits it."""
    tmp_path, cfg, orders = staged_cli
    sc = spark.sparkContext
    sc.setJobGroup("cli-drain-jobcount", "single-job-per-batch assertion")
    try:
        rc = main([
            str(cfg), "--sink", "parquet",
            "--output-dir", str(tmp_path / "out_jobcount"),
        ])
    finally:
        sc.setJobGroup("", "")
    assert rc == 0
    ids = sc.statusTracker().getJobIdsForGroup("cli-drain-jobcount")
    n_batches = 2  # staged_cli: 2 files, download_batch_size 1
    assert len(ids) <= 2 * n_batches, (
        f"CLI drain ran {len(ids)} jobs for {n_batches} batches -- "
        "a second scan per batch has been reintroduced"
    )


def test_cli_bad_config_is_exit_2(tmp_path):
    cfg = tmp_path / "bad.yml"
    cfg.write_text("s3: {}\n")  # missing parquet section
    assert main([str(cfg), "--sink", "parquet", "--output-dir", "x"]) == 2


def test_cli_missing_db_section_is_exit_2(staged_cli):
    _, cfg, _ = staged_cli
    assert main([str(cfg), "--sink", "jdbc"]) == 2


def test_cli_missing_output_dir_is_exit_2(staged_cli):
    _, cfg, _ = staged_cli
    assert main([str(cfg), "--sink", "parquet"]) == 2


def test_cli_failed_batch_is_exit_1_and_preserves_wip(spark, tmp_path):
    work = tmp_path / "work"
    work.mkdir()
    (work / "todo").write_text(str(tmp_path / "missing.parquet") + "\n")
    cfg = tmp_path / "config.yml"
    cfg.write_text(
        f"""
s3:
  download_batch_size: 1
  work_lists_dir: {work}
parquet:
  desired_fields: [o_orderkey]
"""
    )
    out_dir = tmp_path / "out"
    rc = main([str(cfg), "--sink", "parquet", "--output-dir", str(out_dir)])
    assert rc == 1
    # Fail-fast: nothing marked completed; the failed key stays in wip
    # so a rerun resumes it (reference: src/db.rs:202-239 semantics).
    assert not (work / "completed").exists() or not (
        work / "completed"
    ).read_text().strip()
    assert (work / "wip").read_text().strip().endswith("missing.parquet")


def test_cli_parquet_sink_accepts_nested_columns(spark, tmp_path):
    # Nested projection columns are fine for --sink parquet (parquet
    # is a nested format); the flat-schema gate belongs to PG sinks
    # only (require_flat in __main__._make_sink_fn).
    src = tmp_path / "nested.parquet"
    spark.createDataFrame(
        [(1, {"a": 1}), (2, {"a": 2})], "id long, props map<string,int>"
    ).coalesce(1).write.parquet(str(src))
    work = tmp_path / "work"
    work.mkdir()
    (work / "todo").write_text(f"{src}\n")
    cfg = tmp_path / "config.yml"
    cfg.write_text(
        f"""
s3:
  download_batch_size: 1
  work_lists_dir: {work}
parquet:
  desired_fields: [id, props]
  parquet_to_db:
    id: null
    props: null
"""
    )
    out_dir = tmp_path / "out"
    rc = main([str(cfg), "--sink", "parquet", "--output-dir", str(out_dir)])
    assert rc == 0
    got = spark.read.parquet(str(out_dir))
    assert dict(got.dtypes)["props"] == "map<string,int>"
    assert got.count() == 2
