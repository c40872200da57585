"""PySpark-native analytics engine with the capabilities of
opsgang/s3-parquet-to-postgres, rebuilt Spark-first.

The reference is a checkpointed Parquet->Postgres ETL pipeline
(reference: src/runner.rs:47-112). This package re-expresses its data
model (per-file row streams, projected/renamed/cast flat columns,
resumable work lists, fail-fast destination validation) on top of the
Spark DataFrame API, and extends it with the relational query surface
its tests exercise plus LLM-data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns).

Layout:
  session     SparkSession factory tuned for scale (AQE, Arrow, S3A)
  catalog     test-table loading helpers (incl. ns-timestamp handling)
  config      YAML job-spec model (reference: src/config.rs:7-37)
  sources/    parquet scan/partitioning, work-list manifest, bucketed
              tables, small-file compaction
  operators/  cast planner, dedup ladder (exact/MinHash/SimHash/
              Jaccard/components), similarity (exact/LSH/IVF), text
              stats + PII scrub, as-of & range joins, skew salting,
              Z-order clustering, multimodal binary columns
  functions/  cross-engine-exact numerics, UDF surface, layout helpers
  sinks/      JDBC + Postgres COPY writers, fail-fast validation
  plans/      declared query catalog (Spark query + DuckDB oracle SQL)
  streaming/  incremental ingestion, watermarked windows, stateful
              processing, stream-stream joins, incremental aggregates
  pipeline    end-to-end runner (reference: src/runner.rs:47-112)
"""

__version__ = "0.1.0"
