"""Capture `.explain("formatted")` output for named catalog queries into
plans/rNN/<query>_<suffix>.txt (each optimization round's evidence files).

Usage:
    python tools/capture_plans.py <suffix> <outdir> <query> [query ...]

e.g. python tools/capture_plans.py after plans/r11 dedup_containment

Run from any checkout (a git worktree at the prior round's snapshot
produces the `before` files); <outdir> should be the MAIN repo's
plans/rNN directory so both sides land in one committed place.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from s3_parquet_to_postgres_spark.plans import all_queries  # noqa: E402
from s3_parquet_to_postgres_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    suffix, outdir, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    spark = build_session(
        app_name=f"capture_plans_{suffix}", master="local[8]",
        shuffle_partitions=8, extra_confs={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    for name in names:
        if name not in queries:
            print(f"SKIP {name}: not in this checkout's registry")
            continue
        df = queries[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(
                f"# {name} -- explain('formatted') at {SF_DIR}, "
                f"suffix={suffix}\n"
            )
            fh.write(buf.getvalue())
        print(f"WROTE {path}")
    spark.stop()


if __name__ == "__main__":
    main()
