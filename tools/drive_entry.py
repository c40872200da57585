"""Drive the driver contract: __spark_entry__.entry + queries() vs oracle_sql() via DuckDB at sf0.01."""
import hashlib
import sys

sys.path.insert(0, "/root/repo")

import duckdb
import __spark_entry__ as entrymod
from s3_parquet_to_postgres_spark.session import build_session

SF_DIR = __import__("os").environ.get("DRIVE_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def unhashable_cols(df_pandas):
    """Columns whose values would crash the driver's pandas sort_values
    canonicalizer (TypeError: unhashable type) — arrays/lists/dicts."""
    bad = []
    for c in df_pandas.columns:
        col = df_pandas[c]
        if col.dtype == object:
            for v in col.head(5):
                if isinstance(v, (list, dict, set)) or type(v).__name__ == "ndarray":
                    bad.append(c)
                    break
    return bad


def canon(df_pandas):
    cols = sorted(df_pandas.columns)
    rows = []
    for _, r in df_pandas[cols].iterrows():
        vals = []
        for v in r:
            if v is None or (isinstance(v, float) and v != v):
                vals.append("NULL")
            elif isinstance(v, float):
                vals.append(f"{v:.6g}")
            elif isinstance(v, (bytes, bytearray)):
                vals.append(bytes(v).hex())
            else:
                vals.append(str(v))
        rows.append("\x1f".join(vals))
    rows.sort()
    return cols, len(rows), hashlib.md5("\x1e".join(rows).encode()).hexdigest()


def main():
    only = set(sys.argv[1:])
    spark = build_session(
        app_name="drive_entry", master="local[8]", shuffle_partitions=8,
        extra_confs={"spark.ui.enabled": "false"},
    )
    res = entrymod.entry(spark)
    print(f"SMOKE entry() rows={res.count()}", flush=True)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_ok = n_fail = n_noora = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sp = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:200]}", flush=True)
            n_fail += 1
            continue
        bad = unhashable_cols(sp)
        if bad:
            print(f"WARN {name}: array-typed output cols {bad} would crash driver canonicalizer", flush=True)
            n_fail += 1
        sql = oracles.get(name)
        if sql is None:
            print(f"ROWS {name}: rows={len(sp)} (no oracle)", flush=True)
            n_noora += 1
            continue
        try:
            du = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {type(e).__name__}: {str(e)[:200]}", flush=True)
            n_fail += 1
            continue
        sc, sn, sh = canon(sp)
        dc, dn, dh = canon(du)
        if sn == dn and sc == dc and sh == dh:
            print(f"OK {name}: rows={sn}", flush=True)
            n_ok += 1
        else:
            print(
                f"FAIL {name}: rows {sn} vs {dn}; cols {'=' if sc == dc else f'{sc} vs {dc}'}; "
                f"hash {'=' if sh == dh else 'MISMATCH'}",
                flush=True,
            )
            n_fail += 1
    print(f"RESULT ok={n_ok} fail={n_fail} rows_only={n_noora}", flush=True)
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
