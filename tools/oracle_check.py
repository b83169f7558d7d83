#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage:
    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out [names...]"
    python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/verify_out [names...]

For each query with both a Spark result dump (<out>/<name>/*.parquet) and an
oracle entry in <out>/oracle_sql.json: run the oracle in DuckDB over the sf
parquet views, load the Spark dump through the same DuckDB reader (so both
sides get identical value rendering), sort columns by name, sort rows by all
columns, and compare cell-for-cell.  Prints one line per query and a summary;
exits 1 on any mismatch.  Dev-only tooling — the product library never
depends on this.
"""
import sys, json, glob
import duckdb

TABLES = ["events", "lineitem", "orders", "customer", "supplier", "part",
          "nation", "region", "documents", "embeddings"]


def canon(con, rel_sql):
    df = con.sql(rel_sql).df()
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort",
                            na_position="first").reset_index(drop=True)
    return df


def main(sf_dir, out_dir, names):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    todo = sorted(names or oracles.keys())
    fails, skipped = [], []
    for name in todo:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            skipped.append(name); print(f"{name}: NO SPARK DUMP"); continue
        if name not in oracles:
            skipped.append(name); print(f"{name}: no_oracle"); continue
        try:
            spark_df = canon(con, f"SELECT * FROM '{files[0]}'")
            ora_df = canon(con, oracles[name])
        except Exception as e:
            fails.append(name); print(f"{name}: ERROR {e}"); continue
        ok_rows = len(spark_df) == len(ora_df)
        ok_schema = list(spark_df.columns) == list(ora_df.columns)
        ok_vals = ok_rows and ok_schema and spark_df.astype(str).equals(
            ora_df.astype(str))
        if ok_rows and ok_schema and ok_vals:
            print(f"{name}: ok ({len(spark_df)} rows)")
        else:
            fails.append(name)
            print(f"{name}: MISMATCH rows={len(spark_df)}/{len(ora_df)} "
                  f"schema_ok={ok_schema} vals_ok={ok_vals}")
            if ok_schema and ok_rows:
                neq = spark_df.astype(str) != ora_df.astype(str)
                cols = [c for c in spark_df.columns if neq[c].any()]
                idx = neq.any(axis=1)
                print(f"  diff cols={cols}; first rows:")
                print(spark_df[idx].head(3).to_string())
                print(ora_df[idx].head(3).to_string())
            elif not ok_schema:
                print(f"  spark={list(spark_df.columns)}\n  ora  ={list(ora_df.columns)}")
    print(f"\n{len(todo)-len(fails)-len(skipped)} ok, {len(fails)} FAIL, "
          f"{len(skipped)} skipped: {fails or ''}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3:]))
