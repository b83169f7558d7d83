#!/usr/bin/env python3
"""HUGEINT + DECIMAL tripwire for the DuckDB oracle gate.

DuckDB widens sum() over INTEGER/BIGINT to HUGEINT (int128). The driver's
hasher renders HUGEINT differently from Spark's int64 (pandas materializes
it as float64/object), so value-equal frames hash unequal — see round-4
VERDICT #1. DECIMAL output columns are the same class (round-7 VERDICT
#1): Spark infers a different precision than DuckDB (DECIMAL(28,2) vs
(38,2) for the same sum) and the hasher distinguishes the renderings even
when every value matches. Every oracle output column must therefore be a
type pandas round-trips losslessly AND whose precision both engines agree
on; any integer sum needs CAST(... AS BIGINT), and any money/decimal
column must cross as BIGINT cents/micros or one final CAST(... AS
DOUBLE) — never raw DECIMAL.

Run after Verify dumped oracle_sql.json (no Spark needed — this only
PREPAREs each oracle query against the parquet views and inspects the
result types):

    python3 tools/check_oracle_types.py /root/testdata/sf0.01 /tmp/verify_out/oracle_sql.json

Exits 1 if any oracle emits HUGEINT/UHUGEINT/INT128 (or a LIST thereof).
"""
import sys, json, duckdb

BAD = ("HUGEINT", "UHUGEINT", "INT128", "DECIMAL")
TABLES = ["events", "lineitem", "orders", "customer", "supplier", "part",
          "nation", "region", "documents", "embeddings"]

def main(sf_dir: str, oracle_json: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(oracle_json))
    bad = []
    for name, sql in sorted(oracles.items()):
        try:
            rel = con.sql(sql)  # plans + binds types; does not materialize
            types = [str(t).upper() for t in rel.types]
        except Exception as e:  # a broken oracle is its own failure mode
            bad.append((name, f"oracle failed to plan: {str(e)[:200]}"))
            continue
        hits = [f"{c}:{t}" for c, t in zip(rel.columns, types)
                if any(b in t for b in BAD)]
        if hits:
            bad.append((name, "unhashable column(s): " + ", ".join(hits)))
    if bad:
        for name, msg in bad:
            print(f"FAIL {name}: {msg}")
        print(f"\n{len(bad)}/{len(oracles)} oracles emit driver-unhashable "
              f"types — wrap integer sums in CAST(... AS BIGINT); put "
              f"money on BIGINT cents/micros or one final CAST(... AS "
              f"DOUBLE), never raw DECIMAL.")
        return 1
    print(f"OK: {len(oracles)} oracles, no HUGEINT/INT128/DECIMAL output "
          f"columns.")
    return 0

if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    oj = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"
    sys.exit(main(sf, oj))
