#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify first
(writes <out>/<query>/ parquet + <out>/oracle_sql.json), then this script
runs each oracle SQL in DuckDB over the same testdata parquet and compares
rows / schema (sorted column names) / exact values.

Usage: python3 tools/oracle_check.py /tmp/verify_out /root/testdata/sf0.01
"""
import json, sys, glob
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"{name}: MISSING spark output"); failures += 1; continue
        try:
            odf = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR {e}"); failures += 1; continue
        sdf = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        scols, ocols = sorted(sdf.columns), sorted(odf.columns)
        if scols != ocols:
            print(f"{name}: SCHEMA MISMATCH spark={scols} oracle={ocols}")
            failures += 1; continue
        if len(sdf) != len(odf):
            print(f"{name}: ROWS MISMATCH spark={len(sdf)} oracle={len(odf)}")
            failures += 1; continue
        s = sdf[scols].sort_values(by=scols).reset_index(drop=True)
        o = odf[ocols].sort_values(by=ocols).reset_index(drop=True)
        mismatch = None
        try:
            for c in scols:
                sv = s[c]
                ov = o[c].astype(s[c].dtype) if s[c].dtype != o[c].dtype else o[c]
                neq = ~((sv == ov) | (sv.isna() & ov.isna()))
                if neq.any():
                    i = neq.idxmax()
                    mismatch = f"col {c} row {i}: spark={sv[i]!r} oracle={ov[i]!r}"
                    break
        except Exception as e:  # dtype coercion etc. — fail THIS query, keep going
            mismatch = f"COMPARE ERROR {e}"
        if mismatch:
            print(f"{name}: VALUE MISMATCH {mismatch}"); failures += 1
        else:
            print(f"{name}: OK ({len(sdf)} rows)")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
