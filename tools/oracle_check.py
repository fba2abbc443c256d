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
            import numpy as np
            for c in scols:
                sk, ok_ = s[c].dtype.kind, o[c].dtype.kind
                # int-vs-float drift is a TYPE-CONTRACT bug: coercing the
                # oracle's float down to int would truncate 1.9 -> 1 and
                # report a false OK on exactly the class of regression the
                # gate exists to catch
                if sk != ok_ and {sk, ok_} <= {"i", "u", "f"} and "f" in {sk, ok_}:
                    mismatch = f"col {c} DTYPE KIND spark={s[c].dtype} oracle={o[c].dtype}"
                    break
                if sk != ok_ and {sk, ok_} == {"i", "u"}:
                    # signed-vs-unsigned: result_type would be float64, which
                    # collapses distinct values >= 2^53 — compare exact ints
                    sv, ov = s[c].astype(object), o[c].astype(object)
                else:
                    common = np.result_type(s[c].dtype, o[c].dtype) \
                        if s[c].dtype != o[c].dtype else s[c].dtype
                    sv, ov = s[c].astype(common), o[c].astype(common)
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
    # queries with no oracle SQL (approximate by design) still get the
    # contract's rows-only check. Driven by the CATALOG (queries.json from
    # Verify) so a failed-and-poisoned query shows up as MISSING instead of
    # silently not being checked; falls back to a directory scan for output
    # dirs produced by an older Verify.
    try:
        rows_only = [q for q in json.load(open(f"{out_dir}/queries.json"))
                     if q not in oracle]
    except FileNotFoundError:
        rows_only = [d.rstrip("/").rsplit("/", 1)[-1]
                     for d in sorted(glob.glob(f"{out_dir}/*/"))
                     if d.rstrip("/").rsplit("/", 1)[-1] not in oracle]
    for name in sorted(rows_only):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        n = con.execute(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0] \
            if files else 0
        if n > 0:
            print(f"{name}: OK rows-only ({n} rows)")
        else:
            print(f"{name}: ROWS-ONLY FAILURE (missing or empty output)"); failures += 1
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
