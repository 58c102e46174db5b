#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet dumps
against the oracle SQL in DuckDB over the same sf dir, compare canonicalized
(sorted rows, 12-significant-digit floats, columns sorted by name) results.

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import json, math, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon_val(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.12g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_val(x) for x in v) + "]"
    return str(v)

def canon(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(canon_val(r[i]) for i in idx) for r in rows)
    return [cols[i] for i in idx], out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        got = con.sql(f"SELECT * FROM read_parquet({files!r})")
        g_cols, g_rows = canon(list(got.columns), got.fetchall())
        try:
            want = con.sql(oracle[name])
            w_cols, w_rows = canon(list(want.columns), want.fetchall())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_bad += 1; continue
        if [c.lower() for c in g_cols] != [c.lower() for c in w_cols]:
            print(f"FAIL {name}: cols {g_cols} vs {w_cols}"); n_bad += 1; continue
        if g_rows != w_rows:
            print(f"FAIL {name}: {len(g_rows)} vs {len(w_rows)} rows")
            for a, b in list(zip(g_rows, w_rows))[:5]:
                if a != b:
                    print(f"  spark:  {a}\n  oracle: {b}")
            n_bad += 1
            continue
        print(f"ok   {name} ({len(g_rows)} rows)")
        n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
