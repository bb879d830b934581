#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 scripts/selfcheck.py <verify_out_dir> <sf_dir> [query...]

Reads each <out_dir>/<name> parquet result (written by graft.Verify), runs
the matching oracle SQL from <out_dir>/oracle_sql.json in DuckDB against the
<sf_dir> parquet tables (registered as views under their bare names), and
compares: schema (column names sorted), row count, and values (rows compared
in result order and as sorted multisets). Dev tool only — not part of the
shipped library.
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if isinstance(v, float):
        return round(v, 9)
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return ("dec", str(v))
    except Exception:
        pass
    return v

def norm_rows(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [tuple(norm_cell(r[i]) for i in order) for r in rows]

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_noorc = 0
    for name in names:
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet output"); n_fail += 1; continue
        got = con.execute(f"SELECT * FROM '{files[0]}'")
        got_cols = [c[0] for c in got.description]
        got_rows = got.fetchall()
        if name not in oracle:
            print(f"---- {name}: no oracle (rows={len(got_rows)})"); n_noorc += 1
            continue
        try:
            exp = con.execute(oracle[name])
            exp_cols = [c[0] for c in exp.description]
            exp_rows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e).splitlines()[0]}")
            n_fail += 1; continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: cols {sorted(got_cols)} != {sorted(exp_cols)}")
            n_fail += 1; continue
        g = norm_rows(got_rows, got_cols); e = norm_rows(exp_rows, exp_cols)
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} != {len(e)}"); n_fail += 1; continue
        if g == e:
            print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
        elif sorted(map(repr, g)) == sorted(map(repr, e)):
            print(f"PASS* {name} ({len(g)} rows; order differs)"); n_pass += 1
        else:
            bad = [(i, a, b) for i, (a, b) in enumerate(zip(g, e)) if a != b][:3]
            print(f"FAIL {name}: value mismatch; first diffs: {bad}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_noorc} no-oracle ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
