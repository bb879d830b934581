#!/usr/bin/env python3
"""Strict local replica of the driver's correctness gate.

Usage: python3 scripts/selfcheck.py <verify_out_dir> <sf_dir> [query...]

Reads each <out_dir>/<name> parquet result (written by graft.Verify) with
pyarrow, runs the matching oracle SQL from <out_dir>/oracle_sql.json in
DuckDB against the <sf_dir> parquet tables (registered as views under their
bare names), fetches the oracle result as Arrow, and compares AT LEAST as
strictly as the driver:

  - column names: exact set (compared sorted-by-name, like the driver hash)
  - arrow dtypes: exact per column (string/large_string unified; timestamp
    tz INCLUDED — Spark TimestampType writes tz=UTC, DuckDB yields naive
    timestamps, and the driver's gate fails on that difference, so query
    outputs must be timestamp_ntz)
  - row count and ROW ORDER: exact
  - values: exact — floats compared bit-for-bit via struct packing, no
    rounding, no sorted-row fallback, decimals compared with scale

Dev tool only — not part of the shipped library.
"""
import sys, json, glob, os, struct, math, datetime, decimal
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_type(t: pa.DataType) -> str:
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_timestamp(t):
        # tz KEPT: the driver's gate distinguishes tz-aware (Spark
        # TimestampType → isAdjustedToUTC=true) from naive (DuckDB /
        # timestamp_ntz) — dropping it here masked 5 real failures in r2
        return f"timestamp[{t.unit}, tz={t.tz}]" if t.tz else \
            f"timestamp[{t.unit}]"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_large_list(t) or pa.types.is_list(t):
        return f"list<{canon_type(t.value_type)}>"
    return str(t)


def canon_cell(v):
    """Bit-exact canonical form for comparison."""
    if v is None:
        return None
    if isinstance(v, float):
        return ("f64", struct.pack("<d", v))
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v))
    if isinstance(v, (datetime.datetime,)):
        # compare as UTC micros regardless of tzinfo presence
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return ("ts", v.isoformat())
    if isinstance(v, list):
        return tuple(canon_cell(x) for x in v)
    return v


def table_rows(tbl: pa.Table, cols):
    data = {c: tbl.column(c).to_pylist() for c in cols}
    n = tbl.num_rows
    return [tuple(canon_cell(data[c][i]) for c in cols) for i in range(n)]


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
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no parquet output"); n_fail += 1; continue
        got = pa.concat_tables([pq.read_table(f) for f in files])
        if name not in oracle:
            print(f"---- {name}: no oracle (rows={got.num_rows})"); n_noorc += 1
            continue
        try:
            exp = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e).splitlines()[0]}")
            n_fail += 1; continue
        cols = sorted(got.schema.names)
        if cols != sorted(exp.schema.names):
            print(f"FAIL {name}: cols {cols} != {sorted(exp.schema.names)}")
            n_fail += 1; continue
        tmis = [(c, canon_type(got.schema.field(c).type),
                 canon_type(exp.schema.field(c).type)) for c in cols
                if canon_type(got.schema.field(c).type)
                != canon_type(exp.schema.field(c).type)]
        if tmis:
            print(f"FAIL {name}: dtype mismatch {tmis}"); n_fail += 1; continue
        if got.num_rows != exp.num_rows:
            print(f"FAIL {name}: rows {got.num_rows} != {exp.num_rows}")
            n_fail += 1; continue
        g = table_rows(got, cols); e = table_rows(exp, cols)
        if g == e:
            print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
        else:
            bad = [(i, a, b) for i, (a, b) in enumerate(zip(g, e))
                   if a != b][:3]
            print(f"FAIL {name}: value/order mismatch; first diffs: {bad}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_noorc} no-oracle ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
