#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check.py <verify_out_dir> <sf_dir> [query ...]

Reads each <out_dir>/<name> parquet (Verify.scala output), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sf_dir
parquet tables, canonicalizes both per FIXTURES.md rules (round doubles
to 6dp, timestamps → UTC strings, sort columns by name), and compares.
"""
import sys, os, json, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(rows, cols):
    # sort columns by name, canonicalize values
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            rr.append(canon_val(v))
        out.append(tuple(rr))
    return out

def canon_val(v):
    import datetime, decimal
    if isinstance(v, float):
        if math.isnan(v): return "nan"
        return f"{round(v, 6):.6f}"
    if isinstance(v, decimal.Decimal):
        # deliberately distinct from int: the driver's hasher serializes
        # DuckDB HUGEINT/DECIMAL differently from BIGINT, so a bare
        # integer sum() in an oracle (HUGEINT) must FAIL here too —
        # fetch via arrow (see rows_of) so the Decimal type survives
        return "dec:" + f"{v:f}"
    if isinstance(v, datetime.datetime):
        # full microsecond precision — the events table is µs-native;
        # truncating to ms would hide sub-ms divergence
        return v.strftime("%Y-%m-%d %H:%M:%S.") + f"{v.microsecond:06d}"
    if isinstance(v, (list, tuple)):
        return tuple(canon_val(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon_val(x)) for k, x in v.items()))
    return v

def rows_of(rel):
    """Fetch through arrow, not fetchall(): duckdb's fetchall() converts
    HUGEINT to a plain Python int, erasing the very type difference the
    driver's hasher trips on. Arrow keeps HUGEINT as decimal128(38,0),
    which to_pylist() surfaces as decimal.Decimal."""
    tbl = rel.arrow()
    cols = [c.lower() for c in tbl.column_names]
    if tbl.num_columns == 0:
        return cols, []
    pyl = [tbl.column(i).to_pylist() for i in range(tbl.num_columns)]
    return cols, list(zip(*pyl)) if tbl.num_rows else []

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = n_skip = 0
    names = sorted(os.listdir(out_dir))
    for name in names:
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d): continue
        if only and name not in only: continue
        got_rel = con.sql(f"SELECT * FROM read_parquet('{d}/*.parquet')")
        got_cols, got_rows = rows_of(got_rel)
        got = canon(got_rows, got_cols)
        if name not in oracles:
            print(f"SKIP {name}: no oracle ({len(got)} rows)")
            n_skip += 1
            continue
        try:
            exp_rel = con.sql(oracles[name])
            exp_cols, exp_rows = rows_of(exp_rel)
            exp = canon(exp_rows, exp_cols)
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            n_fail += 1
        elif got == exp:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: rows differ (got {len(got)} vs exp {len(exp)})")
            for i, (g, e) in enumerate(zip(got, exp)):
                if g != e:
                    print(f"  first diff at row {i}:\n    got {g}\n    exp {e}")
                    break
            if len(got) != len(exp):
                print(f"  got[:2]={got[:2]}\n  exp[:2]={exp[:2]}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
