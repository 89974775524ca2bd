#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark output), runs the
matching oracle SQL from oracle_sql.json in DuckDB over views named after
the test tables, and compares as sorted multisets of rows with columns
sorted by name. Purely a dev tool — the real gate is driver-side.
"""
import sys, os, json, math
import duckdb

def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # stabilize -0.0 and float repr
        if v == 0:
            v = 0.0
        return f"{v:.10g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)

def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            gcols = [d[0] for d in got.description]
            grows = got.fetchall()
        except Exception as e:
            print(f"  ✗ {name}: SPARK OUTPUT MISSING/UNREADABLE: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            status = f"rows-only ({len(grows)} rows)"
            n_rowsonly += 1
            print(f"  ~ {name}: {status}")
            continue
        try:
            exp = con.execute(oracle[name])
            ecols = [d[0] for d in exp.description]
            erows = exp.fetchall()
        except Exception as e:
            print(f"  ✗ {name}: ORACLE ERROR: {e}")
            n_fail += 1
            continue
        gc, gr = norm_rows(gcols, grows)
        ec, er = norm_rows(ecols, erows)
        if gc != ec:
            print(f"  ✗ {name}: column mismatch spark={gc} duck={ec}")
            n_fail += 1
        elif gr != er:
            n_fail += 1
            diff_g = [r for r in gr if r not in set(er)][:3]
            diff_e = [r for r in er if r not in set(gr)][:3]
            print(f"  ✗ {name}: {len(gr)} vs {len(er)} rows; "
                  f"spark-only={diff_g} duck-only={diff_e}")
        else:
            n_pass += 1
            print(f"  ✓ {name} ({len(gr)} rows)")
    print(f"PASS={n_pass} FAIL={n_fail} ROWS_ONLY={n_rowsonly}")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
