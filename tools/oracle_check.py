#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle compare.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>

For each <name>.parquet result under verify_out_dir, runs the matching SQL
from oracle_sql.json in DuckDB (with each fixture parquet registered as a
view), sorts columns by name, sorts rows, and compares cell-by-cell —
flagging any value that is not exactly equal (and reporting the max float
divergence so near-misses are visible).
"""
import json, math, os, sys
import duckdb

def norm_cell(v):
    if isinstance(v, float):
        return v
    # decimals -> float for comparison visibility; report exactness separately
    return v

def main(out_dir, sf_dir, skip=()):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    skipped = [n for n in sorted(oracle) if any(n.startswith(s) for s in skip)]
    for s in skipped:
        print(f"SKIP {s} (quadratic oracle excluded by --skip)")
    for name in sorted(n for n in oracle if n not in skipped):
        res_path = os.path.join(out_dir, name)
        if not os.path.isdir(res_path):
            print(f"FAIL {name}: no spark result dir"); n_fail += 1; continue
        got = con.execute(
            f"SELECT * FROM read_parquet('{res_path}/*.parquet')").fetchdf()
        want = con.execute(oracle[name]).fetchdf()
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}"); n_fail += 1; continue
        got = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        want = want.sort_values(by=list(want.columns)).reset_index(drop=True)
        bad = []
        for c in got.columns:
            for i in range(len(got)):
                a, b = got[c][i], want[c][i]
                if isinstance(a, float) and isinstance(b, float):
                    if a != b and not (math.isnan(a) and math.isnan(b)):
                        rel = abs(a-b)/max(abs(a), abs(b), 1e-300)
                        bad.append(f"{c}[{i}]: {a!r} != {b!r} (rel {rel:.2e})")
                elif str(a) != str(b):
                    bad.append(f"{c}[{i}]: {a!r} != {b!r}")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad[:5])); n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    # usage: oracle_check.py <verify_out> <sf_dir> [--skip q35,q37,...]
    # --skip excludes queries whose DuckDB oracle is O(N^2) by design
    # (all-pairs twins) and infeasible at larger scale factors; the Spark
    # side stays linear and is verified at sf0.01 instead.
    args = sys.argv[1:]
    skip = ()
    if "--skip" in args:
        i = args.index("--skip")
        skip = tuple(args[i + 1].split(","))
        args = args[:i] + args[i + 2:]
    sys.exit(main(args[0], args[1], skip))
