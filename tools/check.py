#!/usr/bin/env python3
"""Local dev harness mimicking the driver's correctness gate:
runs graft.Verify output (parquet per query) against the DuckDB oracle SQL
on the same testdata tables, compares values column-sorted.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
(Run `sbt "runMain graft.Verify <sfDir> <outDir>"` first.)
"""
import sys, json, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    src = f"{sf_dir}/{t}.parquet"
    if os.path.isdir(src):  # Spark-written tables are directories of parts
        src = f"{src}/*.parquet"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

def canon(v):
    if isinstance(v, float):
        return float(v)
    return v

fails = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    res_glob = glob.glob(os.path.join(out_dir, name, "*.parquet"))
    if not res_glob:
        print(f"FAIL {name}: no result parquet"); fails += 1; continue
    try:
        mine = con.execute(f"SELECT * FROM '{res_glob[0]}'").df()
        ref = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    mc, rc = sorted(mine.columns), sorted(ref.columns)
    if mc != rc:
        print(f"FAIL {name}: columns {mc} vs {rc}"); fails += 1; continue
    if len(mine) != len(ref):
        print(f"FAIL {name}: rows {len(mine)} vs {len(ref)}"); fails += 1; continue
    mine, ref = mine[mc], ref[mc]
    # the driver's comparator sort_values+factorize+hashes the frames, so
    # a dtype mismatch (e.g. DuckDB HUGEINT -> float64 vs Spark int64) or
    # an unhashable cell (bytearray/ndarray) fails there even when values
    # compare equal — surface both locally
    for c in mc:
        if str(mine[c].dtype) != str(ref[c].dtype):
            print(f"WARN {name}: dtype col {c}: {mine[c].dtype} vs {ref[c].dtype}")
        if mine[c].dtype == object and len(mine) > 0:
            v = mine[c].iloc[0]
            try:
                hash(v)
            except TypeError:
                print(f"WARN {name}: col {c} unhashable ({type(v).__name__}) — driver gate would ERR")
    bad = None
    for c in mc:
        a, b = mine[c].tolist(), ref[c].tolist()
        for i, (x, y) in enumerate(zip(a, b)):
            xx, yy = canon(x), canon(y)
            if xx != yy and not (xx != xx and yy != yy):  # NaN==NaN ok
                bad = (c, i, x, y); break
        if bad: break
    if bad:
        c, i, x, y = bad
        print(f"FAIL {name}: col {c} row {i}: {x!r} vs {y!r}"); fails += 1
    else:
        print(f"OK   {name}: {len(mine)} rows")
print("----", "ALL OK" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
