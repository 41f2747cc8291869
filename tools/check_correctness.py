#!/usr/bin/env python3
"""Local pre-check of the driver's correctness gate: run graft.Verify output
against the DuckDB oracle the same way the driver does (sorted columns,
row-count + value compare). Usage:
    python3 tools/check_correctness.py /root/testdata/sf0.01 /tmp/verify_out
(run `sbt "runMain graft.Verify <sfdir> <outdir>"` first)
"""
import sys, os, json, glob, math
import duckdb
import numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    # seed-sweep corpora are Spark-written DIRECTORIES; driver testdata is
    # single files — glob the former so both register
    p = f"{sfdir}/{t}.parquet"
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

oracle_sql = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle_sql.items()):
    try:
        odf = con.execute(sql).fetchdf()
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); fails += 1; continue
        sdf = duckdb.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchdf()
        # driver compare: sort columns by name, then compare values
        odf = odf[sorted(odf.columns)]
        sdf = sdf[sorted(sdf.columns)]
        if list(odf.columns) != list(sdf.columns):
            print(f"FAIL {name}: columns {list(sdf.columns)} vs oracle {list(odf.columns)}"); fails += 1; continue
        if len(odf) != len(sdf):
            print(f"FAIL {name}: rows {len(sdf)} vs oracle {len(odf)}"); fails += 1; continue
        o = odf.reset_index(drop=True)
        s = sdf.reset_index(drop=True)
        bad = None
        for c in o.columns:
            for i, (a, b) in enumerate(zip(o[c], s[c])):
                eq = (a == b) or (a is None and b is None)
                # hash-faithful float compare: the driver hashes FORMATTED
                # values, so -0.0 vs +0.0 (== under IEEE) must FAIL here
                # too, exactly like NaN != NaN must PASS. Applies to ANY
                # floating dtype (np.float32 is not a Python float), and an
                # int-vs-float dtype pair formats differently on the driver
                # ("1" vs "1.0") so it must FAIL here even when == holds.
                try:
                    a_f = isinstance(a, (float, np.floating))
                    b_f = isinstance(b, (float, np.floating))
                    if a_f or b_f:
                        if not (a_f and b_f):
                            eq = False  # mixed int/float formats differently
                        elif math.isnan(a) or math.isnan(b):
                            eq = math.isnan(a) and math.isnan(b)
                        else:
                            eq = (float(a) == float(b)) and (
                                math.copysign(1.0, a) == math.copysign(1.0, b))
                except Exception:
                    pass
                if not eq:
                    bad = (c, i, a, b); break
            if bad: break
        if bad:
            print(f"FAIL {name}: col={bad[0]} row={bad[1]} oracle={bad[2]!r} spark={bad[3]!r}"); fails += 1
        else:
            print(f"PASS {name}: {len(odf)} rows")
    except Exception as e:
        print(f"ERROR {name}: {e}"); fails += 1
print(f"\n{'ALL PASS' if fails == 0 else f'{fails} FAILURES'} / {len(oracle_sql)} queries")
sys.exit(1 if fails else 0)
