"""Simulate the driver's correctness gate: bare SparkSession (ANSI-on
defaults, no engine conf), import __spark_entry__, smoke entry(), and
diff every queries() entry against its oracle_sql() via DuckDB at
sf0.01 with atol=0 — stricter than the pytest harness.  Run from the
repo root: python tools/drive_contract.py [sf_dir] [--json PATH]

--json writes a CORRECTNESS-shaped artifact (one row per spec with
rows/schema/hash-equivalent booleans) covering EVERY registration —
not just the driver's 50-slot window.  Committed per round (e.g.
SELFCHECK_r06.json) it is the compensating evidence for specs the
window cannot hold (see plans/queries.py "WINDOW OVERFLOW")."""
import json
import os
import sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession
import duckdb, os, pandas as pd, numpy as np

spark = (SparkSession.builder.master("local[8]")
         .appName("driver-sim")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e

df = e.entry(spark)
rows = df.collect()
print(f"ENTRY rows={len(rows)}")

qs, osql = e.queries(), e.oracle_sql()
argv = list(sys.argv[1:])
json_path = None
if "--json" in argv:
    i = argv.index("--json")
    if i + 1 >= len(argv):
        sys.exit("usage: drive_contract.py [sf_dir] --json PATH (a path must follow --json)")
    json_path = argv[i + 1]
    del argv[i : i + 2]
sf = argv[0] if argv else "/root/testdata/sf0.01"
report: dict[str, dict] = {}
conn = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        conn.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
fails = 0
for name, fn in qs.items():
    t0 = time.time()
    try:
        spdf = fn(spark, sf).toPandas()
    except Exception as ex:
        print(f"FAIL {name}: spark error {str(ex)[:140]}")
        # Same key set as success rows so artifact diffing never needs
        # key-existence guards (ADVICE r06).
        report[name] = {
            "rows_match": False,
            "schema_match": False,
            "hash_match": False,
            "spark_rows": None,
            "oracle_rows": None,
            "err": str(ex)[:200],
        }
        fails += 1
        continue
    t_spark = time.time() - t0
    if name not in osql:
        print(f"OK(rows-only) {name}: rows={len(spdf)} spark={t_spark:.1f}s")
        report[name] = {"spark_rows": len(spdf), "rows_only": True, "err": None}
        continue
    t0 = time.time()
    odf = conn.execute(osql[name]).fetchdf()
    t_duck = time.time() - t0
    ok_rows = len(spdf) == len(odf)
    ok_cols = sorted(spdf.columns) == sorted(odf.columns)
    status = "OK" if (ok_rows and ok_cols) else "FAIL"
    mismatch, dtype_mm = -1, []
    if ok_rows and ok_cols:
        cols = sorted(spdf.columns)
        a = spdf.reindex(cols, axis=1).sort_values(cols).reset_index(drop=True)
        b = odf.reindex(cols, axis=1).sort_values(cols).reset_index(drop=True)
        # Dtype parity: the driver's value-hash is TYPED, so an
        # int-vs-float representation split (e.g. DuckDB sum(int) →
        # HUGEINT fetched as float64 vs Spark BIGINT) fails its gate
        # even when every cell matches — flag it here too (VERDICT r01).
        def kind(s):
            if pd.api.types.is_bool_dtype(s): return "bool"
            if pd.api.types.is_integer_dtype(s): return "int"
            if pd.api.types.is_float_dtype(s): return "float"
            if pd.api.types.is_datetime64_any_dtype(s): return "ts"
            return "obj"
        dtype_mm = [
            f"{c}:{kind(a[c])}!={kind(b[c])}" for c in cols if kind(a[c]) != kind(b[c])
        ]
        if dtype_mm: status = "FAIL"
        mismatch = 0
        for c in cols:
            av, bv = a[c], b[c]
            if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
                m = ~(np.isclose(av.astype(float), bv.astype(float), rtol=0, atol=0) | (av.isna() & bv.isna()))
            else:
                try: m = ~((av == bv) | (av.isna() & bv.isna()))
                except Exception: m = pd.Series([False]*len(av))
            mismatch += int(m.sum())
        if mismatch: status = "FAIL"
    if status == "FAIL": fails += 1
    dt = f" dtypemm={dtype_mm}" if dtype_mm else ""
    print(f"{status} {name}: rows {len(spdf)}/{len(odf)} cols:{ok_cols} cellmm={mismatch}{dt} spark={t_spark:.1f}s duck={t_duck:.1f}s")
    report[name] = {
        "rows_match": ok_rows,
        "schema_match": ok_cols and not dtype_mm,
        "hash_match": status == "OK",
        "spark_rows": len(spdf),
        "oracle_rows": len(odf),
        "err": None,
    }
print("TOTAL FAILS:", fails)
if json_path:
    with open(json_path, "w") as f:
        json.dump({"sf_dir": sf, "total_fails": fails, "specs": report}, f, indent=1, sort_keys=True)
    print(f"wrote {json_path} ({len(report)} specs)")
