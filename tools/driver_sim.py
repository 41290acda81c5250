"""Simulate the correctness driver against /root/repo/__spark_entry__.py."""
import decimal, math, os, sys, time

sys.path.insert(0, "/root/repo")
import duckdb
import pandas as pd
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .appName("driver-sim")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as E

# --- t1 smoke: entry() twice, schema stability ---
df1 = E.entry(spark)
rows1 = df1.collect()
df2 = E.entry(spark)
assert df2.schema == df1.schema, "entry schema unstable"
print(f"SMOKE: entry -> {len(rows1)} rows, schema stable: {df1.schema.simpleString()}")
assert len(rows1) > 0

# --- t2 correctness at sf0.01 ---
SF = os.environ.get("SPARK_GRAFT_VERIFY_SF_DIR", "/root/testdata/sf0.01")
con = duckdb.connect()
for name in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF}/{name}.parquet')")

def norm(v):
    if v is None: return None
    if isinstance(v, float) and math.isnan(v): return None
    if v is pd.NaT: return None
    if isinstance(v, decimal.Decimal): return float(v)
    if isinstance(v, bool): return v
    if isinstance(v, (int, float)): return float(v)
    if isinstance(v, pd.Timestamp): return v.to_pydatetime()
    return v

def canon(pdf):
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    return sorted((tuple(norm(v) for v in r) for r in pdf.itertuples(index=False, name=None)), key=repr)

qs, os_ = E.queries(), E.oracle_sql()
fail = 0
for name, fn in sorted(qs.items()):
    t0 = time.time()
    sdf = fn(spark, SF).toPandas()
    if name not in os_:
        print(f"  {name}: rows-only, {len(sdf)} rows ({time.time()-t0:.1f}s)")
        continue
    ddf = con.execute(os_[name]).df()
    ok_rows = len(sdf) == len(ddf)
    ok_cols = sorted(sdf.columns) == sorted(ddf.columns)
    ok_vals = ok_rows and ok_cols and canon(sdf) == canon(ddf)
    status = "OK" if (ok_rows and ok_cols and ok_vals) else "MISMATCH"
    if status != "OK":
        fail += 1
    print(f"  {name}: {status} rows={len(sdf)}/{len(ddf)} ({time.time()-t0:.1f}s)")
print(f"RESULT: {len(qs)} queries, {fail} mismatches")
sys.exit(1 if fail else 0)
