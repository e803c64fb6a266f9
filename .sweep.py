"""Full-registry oracle sweep (local certification harness, not shipped)."""
import json
import sys
import time

from pyspark.sql import SparkSession

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "48g")
    .config("spark.sql.adaptive.enabled", "true")
    .getOrCreate()
)
import importlib.util

spec = importlib.util.spec_from_file_location("m", "/root/repo/__spark_entry__.py")
m = importlib.util.module_from_spec(spec)
spec.loader.exec_module(m)

from gcp_datalake_pipeline_spark.plans.compare import compare_query, duckdb_connection

qs = m.queries()
oracles = m.oracle_sql()
con = duckdb_connection(sf_dir, cached=True)
bad = []
t0 = time.time()
for i, name in enumerate(sorted(qs)):
    t = time.time()
    try:
        df = qs[name](spark, sf_dir)
        if name not in oracles:
            n = df.count()
            ok, detail = n >= 0, f"rows-only n={n}"
        else:
            r = compare_query(spark, con, name, df, oracles[name])
            ok, detail = r.ok, r.detail
    except Exception as exc:  # noqa: BLE001
        ok, detail = False, f"EXC {type(exc).__name__}: {exc}"
    flag = "ok" if ok else "FAIL"
    print(f"[{i+1}/{len(qs)}] {flag} {name} ({time.time()-t:.1f}s) "
          + ("" if ok else detail[:500]), flush=True)
    if not ok:
        bad.append(name)
print(json.dumps({"sf": sf_dir, "total": len(qs), "failed": bad,
                  "wall_s": round(time.time() - t0, 1)}), flush=True)
