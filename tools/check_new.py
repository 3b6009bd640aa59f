"""Three-scale oracle check for newly registered queries (the landing gate
every new registration passes BEFORE the driver sees it — referenced as
the "/tmp/check_new.py pattern" in VERDICT r08; checked in from r09 so
the recipe survives rounds).

Usage: python tools/check_new.py name [name ...]
Runs each named query at sf0.001 / sf0.01 / sf0.1 and compares against its
DuckDB oracle with the drive_driver.py normalization."""
import sys, math
sys.path.insert(0, "/root/repo")
import duckdb
from pyspark.sql import SparkSession
from gpu_mapreduce_spark.registry import load_all

NAMES = sys.argv[1:]
SCALES = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
reg = load_all()

def norm(v):
    if hasattr(v, "tolist"): v = v.tolist()
    if v is None: return None
    if isinstance(v, float):
        return None if math.isnan(v) else f"{v:.12g}"
    if hasattr(v, "isoformat"): return v.isoformat()
    return v

fails = []
for SF in SCALES:
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    for name in NAMES:
        q = reg[name]
        import time
        t0 = time.time()
        sdf = q.fn(spark, SF)
        scols = sorted(sdf.columns)
        srows = sorted((tuple(norm(v) for v in r)
                        for r in sdf.select(*scols).collect()), key=str)
        t1 = time.time()
        ddf = con.sql(q.oracle.replace("{SF_DIR}", SF)).fetchdf()
        ddf.columns = [c.lower() for c in ddf.columns]
        dcols = sorted(ddf.columns)
        drows = sorted((tuple(norm(v) for v in r)
                        for r in ddf[[c for c in scols]].itertuples(index=False)), key=str)
        t2 = time.time()
        ok = [c.lower() for c in scols] == dcols and srows == drows
        print(f"{SF.split('/')[-1]} {name}: {'MATCH' if ok else 'MISMATCH'}"
              f" ({len(srows)} vs {len(drows)} rows;"
              f" spark {t1-t0:.1f}s oracle {t2-t1:.1f}s)")
        if not ok:
            fails.append((SF, name))
            for a, b in list(zip(srows, drows))[:5]:
                if a != b:
                    print("  spark:", a)
                    print("  duck :", b)
print("RESULT:", "ALL MATCH" if not fails else f"FAILS: {fails}")
sys.exit(1 if fails else 0)
