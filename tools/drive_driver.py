"""Simulate the round driver against __spark_entry__.py.

Usage: python tools/drive_driver.py [--marker=PATH] [SF_DIR] [skip_name ...]
Defaults to the driver's correctness scale (sf0.01). Pass
/root/testdata/sf0.1 plus the oracle-cost-bound names to reproduce the
SCALE.md full-registry sweep at 10x the driver-checked scale.

--marker=PATH writes a one-object JSON summary (sf, per-query verdicts,
match/fail counts, wall seconds) — the committed once-per-round
full-sweep record (SURVEY §2.6 staleness-bound policy, VERDICT r13 #3):
the driver's 50-query window re-verifies each query only every
ceil(total/50) rounds, so the sweep marker is what pins "the whole
registry was green this round" in history."""
import sys, math, time
sys.path.insert(0, "/root/repo")
import duckdb
import __spark_entry__ as e
from pyspark.sql import SparkSession

args = sys.argv[1:]
MARKER = None
if args and args[0].startswith("--marker="):
    MARKER = args.pop(0).split("=", 1)[1]
SF = args[0] if args else "/root/testdata/sf0.01"
SKIP = set(args[1:])
T0 = time.monotonic()
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

# t1 smoke
df = e.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, schema={df.columns}")
assert len(rows) > 0

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def norm(v):
    if hasattr(v, "tolist"): v = v.tolist()
    if v is None: return None
    if isinstance(v, float):
        return None if math.isnan(v) else f"{v:.12g}"
    if hasattr(v, "isoformat"): return v.isoformat()
    return v

qs = e.queries()
os_ = e.oracle_sql(SF)  # same substitution path the round driver consumes
fails = []
verdicts = {}
for name, fn in sorted(qs.items()):
    if name in SKIP:
        print(f"{name}: SKIPPED (arg)")
        verdicts[name] = "skipped"
        continue
    sdf = fn(spark, SF)
    if name not in os_:
        print(f"{name}: rows-only, {sdf.count()} rows")
        verdicts[name] = "rows_only"
        continue
    scols = sorted(sdf.columns)
    srows = sorted((tuple(norm(v) for v in r) for r in sdf.select(*scols).collect()), key=str)
    rel = con.sql(os_[name])
    ddf = rel.fetchdf(); ddf.columns = [c.lower() for c in ddf.columns]
    dcols = sorted(ddf.columns)
    drows = sorted((tuple(norm(v) for v in r) for r in ddf[[c for c in scols]].itertuples(index=False)), key=str)
    ok = [c.lower() for c in scols] == dcols and srows == drows
    print(f"{name}: {'MATCH' if ok else 'MISMATCH'} ({len(srows)} vs {len(drows)} rows)")
    verdicts[name] = "match" if ok else "MISMATCH"
    if not ok: fails.append(name)

if MARKER:
    import json
    with open(MARKER, "w") as f:
        json.dump({
            "sf": SF,
            "n_queries": len(qs),
            "n_match": sum(1 for v in verdicts.values() if v == "match"),
            "n_rows_only": sum(1 for v in verdicts.values() if v == "rows_only"),
            "n_skipped": sum(1 for v in verdicts.values() if v == "skipped"),
            "fails": fails,
            "wall_s": round(time.monotonic() - T0, 1),
            "verdicts": verdicts,
        }, f, indent=1, sort_keys=True)
    print(f"marker -> {MARKER}")

print("RESULT:", "ALL MATCH" if not fails else f"FAILS: {fails}")
sys.exit(1 if fails else 0)
