"""r12 directive #3: attribute the ann_ivf_topk bench drift
(r10 min 2.354s -> r11 min 2.871s, IQR 0.117, structural plan
byte-identical). Hypothesis from VERDICT r11: cache-residency
interaction with the r11-reworked ann_lsh_topk, which now persists a
shared slim-vector table and runs immediately before ann_ivf in the
bench loop.

Protocol: fresh process per arm (run this script twice with arg
'alone' / 'after_lsh'), idle machine, sf0.1, bench-style timing
(count() to materialize, clearCache + forced GC + settle between
runs, 7 runs, report all + median/min/IQR).
"""
import sys, time, json
sys.path.insert(0, "/root/repo")
from ghcn_d_etl_project_spark.session import get_spark
from ghcn_d_etl_project_spark.plans import all_queries

mode = sys.argv[1]
sf = "/root/testdata/sf0.1"
spark = get_spark(app_name=f"ivf-drift-{mode}")
qs = all_queries()

def run(name):
    t0 = time.perf_counter()
    qs[name].fn(spark, sf).count()
    dt = time.perf_counter() - t0
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    time.sleep(0.4)
    return dt

# warm the JVM the same way bench does implicitly (queries before it):
# one throwaway small query either way
qs["monthly_agg"].fn(spark, "/root/testdata/sf0.001").count()
spark.catalog.clearCache()

if mode == "after_lsh":
    lsh = [run("ann_lsh_topk") for _ in range(3)]
    print("ann_lsh runs:", [round(x,3) for x in lsh], file=sys.stderr)

runs = [run("ann_ivf_topk") for _ in range(7)]
s = sorted(runs)
n = len(s)
med = s[n//2]
iqr = s[(3*n)//4] - s[n//4]
print(json.dumps({"mode": mode, "runs": [round(x,3) for x in runs],
                  "median": round(med,3), "min": round(s[0],3),
                  "iqr": round(iqr,3)}))
