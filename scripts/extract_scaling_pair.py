"""2 vs 8 cores on the 200k-page corpus (below the sandbox's saturation
ceiling) — the N vs 4N evidence for the data plane."""

import json
import sys
import time

sys.path.insert(0, "/root/repo")
import bench
from pyspark.sql import functions as F

CORPUS = "/tmp/mtn_bench_corpus_v3_200000"
out = {"corpus": CORPUS, "stage": "extract_pages mapInPandas", "pair": "2->8"}
for cpus in (2, 8):
    sp = bench.make_spark(cpus, shuffle=64)
    sp.sparkContext.setLogLevel("ERROR")
    from map_the_net_crawler_spark.functions.extract import extract_pages
    pages = sp.read.parquet(f"{CORPUS}/pages.parquet")
    df = pages.select("url", F.regexp_replace("url", "^http://", "")
                      .alias("domain_name"), "html").repartition(64, "url")
    extract_pages(df.limit(500)).count()
    t0 = time.time()
    n = extract_pages(df).count()
    dt = round(time.time() - t0, 2)
    out[f"local[{cpus}]"] = {"sec": dt, "pages_per_sec": round(200000 / dt, 1)}
    print(f"local[{cpus}]: {dt}s", flush=True)
    sp.stop()
out["efficiency_2_to_8"] = round(
    (out["local[2]"]["sec"] / out["local[8]"]["sec"]) / 4.0, 3)
print(json.dumps(out))
with open("/root/repo/BENCH_EXTRACT_PAIR.json", "w") as f:
    json.dump(out, f, indent=2)
