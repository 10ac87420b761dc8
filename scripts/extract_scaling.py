"""CPU-bound scaling evidence: the Arrow extract UDF (HTML parse of the
50k-page corpus) at local[8] vs local[32], interleaved, min of reps.
This is the stage that dominates wall-clock at 100TB-pages scale; the
full-iteration bench adds constant driver-side cost that swamps it at
sandbox corpus sizes (see BENCH.md)."""

import json
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
import bench
from pyspark.sql import functions as F

import os
N_DOM = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
CORPUS = f"/tmp/mtn_bench_corpus_v3_{N_DOM}"
if not os.path.exists(os.path.join(CORPUS, "pages.parquet")):
    from map_the_net_crawler_spark.fixtures import write_fixtures
    import shutil
    tmp = CORPUS + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    write_fixtures(tmp, n_domains=N_DOM, links_per_page=12,
                   hub_every=13, hub_out_links=150)
    os.rename(tmp, CORPUS)
    print("corpus generated", flush=True)
REPS = 2
out: dict = {"corpus": CORPUS, "stage": "extract_pages mapInPandas",
             "reps": REPS}
samples = {8: [], 32: []}
for rep in range(REPS):
    for cpus in (8, 32):
        sp = bench.make_spark(cpus, shuffle=64)
        sp.sparkContext.setLogLevel("ERROR")
        from map_the_net_crawler_spark.functions.extract import extract_pages
        pages = sp.read.parquet(f"{CORPUS}/pages.parquet")
        df = pages.select("url", F.regexp_replace("url", "^http://", "")
                          .alias("domain_name"), "html").repartition(64, "url")
        # warmup on a slice
        extract_pages(df.limit(500)).count()
        t0 = time.time()
        n = extract_pages(df).count()
        dt = time.time() - t0
        samples[cpus].append(round(dt, 2))
        print(f"rep{rep} local[{cpus}]: {dt:.1f}s rows={n}", flush=True)
        sp.stop()

for cpus, s in samples.items():
    out[f"local[{cpus}]"] = {"sec": min(s), "all_sec": s,
                             "pages_per_sec": round(N_DOM / min(s), 1)}
eff = (out["local[8]"]["sec"] / out["local[32]"]["sec"]) / 4.0
out["efficiency_8_to_32"] = round(eff, 3)
print(json.dumps(out))
with open("/root/repo/BENCH_EXTRACT_SCALING.json", "w") as f:
    json.dump(out, f, indent=2)
