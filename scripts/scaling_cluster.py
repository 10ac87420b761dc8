"""VERDICT r5 'Next round' #2: measure the driver-amortization claim
instead of arguing it.  Runs the bench crawl on local-cluster[2,4,8g]
vs local-cluster[8,4,8g] — separate executor JVMs with real shuffle/RPC
and a CONSTANT driver — so scaling efficiency isolates the executor
term.  Canary-bracketed, interleaved reps, min per level (BENCH.md
noise protocol).  Writes BENCH_SCALING_CLUSTER.json.

Usage: SPARK_DRIVER_MEMORY=24g python -u scripts/scaling_cluster.py [reps]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402
from map_the_net_crawler_spark.session import get_spark  # noqa: E402

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 2
CORPUS = "/tmp/mtn_bench_corpus_v3_50000"
LEVELS = [(2, 4, 8192), (8, 4, 8192)]   # (executors, cores, MB)

if not os.path.exists(os.path.join(CORPUS, "pages.parquet")):
    bench.bench_corpus(1.0)

samples = {f"{e}x{c}": [] for e, c, _m in LEVELS}
canaries = []
for rep in range(REPS):
    for e, c, m in LEVELS:
        key = f"{e}x{c}"
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        sp = get_spark(app_name=f"mtn-lc-{key}",
                       master=f"local-cluster[{e},{c},{m}]",
                       shuffle_partitions=32,
                       extra_conf={
                           # executors are separate JVMs: their Python
                           # workers need the engine package on the path
                           "spark.executorEnv.PYTHONPATH": repo})
        sp.sparkContext.setLogLevel("ERROR")
        t0 = time.time()
        bench.bench_canary(sp, "/root/testdata/sf0.1")   # JIT throwaway
        pre = bench.bench_canary(sp, "/root/testdata/sf0.1")
        r = bench.bench_crawl(sp, CORPUS, timed_iterations=1)
        post = bench.bench_canary(sp, "/root/testdata/sf0.1")
        sp.stop()
        canaries.append({"level": key, "rep": rep, "pre": pre, "post": post})
        samples[key].append(r)
        print(f"rep{rep} {key}: {r['sec_per_iteration']}s "
              f"{r['urls_per_sec']} urls/s (canary {pre}/{post})",
              flush=True)

out = {"corpus_domains": 50000, "reps": REPS,
       "levels": [f"local-cluster[{e},{c},{m}m]" for e, c, m in LEVELS],
       "aggregation": "min_sec_per_level(interleaved, canary-bracketed)",
       "canaries": canaries}
for key, rs in samples.items():
    best = min(rs, key=lambda r: r["sec_per_iteration"])
    out[key] = {"urls_per_sec": best["urls_per_sec"],
                "sec_per_iteration": best["sec_per_iteration"],
                "all_sec": [r["sec_per_iteration"] for r in rs]}
a, b = out["2x4"]["urls_per_sec"], out["8x4"]["urls_per_sec"]
out["efficiency_8_to_32_cores"] = round((b / a) / 4.0, 3) if a else None
with open("BENCH_SCALING_CLUSTER.json", "w") as f:
    json.dump(out, f, indent=2)
print(json.dumps({k: v for k, v in out.items() if k != "canaries"}))
