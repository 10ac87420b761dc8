import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ["MTN_TRACE"] = "1"

import bench
from map_the_net_crawler_spark.plans import iteration as it_mod
it_mod._TRACE = True

corpus = bench.bench_corpus(0.1)
spark = bench.make_spark(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
t0 = time.time()
out = bench.bench_crawl(spark, corpus, timed_iterations=2)
print("crawl:", {k: out[k] for k in ("urls_per_sec", "sec_per_iteration",
                                     "frontier_merge_sec_per_iteration")})
for i in out["iterations"]:
    print(i["iteration"], i["sec"], i["claimed"], i["timings"], flush=True)
spark.stop()
