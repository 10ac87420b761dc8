import sys
import time

sys.path.insert(0, "/root/repo")
import bench

cpus = int(sys.argv[1])
corpus = f"/tmp/mtn_bench_corpus_v3_{sys.argv[2] if len(sys.argv) > 2 else '50000'}"
sp = bench.make_spark(cpus)
out = bench.bench_crawl(sp, corpus, timed_iterations=1)
print(f"RESULT local[{cpus}]", out["urls_per_sec"], out["sec_per_iteration"],
      out["iterations"][0]["timings"], flush=True)
sp.stop()
