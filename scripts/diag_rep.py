"""One canary-bracketed bench_crawl rep at a given level/corpus.

Usage: python scripts/diag_rep.py [cpus] [corpus_dir]
Prints three flush-immediate lines: canary pre, the rep, canary post.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import bench

cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
corpus = sys.argv[2] if len(sys.argv) > 2 else "/tmp/mtn_bench_corpus_v3_50000"

sp = bench.make_spark(cpus, shuffle=32)
t0 = time.time()
bench.bench_canary(sp, "/root/testdata/sf0.1")
print(f"canary_pre {round(time.time() - t0, 2)}", flush=True)
c = bench.bench_crawl(sp, corpus, timed_iterations=1)
print(f"local[{cpus}] {c['sec_per_iteration']}s {c['urls_per_sec']} urls/s",
      flush=True)
import json
for it in c["iterations"]:
    ts = sorted((it.get("timings") or {}).items(), key=lambda kv: -kv[1])
    print(json.dumps({"iteration": it["iteration"], "sec": it["sec"],
                      "phases": [[k, round(v, 2)] for k, v in ts]}),
          flush=True)
t0 = time.time()
bench.bench_canary(sp, "/root/testdata/sf0.1")
print(f"canary_post {round(time.time() - t0, 2)}", flush=True)
sp.stop()
