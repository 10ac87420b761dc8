"""Print per-lap timings of the bench crawl iterations — the feedback
loop for the F-term work (VERDICT r4 item 3).  Not part of the bench
artifact; run ad hoc:

    PYTHONPATH=/root/repo python -u scripts/profile_iteration.py [sf_dir]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else bench.SF_DIR
    sf = bench.sf_value(sf_dir)
    corpus = bench.bench_corpus(sf)
    spark = bench.make_spark(bench.CPUS)
    try:
        # throwaway canary to absorb JIT warmup (BENCH.md protocol)
        c = bench.bench_canary(spark, sf_dir)
        print(f"canary_sec {c}", flush=True)
        r = bench.bench_crawl(spark, corpus)
        print(json.dumps({k: v for k, v in r.items()
                          if k != "iterations"}, indent=1))
        for it in r["iterations"]:
            print(f"-- iteration {it['iteration']}: {it['sec']} s, "
                  f"claimed {it['claimed']}")
            for lab, sec in sorted((it.get("timings") or {}).items(),
                                   key=lambda kv: -kv[1]):
                print(f"   {sec:8.3f}  {lab}")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
