"""bench_skew in isolation (claim_hub_skew_salted) — the round-5 2×
regression check.  Usage: python scripts/measure_skew_claim.py [cpus]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402

cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
sp = bench.make_spark(cpus)
sp.sparkContext.setLogLevel("ERROR")
# throwaway rep absorbs JIT warmup, then two recorded reps
for rep in range(3):
    out = bench.bench_skew(sp)
    print(f"rep{rep}: salt1={out['claim_salt1_sec']}s "
          f"salt16={out['claim_salt16_sec']}s "
          f"claimed={out['claimed_salt16']}", flush=True)
sp.stop()
