"""Clean N-vs-4N scaling evidence: same job, same 50k-domain corpus,
local[2] / local[8] / local[32], interleaved reps, min per level.
Run with NOTHING else on the box."""
import json
import sys

sys.path.insert(0, "/root/repo")
import bench

BIG = "/tmp/mtn_bench_corpus_v3_50000"
levels = [2, 8, 32]
reps = {2: 2, 8: 3, 32: 3}
samples = {lv: [] for lv in levels}
for r in range(3):
    for lv in levels:
        if r >= reps[lv]:
            continue
        sp = bench.make_spark(lv, shuffle=32)
        c = bench.bench_crawl(sp, BIG, timed_iterations=1)
        sp.stop()
        samples[lv].append(c)
        print(f"rep{r} local[{lv}]: {c['sec_per_iteration']}s "
              f"{c['urls_per_sec']} urls/s", flush=True)

out = {"corpus_domains": 50000, "reps": reps,
       "aggregation": "min_sec_per_level(interleaved)"}
for lv, cs in samples.items():
    best = min(cs, key=lambda c: c["sec_per_iteration"])
    out[f"local[{lv}]"] = {
        "urls_per_sec": best["urls_per_sec"],
        "sec_per_iteration": best["sec_per_iteration"],
        "all_sec": [c["sec_per_iteration"] for c in cs]}

def eff(a, b, f):
    return round((out[f"local[{b}]"]["urls_per_sec"]
                  / out[f"local[{a}]"]["urls_per_sec"]) / f, 3)

out["efficiency_2_to_8"] = eff(2, 8, 4.0)
out["efficiency_8_to_32"] = eff(8, 32, 4.0)
with open("/root/repo/BENCH_SCALING.json", "w") as fh:
    json.dump(out, fh, indent=2)
print(json.dumps(out))
