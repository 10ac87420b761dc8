"""Canary-gated 2/8/32 scaling ladder (round 5).

The sandbox host is shared: round-2 reps of the identical job spanned
11x and the 2026-08-17 afternoon window read the fixed-work canary at
18-22 s against its ~2-4 s quiet reference, so an un-gated ladder just
measures the co-tenants.  This runner (a) refuses to start a rep until
TWO consecutive canary probes come in under QUIET_SEC (the noise
oscillates faster than one probe can vouch for), (b) brackets every rep
with canaries so each sample self-adjudicates, and (c) appends every
sample to BENCH_SCALING_R5.json as it lands — a kill loses nothing.

Canary brackets alone proved insufficient at level 32: a burst that
starts after the pre-canary and ends before the post-canary contaminates
a 4-minute rep while both brackets read clean (observed 2026-08-17
22:40: HEAD 272-301 s and ROUND-4 code 735 s at local[32] vs round-4's
own quiet-morning 48.8 s, with clean-ish brackets).  So samples also
pass a cross-level sanity invariant: this workload's throughput is
monotone non-decreasing in cores (measured every prior round), so a
clean level-32 sample whose URLs/s falls below a clean level-8 sample
(or 8 below 2) is marked suspect and re-taken rather than published.

The final BENCH_SCALING.json is written only from canary-clean,
non-suspect samples, min-sec-per-level, interleaved.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import bench

CORPUS = "/tmp/mtn_bench_corpus_v3_50000"
SF_DIR = "/root/testdata/sf0.1"
OUT_RAW = "/root/repo/BENCH_SCALING_R5.json"
OUT_FINAL = "/root/repo/BENCH_SCALING.json"
QUIET_SEC = 6.0          # quiet-host canary is ~2-4 s (BENCH.md)
DIRTY_FACTOR = 1.8       # post-canary may run slightly warm
WAIT_SLEEP = 240         # between quiet probes
MAX_WAIT = float(os.environ.get("MTN_LADDER_MAX_WAIT",
                                8 * 3600))  # give up waiting after this
LEVELS = [32, 8, 2]      # shortest rep first: least exposure to bursts
REPS = int(os.environ.get("MTN_LADDER_REPS", 2))
MAX_TAKES = 4            # re-takes per (rep, level) before giving up


def mark_suspects(samples):
    """Flag clean samples that violate cores-monotone throughput."""
    def best(lv):
        ss = [s for s in samples
              if s["level"] == lv and s["clean"] and not s.get("suspect")]
        return max((s["urls_per_sec"] for s in ss), default=None)

    for hi, lo in ((32, 8), (8, 2)):
        floor = best(lo)
        if floor is None:
            continue
        for s in samples:
            if (s["level"] == hi and s["clean"]
                    and s["urls_per_sec"] < floor):
                s["suspect"] = True
    return samples


def usable(s):
    return s["clean"] and not s.get("suspect")


state = {"corpus_domains": 50000, "quiet_gate_sec": QUIET_SEC,
         "samples": []}
if os.path.exists(OUT_RAW):
    # Resume: keep clean samples already captured by a killed run
    # (suspects re-marked from scratch so the invariant sees them all).
    with open(OUT_RAW) as fh:
        prev = json.load(fh)
    state["samples"] = mark_suspects(
        [dict(s, suspect=False) for s in prev.get("samples", [])
         if s["clean"]])
    state["probes"] = prev.get("probes", [])


def save():
    with open(OUT_RAW, "w") as fh:
        json.dump(state, fh, indent=2)


def canary_probe():
    sp = bench.make_spark(32, shuffle=32)
    try:
        return bench.bench_canary(sp, SF_DIR)
    finally:
        sp.stop()


def wait_quiet(deadline, consecutive=2):
    streak = 0
    while time.time() < deadline:
        c = canary_probe()
        print(f"quiet probe: canary {c:.2f}s", flush=True)
        state.setdefault("probes", []).append(round(c, 2))
        save()
        if c < QUIET_SEC:
            streak += 1
            if streak >= consecutive:
                return c
            time.sleep(20)
        else:
            streak = 0
            time.sleep(WAIT_SLEEP)
    return None


def one_rep(level):
    sp = bench.make_spark(level, shuffle=32)
    try:
        pre = bench.bench_canary(sp, SF_DIR)
        c = bench.bench_crawl(sp, CORPUS, timed_iterations=1)
        post = bench.bench_canary(sp, SF_DIR)
    finally:
        sp.stop()
    return {"level": level, "sec_per_iteration": c["sec_per_iteration"],
            "urls_per_sec": c["urls_per_sec"],
            "canary_pre": round(pre, 2), "canary_post": round(post, 2),
            "clean": pre < QUIET_SEC * DIRTY_FACTOR
                     and post < QUIET_SEC * DIRTY_FACTOR}


def have_usable(rep, level):
    return any(s["rep"] == rep and s["level"] == level and usable(s)
               for s in state["samples"])


def take_sample(rep, level, take):
    s = one_rep(level)
    s["rep"] = rep
    state["samples"].append(s)
    mark_suspects(state["samples"])
    save()
    print(f"rep{rep} local[{level}] take{take}: "
          f"{s['sec_per_iteration']}s {s['urls_per_sec']} "
          f"urls/s canary {s['canary_pre']}/{s['canary_post']} "
          f"clean={s['clean']} "
          f"suspect={s.get('suspect', False)}", flush=True)


def missing_levels():
    good = [s for s in state["samples"] if usable(s)]
    return [lv for lv in LEVELS
            if not any(s["level"] == lv for s in good)]


def main():
    deadline = time.time() + MAX_WAIT
    for rep in range(REPS):
        for level in LEVELS:
            for take in range(MAX_TAKES):
                if have_usable(rep, level):
                    break
                if wait_quiet(deadline) is None:
                    print("gave up waiting for a quiet window", flush=True)
                    save()
                    return
                take_sample(rep, level, take)

    # Hunting mode: a level whose every sample got retro-marked suspect
    # (a later lower-level sample raised the monotone floor after that
    # level's take loop ended) gets re-taken until the deadline — the
    # co-tenant bursts penalize high thread counts specifically, so the
    # clean high-level window is the rare one worth waiting for.
    hunt = 0
    while missing_levels() and time.time() < deadline:
        lv = missing_levels()[0]
        if wait_quiet(deadline) is None:
            print("gave up hunting for a quiet window", flush=True)
            save()
            break
        take_sample(f"hunt{hunt}", lv, 0)
        hunt += 1

    good = [s for s in state["samples"] if usable(s)]
    if missing_levels():
        print("not every level has a usable sample; no final write",
              flush=True)
        return
    out = {"corpus_domains": 50000, "reps": REPS, "levels": LEVELS,
           "aggregation":
               "min_sec_per_level(interleaved, canary-clean, non-suspect)",
           "quiet_gate_sec": QUIET_SEC}
    for lv in LEVELS:
        ss = [s for s in good if s["level"] == lv]
        best = min(ss, key=lambda s: s["sec_per_iteration"])
        out[f"local[{lv}]"] = {
            "urls_per_sec": best["urls_per_sec"],
            "sec_per_iteration": best["sec_per_iteration"],
            "all_sec": [s["sec_per_iteration"] for s in ss],
            "canaries": [[s["canary_pre"], s["canary_post"]] for s in ss]}

    def eff(a, b):
        return round((out[f"local[{b}]"]["urls_per_sec"]
                      / out[f"local[{a}]"]["urls_per_sec"]) / 4.0, 3)

    out["efficiency_2_to_8"] = eff(2, 8)
    out["efficiency_8_to_32"] = eff(8, 32)
    with open(OUT_FINAL, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
