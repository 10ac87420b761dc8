"""Supplementary bench probes (NOT part of the frozen driver bench —
bench.py is measurement-frozen; VERDICT r5 items 4/5 land here).

Prints ONE JSON line:
- claim_io: the stats-pruned claim read's file-skipping telemetry from a
  short bucketed crawl (pruned flag + files_opened/files_total per
  iteration) — makes a silent fallback to the unpruned read visible.
- politeness_ab: same-corpus politeness iteration with the Arrow
  pre-filter FORCED (round-5 behavior) vs SIZE-GATED (round 6) — the
  clean A/B the round-5 artifact discrepancy called for.  Both paths
  claim bit-identical sets (asserted here on the claimed count).

Usage: python -u bench_extra.py  (env as bench.py)
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import shutil

import bench
from map_the_net_crawler_spark import schemas as S
from map_the_net_crawler_spark.config import CrawlConfig
from map_the_net_crawler_spark.plans.crawl import init_run
from map_the_net_crawler_spark.plans.iteration import (CrawlInputs,
                                                       run_iteration)
from map_the_net_crawler_spark.storage import TableIO


def _inputs(spark, corpus):
    return CrawlInputs(
        pages=spark.read.parquet(f"{corpus}/pages.parquet"),
        robots=spark.read.parquet(f"{corpus}/robots.parquet"),
        redirects=spark.read.schema(S.REDIRECTS).parquet(
            f"{corpus}/redirects.parquet"),
        whois=spark.read.parquet(f"{corpus}/whois.parquet"),
        dns=spark.read.parquet(f"{corpus}/dns.parquet"),
        ssl=spark.read.parquet(f"{corpus}/ssl.parquet"),
        geo=spark.read.parquet(f"{corpus}/geo.parquet"))


def probe_claim_io(spark) -> list[dict]:
    """3 bucketed iterations over the 300-domain corpus with a 50k-row
    priority-0 filler frontier (the frontier-growth shape: most files
    hold only never-claimed rows, so skipping has files to skip);
    report each iteration's claim_io."""
    from pyspark.sql import functions as F

    from map_the_net_crawler_spark.operators.frontier import \
        DISCOVERY_TS_BASE
    corpus = bench.bench_corpus(0.006)
    run_dir = tempfile.mkdtemp(prefix="mtn_claimio_")
    tio = TableIO(run_dir, spark, num_buckets=8,
                  stats_max_records_per_file=1024)
    seeds = spark.read.parquet(f"{corpus}/frontier_seed.parquet")
    max_seq = seeds.agg(F.max("discovery_seq")).collect()[0][0]
    filler = spark.range(50_000).select(
        F.concat(F.lit("http://filler-"), F.col("id"),
                 F.lit(".zz")).alias("url"),
        F.concat(F.lit("filler-"), F.col("id"), F.lit(".zz"))
        .alias("domain_name"),
        F.lit(None).cast("string").alias("source_domain"),
        F.lit(0).alias("priority"),
        F.lit("pending").alias("status"),
        (F.col("id") + max_seq + 1).alias("discovery_seq"),
        F.lit(DISCOVERY_TS_BASE.replace(tzinfo=None))
        .cast("timestamp").alias("discovery_ts"),
        F.lit(0).alias("depth"),
        F.lit(None).cast("string").alias("error_message"),
        F.lit(None).cast("int").alias("processed_iteration"))
    seeds = seeds.unionByName(
        filler.select(*[f.name for f in S.FRONTIER.fields]))
    cfg = CrawlConfig(max_items=50)
    next_seq = init_run(spark, tio, seeds)
    out = []
    for i in range(1, 4):
        r = run_iteration(spark, tio, _inputs(spark, corpus), cfg, i,
                          next_seq)
        next_seq = r.next_seq
        out.append({"iteration": i, **(r.claim_io or {})})
    shutil.rmtree(run_dir, ignore_errors=True)
    return out


def politeness_ab(spark, corpus, budget=8, salt_buckets=16,
                  reps=2) -> dict:
    """Same corpus, same claim semantics: pre-filter FORCED (r5) vs
    SIZE-GATED (r6).  Interleaved reps, min per variant — a single
    sample per variant is inside this host's run-to-run noise."""
    out = {}
    for rep in range(reps):
        for label, min_bytes in (("prefilter_forced", 0),
                                 ("size_gated", None)):
            s = _politeness_once(spark, corpus, budget, salt_buckets,
                                 min_bytes)
            ent = out.setdefault(label, {"claimed": s["claimed"],
                                         "all_sec": []})
            ent["all_sec"].append(s["sec"])
            assert ent["claimed"] == s["claimed"]
    for ent in out.values():
        ent["sec"] = min(ent["all_sec"])
    assert out["prefilter_forced"]["claimed"] == \
        out["size_gated"]["claimed"], "politeness A/B claimed sets differ"
    return out


def _politeness_once(spark, corpus, budget, salt_buckets, min_bytes):
    kw = {} if min_bytes is None else {
        "politeness_prefilter_min_bytes": min_bytes}
    cfg = CrawlConfig(max_items=1_000_000, **kw)
    run_dir = tempfile.mkdtemp(prefix="mtn_polab_")
    pages = spark.read.parquet(f"{corpus}/pages.parquet")
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    seeds = pages.select(
        F.col("url"),
        F.regexp_replace("url", "^http://", "").alias("domain_name"),
        F.lit(None).cast("string").alias("source_domain"),
        F.lit(1).alias("priority"),
        F.lit("pending").alias("status"),
        (F.row_number().over(Window.orderBy("url")) - 1)
        .cast("long").alias("discovery_seq"),
        F.col("warc_ts").alias("discovery_ts"),
        F.lit(0).alias("depth"),
        F.lit(None).cast("string").alias("error_message"),
        F.lit(None).cast("int").alias("processed_iteration"))
    tio = TableIO(run_dir, spark,
                  num_buckets=max(8, pages.count() // 25_000))
    next_seq = init_run(spark, tio, seeds)
    t0 = time.time()
    r = run_iteration(spark, tio, _inputs(spark, corpus), cfg, 1,
                      next_seq, politeness_budget=budget,
                      salt_buckets=salt_buckets)
    shutil.rmtree(run_dir, ignore_errors=True)
    return {"sec": round(time.time() - t0, 2), "claimed": r.claimed}


def main():
    sf = bench.sf_value(bench.SF_DIR)
    corpus = bench.bench_corpus(sf)
    spark = bench.make_spark(bench.CPUS)
    bench.bench_canary(spark, bench.SF_DIR)          # JIT throwaway
    pre = bench.bench_canary(spark, bench.SF_DIR)
    result = {"metric": "claim_io+politeness_ab", "unit": "sec", "sf": sf,
              "cpus": bench.CPUS,
              "claim_io": probe_claim_io(spark),
              "politeness_ab": politeness_ab(spark, corpus)}
    result["canary_sec_pre"] = pre
    result["canary_sec_post"] = bench.bench_canary(spark, bench.SF_DIR)
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
