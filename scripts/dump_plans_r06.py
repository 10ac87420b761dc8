"""Dump .explain('formatted') for the round-6 touched queries into
plans/r06/<name>_<tag>.txt.  Usage:
    python scripts/dump_plans_r06.py before|after [sf_dir]
Driver-side only (no jobs except tiny collects the operators require).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "plans", "r06")
os.makedirs(OUT, exist_ok=True)

from map_the_net_crawler_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="plans-r06", master="local[4]",
                  shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")

from pyspark.sql import functions as F  # noqa: E402

from map_the_net_crawler_spark.config import CrawlConfig  # noqa: E402
from map_the_net_crawler_spark.operators.dedup import \
    minhash_lsh_pairs  # noqa: E402
from map_the_net_crawler_spark.operators.frontier import \
    claim_batch  # noqa: E402
from map_the_net_crawler_spark.operators.similarity import (  # noqa: E402
    brute_force_cosine_topk, ivf_topk, lsh_bucketed_topk)


def dump(name, df):
    p = os.path.join(OUT, f"{name}_{TAG}.txt")
    with open(p, "w") as f:
        f.write(df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"))
    print("wrote", p)


docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

dump("minhash_lsh", minhash_lsh_pairs(docs, n_hashes=32, bands=8,
                                      shingle_n=3, jaccard_threshold=0.5))
dump("ann_cosine_topk", brute_force_cosine_topk(
    emb.filter(F.col("vec_id") < 100), emb, k=10))
dump("ann_lsh", lsh_bucketed_topk(
    emb.filter(F.col("vec_id") < 100), emb, dim=64, k=10, n_planes=8))
dump("ann_ivf", ivf_topk(
    emb.filter(F.col("vec_id") < 100), emb, dim=64, n_cells=16,
    nprobe=4, k=10))

# politeness claim over a synthetic frontier (same shape as bench_skew)
frontier = spark.range(10_000).select(
    F.concat(F.lit("http://d"), F.col("id") % 500, F.lit(".com/p"),
             F.col("id")).alias("url"),
    F.concat(F.lit("d"), F.col("id") % 500, F.lit(".com"))
    .alias("domain_name"),
    F.lit(None).cast("string").alias("source_domain"),
    F.lit(1).alias("priority"),
    F.lit("pending").alias("status"),
    F.col("id").alias("discovery_seq"),
    F.lit(None).cast("timestamp").alias("discovery_ts"),
    F.lit(0).alias("depth"),
    F.lit(None).cast("string").alias("error_message"),
    F.lit(None).cast("int").alias("processed_iteration"))
cfg = CrawlConfig(max_items=1000)
dump("claim_politeness_salted",
     claim_batch(frontier, cfg, politeness_budget=8, salt_buckets=16))

# discovery merge (first-wins window + frontier anti-join) over a
# synthetic frontier/discovery pair shaped like the bench corpus
import tempfile  # noqa: E402

from map_the_net_crawler_spark.operators.frontier import \
    merge_discoveries  # noqa: E402

d = tempfile.mkdtemp(prefix="plans_r06_")
# bench-scale frontier (~15 MB parquet): over the 10m default
# threshold, under the round-6 64m one — the plan pair shows the
# anti-join flip SortMergeJoin -> BroadcastHashJoin LeftAnti
big_frontier = spark.range(2_000_000).select(
    F.concat(F.lit("http://d"), F.col("id") % 200_000, F.lit(".com/p"),
             F.col("id")).alias("url"),
    F.concat(F.lit("d"), F.col("id") % 200_000, F.lit(".com"))
    .alias("domain_name"),
    F.lit(None).cast("string").alias("source_domain"),
    F.lit(1).alias("priority"),
    F.lit("pending").alias("status"),
    F.col("id").alias("discovery_seq"),
    F.lit(None).cast("timestamp").alias("discovery_ts"),
    F.lit(0).alias("depth"),
    F.lit(None).cast("string").alias("error_message"),
    F.lit(None).cast("int").alias("processed_iteration"))
big_frontier.write.mode("overwrite").parquet(f"{d}/frontier")
fr = spark.read.parquet(f"{d}/frontier")
disc = spark.range(5_000).select(
    F.concat(F.lit("http://t"), F.col("id") % 800, F.lit(".com/p"),
             F.col("id")).alias("clean_url"),
    F.concat(F.lit("t"), F.col("id") % 800, F.lit(".com"))
    .alias("target_domain"),
    F.concat(F.lit("d"), F.col("id") % 500, F.lit(".com"))
    .alias("source_domain"),
    F.lit(0).alias("src_depth"),
    (F.col("id") % 100 + 1).cast("int").alias("source_rank"),
    (F.col("id") % 2 == 0).alias("is_internal"),
    (F.col("id") % 40).cast("int").alias("link_pos"))
scounts = spark.createDataFrame([], "domain_name string, seen_cnt long")
procd = spark.createDataFrame(
    [], "domain_name string, batch_rank int, records_history boolean")
dump("merge_discoveries",
     merge_discoveries(fr, disc, scounts, procd, cfg, next_seq=10_000,
                       iteration=2, rows_hint=5_000))

spark.stop()
