"""Isolate minhash_lsh_pairs stage costs at the given SF (guide §1.4:
noop sink, labelled jobs).  Usage:
    python scripts/measure_minhash.py [sf_dir] [cpus]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32

from map_the_net_crawler_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="measure-minhash", master=f"local[{CPUS}]",
                  shuffle_partitions=CPUS)
spark.sparkContext.setLogLevel("ERROR")

from pyspark.sql import functions as F  # noqa: E402

from map_the_net_crawler_spark.operators.dedup import (  # noqa: E402
    minhash_lsh_pairs, minhash_signature, shingles_col)

docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
print("docs partitions:", docs.rdd.getNumPartitions())


def noop(df, label):
    spark.sparkContext.setJobDescription(label)
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    print(f"{label}: {dt:.2f}s", flush=True)
    spark.sparkContext.setJobDescription(None)
    return dt


# warm-up JIT on a small slice
noop(minhash_lsh_pairs(docs.filter(F.col("doc_id") < 500), n_hashes=32,
                       bands=8, shingle_n=3, jaccard_threshold=0.5),
     "warmup(500 docs)")

# stage isolation
noop(docs.select("doc_id", shingles_col(F.col("text"), 3).alias("sh")),
     "shingles only")
sig = minhash_signature(docs, "text", 32, 3)
noop(sig, "signature (shingle+md5+explode+groupBy)")

rows_per_band = 4
banded = sig.select(
    "doc_id",
    F.posexplode(F.array(*[
        F.md5(F.concat_ws(
            ",", *[F.col("sig")[b * rows_per_band + r].cast("string")
                   for r in range(rows_per_band)]))
        for b in range(8)])).alias("band", "bucket"))
noop(banded, "banded")
bucket_sizes = banded.groupBy("band", "bucket").agg(F.count("*").alias("bsz"))
banded2 = (banded.join(bucket_sizes, ["band", "bucket"])
           .filter(F.col("bsz") <= 1000).drop("bsz"))
a = banded2.select(F.col("band"), F.col("bucket"),
                   F.col("doc_id").alias("doc_a"))
b = banded2.select(F.col("band"), F.col("bucket"),
                   F.col("doc_id").alias("doc_b"))
cand = (a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b").distinct())
spark.sparkContext.setJobDescription("cand count")
t0 = time.time()
n_cand = cand.count()
print(f"candidates: {n_cand} rows, {time.time()-t0:.2f}s", flush=True)

# full pipeline
full = minhash_lsh_pairs(docs, n_hashes=32, bands=8, shingle_n=3,
                         jaccard_threshold=0.5)
spark.sparkContext.setJobDescription("full count")
t0 = time.time()
n = full.count()
print(f"full minhash_lsh_pairs: {n} rows, {time.time()-t0:.2f}s", flush=True)

spark.stop()
