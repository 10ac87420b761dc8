"""Old-vs-new minhash_lsh_pairs: result identity + wall time at a given
SF.  The 'old' pipeline is the round-5 implementation inlined verbatim.
Usage: python scripts/verify_minhash_equiv.py [sf_dir] [cpus]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32

from map_the_net_crawler_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="verify-minhash", master=f"local[{CPUS}]",
                  shuffle_partitions=CPUS)
spark.sparkContext.setLogLevel("ERROR")

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from map_the_net_crawler_spark.operators.dedup import (  # noqa: E402
    MINHASH_PRIME, minhash_lsh_pairs, shingles_col)


def old_minhash_signature(docs, text_col="text", n_hashes=32, shingle_n=3):
    h1 = F.conv(F.substring(F.md5(F.col("shingle")), 1, 10), 16, 10) \
          .cast("long")
    h2 = F.conv(F.substring(F.md5(F.col("shingle")), 11, 10), 16, 10) \
          .cast("long")
    sh = docs.select("doc_id",
                     F.explode(shingles_col(F.col(text_col), shingle_n))
                     .alias("shingle")) \
             .select("doc_id", h1.alias("h1"), h2.alias("h2"))
    aggs = [F.min((F.col("h1") + F.lit(p) * F.col("h2"))
                  % F.lit(MINHASH_PRIME)).alias(f"h{p}")
            for p in range(n_hashes)]
    sig = sh.groupBy("doc_id").agg(*aggs)
    return sig.select("doc_id",
                      F.array(*[F.col(f"h{p}") for p in range(n_hashes)])
                      .alias("sig"))


def old_minhash_lsh_pairs(docs, text_col="text", n_hashes=32, bands=8,
                          shingle_n=3, jaccard_threshold=0.5,
                          max_bucket=1000):
    rows_per_band = n_hashes // bands
    sig = old_minhash_signature(docs, text_col, n_hashes, shingle_n)
    banded = sig.select(
        "doc_id",
        F.posexplode(F.array(*[
            F.md5(F.concat_ws(
                ",", *[F.col("sig")[b * rows_per_band + r].cast("string")
                       for r in range(rows_per_band)]))
            for b in range(bands)])).alias("band", "bucket"))
    bucket_sizes = banded.groupBy("band", "bucket").agg(
        F.count("*").alias("bsz"))
    banded = (banded.join(bucket_sizes, ["band", "bucket"])
              .filter(F.col("bsz") <= max_bucket).drop("bsz"))
    a = banded.select(F.col("band"), F.col("bucket"),
                      F.col("doc_id").alias("doc_a"))
    b = banded.select(F.col("band"), F.col("bucket"),
                      F.col("doc_id").alias("doc_b"))
    cand = (a.join(b, ["band", "bucket"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b").distinct())
    sh = docs.select("doc_id",
                     F.transform(shingles_col(F.col(text_col), shingle_n),
                                 lambda s: F.xxhash64(s)).alias("shingles"))
    cand = (cand
            .join(sh.select(F.col("doc_id").alias("doc_a"),
                            F.col("shingles").alias("sh_a")), "doc_a")
            .join(sh.select(F.col("doc_id").alias("doc_b"),
                            F.col("shingles").alias("sh_b")), "doc_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = F.when(union > 0, inter.cast("double") / union) \
           .otherwise(F.lit(0.0))
    return (cand.select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
            .filter(F.col("jaccard") >= jaccard_threshold))


docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

# warm the JVM once on a small slice of EACH pipeline
small = docs.filter(F.col("doc_id") < 300)
old_minhash_lsh_pairs(small).count()
minhash_lsh_pairs(small).count()

t0 = time.time()
new_rows = sorted(map(tuple, minhash_lsh_pairs(
    docs, n_hashes=32, bands=8, shingle_n=3,
    jaccard_threshold=0.5).collect()))
t_new = time.time() - t0
print(f"new: {len(new_rows)} rows in {t_new:.2f}s", flush=True)

t0 = time.time()
old_rows = sorted(map(tuple, old_minhash_lsh_pairs(
    docs, n_hashes=32, bands=8, shingle_n=3,
    jaccard_threshold=0.5).collect()))
t_old = time.time() - t0
print(f"old: {len(old_rows)} rows in {t_old:.2f}s", flush=True)

assert old_rows == new_rows, (
    f"MISMATCH: old={len(old_rows)} new={len(new_rows)}; "
    f"only_old={set(old_rows) - set(new_rows)}; "
    f"only_new={set(new_rows) - set(old_rows)}")
print(f"IDENTICAL ({len(old_rows)} rows); speedup {t_old / t_new:.2f}x")
spark.stop()
