import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
import bench
from pyspark.sql import functions as F

cpus = int(sys.argv[1])
corpus = "/tmp/mtn_bench_corpus_v3_50000"
ex_path = "/tmp/mtn_extract_50k"

sp = bench.make_spark(cpus)
sp.sparkContext.setLogLevel("ERROR")

import os
if not os.path.exists(ex_path):
    from map_the_net_crawler_spark.functions.extract import extract_pages
    pages = sp.read.parquet(f"{corpus}/pages.parquet")
    df = pages.select("url", F.regexp_replace("url", "^http://", "")
                      .alias("domain_name"), "html").repartition(32, "url")
    extract_pages(df).write.mode("overwrite").parquet(ex_path)
    print("extract snapshot written", flush=True)

ex = sp.read.parquet(ex_path)
links = ex.filter(F.col("link_pos") >= 0)
print("link rows:", links.count(), flush=True)

from map_the_net_crawler_spark.operators.links import filter_links

d = tempfile.mkdtemp()
for label, df in [
    ("filter_links+write", filter_links(links)),
    ("plain write (no filter)", links),
    ("filter netloc-only", links.filter(F.col("href_netloc") != "")),
]:
    t0 = time.time()
    df.write.mode("overwrite").parquet(f"{d}/{abs(hash(label))}")
    print(f"{label}: {time.time()-t0:.1f}s", flush=True)

# count-only (no write) to separate write cost from filter cost
t0 = time.time()
n = filter_links(links).count()
print(f"filter_links count-only: {time.time()-t0:.1f}s ({n})", flush=True)
sp.stop()
