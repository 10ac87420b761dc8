"""Verify probe: crawl interrupted after k iterations + resume == straight run."""
import tempfile

import pandas as pd

from map_the_net_crawler_spark.config import CrawlConfig
from map_the_net_crawler_spark.fixtures import write_fixtures
from map_the_net_crawler_spark.plans.crawl import run_crawl
from map_the_net_crawler_spark.plans.iteration import CrawlInputs
from map_the_net_crawler_spark.session import get_spark
from map_the_net_crawler_spark.storage import TableIO
from map_the_net_crawler_spark import schemas as S

fxdir = tempfile.mkdtemp()
paths = write_fixtures(fxdir, n_domains=20)
spark = get_spark(master="local[8]", shuffle_partitions=1)
spark.sparkContext.setLogLevel("ERROR")
cfg = CrawlConfig()


def inputs():
    return CrawlInputs(
        pages=spark.read.parquet(paths["pages"]),
        robots=spark.read.parquet(paths["robots"]),
        redirects=spark.read.schema(S.REDIRECTS).parquet(paths["redirects"]),
        whois=spark.read.parquet(paths["whois"]),
        dns=spark.read.parquet(paths["dns"]),
        ssl=spark.read.parquet(paths["ssl"]),
        geo=spark.read.parquet(paths["geo"]))


seeds = spark.read.parquet(paths["frontier_seed"])

run_a = tempfile.mkdtemp()
tio_a = TableIO(run_a, spark)
run_crawl(spark, tio_a, inputs(), cfg, seeds=seeds, max_iterations=6)

run_b = tempfile.mkdtemp()
tio_b = TableIO(run_b, spark)
run_crawl(spark, tio_b, inputs(), cfg, seeds=seeds, max_iterations=3)
# simulate crash + new session resume: fresh TableIO, no seeds
tio_b2 = TableIO(run_b, spark)
run_crawl(spark, tio_b2, inputs(), cfg, seeds=None, max_iterations=3)

for t in ("frontier", "seen", "nodes", "edges"):
    a = tio_a.read(t).toPandas().sort_values("url" if t in ("frontier", "seen")
                                             else "domain_name"
                                             if t == "nodes" else
                                             ["src_domain", "dst_domain",
                                              "relationship_type"])
    b = TableIO(run_b, spark).read(t).toPandas().sort_values(
        "url" if t in ("frontier", "seen") else "domain_name"
        if t == "nodes" else ["src_domain", "dst_domain", "relationship_type"])
    a = a.reset_index(drop=True)
    b = b.reset_index(drop=True)
    same = a.equals(b)
    print(f"{t}: {'MATCH' if same else 'MISMATCH'} ({len(a)} vs {len(b)})",
          flush=True)
spark.stop()
