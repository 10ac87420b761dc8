import sys
import tempfile
import time

t0 = time.time()


def log(*a):
    print(f"[{time.time()-t0:7.1f}s]", *a, flush=True)


from map_the_net_crawler_spark.config import CrawlConfig
from map_the_net_crawler_spark.fixtures import write_fixtures
from map_the_net_crawler_spark.plans.crawl import init_run
from map_the_net_crawler_spark.plans.iteration import CrawlInputs, run_iteration
from map_the_net_crawler_spark.session import get_spark
from map_the_net_crawler_spark.storage import TableIO
from map_the_net_crawler_spark import schemas as S

fxdir, rundir = tempfile.mkdtemp(), tempfile.mkdtemp()
paths = write_fixtures(fxdir, n_domains=30)
log("fixtures written")
spark = get_spark(master=sys.argv[1] if len(sys.argv) > 1 else "local[8]",
                  shuffle_partitions=int(sys.argv[3]) if len(sys.argv) > 3 else None,
                  codegen=len(sys.argv) <= 4 or sys.argv[4] != "nocodegen")
spark.sparkContext.setLogLevel("ERROR")
log("spark up")
tio = TableIO(rundir, spark)
inputs = CrawlInputs(
    pages=spark.read.parquet(paths["pages"]),
    robots=spark.read.parquet(paths["robots"]),
    redirects=spark.read.schema(S.REDIRECTS).parquet(paths["redirects"]),
    whois=spark.read.parquet(paths["whois"]),
    dns=spark.read.parquet(paths["dns"]),
    ssl=spark.read.parquet(paths["ssl"]),
    geo=spark.read.parquet(paths["geo"]),
)
seeds = spark.read.parquet(paths["frontier_seed"])
cfg = CrawlConfig()
next_seq = init_run(spark, tio, seeds)
log("init done")
n_iter = int(sys.argv[2]) if len(sys.argv) > 2 else 3
for i in range(1, n_iter + 1):
    r = run_iteration(spark, tio, inputs, cfg, i, next_seq)
    next_seq = r.next_seq
    log("iter", i, r)
spark.stop()
log("done")
