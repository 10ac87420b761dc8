import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
import bench
from pyspark.sql import functions as F

cpus = int(sys.argv[1])
codegen = sys.argv[2] != "nocodegen" if len(sys.argv) > 2 else True
from map_the_net_crawler_spark.session import get_spark
sp = get_spark(app_name="iso2", master=f"local[{cpus}]",
               shuffle_partitions=cpus, codegen=codegen)
sp.sparkContext.setLogLevel("ERROR")

ex = sp.read.parquet("/tmp/mtn_extract_50k")
links = ex.filter(F.col("link_pos") >= 0)
slim = links.select("domain_name", "link_pos", "href", "link_text",
                    "href_scheme", "href_netloc", "href_path",
                    "n_query_params", "param_names", "target_domain",
                    "clean_url")
d = tempfile.mkdtemp()
from map_the_net_crawler_spark.operators.links import filter_links

def t(label, df):
    t0 = time.time()
    df.write.mode("overwrite").parquet(f"{d}/{abs(hash(label))}")
    print(f"[{cpus} cg={codegen}] {label}: {time.time()-t0:.1f}s", flush=True)

t("slim plain write", slim)
t("slim filter_links write", filter_links(slim))
sp.stop()
