"""Dev harness: run the Spark engine and the sequential Python oracle on
the same fixtures and diff crawl order / seen / nodes / edges."""

from __future__ import annotations

import sys
import tempfile

import pandas as pd

from map_the_net_crawler_spark.config import CrawlConfig
from map_the_net_crawler_spark.fixtures import write_fixtures
from map_the_net_crawler_spark.oracle.pyref import ReferenceOracle
from map_the_net_crawler_spark.plans.crawl import run_crawl
from map_the_net_crawler_spark.plans.iteration import CrawlInputs
from map_the_net_crawler_spark.session import get_spark
from map_the_net_crawler_spark.storage import TableIO
from map_the_net_crawler_spark import schemas as S


def main(n_domains=30, max_iterations=6, master="local[8]"):
    fxdir = tempfile.mkdtemp(prefix="fixtures_")
    rundir = tempfile.mkdtemp(prefix="run_")
    paths = write_fixtures(fxdir, n_domains=n_domains)
    fx = {k: pd.read_parquet(v) for k, v in paths.items()}
    cfg = CrawlConfig()

    # oracle
    oracle = ReferenceOracle(fx, cfg)
    ost = oracle.run(max_iterations=max_iterations)

    # engine
    spark = get_spark(master=master, shuffle_partitions=1)
    spark.sparkContext.setLogLevel("ERROR")
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
    summary = run_crawl(spark, tio, inputs, cfg, seeds=seeds,
                        max_iterations=max_iterations)
    print("engine iterations:", [(r.iteration, r.claimed, r.processed,
                                  r.skipped, r.new_urls)
                                 for r in summary.iterations])

    # ---- compare crawl order (claim sequence) ----
    eng_order = []
    for r in summary.iterations:
        cl = tio.read("gated", version=r.iteration) \
            .orderBy("claim_rank").select("claim_rank", "url").collect()
        eng_order += [(r.iteration, row.claim_rank, row.url) for row in cl]
    ora_order = ost.crawl_order
    ok = eng_order == ora_order
    print(f"crawl order: {'MATCH' if ok else 'MISMATCH'} "
          f"({len(eng_order)} vs {len(ora_order)})")
    if not ok:
        for a, b in zip(eng_order, ora_order):
            if a != b:
                print("  first diff: engine", a, "oracle", b)
                break
        if len(eng_order) != len(ora_order):
            print("  engine tail:", eng_order[len(ora_order):][:5])
            print("  oracle tail:", ora_order[len(eng_order):][:5])

    # ---- seen set ----
    eng_seen = {r.url: (r.status, r.links_found)
                for r in tio.read("seen", S.SEEN).collect()}
    ora_seen = {u: (h["status"], h["links_found"]) for u, h in ost.seen.items()}
    print(f"seen: {'MATCH' if eng_seen == ora_seen else 'MISMATCH'} "
          f"({len(eng_seen)} vs {len(ora_seen)})")
    if eng_seen != ora_seen:
        for u in sorted(set(eng_seen) | set(ora_seen)):
            if eng_seen.get(u) != ora_seen.get(u):
                print("  ", u, "engine", eng_seen.get(u), "oracle", ora_seen.get(u))

    # ---- edges ----
    eng_edges = {(r.src_domain, r.dst_domain, r.relationship_type):
                 (r.link_text, r.link_url)
                 for r in tio.read("edges", S.EDGES).collect()}
    ora_edges = {k: (v["link_text"], v["link_url"]) for k, v in ost.edges.items()}
    print(f"edges: {'MATCH' if eng_edges == ora_edges else 'MISMATCH'} "
          f"({len(eng_edges)} vs {len(ora_edges)})")
    if eng_edges != ora_edges:
        diffs = 0
        for k in sorted(set(eng_edges) | set(ora_edges)):
            if eng_edges.get(k) != ora_edges.get(k):
                print("  ", k, "engine", eng_edges.get(k), "oracle", ora_edges.get(k))
                diffs += 1
                if diffs > 8:
                    break

    # ---- nodes ----
    def node_key(n):
        return {k: n.get(k) for k in
                ("title", "description", "favicon_url", "category",
                 "created_date", "expiry_date", "registrar", "asn",
                 "ssl_valid", "country", "ip_address")}
    eng_nodes = {r.domain_name: node_key(r.asDict())
                 for r in tio.read("nodes", S.NODES).collect()}
    ora_nodes = {d: node_key(n) for d, n in ost.nodes.items()}
    print(f"nodes: {'MATCH' if eng_nodes == ora_nodes else 'MISMATCH'} "
          f"({len(eng_nodes)} vs {len(ora_nodes)})")
    if eng_nodes != ora_nodes:
        diffs = 0
        for d in sorted(set(eng_nodes) | set(ora_nodes)):
            if eng_nodes.get(d) != ora_nodes.get(d):
                print("  ", d)
                print("    engine", eng_nodes.get(d))
                print("    oracle", ora_nodes.get(d))
                diffs += 1
                if diffs > 5:
                    break

    # ---- frontier ----
    eng_f = {r.url: (r.status, r.priority, r.depth, r.discovery_seq)
             for r in tio.read("frontier", S.FRONTIER).collect()}
    ora_f = {u: (q["status"], q["priority"], q["depth"], q["discovery_seq"])
             for u, q in ost.queue.items()}
    print(f"frontier: {'MATCH' if eng_f == ora_f else 'MISMATCH'} "
          f"({len(eng_f)} vs {len(ora_f)})")
    if eng_f != ora_f:
        diffs = 0
        for u in sorted(set(eng_f) | set(ora_f)):
            if eng_f.get(u) != ora_f.get(u):
                print("  ", u, "engine", eng_f.get(u), "oracle", ora_f.get(u))
                diffs += 1
                if diffs > 8:
                    break
    spark.stop()
    return ok


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    it = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    main(n, it)
