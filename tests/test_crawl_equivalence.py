"""Reference-oracle equivalence (SURVEY.md §5.2): the Spark engine must
reproduce the sequential Python restatement of the reference crawler —
crawl order, URL-seen set, node rows, edge rows, frontier evolution —
on the adversarial fixture corpus.  This is the correctness bar from
BASELINE.json north_rule ("matching the reference's crawl ordering and
URL-seen set under the same seed list + politeness budget")."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from map_the_net_crawler_spark import schemas as S
from map_the_net_crawler_spark.config import CrawlConfig
from map_the_net_crawler_spark.oracle.pyref import ReferenceOracle
from map_the_net_crawler_spark.plans.crawl import run_crawl
from map_the_net_crawler_spark.plans.iteration import CrawlInputs
from map_the_net_crawler_spark.storage import TableIO

N_ITER = 5


@pytest.fixture(scope="module")
def engine_run(spark, fixture_paths):
    tio = TableIO(tempfile.mkdtemp(prefix="mtn_eq_"), spark)
    inputs = CrawlInputs(
        pages=spark.read.parquet(fixture_paths["pages"]),
        robots=spark.read.parquet(fixture_paths["robots"]),
        redirects=spark.read.schema(S.REDIRECTS).parquet(fixture_paths["redirects"]),
        whois=spark.read.parquet(fixture_paths["whois"]),
        dns=spark.read.parquet(fixture_paths["dns"]),
        ssl=spark.read.parquet(fixture_paths["ssl"]),
        geo=spark.read.parquet(fixture_paths["geo"]))
    seeds = spark.read.parquet(fixture_paths["frontier_seed"])
    summary = run_crawl(spark, tio, inputs, CrawlConfig(), seeds=seeds,
                        max_iterations=N_ITER)
    return tio, summary


@pytest.fixture(scope="module")
def oracle_run(fixture_frames):
    oracle = ReferenceOracle(fixture_frames, CrawlConfig())
    return oracle.run(max_iterations=N_ITER)


def test_crawl_order(engine_run, oracle_run):
    tio, summary = engine_run
    eng = []
    for r in summary.iterations:
        claims = tio.read("gated", version=r.iteration) \
            .orderBy("claim_rank").select("claim_rank", "url").collect()
        eng += [(r.iteration, c.claim_rank, c.url) for c in claims]
    assert eng == oracle_run.crawl_order


def test_seen_set(engine_run, oracle_run):
    tio, _ = engine_run
    eng = {r.url: (r.status, r.links_found)
           for r in tio.read("seen", S.SEEN).collect()}
    want = {u: (h["status"], h["links_found"])
            for u, h in oracle_run.seen.items()}
    assert eng == want


def test_edges(engine_run, oracle_run):
    tio, _ = engine_run
    eng = {(r.src_domain, r.dst_domain, r.relationship_type):
           (r.link_text, r.link_url)
           for r in tio.read("edges", S.EDGES).collect()}
    want = {k: (v["link_text"], v["link_url"])
            for k, v in oracle_run.edges.items()}
    assert eng == want


def test_nodes(engine_run, oracle_run):
    tio, _ = engine_run
    fields = ("title", "description", "favicon_url", "category",
              "created_date", "expiry_date", "registrar", "asn",
              "asn_description", "ssl_valid", "country", "ip_address")

    def key(n):
        return {f: n.get(f) for f in fields}

    eng = {r.domain_name: key(r.asDict())
           for r in tio.read("nodes", S.NODES).collect()}
    want = {d: key(n) for d, n in oracle_run.nodes.items()}
    assert eng == want
    # tags arrays too (sorted sets)
    eng_tags = {r.domain_name: r.tags
                for r in tio.read("nodes", S.NODES).collect()}
    for d, n in oracle_run.nodes.items():
        assert eng_tags[d] == n.get("tags"), d


def test_frontier(engine_run, oracle_run):
    tio, _ = engine_run
    eng = {r.url: (r.status, r.priority, r.depth, r.discovery_seq)
           for r in tio.read("frontier", S.FRONTIER).collect()}
    want = {u: (q["status"], q["priority"], q["depth"], q["discovery_seq"])
            for u, q in oracle_run.queue.items()}
    assert eng == want
