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


def test_metrics(engine_run, oracle_run):
    """S13/A5/C11: collection-log counters match the sequential oracle
    (update_collection_log, database.py:561-582).  The engine logs once
    per domain per iteration (its batch is domain-deduped); the oracle
    logs per item — compare against the oracle's FIRST row per
    (iteration, domain), which saw the same pre-batch state."""
    from decimal import Decimal
    tio, _ = engine_run
    eng = {(r.iteration, r.domain_name):
           (r.relationships_found, r.urls_discovered, r.processing_time)
           for r in tio.read("metrics", S.METRICS).collect()}
    want = {}
    for m in oracle_run.metrics:
        k = (m["iteration"], m["domain_name"])
        if k not in want:
            pt = Decimal(1 + m["relationships_found"] + m["urls_discovered"]
                         ) / Decimal(1000)
            want[k] = (m["relationships_found"], m["urls_discovered"],
                       pt.quantize(Decimal("0.001")))
    assert eng == want
    assert any(v[0] > 0 for v in eng.values())    # counters actually fire


def test_kill_resume(spark, fixture_paths, engine_run):
    """SURVEY.md §5.5: run 3 iterations, simulate a crash (fresh TableIO
    over the same directory, no seeds), resume 2 more — every table must
    equal the uninterrupted 5-iteration run (engine_run)."""
    import tempfile as _tf
    uninterrupted, _ = engine_run
    inputs = CrawlInputs(
        pages=spark.read.parquet(fixture_paths["pages"]),
        robots=spark.read.parquet(fixture_paths["robots"]),
        redirects=spark.read.schema(S.REDIRECTS)
        .parquet(fixture_paths["redirects"]),
        whois=spark.read.parquet(fixture_paths["whois"]),
        dns=spark.read.parquet(fixture_paths["dns"]),
        ssl=spark.read.parquet(fixture_paths["ssl"]),
        geo=spark.read.parquet(fixture_paths["geo"]))
    run_dir = _tf.mkdtemp(prefix="mtn_resume_")
    run_crawl(spark, TableIO(run_dir, spark), inputs, CrawlConfig(),
              seeds=spark.read.parquet(fixture_paths["frontier_seed"]),
              max_iterations=3)
    # crash: all driver state is discarded; resume from disk only
    run_crawl(spark, TableIO(run_dir, spark), inputs, CrawlConfig(),
              seeds=None, max_iterations=N_ITER - 3)
    resumed = TableIO(run_dir, spark)
    keys = {"frontier": ["url"], "seen": ["url"], "nodes": ["domain_name"],
            "edges": ["src_domain", "dst_domain", "relationship_type"],
            "metrics": ["iteration", "domain_name"]}
    for t, key in keys.items():
        a = sorted(map(tuple, uninterrupted.read(
            t, getattr(S, t.upper())).collect()))
        b = sorted(map(tuple, resumed.read(
            t, getattr(S, t.upper())).collect()))
        assert a == b, f"table {t} diverged after resume"
