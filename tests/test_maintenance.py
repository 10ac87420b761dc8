"""Maintenance operators (SURVEY.md §2.10)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from map_the_net_crawler_spark.operators.maintenance import (
    archive_metrics, log_statistics, missing_field_nodes, purge_ugc,
    ugc_purge_candidates)


def _nodes(spark):
    rows = [
        ("ok.example.com", "T", "D"),
        ("cool.itch.io", None, None),        # UGC pattern
        ("writer.wordpress.com", "T", None),  # UGC pattern
        ("tracking.example.com", "T", "D"),   # 'tracking' pattern
        ("plain.org", None, "D"),
    ]
    return spark.createDataFrame(
        rows, "domain_name string, title string, description string")


def test_ugc_purge(spark):
    nodes = _nodes(spark)
    edges = spark.createDataFrame(
        [("ok.example.com", "cool.itch.io", "link"),
         ("plain.org", "ok.example.com", "link"),
         ("cool.itch.io", "plain.org", "link")],
        "src_domain string, dst_domain string, relationship_type string")
    frontier = spark.createDataFrame(
        [("http://cool.itch.io", "cool.itch.io"),
         ("http://plain.org", "plain.org")],
        "url string, domain_name string")
    bad = {r.domain_name for r in ugc_purge_candidates(nodes).collect()}
    assert bad == {"cool.itch.io", "writer.wordpress.com",
                   "tracking.example.com"}
    n2, e2, f2 = purge_ugc(nodes, edges, frontier)
    assert {r.domain_name for r in n2.collect()} == {"ok.example.com",
                                                     "plain.org"}
    assert e2.count() == 1                     # only plain.org -> ok.example
    assert {r.domain_name for r in f2.collect()} == {"plain.org"}


def test_archive_and_stats(spark, tmp_path):
    rows = [(i, f"d{i}.com", None, "completed", None, None, None, "agent-a")
            for i in range(1, 6)]
    m = spark.createDataFrame(
        rows, "iteration int, domain_name string, url string, status string, "
              "relationships_found int, urls_discovered int, "
              "error_message string, agent_name string")
    kept, old = archive_metrics(m, max_iteration_age=2, current_iteration=5,
                                csv_path=str(tmp_path / "arch"))
    assert {r.iteration for r in old.collect()} == {1, 2, 3}
    assert {r.iteration for r in kept.collect()} == {4, 5}
    csv = spark.read.option("header", True).csv(str(tmp_path / "arch"))
    assert csv.count() == 3
    stats = log_statistics(m).collect()
    assert stats[0].cnt == 5 and stats[0].status == "completed"


def test_missing_field_scan(spark):
    nodes = _nodes(spark)
    out = [r.domain_name for r in
           missing_field_nodes(nodes, ["title", "description"]).collect()]
    assert out == ["cool.itch.io", "plain.org", "writer.wordpress.com"]


def test_backfill_non_null_wins(spark, fixture_paths):
    """fill_missing_domain_data.py:85-164: nulls are filled from the
    S4-S7 dimension joins; existing values always survive."""
    from map_the_net_crawler_spark import schemas as S
    from map_the_net_crawler_spark.operators.maintenance import (
        BACKFILL_FIELDS, backfill_missing)
    whois = spark.read.parquet(fixture_paths["whois"])
    dns = spark.read.parquet(fixture_paths["dns"])
    ssl = spark.read.parquet(fixture_paths["ssl"])
    geo = spark.read.parquet(fixture_paths["geo"])
    some = [r.domain for r in dns.select("domain").limit(4).collect()]
    nodes = spark.createDataFrame(
        [(d, "PreExisting" if i % 2 == 0 else None, None)
         for i, d in enumerate(some)],
        "domain_name string, registrar string, ip_address string")
    full = nodes
    for f in BACKFILL_FIELDS:
        if f not in ("registrar", "ip_address"):
            full = full.withColumn(f, F.lit(None).cast(S.NODES[f].dataType))
    out = {r.domain_name: r for r in
           backfill_missing(full, whois, dns, ssl, geo).collect()}
    dns_rows = {r.domain: r for r in dns.collect()}
    for i, d in enumerate(some):
        if i % 2 == 0:
            assert out[d].registrar == "PreExisting"   # non-null survives
        assert out[d].ip_address == dns_rows[d].ip_address  # null filled
        assert out[d].ssl_valid is not None


def test_backfill_web_fields(spark, fixture_paths):
    """Web-data group (fill_missing_domain_data.py:127-131): a null
    title backfills from the pages snapshot through the crawl's extract
    UDF (byte-identical to a crawled title); an existing title
    survives; a domain with no page collects nothing."""
    from map_the_net_crawler_spark import schemas as S
    from map_the_net_crawler_spark.functions.extract import extract_pages
    from map_the_net_crawler_spark.operators.maintenance import (
        BACKFILL_FIELDS, backfill_missing)
    whois = spark.read.parquet(fixture_paths["whois"])
    dns = spark.read.parquet(fixture_paths["dns"])
    ssl = spark.read.parquet(fixture_paths["ssl"])
    geo = spark.read.parquet(fixture_paths["geo"])
    pages = spark.read.parquet(fixture_paths["pages"])
    doms = [r.url[len("http://"):] for r in
            pages.select("url").orderBy("url").limit(3).collect()]
    doms.append("no-page-here.example")
    nodes = spark.createDataFrame(
        [(d, "PreTitle" if i == 0 else None, None, None)
         for i, d in enumerate(doms)],
        "domain_name string, title string, description string, "
        "favicon_url string")
    for f in BACKFILL_FIELDS:
        nodes = nodes.withColumn(f, F.lit(None).cast(S.NODES[f].dataType))
    out = {r.domain_name: r for r in
           backfill_missing(nodes, whois, dns, ssl, geo,
                            pages=pages).collect()}
    # reference values straight from the extract UDF over those pages
    want = {r.domain_name: r for r in extract_pages(
        pages.filter(F.col("url").isin(
            [f"http://{d}" for d in doms[:3]]))
        .select("url", F.regexp_replace("url", "^http://", "")
                .alias("domain_name"), "html"))
        .filter(F.col("link_pos") == -1).collect()}
    assert out[doms[0]].title == "PreTitle"                 # survives
    assert out[doms[0]].description == want[doms[0]].description
    for d in doms[1:3]:
        assert out[d].title == want[d].title                # backfilled
        assert out[d].favicon_url == want[d].favicon_url
    assert out["no-page-here.example"].title is None        # no page
    assert len(out) == 4


def test_screenshot_sink(spark, tmp_path):
    """S8: the sink writes one valid PNG per domain executor-side and
    the manifest's dimensions come from re-sniffing the written file."""
    from map_the_net_crawler_spark.functions.multimodal import sniff_media
    from map_the_net_crawler_spark.operators.screenshot import (
        placeholder_png, screenshot_sink)
    doms = ["alpha.com", "beta.org", "alpha.com"]     # dup collapses
    nodes = spark.createDataFrame([(d,) for d in doms],
                                  "domain_name string")
    out_dir = str(tmp_path / "shots")
    rows = {r.domain_name: r for r in
            screenshot_sink(nodes, out_dir).collect()}
    assert set(rows) == {"alpha.com", "beta.org"}
    for d, r in rows.items():
        assert r.ok and r.format == "png"
        assert r.width == len(d) % 8 + 4
        assert r.height == ord(d[0]) % 8 + 4
        with open(r.path, "rb") as f:
            blob = f.read()
        assert blob == placeholder_png(d)             # deterministic
        assert sniff_media(blob)["width"] == r.width
    # injected capture callable replaces the placeholder renderer
    rows2 = screenshot_sink(nodes, str(tmp_path / "shots2"),
                            capture=lambda d: placeholder_png("x" + d)
                            ).collect()
    assert all(r.width == (len(r.domain_name) + 1) % 8 + 4 for r in rows2)
