"""Property-based cross-implementation invariants (hypothesis).

The engine parses URLs two ways: the Python `urlkit` (urllib.parse —
shared verbatim with the sequential oracle and the Arrow extract UDF)
and JVM Column regexes (the SQL-expressible variant used by
q_url_canonicalize / q_link_filter and their DuckDB oracles).  For the
domain both implementations claim — absolute lowercase-scheme http(s)
URLs — they must agree exactly on netloc, path, stripped domain and the
frontier key ``clean_url``."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from map_the_net_crawler_spark.urlkit import clean_url_for_queue, parse_href

_label = st.from_regex(r"[a-z0-9]([a-z0-9-]{0,6}[a-z0-9])?", fullmatch=True)
_host = st.builds(lambda labs, www: ("www." if www else "") + ".".join(labs),
                  st.lists(_label, min_size=1, max_size=4), st.booleans())
_seg = st.from_regex(r"[A-Za-z0-9._~%!$'()*+,;:@-]{0,10}", fullmatch=True)
_path = st.lists(_seg, max_size=4).map(
    lambda segs: "".join("/" + s for s in segs))
_query = st.one_of(st.just(""),
                   st.from_regex(r"\?[A-Za-z0-9=&_-]{0,24}", fullmatch=True))
_frag = st.one_of(st.just(""),
                  st.from_regex(r"#[A-Za-z0-9_-]{0,8}", fullmatch=True))
_url = st.builds(lambda sch, h, p, q, f: f"{sch}://{h}{p}{q}{f}",
                 st.sampled_from(["http", "https"]),
                 _host, _path, _query, _frag)


@given(urls=st.lists(_url, min_size=20, max_size=50))
@settings(max_examples=5, deadline=None)
def test_column_regex_parse_matches_urllib(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    scheme = F.regexp_extract("url", r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1)
    netloc = F.regexp_extract("url", r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1)
    path = F.regexp_replace(
        F.regexp_extract("url",
                         r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)", 1),
        r";[^/]*$", "")   # urlparse._splitparams: last-segment ';params'
    clean = F.concat(scheme, F.lit("://"), netloc, path)
    clean = F.when((F.length(clean) > 1) & clean.rlike("/$"),
                   F.regexp_replace(clean, "/+$", "")).otherwise(clean)
    domain = F.regexp_replace(F.lower(netloc), r"^www\.", "")
    rows = df.select("url", netloc.alias("netloc"), path.alias("path"),
                     clean.alias("clean_url"), domain.alias("domain")) \
        .collect()
    for r in rows:
        ref = parse_href(r.url)
        assert r.netloc == ref["netloc"], r.url
        assert r.path == ref["path"], r.url
        assert r.domain == ref["target_domain"], r.url
        assert r.clean_url == clean_url_for_queue(r.url), r.url


@given(seed=st.integers(min_value=0, max_value=2**31 - 1),
       budget=st.integers(min_value=1, max_value=12))
@settings(max_examples=5, deadline=None)
def test_politeness_budget_claim_equivalence(spark, seed, budget):
    """When the per-domain politeness budget is at least the largest
    per-domain pending count, the budget window prunes nothing and the
    claim is IDENTICAL (same rows, same claim_rank order) to faithful
    claim mode — i.e. politeness only ever removes over-budget rows,
    never reorders (VERDICT r2 item 10; reference sleep semantics,
    domain_collector.py:1411-1412 re-expressed as cardinality)."""
    import random

    from map_the_net_crawler_spark.config import CrawlConfig
    from map_the_net_crawler_spark.operators.frontier import claim_batch
    rng = random.Random(seed)
    rows, seq = [], 0
    for d in range(8):
        for _ in range(rng.randint(1, budget)):   # per-domain ≤ budget
            rows.append((f"http://d{d}.com/p{seq}", f"d{d}.com", None,
                         rng.randint(1, 3), "pending", seq, None, 0,
                         None, None))
            seq += 1
    f = spark.createDataFrame(
        rows,
        "url string, domain_name string, source_domain string, "
        "priority int, status string, discovery_seq long, "
        "discovery_ts timestamp, depth int, error_message string, "
        "processed_iteration int")
    cfg = CrawlConfig(max_items=20)
    plain = [(r.claim_rank, r.url) for r in
             claim_batch(f, cfg).orderBy("claim_rank").collect()]
    budgeted = [(r.claim_rank, r.url) for r in
                claim_batch(f, cfg, politeness_budget=budget)
                .orderBy("claim_rank").collect()]
    assert plain == budgeted
    # salting is a skew heuristic: per-domain intake is bounded by
    # salt_buckets × ceil(budget/salt_buckets) (the sub-quota bound —
    # approximate, within ceil rounding of the budget), and the claim
    # stays deterministic across partitionings
    salted = claim_batch(f, cfg, politeness_budget=budget,
                         salt_buckets=4).orderBy("claim_rank").collect()
    sub_quota = -(-budget // 4)
    per_dom: dict = {}
    for r in salted:
        per_dom[r.domain_name] = per_dom.get(r.domain_name, 0) + 1
    assert all(c <= 4 * sub_quota for c in per_dom.values())
    again = claim_batch(f.repartition(7), cfg, politeness_budget=budget,
                        salt_buckets=4).orderBy("claim_rank").collect()
    assert [(r.claim_rank, r.url) for r in salted] == \
        [(r.claim_rank, r.url) for r in again]


@given(texts=st.lists(st.text(max_size=60), min_size=10, max_size=25))
@settings(max_examples=5, deadline=None)
def test_exact_dedup_survivor_invariants(spark, texts):
    """exact_dedup on arbitrary unicode text: exactly one survivor per
    content-hash group, survivor is min doc_id, group sizes sum to N."""
    from map_the_net_crawler_spark.operators.dedup import exact_dedup
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    rows = exact_dedup(docs).collect()
    assert len(rows) == len(texts)
    by_hash: dict = {}
    for r in rows:
        by_hash.setdefault(r.content_hash, []).append(r)
    for grp in by_hash.values():
        assert sum(r.is_survivor for r in grp) == 1
        assert min(r.doc_id for r in grp) == \
            next(r.doc_id for r in grp if r.is_survivor)
        assert all(r.group_size == len(grp) for r in grp)
