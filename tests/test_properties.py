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
