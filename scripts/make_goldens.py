"""Generate the committed golden-parquet oracles (run once, outputs
reviewed and committed — fixtures/golden_*.parquet).

The driver's DuckDB gate cannot express HTML parsing or the iterative
crawl in SQL, so those queries hash-compare against goldens produced by
the SEQUENTIAL implementations (htmlx one-page extraction / the pyref
reference oracle), the same strategy the hand-computed goldens in
tests/test_semantics_core.py use — generated once here, never at check
time, so the comparison catches any regression in the Spark dataflow.

- golden_extract_meta.parquet: per fixture page (url, title,
  description, favicon_url, meta_keywords, text) via htmlx
  (reference analogue: domain_collector.py:563-585).
- golden_crawl_edges.parquet: the edge table the sequential reference
  oracle produces for the default 2-iteration fixture crawl
  (domain_collector.py:1350-1412 loop semantics).

Independence honesty (ADVICE r3): golden_crawl_edges comes from the
SEPARATE sequential restatement (oracle/pyref.py — an independent code
path whose own semantics are pinned line-by-line to the reference by
unit tests), so it detects Spark-vs-sequential divergence.  The
golden_extract_meta and golden_robots_decisions goldens, by contrast,
call the SAME htmlx / functions.robots parsers the Spark UDFs wrap —
they are REGRESSION PINS (snapshot drift of one code path), not
independent oracles; the independent coverage for those parsers is the
hand-computed per-quirk unit tests in tests/test_semantics_core.py and
tests/test_robots.py, which assert expected values written by hand from
the reference's code.
"""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from map_the_net_crawler_spark.config import CrawlConfig  # noqa: E402
from map_the_net_crawler_spark.htmlx import extract_page, resolve_favicon  # noqa: E402
from map_the_net_crawler_spark.oracle.pyref import ReferenceOracle  # noqa: E402

FIXDIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "fixtures")


def golden_extract_meta() -> pd.DataFrame:
    pages = pd.read_parquet(os.path.join(FIXDIR, "pages.parquet"))
    rows = []
    for r in pages.itertuples():
        ex = extract_page(bytes(r.html))
        rows.append(dict(url=r.url, title=ex.title,
                         description=ex.description,
                         favicon_url=resolve_favicon(r.url, ex.favicon_url),
                         meta_keywords=ex.meta_keywords, text=ex.text))
    return pd.DataFrame(rows).sort_values("url").reset_index(drop=True)


def golden_crawl_edges() -> pd.DataFrame:
    fx = {n: pd.read_parquet(os.path.join(FIXDIR, f"{n}.parquet"))
          for n in ("pages", "robots", "redirects", "whois", "dns", "ssl",
                    "geo", "frontier_seed")}
    ost = ReferenceOracle(fx, CrawlConfig()).run(max_iterations=2)
    rows = [dict(src_domain=s, dst_domain=d, relationship_type=t,
                 link_text=v["link_text"], link_url=v["link_url"])
            for (s, d, t), v in ost.edges.items()]
    return (pd.DataFrame(rows)
            .sort_values(["src_domain", "dst_domain", "relationship_type"])
            .reset_index(drop=True))


def golden_robots_decisions() -> pd.DataFrame:
    """Sequential robots.txt decisions per fixture domain (the parser
    with the reference's directive-reset quirk, functions/robots.py —
    quirks pinned by hand-computed unit tests)."""
    from map_the_net_crawler_spark.functions.robots import robots_allowed
    robots = pd.read_parquet(os.path.join(FIXDIR, "robots.parquet"))
    rows = [dict(domain=r.domain,
                 allowed=bool(robots_allowed(
                     r.body, None if pd.isna(r.status_code)
                     else int(r.status_code),
                     "/", "WorldMapper/1.0 (compatible)")))
            for r in robots.itertuples()]
    return pd.DataFrame(rows).sort_values("domain").reset_index(drop=True)


if __name__ == "__main__":
    em = golden_extract_meta()
    em.to_parquet(os.path.join(FIXDIR, "golden_extract_meta.parquet"),
                  index=False)
    print(f"golden_extract_meta: {len(em)} rows")
    ce = golden_crawl_edges()
    ce.to_parquet(os.path.join(FIXDIR, "golden_crawl_edges.parquet"),
                  index=False)
    print(f"golden_crawl_edges: {len(ce)} rows")
    rd = golden_robots_decisions()
    rd.to_parquet(os.path.join(FIXDIR, "golden_robots_decisions.parquet"),
                  index=False)
    print(f"golden_robots_decisions: {len(rd)} rows")
