"""The one Arrow-vectorized extract UDF (SURVEY.md §2.8 U1-U6).

Replaces the reference's per-URL BeautifulSoup pass
(domain_collector.py:563-585 metadata, 958-973 links, 420-436 keywords)
with a single ``mapInPandas`` over (url, domain_name, html) batches.

Output contract (schemas.EXTRACTED):
- exactly one metadata row per input page with ``link_pos = -1``
  carrying title/description/favicon/keywords/text,
- one row per <a href> in document order with ``link_pos >= 0`` and the
  urlparse-derived fields (scheme/netloc/target_domain/path/query/
  param_names/clean_url) computed here so they are bit-identical to the
  reference's urllib.parse behavior — every later filter/cap/classify
  step is a JVM Column expression over these.

Pages with NULL html (URL absent from the pages snapshot — the
reference's requests exception path, domain_collector.py:1296-1300)
yield a metadata row with ``fetch_ok = false`` and no link rows.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..htmlx import extract_page, resolve_favicon
from ..urlkit import parse_href

EXTRACT_SCHEMA = (
    "url string, domain_name string, fetch_ok boolean, "
    "title string, description string, favicon_url string, "
    "meta_keywords string, text string, "
    "link_pos int, href string, link_text string, "
    "href_scheme string, href_netloc string, target_domain string, "
    "href_path string, href_query string, n_query_params int, "
    "param_names array<string>, clean_url string"
)

_COLS = ["url", "domain_name", "fetch_ok", "title", "description",
         "favicon_url", "meta_keywords", "text", "link_pos", "href",
         "link_text", "href_scheme", "href_netloc", "target_domain",
         "href_path", "href_query", "n_query_params", "param_names",
         "clean_url"]


def _extract_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    # Columnar accumulation: the batch fans out to one row per link
    # (~20x), and pd.DataFrame-from-records over 19 columns was a
    # measurable slice of the extract stage — same rows, same order,
    # same dtypes as the former list-of-dicts build.
    cols: dict[str, list] = {c: [] for c in _COLS}

    def emit(url, domain, fetch_ok, title=None, description=None,
             favicon_url=None, meta_keywords=None, text=None,
             link_pos=-1, href=None, link_text=None, href_scheme=None,
             href_netloc=None, target_domain=None, href_path=None,
             href_query=None, n_query_params=None, param_names=None,
             clean_url=None):
        cols["url"].append(url)
        cols["domain_name"].append(domain)
        cols["fetch_ok"].append(fetch_ok)
        cols["title"].append(title)
        cols["description"].append(description)
        cols["favicon_url"].append(favicon_url)
        cols["meta_keywords"].append(meta_keywords)
        cols["text"].append(text)
        cols["link_pos"].append(link_pos)
        cols["href"].append(href)
        cols["link_text"].append(link_text)
        cols["href_scheme"].append(href_scheme)
        cols["href_netloc"].append(href_netloc)
        cols["target_domain"].append(target_domain)
        cols["href_path"].append(href_path)
        cols["href_query"].append(href_query)
        cols["n_query_params"].append(n_query_params)
        cols["param_names"].append(param_names)
        cols["clean_url"].append(clean_url)

    for url, domain, html in zip(pdf["url"], pdf["domain_name"], pdf["html"]):
        if html is None:
            emit(url, domain, False)
            continue
        page = extract_page(bytes(html))
        emit(url, domain, True, title=page.title,
             description=page.description,
             favicon_url=resolve_favicon(url, page.favicon_url),
             meta_keywords=page.meta_keywords, text=page.text)
        for pos, href, text in page.links:
            p = parse_href(href)
            emit(url, domain, True, link_pos=pos, href=href,
                 link_text=text, href_scheme=p["scheme"],
                 href_netloc=p["netloc"],
                 target_domain=p["target_domain"], href_path=p["path"],
                 href_query=p["query"],
                 n_query_params=p["n_query_params"],
                 param_names=p["param_names"], clean_url=p["clean_url"])
    return pd.DataFrame(cols, columns=_COLS)


def _extract_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield _extract_batch(pdf)


def extract_pages(fetched: DataFrame) -> DataFrame:
    """fetched: (url, domain_name, html) → EXTRACTED rows (Arrow batches)."""
    return fetched.select("url", "domain_name", "html").mapInPandas(
        _extract_iter, schema=EXTRACT_SCHEMA
    )
