"""Deterministic synthetic WARC-style fixture corpus (FIXTURES.md, SURVEY.md §5.3).

Generates, from a single integer seed, a self-consistent site graph:

- ``pages(url, warc_ts, html, text, lang)`` — root page per domain; the
  ``text`` column is produced by running htmlx.extract_page on the
  generated html, so the engine's byte-identical-text invariant
  (BASELINE.json input_hint) is testable end-to-end.
- ``frontier_seed`` — seed rows with mixed priorities.
- ``robots`` — bodies covering every parser quirk (U7).
- ``redirects`` — HEAD-resolution snapshot incl. protocol-only cases (J6).
- ``whois/dns/ssl/geo`` — enrichment dimensions (S4-S7) keyed to domains.

Adversarial cases per FIXTURES.md §1: hub domains with hundreds of
outlinks (skew), UGC subdomains, tracking params, >10-param URLs,
>500-char URLs, >8-segment paths, non-content first segments, excluded
extensions, empty/short/boilerplate link texts, www-prefixed targets,
parent→subdomain links, links into the redirects table.

Pure pandas/pyarrow writers — the same parquet is read by Spark, DuckDB
(oracle SQL) and the sequential Python oracle.  Sizes scale with
``n_domains`` so bench.py can generate sf-scale corpora with the same code.
"""

from __future__ import annotations

import datetime as dt
import os
import random
from decimal import Decimal

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .htmlx import extract_page

_BASE_TS = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)

_TLDS = ("com", "org", "net", "io", "co.uk", "de")
_CATEGORY_SNIPPETS = (
    ("Tech blog and journal", "Daily posts about software and engineering"),
    ("Online shop", "Buy products on sale in our store"),
    ("Local news and media", "Breaking headlines from our reporters"),
    ("Community forum", "Discussion board with many topics"),
    ("State university", "Campus life for students and faculty"),
    ("Travel booking", "Hotels, flights and tours for your holiday"),
    ("Health clinic", "Medical care, wellness and therapy"),
    ("Finance and banking", "Loans, credit and investment services"),
    ("Art gallery", "Museum exhibits, concerts and film festival"),
    ("Plain website", "Just a site with general info"),
)
_KEYWORDS = ("spark, data, crawl", "Shopping, Deals", "", "news,media , press",
             "open source,tools")
_BOILERPLATE = ("click here", "read more", "learn more", "continue", "next",
                "previous", "x", "")


def domain_list(n_domains: int, rng: random.Random) -> list[str]:
    doms = []
    for i in range(n_domains):
        tld = _TLDS[i % len(_TLDS)]
        doms.append(f"site{i:05d}.{tld}")
    return doms


def _page_html(domain: str, idx: int, links: list[tuple[str, str]],
               rng: random.Random) -> str:
    title, desc = _CATEGORY_SNIPPETS[idx % len(_CATEGORY_SNIPPETS)]
    kw = _KEYWORDS[idx % len(_KEYWORDS)]
    head = [f"<title>{title} {domain}</title>"]
    if idx % 3 != 2:
        head.append(f'<meta name="description" content="{desc}">')
    elif idx % 6 == 2:
        head.append(f'<meta property="og:description" content="OG: {desc}">')
    if kw:
        head.append(f'<meta name="keywords" content="{kw}">')
    if idx % 4 == 0:
        head.append('<link rel="icon" href="/favicon-32.png">')
    elif idx % 4 == 1:
        head.append('<link rel="shortcut icon" href="img/fav.ico">')
    body = [f"<h1>Welcome to {domain}</h1>", f"<p>Page number {idx} of the corpus.</p>"]
    for href, text in links:
        body.append(f'<a href="{href}">{text}</a>')
    body.append("<footer>Generated fixture &amp; copyright 2024</footer>")
    return ("<html><head>" + "\n".join(head) + "</head><body>"
            + "\n".join(body) + "</body></html>")


def generate_fixtures(n_domains: int = 120, seed: int = 42,
                      links_per_page: int = 8, hub_every: int = 17,
                      hub_out_links: int = 120) -> dict[str, pd.DataFrame]:
    rng = random.Random(seed)
    domains = domain_list(n_domains, rng)
    n = len(domains)

    # subdomains of the first domains (parent → sub links ⇒ 'subdomain' edges)
    subdomains = [f"blog.{domains[i]}" for i in range(0, min(10, n), 2)]
    # UGC platform hosts (excluded by F3 domain patterns)
    ugc = ["cooldev.itch.io", "someuser.github.io", "writer.wordpress.com"]
    all_hosts = domains + subdomains + ugc

    redirect_rows: list[dict] = []
    page_rows: list[dict] = []

    def adversarial_links(i: int, me: str) -> list[tuple[str, str]]:
        out: list[tuple[str, str]] = []
        t = lambda j: domains[j % n]
        # clean external links with meaningful text
        for k in range(links_per_page):
            tgt = t(i * 7 + k + 1)
            if tgt != me:
                out.append((f"http://{tgt}/", f"Partner site {tgt} overview"))
        # a www-prefixed target (C2 strip)
        out.append((f"http://www.{t(i * 3 + 5)}/news", f"News from {t(i * 3 + 5)}"))
        # internal links (same domain): a couple clean + duplicates after cleaning
        out.append((f"http://{me}/articles/one", "First article long text"))
        out.append((f"http://{me}/articles/one?utm_campaign=x#frag", "Dup after clean"))
        out.append((f"http://{me}/articles/two", "Second article body"))
        # tracking params (F5)
        out.append((f"http://{t(i + 2)}/p?utm_source=feed", "Tracked link text"))
        out.append((f"http://{t(i + 3)}/p?fbclid=abc123", "Facebook tracked link"))
        # too many params (F4)
        qp = "&".join(f"k{j}=v{j}" for j in range(12))
        out.append((f"http://{t(i + 4)}/q?{qp}", "Parameter soup link"))
        # too long (F6)
        out.append((f"http://{t(i + 5)}/" + "x" * 520, "Very long generated url"))
        # deep path (F7)
        out.append((f"http://{t(i + 6)}/a/b/c/d/e/f/g/h/i", "Deep path link text"))
        # non-content first segment (F8)
        out.append((f"http://{t(i + 7)}/api/v1/resource", "API endpoint link"))
        # excluded extensions (F2)
        out.append((f"http://{t(i + 8)}/brochure.pdf", "Download our brochure"))
        out.append((f"http://{t(i + 9)}/logo.png", "Logo image link text"))
        # excluded patterns (F3)
        out.append((f"http://{t(i + 10)}/login", "Member login area"))
        out.append((f"http://{t(i + 11)}/analytics/dash", "Analytics dashboard"))
        # boilerplate / short text (F9)
        out.append((f"http://{t(i + 12)}/fine", _BOILERPLATE[i % len(_BOILERPLATE)]))
        # relative + javascript + mailto (F1)
        out.append(("/relative/path", "Relative link text here"))
        out.append(("javascript:void(0)", "JS pseudo link text"))
        out.append((f"mailto:info@{me}", "Mail us at info address"))
        # UGC (excluded domain at edge stage, F3 domain patterns)
        out.append((f"http://{ugc[i % len(ugc)]}/game", "Indie game page link"))
        # parent → subdomain (C4 'subdomain' edge) for even low-index domains
        if i < 10 and i % 2 == 0:
            out.append((f"http://blog.{me}/", f"Our blog at blog.{me}"))
        # link into the redirects snapshot (J6)
        if i % 5 == 0:
            src = f"http://{t(i + 13)}/moved"
            final = f"http://{t(i + 14)}/landing"
            redirect_rows.append({"url": src, "final_url": final, "status_code": 301})
            out.append((src, "Old moved location link"))
        if i % 5 == 1:
            # protocol-only redirect: must NOT become type 'redirect'
            src = f"http://{t(i + 13)}/secure"
            redirect_rows.append({"url": src,
                                  "final_url": f"https://{t(i + 13)}/secure",
                                  "status_code": 301})
            out.append((src, "Protocol upgrade redirect"))
        return out

    for i, d in enumerate(all_hosts):
        if i < n and i % hub_every == 0:
            # hub page: hundreds of outlinks (skew)
            links = [(f"http://{domains[(i * 31 + j) % n]}/", f"Hub outlink number {j}")
                     for j in range(hub_out_links)]
            links += adversarial_links(i, d)
        else:
            links = adversarial_links(i, d)
        html = _page_html(d, i, links, rng)
        page = extract_page(html)
        page_rows.append({
            "url": f"http://{d}",
            "warc_ts": _BASE_TS + dt.timedelta(seconds=i),
            "html": html.encode("utf-8"),
            "text": page.text,
            "lang": "en" if i % 7 else "de",
        })

    pages = pd.DataFrame(page_rows)

    # --- frontier seeds: ~20 rows over the first domains, mixed priorities ---
    seeds = []
    n_seeds = min(20, n)
    for s in range(n_seeds):
        d = domains[s]
        seeds.append({
            "url": f"http://{d}",
            "domain_name": d,
            "source_domain": None,
            "priority": 3 if s % 9 == 0 else (2 if s % 4 == 0 else 1),
            "status": "pending",
            "discovery_seq": s,
            "discovery_ts": _BASE_TS + dt.timedelta(seconds=s),
            "depth": 0,
            "error_message": None,
            "processed_iteration": None,
        })
    frontier_seed = pd.DataFrame(seeds)

    # --- robots fixtures (one per parser quirk) ---
    robots_rows = [
        # plain disallow-all: domain 1 is fully blocked
        {"domain": domains[1 % n], "status_code": 200,
         "body": "User-agent: *\nDisallow: /\n"},
        # empty Disallow value → blocks all at decision time (quirk :1520)
        {"domain": domains[2 % n], "status_code": 200,
         "body": "User-agent: *\nDisallow:\n"},
        # longest-match Allow beats Disallow for root? (Allow /, Disallow /x)
        {"domain": domains[3 % n], "status_code": 200,
         "body": "User-agent: *\nDisallow: /private\nAllow: /\n"},
        # exact-UA section (lowercased key never matches mixed-case UA quirk)
        {"domain": domains[4 % n], "status_code": 200,
         "body": "User-agent: WorldMapper/1.0 (compatible)\nDisallow: /\n"
                 "User-agent: *\nAllow: /\n"},
        # unknown directive resets agent list (quirk :1496-1498):
        # the Disallow after Crawl-delay applies to NO agent → allow
        {"domain": domains[5 % n], "status_code": 200,
         "body": "User-agent: *\nCrawl-delay: 10\nDisallow: /\n"},
        # 404 robots → allow
        {"domain": domains[6 % n], "status_code": 404, "body": None},
        # 500 robots → allow
        {"domain": domains[7 % n], "status_code": 500, "body": "oops"},
        # disallow a sub-path only (root allowed)
        {"domain": domains[8 % n], "status_code": 200,
         "body": "User-agent: *\nDisallow: /articles\n"},
    ]
    robots = pd.DataFrame(robots_rows)

    redirects = pd.DataFrame(redirect_rows).drop_duplicates(subset=["url"]) \
        if redirect_rows else pd.DataFrame(columns=["url", "final_url", "status_code"])

    # --- enrichment dims keyed to the first ~50 domains ---
    whois_rows, dns_rows, ssl_rows, geo_rows = [], [], [], []
    date_formats = ("2019-03-01", "2020-05-06 10:11:12", "07-Mar-2018", "bogus")
    for i, d in enumerate(domains[: min(50, n)]):
        ip = f"10.{(i * 13) % 256}.{(i * 7) % 256}.{(i * 3) % 254 + 1}"
        whois_rows.append({"domain": d,
                           "created_date_raw": date_formats[i % 4],
                           "expiry_date_raw": "2030-01-01",
                           "registrar": f"Registrar-{i % 5}"})
        dns_rows.append({"domain": d,
                         "nameservers": [f"ns1.{d}", f"ns2.{d}"] if i % 3 else None,
                         "ip_address": ip,
                         "asn": f"AS{64500 + i % 90}",
                         "asn_description": f"AS{64500 + i % 90} Example Carrier {i % 9}"})
        ssl_rows.append({"domain": d, "ssl_valid": bool(i % 4),
                         "ssl_expiry": (_BASE_TS + dt.timedelta(days=300 + i)).date()})
        geo_rows.append({"ip_address": ip,
                         "latitude": Decimal(str(round(-60 + (i * 2.5) % 120, 8))),
                         "longitude": Decimal(str(round(-170 + (i * 7.3) % 340, 8))),
                         "country": ["US", "DE", "FR", "JP", "BR"][i % 5],
                         "city": f"City{i % 23}"})
    # subdomain rows with null NS → parent fallback join (J4)
    for s in subdomains[:3]:
        dns_rows.append({"domain": s, "nameservers": None, "ip_address": None,
                         "asn": None, "asn_description": None})

    # --- flat URL/link tables for SQL-oracle-checkable filter queries ---
    raw_urls = []
    link_cand = []
    for i, d in enumerate(domains):
        raw_urls.append(f"http://{d}/path/page?utm_source=x#frag")
        raw_urls.append(f"https://www.{d}/a/b/")
        raw_urls.append(f"http://{d}")
        raw_urls.append(f"http://{d}/q?a=1&b=2")
        for href, text in adversarial_links(i, d):
            link_cand.append({"href": href, "link_text": text,
                              "src_domain": d, "pos": len(link_cand)})
    raw_urls_df = pd.DataFrame({"url": raw_urls})
    link_candidates = pd.DataFrame(link_cand)

    return {
        "whois_raw": generate_whois_raw(),
        "pages": pages,
        "frontier_seed": frontier_seed,
        "robots": robots,
        "redirects": redirects,
        "whois": pd.DataFrame(whois_rows),
        "dns": pd.DataFrame(dns_rows),
        "ssl": pd.DataFrame(ssl_rows),
        "geo": pd.DataFrame(geo_rows),
        "raw_urls": raw_urls_df,
        "link_candidates": link_candidates,
    }


_ARROW_SCHEMAS = {
    "pages": pa.schema([
        ("url", pa.string()), ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("html", pa.binary()), ("text", pa.string()), ("lang", pa.string()),
    ]),
    "frontier_seed": pa.schema([
        ("url", pa.string()), ("domain_name", pa.string()),
        ("source_domain", pa.string()), ("priority", pa.int32()),
        ("status", pa.string()), ("discovery_seq", pa.int64()),
        ("discovery_ts", pa.timestamp("us", tz="UTC")), ("depth", pa.int32()),
        ("error_message", pa.string()), ("processed_iteration", pa.int32()),
    ]),
    "robots": pa.schema([
        ("domain", pa.string()), ("status_code", pa.int32()), ("body", pa.string()),
    ]),
    "redirects": pa.schema([
        ("url", pa.string()), ("final_url", pa.string()), ("status_code", pa.int32()),
    ]),
    "whois": pa.schema([
        ("domain", pa.string()), ("created_date_raw", pa.string()),
        ("expiry_date_raw", pa.string()), ("registrar", pa.string()),
    ]),
    "dns": pa.schema([
        ("domain", pa.string()), ("nameservers", pa.list_(pa.string())),
        ("ip_address", pa.string()), ("asn", pa.string()),
        ("asn_description", pa.string()),
    ]),
    "ssl": pa.schema([
        ("domain", pa.string()), ("ssl_valid", pa.bool_()), ("ssl_expiry", pa.date32()),
    ]),
    "geo": pa.schema([
        ("ip_address", pa.string()), ("latitude", pa.decimal128(10, 8)),
        ("longitude", pa.decimal128(11, 8)), ("country", pa.string()),
        ("city", pa.string()),
    ]),
    "raw_urls": pa.schema([("url", pa.string())]),
    "link_candidates": pa.schema([
        ("href", pa.string()), ("link_text", pa.string()),
        ("src_domain", pa.string()), ("pos", pa.int64()),
    ]),
    "whois_raw": pa.schema([
        ("domain", pa.string()), ("whois_text", pa.string()),
    ]),
}


def generate_whois_raw(n: int = 60) -> "pd.DataFrame":
    """Raw WHOIS response texts for the C13 regex-alternation extractor
    (domain_collector.py:672-733).  Deterministic templates cycling every
    key variant, all three date formats, case quirks, the
    'Sponsoring Registrar' substring-precedence quirk, bogus dates and
    missing fields."""
    rows = []
    for i in range(n):
        d = f"whois-{i}.example"
        day = 1 + (i % 27)
        v = i % 8
        if v == 0:
            txt = (f"Domain Name: {d}\nRegistrar: Alpha Registrar {i}\n"
                   f"Creation Date: 2019-03-{day:02d}\n"
                   f"Registry Expiry Date: 2026-03-{day:02d}\n")
        elif v == 1:
            txt = (f"Registrar Name: Beta Names {i}\n"
                   f"Created: 2020-05-{day:02d} 10:11:12\n"
                   f"Expiration Date: 2027-01-{day:02d} 08:09:10\n")
        elif v == 2:
            txt = (f"Sponsoring Registrar: Gamma Corp {i}\n"
                   f"Created Date: {day:02d}-Mar-2018\n"
                   f"Expires: {day:02d}-Jan-2030\n")
        elif v == 3:
            # lower-case keys: re.IGNORECASE must still match
            txt = (f"registrar:   Spaced Reg {i}   \n"
                   f"creation date: 2021-07-{day:02d}\n"
                   f"registry expiry date: 2028-07-{day:02d}\n")
        elif v == 4:
            # no registrar line; bogus created date; valid expiry
            txt = (f"Domain: {d}\nCreation Date: sometime in 2019\n"
                   f"Expires: 2029-12-{day:02d}\n")
        elif v == 5:
            # 'Sponsoring Registrar:' line is ALSO matched by the plain
            # 'Registrar:' pattern (re.search substring quirk)
            txt = (f"Sponsoring Registrar: Delta Inc {i}\n"
                   f"Created: {day:02d}-Feb-2017\n")
        elif v == 6:
            txt = ""  # empty response
        else:
            txt = (f"% notice line\nRegistrar: Omega LLC {i}\n"
                   f"Registrar Name: ShouldNotWin\n"
                   f"Creation Date: 2022-11-{day:02d}\n"
                   f"Registry Expiry Date: 2030-11-{day:02d} 23:59:59\n"
                   f"Expires: 01-Jan-2031\n")
        rows.append({"domain": d, "whois_text": txt})
    return pd.DataFrame(rows)


def write_fixtures(out_dir: str, **kwargs) -> dict[str, str]:
    """Generate and write all fixture tables as parquet; returns paths."""
    os.makedirs(out_dir, exist_ok=True)
    tables = generate_fixtures(**kwargs)
    paths = {}
    for name, df in tables.items():
        schema = _ARROW_SCHEMAS[name]
        tbl = pa.Table.from_pandas(df, schema=schema, preserve_index=False)
        path = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(tbl, path)
        paths[name] = path
    return paths
