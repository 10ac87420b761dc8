"""Sequential pure-Python reference oracle (SURVEY.md §5.2).

A dict/set re-statement of the reference crawler's control flow —
``process_queue`` (domain_collector.py:1350-1412) driving
``collect_domain_data`` (:238-549) and
``_collect_relationships_and_discover`` (:921-1303) — with MySQL replaced
by in-memory dicts and HTTP/DNS/WHOIS replaced by the fixture snapshot
tables.  The Spark engine must reproduce this oracle's crawl order,
URL-seen set, node rows, edge rows and frontier evolution bit-for-bit.

Fidelity notes (each mirrors a cited reference behavior):
- the crawler always fetches the domain ROOT page
  (url = f"http://{domain_name}", :944-948) — queue URLs beyond the root
  re-crawl the root;
- url_processing_history is keyed by that root URL with ON DUPLICATE
  update (database.py:508-531), so the per-domain history count is 0/1;
- enqueue skips URLs that ever existed in the queue (UNIQUE url +
  is_url_in_queue on pending/processing + ON-DUP absorb: database.py:119,
  477-492, 312-334) — completed rows never resurrect;
- within one claimed batch, items are processed sequentially: earlier
  items' history/nodes are visible to later items' gates
  (quota :1398-1403, whois-copy :459-478);
- claim order is (priority DESC, discovery_seq ASC) — discovery_seq is
  the deterministic stand-in for MySQL's auto-increment insertion order
  that broke ORDER BY ties (database.py:360-367).
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field

import pandas as pd

from ..config import CrawlConfig
from ..functions.robots import robots_allowed
from ..htmlx import extract_page, resolve_favicon
from ..psl import extract as psl_extract
from ..psl import naive_main_domain
from ..rules import (
    DOMAIN_FORMAT_REGEX,
    EXCLUDED_EXTENSIONS,
    EXCLUDED_PATTERNS,
    MAX_PATH_SEGMENTS,
    MAX_QUERY_PARAMS,
    MAX_URL_LENGTH,
    MIN_LINK_TEXT_LEN,
    NON_CONTENT_FIRST_SEGMENTS,
    NON_CONTENT_LINK_TEXTS,
    TRACKING_PARAM_SUBSTRINGS,
    categorize,
    derive_tags,
)
from ..urlkit import clean_url_for_queue, parse_href

import re

_EXCLUDED_RE = [re.compile(p, re.IGNORECASE) for p in EXCLUDED_PATTERNS]
_DOMAIN_RE = re.compile(DOMAIN_FORMAT_REGEX)


def should_exclude_url(href: str, link_text: str) -> str | None:
    """_should_exclude_url (domain_collector.py:144-203); returns reason."""
    p = parse_href(href)
    if not p["netloc"]:
        return "no_domain"
    path = p["path"].lower()
    if any(path.endswith(e) for e in EXCLUDED_EXTENSIONS):
        return "excluded_extension"
    full = href.lower()
    if any(r.search(full) for r in _EXCLUDED_RE):
        return "excluded_pattern"
    if p["query"]:
        if p["n_query_params"] > MAX_QUERY_PARAMS:
            return "too_many_query_params"
        for name in p["param_names"]:
            if any(t in name.lower() for t in TRACKING_PARAM_SUBSTRINGS):
                return "tracking_parameter"
    if len(href) > MAX_URL_LENGTH:
        return "url_too_long"
    segs = [s for s in p["path"].split("/") if s]
    if len(segs) > MAX_PATH_SEGMENTS:
        return "too_many_path_segments"
    if segs and segs[0].lower() in NON_CONTENT_FIRST_SEGMENTS:
        return "non_content_path"
    if not link_text or len(link_text.strip()) < MIN_LINK_TEXT_LEN:
        return "short_link_text"
    if link_text.lower().strip() in NON_CONTENT_LINK_TEXTS:
        return "non_content_link_text"
    return None


def should_exclude_domain(domain: str) -> bool:
    """_should_exclude_domain (domain_collector.py:126-142)."""
    if not domain:
        return True
    d = domain.lower()
    return any(r.search(d) for r in _EXCLUDED_RE)


def is_valid_domain(domain: str) -> bool:
    """_is_valid_domain (domain_collector.py:1305-1312)."""
    return bool(domain) and bool(_DOMAIN_RE.match(domain))


@dataclass
class OracleState:
    queue: dict[str, dict] = field(default_factory=dict)       # url -> row
    seen: dict[str, dict] = field(default_factory=dict)        # url -> history row
    nodes: dict[str, dict] = field(default_factory=dict)       # domain -> node
    edges: dict[tuple, dict] = field(default_factory=dict)     # (src,dst,type) -> attrs
    crawl_order: list[tuple[int, int, str]] = field(default_factory=list)
    metrics: list[dict] = field(default_factory=list)
    next_seq: int = 0


_NODE_FIELDS = (
    "title", "description", "favicon_url", "created_date", "expiry_date",
    "registrar", "nameservers", "asn", "asn_description", "ssl_valid",
    "ssl_expiry", "country", "ip_address", "latitude", "longitude",
    "category", "tags",
)


def _normalize_date(val) -> dt.date | None:
    """database.py:177-192."""
    if val is None or (isinstance(val, float) and pd.isna(val)):
        return None
    if isinstance(val, dt.datetime):
        return val.date()
    if isinstance(val, dt.date):
        return val
    if isinstance(val, str):
        for fmt in ("%Y-%m-%d", "%Y-%m-%d %H:%M:%S", "%d-%b-%Y"):
            try:
                return dt.datetime.strptime(val, fmt).date()
            except ValueError:
                continue
    return None


class ReferenceOracle:
    def __init__(self, fixtures: dict[str, pd.DataFrame],
                 config: CrawlConfig | None = None,
                 enrich: bool = True):
        self.cfg = config or CrawlConfig()
        self.enrich = enrich
        self.pages = {r.url: r for r in fixtures["pages"].itertuples()}
        self.robots = {r.domain: r for r in fixtures["robots"].itertuples()}
        self.redirects = {r.url: r for r in fixtures["redirects"].itertuples()}
        self.whois = ({r.domain: r for r in fixtures["whois"].itertuples()}
                      if "whois" in fixtures else {})
        self.dns = ({r.domain: r for r in fixtures["dns"].itertuples()}
                    if "dns" in fixtures else {})
        self.ssl = ({r.domain: r for r in fixtures["ssl"].itertuples()}
                    if "ssl" in fixtures else {})
        self.geo = ({r.ip_address: r for r in fixtures["geo"].itertuples()}
                    if "geo" in fixtures else {})
        self.st = OracleState()
        for r in fixtures["frontier_seed"].sort_values("discovery_seq").itertuples():
            self.st.queue[r.url] = {
                "url": r.url, "domain_name": r.domain_name,
                "source_domain": r.source_domain, "priority": int(r.priority),
                "status": "pending", "discovery_seq": int(r.discovery_seq),
                "depth": int(r.depth), "error_message": None,
                "processed_iteration": None,
            }
            self.st.next_seq = max(self.st.next_seq, int(r.discovery_seq) + 1)

    # --- gates -----------------------------------------------------------

    def _domain_history_count(self, domain: str) -> int:
        """database.py:533-545 — COUNT(*) history rows for the domain."""
        return sum(1 for h in self.st.seen.values() if h["domain_name"] == domain)

    def _robots_allows(self, domain: str, path: str = "/") -> bool:
        if not self.cfg.respect_robots_txt:
            return True
        r = self.robots.get(domain)
        if r is None:
            return True  # fetch error/missing → allow (:1545-1547, 1562-1564)
        return robots_allowed(r.body, int(r.status_code), path,
                              self.cfg.http_user_agent)

    # --- node helpers ------------------------------------------------------

    def _insert_domain(self, domain: str, data: dict) -> None:
        """insert_domain last-writer-wins upsert (database.py:194-244)."""
        node = self.st.nodes.setdefault(domain, {"domain_name": domain})
        for f in _NODE_FIELDS:
            node[f] = data.get(f)

    def _get_or_create_minimal(self, domain: str) -> None:
        """get_domain_id + minimal insert (domain_collector.py:1065-1069)."""
        if domain not in self.st.nodes:
            node = {"domain_name": domain}
            for f in _NODE_FIELDS:
                node[f] = None
            self.st.nodes[domain] = node

    def _is_complete(self, domain: str) -> bool:
        """is_domain_data_complete (database.py:663-687)."""
        node = self.st.nodes.get(domain)
        if not node:
            return False
        return all(node.get(f) is not None
                   for f in ("title", "description", "ip_address"))

    # --- enrichment (fixture-snapshot stand-ins for S4-S7) ----------------

    def _enrich(self, domain: str, data: dict) -> None:
        if not self.enrich:
            return
        # WHOIS (domain_collector.py:453-478): only naive main domains query;
        # subdomains copy from the main domain's *node* if present.
        main = naive_main_domain(domain)
        if main == domain:
            w = self.whois.get(domain)
            if w is not None:
                data["created_date"] = _normalize_date(w.created_date_raw)
                data["expiry_date"] = _normalize_date(w.expiry_date_raw)
                data["registrar"] = w.registrar if isinstance(w.registrar, str) else None
        else:
            parent = self.st.nodes.get(main)
            if parent:
                data["created_date"] = parent.get("created_date")
                data["expiry_date"] = parent.get("expiry_date")
                data["registrar"] = parent.get("registrar")
        # DNS (:741-798): NS for the domain, parent fallback when absent
        d = self.dns.get(domain)
        ns = list(d.nameservers) if d is not None and d.nameservers is not None else None
        if ns is None and main != domain:
            pd_ = self.dns.get(main)
            if pd_ is not None and pd_.nameservers is not None:
                ns = list(pd_.nameservers)
        data["nameservers"] = ns
        if d is not None:
            data["asn"] = d.asn if isinstance(d.asn, str) else None
            data["asn_description"] = (d.asn_description
                                       if isinstance(d.asn_description, str) else None)
        # SSL (:816-841): connection failure → ssl_valid False
        s = self.ssl.get(domain)
        if s is not None:
            data["ssl_valid"] = bool(s.ssl_valid)
            data["ssl_expiry"] = s.ssl_expiry
        else:
            data["ssl_valid"] = False
            data["ssl_expiry"] = None
        # GEO (:843-883): ip from resolver (dns snapshot), then city lookup
        ip = d.ip_address if d is not None and isinstance(d.ip_address, str) else None
        if ip:
            data["ip_address"] = ip
            g = self.geo.get(ip)
            if g is not None:
                data["latitude"] = g.latitude
                data["longitude"] = g.longitude
                data["country"] = g.country
        # city is collected by the reference but not stored in domains DDL

    # --- the per-item pipeline --------------------------------------------

    def _collect_relationships_and_discover(self, domain: str):
        """domain_collector.py:921-1303."""
        relationships: list[dict] = []
        discovered: list[dict] = []
        if not self._robots_allows(domain):
            return relationships, discovered, False  # no history record (:938-941)
        root_url = f"http://{domain}"
        page = self.pages.get(root_url)
        if page is None or page.html is None:
            self.st.seen[root_url] = {"url": root_url, "domain_name": domain,
                                      "status": "failed", "links_found": 0}
            return relationships, discovered, True
        ex = extract_page(bytes(page.html))

        valid_internal, valid_external = [], []
        for pos, href, text in ex.links:
            if should_exclude_url(href, text) is not None:
                continue
            p = parse_href(href)
            target = p["target_domain"]
            if not target:
                continue
            if not is_valid_domain(target):
                continue
            entry = {"href": href, "link_text": text, "domain": target, "pos": pos}
            (valid_internal if target == domain else valid_external).append(entry)

        max_internal = self.cfg.max_internal_links
        max_external = self.cfg.max_external_links

        def probe_redirect(href: str, target: str):
            """HEAD probe against the redirects snapshot (:1088-1113)."""
            if href.startswith("#") or href.lower().startswith("mailto:"):
                return None
            r = self.redirects.get(href)
            if r is None:
                return None
            final = parse_href(r.final_url)["target_domain"] if r.final_url else ""
            orig = parse_href(href)
            final_scheme = parse_href(r.final_url)["scheme"] if r.final_url else ""
            protocol_only = (final == orig["target_domain"]
                             and orig["scheme"] != final_scheme)
            if (r.status_code is not None and 300 <= int(r.status_code) < 400
                    and final and final != target and not protocol_only):
                return final
            return None

        def add_edge(src, dst, rel_type, text, href):
            self.st.edges[(src, dst, rel_type)] = {"link_text": text, "link_url": href}

        def process(entries, is_internal: bool):
            added = 0
            cap = max_internal if is_internal else max_external
            dedup: set[str] = set()
            for e in entries:
                if added >= cap:
                    break
                href, text, target = e["href"], e["link_text"], e["domain"]
                key = clean_url_for_queue(href) if is_internal else target
                if key in dedup:
                    continue
                dedup.add(key)
                if self._domain_history_count(target) >= self.cfg.max_urls_per_domain:
                    continue
                if should_exclude_domain(target):
                    continue
                self._get_or_create_minimal(target)
                # relationship typing (:1072-1135)
                rel_type = "link"
                es, et = psl_extract(domain), psl_extract(target)
                if (es.domain == et.domain and es.suffix == et.suffix
                        and es.subdomain == "" and et.subdomain != ""):
                    rel_type = "subdomain"
                else:
                    final = probe_redirect(href, target)
                    if final is not None:
                        rel_type = "redirect"
                        if should_exclude_domain(final):
                            continue  # skips main edge + discovery (:1110-1113)
                        self._get_or_create_minimal(final)
                        add_edge(domain, final, "redirect", text, href)
                        relationships.append({"source": domain, "target": final,
                                              "type": "redirect"})
                add_edge(domain, target, rel_type, text, href)
                relationships.append({"source": domain, "target": target,
                                      "type": rel_type})
                discovered.append({"url": clean_url_for_queue(href),
                                   "domain": target})
                added += 1

        process(valid_internal, True)
        process(valid_external, False)

        self.st.seen[root_url] = {"url": root_url, "domain_name": domain,
                                  "status": "success",
                                  "links_found": len(relationships)}
        return relationships, discovered, True

    def _add_discovered(self, discovered: list[dict], depth: int) -> int:
        """add_discovered_urls_to_queue (domain_collector.py:1314-1348)."""
        added = 0
        for d in discovered:
            url = d["url"]
            if url in self.st.queue:   # UNIQUE url — never resurrects
                continue
            if self._domain_history_count(d["domain"]) >= self.cfg.max_urls_per_domain:
                continue
            self.st.queue[url] = {
                "url": url, "domain_name": d["domain"], "source_domain": None,
                "priority": 1, "status": "pending",
                "discovery_seq": self.st.next_seq, "depth": depth,
                "error_message": None, "processed_iteration": None,
            }
            self.st.next_seq += 1
            added += 1
        return added

    def _collect_domain_data(self, domain: str, depth: int, iteration: int):
        """collect_domain_data (domain_collector.py:238-549)."""
        if self._is_complete(domain):
            rels, disc, _ = self._collect_relationships_and_discover(domain)
            self._add_discovered(disc, depth + 1)
            self.st.metrics.append({"iteration": iteration, "domain_name": domain,
                                    "status": "completed",
                                    "relationships_found": len(rels),
                                    "urls_discovered": len(disc)})
            return

        data: dict = {f: None for f in _NODE_FIELDS}
        page = self.pages.get(f"http://{domain}")
        if self._robots_allows(domain, "/") and page is not None and page.html is not None:
            ex = extract_page(bytes(page.html))
            data["title"] = ex.title
            data["description"] = ex.description
            data["favicon_url"] = resolve_favicon(f"http://{domain}", ex.favicon_url)
        # category/tags (:318-451) — keywords fetch ignores robots (quirk)
        kw = None
        if page is not None and page.html is not None:
            kw = extract_page(bytes(page.html)).meta_keywords
        category = categorize(data["title"], data["description"], domain)
        data["category"] = category
        data["tags"] = derive_tags(kw, domain, category)
        self._enrich(domain, data)
        self._insert_domain(domain, data)
        rels, disc, _ = self._collect_relationships_and_discover(domain)
        self._add_discovered(disc, depth + 1)
        self.st.metrics.append({"iteration": iteration, "domain_name": domain,
                                "status": "completed",
                                "relationships_found": len(rels),
                                "urls_discovered": len(disc)})

    # --- the driver loop ---------------------------------------------------

    def claim(self) -> list[dict]:
        pending = [q for q in self.st.queue.values() if q["status"] == "pending"]
        pending.sort(key=lambda q: (-q["priority"], q["discovery_seq"]))
        return pending[: self.cfg.max_items]

    def run(self, max_iterations: int = 100) -> OracleState:
        for iteration in range(1, max_iterations + 1):
            batch = self.claim()
            if not batch:
                break
            for rank, item in enumerate(batch, start=1):
                url, domain, depth = item["url"], item["domain_name"], item["depth"]
                self.st.crawl_order.append((iteration, rank, url))
                if depth >= self.cfg.max_depth:   # :1386-1390 (>= canonical)
                    item["status"] = "skipped"
                    item["error_message"] = "Max depth reached"
                    item["processed_iteration"] = iteration
                    continue
                if self._domain_history_count(domain) >= self.cfg.max_urls_per_domain:
                    item["status"] = "skipped"
                    item["error_message"] = "Domain processing limit reached"
                    item["processed_iteration"] = iteration
                    continue
                self._collect_domain_data(domain, depth, iteration)
                item["status"] = "completed"
                item["processed_iteration"] = iteration
        return self.st
