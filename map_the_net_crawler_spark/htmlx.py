"""Pure-Python HTML extraction — the semantics core of the extract UDF.

Reproduces what the reference computes with BeautifulSoup('html.parser')
(domain_collector.py:563-585 for title/description/favicon,
420-436 for meta keywords, 958-973 for links):

- title: text of the first <title>, stripped (None if no <title>)
- description: content of first <meta name="description">, else first
  <meta property="og:description">; missing content attr -> '' (the
  reference's ``.get('content', '').strip()``)
- favicon: href of first <link> whose rel tokens include 'icon'
  (covers rel="icon" and rel="shortcut icon"), resolved with
  urljoin(base_url, href)
- keywords: content of first <meta name="keywords">
- links: every <a> carrying a non-empty href, in document order, with
  its full descendant text (get_text()) stripped, plus the 0-based
  document position
- text: concatenation of every text node in document order with HTML
  character references decoded (bs4 ``soup.get_text()`` semantics,
  script/style included) — the byte-identical ``pages.text`` invariant
  (BASELINE.json input_hint).

Stdlib html.parser only (bs4/lxml are not available in this environment);
shared verbatim by the Arrow UDF (functions/extract.py) and the
sequential oracle (oracle/pyref.py), so both sides extract identically.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser
from urllib.parse import urljoin


@dataclass
class PageExtract:
    title: str | None = None
    description: str | None = None
    favicon_url: str | None = None
    meta_keywords: str | None = None
    text: str = ""
    links: list[tuple[int, str, str]] = field(default_factory=list)  # (pos, href, text)


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.text_parts: list[str] = []
        self.title_parts: list[str] | None = None
        self.in_title = False
        self.title_done = False
        self.meta_description: str | None = None
        self.og_description: str | None = None
        self.meta_keywords: str | None = None
        self.favicon_href: str | None = None
        # stack of open <a href> accumulators: (pos, href, [text parts])
        self.anchor_stack: list[tuple[int, str, list[str]]] = []
        self.links: list[tuple[int, str, str]] = []
        self._pos = 0

    def handle_starttag(self, tag, attrs):
        # attr-dict built only for the four tags that use it — this
        # method runs for EVERY tag in the document
        if tag not in ("title", "meta", "link", "a"):
            return
        a = dict(attrs)
        if tag == "title" and not self.title_done:
            self.in_title = True
            self.title_parts = []
        elif tag == "meta":
            name = a.get("name")
            prop = a.get("property")
            if name == "description" and self.meta_description is None:
                self.meta_description = a.get("content") or ""
            elif prop == "og:description" and self.og_description is None:
                self.og_description = a.get("content") or ""
            elif name == "keywords" and self.meta_keywords is None:
                self.meta_keywords = a.get("content") or ""
        elif tag == "link" and self.favicon_href is None:
            rel_tokens = (a.get("rel") or "").split()
            if "icon" in rel_tokens and a.get("href"):
                self.favicon_href = a["href"]
        elif tag == "a":
            href = a.get("href")
            if href is not None and href != "":
                self.anchor_stack.append((self._pos, href, []))
                self._pos += 1

    def handle_startendtag(self, tag, attrs):
        # <meta .../> / <link .../> self-closing forms
        self.handle_starttag(tag, attrs)
        if tag == "a":
            self.handle_endtag(tag)

    def handle_endtag(self, tag):
        if tag == "title" and self.in_title:
            self.in_title = False
            self.title_done = True
        elif tag == "a" and self.anchor_stack:
            pos, href, parts = self.anchor_stack.pop()
            self.links.append((pos, href, "".join(parts)))

    def handle_data(self, data):
        self.text_parts.append(data)
        if self.in_title and self.title_parts is not None:
            self.title_parts.append(data)
        for _, _, parts in self.anchor_stack:
            parts.append(data)

    def close(self):
        super().close()
        # unterminated anchors still yield their accumulated text
        while self.anchor_stack:
            pos, href, parts = self.anchor_stack.pop()
            self.links.append((pos, href, "".join(parts)))
        self.links.sort(key=lambda t: t[0])


def extract_page(html: bytes | str | None) -> PageExtract:
    """Extract title/description/favicon/keywords/text/links from HTML."""
    if html is None:
        return PageExtract()
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _Extractor()
    p.feed(html)
    p.close()
    title = "".join(p.title_parts).strip() if p.title_parts is not None else None
    desc = p.meta_description if p.meta_description is not None else p.og_description
    if desc is not None:
        desc = desc.strip()
    return PageExtract(
        title=title,
        description=desc,
        favicon_url=p.favicon_href,
        meta_keywords=p.meta_keywords,
        text="".join(p.text_parts),
        links=[(pos, href, text.strip()) for pos, href, text in p.links],
    )


def resolve_favicon(base_url: str, favicon_href: str | None) -> str | None:
    """urljoin as the reference does (domain_collector.py:585)."""
    if not favicon_href:
        return None
    return urljoin(base_url, favicon_href)
