"""Screenshot sink (SURVEY.md §2.1 S8; reference
domain_collector.py:885-919, default-off per reference config.py:36).

The reference captures a Selenium screenshot per domain and stores the
file path on the node row.  Spark-first shape: a ``mapInPandas``
sink-with-receipt — each executor partition renders its domains' images
and writes them straight to ``out_dir`` (object storage at scale), then
yields one manifest row per file (path, byte size, parsed dimensions),
so the commit point is a normal DataFrame the caller can join back onto
nodes.  No driver round-trip, no collect.

Selenium/Chromium is not available in this container, so the default
``capture`` is a DECLARED placeholder renderer: a deterministic, fully
valid grayscale PNG whose dimensions and pixels derive from the domain
name (md5), written with stdlib zlib/struct only.  Swapping in a real
browser capture changes no Spark code — inject ``capture=`` with any
``domain -> png bytes`` callable.
"""

from __future__ import annotations

import hashlib
import os
import struct
import zlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

MANIFEST_SCHEMA = ("domain_name string, path string, n_bytes int, "
                   "format string, width int, height int, ok boolean")


def placeholder_png(domain: str) -> bytes:
    """Deterministic valid PNG for ``domain``: width = len(domain)%8+4,
    height = ascii(first char)%8+4, pixels from the md5 stream."""
    width = len(domain) % 8 + 4
    height = (ord(domain[0]) if domain else 0) % 8 + 4
    seed = hashlib.md5(domain.encode()).digest()
    px = (seed * ((width * height) // len(seed) + 1))[: width * height]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + px[y * width:(y + 1) * width]
                   for y in range(height))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def screenshot_sink(nodes: DataFrame, out_dir: str,
                    capture: Callable[[str], bytes] | None = None
                    ) -> DataFrame:
    """Render + write one image per input domain; return the manifest.

    ``nodes`` needs a ``domain_name`` column.  Files land at
    ``out_dir/<domain>.png``; the manifest row re-sniffs the written
    bytes (functions/multimodal.sniff_media) so a corrupt render shows
    up as ok=false rather than a silent bad file.

    ``out_dir`` must be SHARED storage (object store / NFS) on a
    multi-node cluster — executors write the files, so manifest paths
    are only resolvable off-executor when the directory is shared.
    Domain names containing a path separator or ``..`` (which a valid
    domain never has, but untrusted frontier rows might) are rejected
    into ok=false manifest rows rather than escaping ``out_dir``."""
    from ..functions.multimodal import sniff_media
    cap = capture or placeholder_png

    def _unsafe(domain: str) -> bool:
        return (not domain or os.sep in domain
                or (os.altsep is not None and os.altsep in domain)
                or "/" in domain or ".." in domain)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        os.makedirs(out_dir, exist_ok=True)
        for pdf in batches:
            out = []
            for domain in pdf["domain_name"]:
                if _unsafe(domain):
                    out.append((domain, None, None, None, None, None,
                                False))
                    continue
                path = os.path.join(out_dir, f"{domain}.png")
                try:
                    blob = cap(domain)
                    tmp = f"{path}.tmp{os.getpid()}"
                    with open(tmp, "wb") as f:
                        f.write(blob)
                    os.replace(tmp, path)
                    info = sniff_media(blob) or {}
                    out.append((domain, path, len(blob),
                                info.get("format"), info.get("width"),
                                info.get("height"),
                                info.get("format") == "png"))
                except OSError:
                    out.append((domain, path, None, None, None, None,
                                False))
            yield pd.DataFrame(out, columns=["domain_name", "path",
                                             "n_bytes", "format", "width",
                                             "height", "ok"])

    return (nodes.select("domain_name").distinct()
            .repartition("domain_name")
            .mapInPandas(run, schema=MANIFEST_SCHEMA))
