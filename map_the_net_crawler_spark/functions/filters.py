"""The URL-exclusion filter pipeline (SURVEY.md §2.2, F1-F10) as Column
expressions — reference ``_should_exclude_url`` (domain_collector.py:144-203)
and ``_should_exclude_domain`` (domain_collector.py:126-142).

Everything here is whole-stage-codegen'd JVM expressions; the only Python
that ever touched these rows is the one Arrow extract UDF that parsed the
hrefs.  Filter order matters for the exclusion *reason* (first match wins,
like the reference's early returns); any reason excludes.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

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
)

# One combined alternation per rule family — Catalyst evaluates a single
# compiled Java regex instead of 30 sequential rlikes.
_EXT_RE = "(?:" + "|".join(re.escape(e) for e in EXCLUDED_EXTENSIONS) + ")$"
_PATTERN_RE = "|".join(f"(?:{p})" for p in EXCLUDED_PATTERNS)
_TRACKING_RE = "|".join(re.escape(t) for t in TRACKING_PARAM_SUBSTRINGS)


def _strip(c: Column) -> Column:
    """Python str.strip() equivalent (Spark trim() is space-only)."""
    return F.regexp_replace(c, r"^\s+|\s+$", "")


def path_segments(path: Column) -> Column:
    """Non-empty '/'-separated path segments (domain_collector.py:182)."""
    return F.filter(F.split(F.coalesce(path, F.lit("")), "/"), lambda s: s != "")


def url_exclusion_reason(
    href: Column,
    link_text: Column,
    href_netloc: Column,
    href_path: Column,
    n_query_params: Column,
    param_names: Column,
) -> Column:
    """First-matching exclusion reason, or NULL when the link survives.

    Mirrors the early-return order of _should_exclude_url
    (domain_collector.py:144-203).
    """
    lower_url = F.lower(href)
    lower_path = F.lower(F.coalesce(href_path, F.lit("")))
    segs = path_segments(href_path)
    first_seg = F.lower(F.element_at(segs, 1))
    text = F.coalesce(link_text, F.lit(""))

    return (
        # F1 — no netloc (relative/javascript/mailto), :148-151
        F.when(F.coalesce(href_netloc, F.lit("")) == "", F.lit("no_domain"))
        # F2 — excluded extension on lowercased path, :153-157
        .when(lower_path.rlike(_EXT_RE), F.lit("excluded_extension"))
        # F3 — excluded pattern over lowercased full url, :159-163
        .when(lower_url.rlike(_PATTERN_RE), F.lit("excluded_pattern"))
        # F4 — too many query params, :166-169 (parse_qs drops blank values;
        # n_query_params was computed with parse_qs inside the extract UDF)
        .when(F.coalesce(n_query_params, F.lit(0)) > MAX_QUERY_PARAMS,
              F.lit("too_many_query_params"))
        # F5 — tracking param name substring, :171-175
        .when(F.exists(F.coalesce(param_names, F.array()),
                       lambda k: F.lower(k).rlike(_TRACKING_RE)),
              F.lit("tracking_parameter"))
        # F6 — url too long, :177-179
        .when(F.length(href) > MAX_URL_LENGTH, F.lit("url_too_long"))
        # F7 — too many path segments, :181-184
        .when(F.size(segs) > MAX_PATH_SEGMENTS, F.lit("too_many_path_segments"))
        # F8 — non-content first segment, :186-191
        .when((F.size(segs) > 0) & first_seg.isin(*NON_CONTENT_FIRST_SEGMENTS),
              F.lit("non_content_path"))
        # F9a — empty/short link text, :193-195
        .when(F.length(_strip(text)) < MIN_LINK_TEXT_LEN, F.lit("short_link_text"))
        # F9b — boilerplate link text, :197-200
        .when(F.lower(_strip(text)).isin(*NON_CONTENT_LINK_TEXTS),
              F.lit("non_content_link_text"))
        .otherwise(F.lit(None).cast("string"))
    )


def domain_excluded(domain: Column) -> Column:
    """_should_exclude_domain (domain_collector.py:126-142): empty domain or
    any excluded pattern matching the lowercased domain."""
    d = F.coalesce(domain, F.lit(""))
    return (d == "") | F.lower(d).rlike(_PATTERN_RE)


def domain_format_valid(domain: Column) -> Column:
    """_is_valid_domain RFC-952-ish regex (domain_collector.py:1305-1312)."""
    return F.coalesce(domain, F.lit("")).rlike(DOMAIN_FORMAT_REGEX)
