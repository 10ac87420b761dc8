"""robots.txt parsing + decision (SURVEY.md §2.8 U7).

Reproduces the reference's hand-rolled parser and longest-match logic
exactly, including its quirks:

- any directive other than user-agent/allow/disallow RESETS the current
  agent list (domain_collector.py:1496-1498),
- empty Disallow value is treated as '/' at decision time
  (domain_collector.py:1520-1521),
- longest matched rule wins; Allow wins only when the longest match is an
  Allow (domain_collector.py:1510-1535; ties: the FIRST rule reaching the
  max length wins because later equal-length rules fail the strict '>'),
- section lookup is rules.get(ua) + rules.get('*') where parsed agent
  names were lowercased but the configured UA is looked up verbatim
  (domain_collector.py:1556-1558) — so a mixed-case UA only ever matches
  the '*' section, exactly like the reference,
- non-200 robots status or missing robots → allow
  (domain_collector.py:1545-1547); parse errors → allow (:1562-1564).

Pure function + Arrow-vectorized pandas UDF wrapper.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F


def parse_robots(content: str) -> dict[str, list[tuple[str, str]]]:
    """domain_collector.py:1475-1499, verbatim semantics."""
    rules: dict[str, list[tuple[str, str]]] = {}
    current_agents: list[str] = []
    for line in content.split("\n"):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        if ":" not in line:
            continue
        directive, value = line.split(":", 1)
        directive = directive.strip().lower()
        value = value.strip()
        if directive == "user-agent":
            agent = value.lower()
            current_agents.append(agent)
            if agent not in rules:
                rules[agent] = []
        elif directive in ("disallow", "allow"):
            for agent in current_agents:
                rules.setdefault(agent, []).append((directive, value))
        else:
            current_agents = []
    return rules


def _path_matches(path: str, rule_value: str) -> bool:
    """domain_collector.py:1501-1508."""
    if not rule_value:
        return True
    if not rule_value.startswith("/"):
        rule_value = "/" + rule_value
    return path.startswith(rule_value)


def robots_decision(path: str, rules: list[tuple[str, str]]) -> bool:
    """domain_collector.py:1510-1535 — longest-match wins."""
    if not path.startswith("/"):
        path = "/" + path
    matched_type = None
    max_len = -1
    for rule_type, rule_value in rules:
        if not rule_value:
            rule_value = "/"
        if _path_matches(path, rule_value):
            if len(rule_value) > max_len:
                matched_type = rule_type
                max_len = len(rule_value)
    if matched_type is None:
        return True
    return matched_type == "allow"


def robots_allowed(body: str | None, status_code: int | None,
                   path: str, user_agent: str) -> bool:
    """Full decision incl. fetch-status handling
    (domain_collector.py:1537-1564)."""
    if status_code is None or status_code != 200 or body is None:
        return True
    try:
        rules = parse_robots(body)
        matched = rules.get(user_agent, []) + rules.get("*", [])
        return robots_decision(path, matched)
    except Exception:
        return True


def make_robots_udf(user_agent: str):
    """Arrow-vectorized (body, status_code, path) -> bool."""

    @F.pandas_udf("boolean")
    def robots_allowed_udf(body: pd.Series, status: pd.Series,
                           path: pd.Series) -> pd.Series:
        return pd.Series([
            robots_allowed(b, None if pd.isna(s) else int(s),
                           p if isinstance(p, str) else "/", user_agent)
            for b, s, p in zip(body, status, path)
        ])

    return robots_allowed_udf
