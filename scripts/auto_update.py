"""Self-update decision engine for a deployed crawler (reference:
auto_update.py:31-243).

The reference couples three concerns: (1) DECIDING whether an update
applies (git HEAD divergence / release-tag comparison / keyword gates /
asset selection / protected-file sync planning), (2) EXECUTING it
(git pull, HTTP download, file sync), and (3) restarting the process.
Only (1) has testable semantics; (2)-(3) are environment side effects a
Spark deployment replaces with its own submit machinery (a new
`spark-submit` of the updated package).  This module re-expresses the
decision layer as pure functions, and the execution layer as injected
callables so the default import performs no subprocess/network I/O:

- ``get_restart_args``       — auto_update.py:31-33 (drop --add-seeds)
- ``decide_git_update``      — auto_update.py:85-131 (dirty-tree skip,
                               HEAD vs upstream comparison)
- ``normalize_version``      — auto_update.py:181-183 (v-prefix strip)
- ``pick_release``           — auto_update.py:151-173 (latest stable,
                               or newest by published_at incl. pre)
- ``release_keyword_gate``   — auto_update.py:176-180 (only_on_release
                               + release_keywords name filter)
- ``pick_asset``             — auto_update.py:186-201 (.zip first, then
                               .tar.gz, then zipball/tarball fallback)
- ``plan_sync``              — auto_update.py:20,225-239 (sync every
                               extracted item except PROTECTED_FILES)
- ``check_for_update``       — auto_update.py:70-80 dispatch, with the
                               apply/restart steps injected
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Sequence

# reference auto_update.py:20 — never overwritten by an update
PROTECTED_FILES = {".env", ".venv", "local_settings.py"}


def get_restart_args(argv: Sequence[str]) -> list[str]:
    """Restart args exclude --add-seeds (a restart must not re-ingest
    the seed list; auto_update.py:31-33)."""
    return [a for a in argv if not a.startswith("--add-seeds")]


def decide_git_update(local_head: str, remote_head: str,
                      dirty: bool) -> str:
    """Git deployment decision (auto_update.py:85-131):
    'skip_dirty' when the working tree has local changes, 'update' when
    local and upstream HEADs differ, else 'up_to_date'."""
    if dirty:
        return "skip_dirty"
    return "update" if local_head != remote_head else "up_to_date"


def normalize_version(ver: str | None) -> str:
    """v/V prefix strip (auto_update.py:181-183)."""
    return ver.lstrip("vV") if ver else ""


def pick_release(releases: list[dict],
                 include_prereleases: bool) -> dict | None:
    """Release selection (auto_update.py:151-173): with pre-releases,
    the newest by published_at across ALL releases; without, the entry
    flagged latest-stable (the /releases/latest endpoint's answer —
    modeled as the newest non-prerelease)."""
    if not releases:
        return None
    if include_prereleases:
        return sorted(releases, key=lambda r: r.get("published_at", ""),
                      reverse=True)[0]
    stable = [r for r in releases if not r.get("prerelease", False)]
    if not stable:
        return None
    return sorted(stable, key=lambda r: r.get("published_at", ""),
                  reverse=True)[0]


def release_keyword_gate(release_name: str, keywords: Sequence[str],
                         only_on_release: bool) -> bool:
    """True when the release may be applied (auto_update.py:176-180):
    the keyword filter only engages when only_on_release is set AND the
    keyword list is non-empty."""
    if not only_on_release or not keywords:
        return True
    return any(kw in release_name for kw in keywords)


def pick_asset(assets: list[dict], zipball_url: str | None = None,
               tarball_url: str | None = None) -> str | None:
    """Asset preference (auto_update.py:186-201): first .zip asset,
    else first .tar.gz asset, else the release zipball/tarball."""
    for asset in assets:
        if asset.get("name", "").endswith(".zip"):
            return asset["browser_download_url"]
    for asset in assets:
        if asset.get("name", "").endswith(".tar.gz"):
            return asset["browser_download_url"]
    return zipball_url or tarball_url


def plan_sync(extracted_items: Sequence[str],
              protected: set[str] = PROTECTED_FILES
              ) -> tuple[list[str], list[str]]:
    """(sync, skipped) partition of the extracted release's top-level
    entries (auto_update.py:225-239): protected files/dirs survive the
    update, everything else is replaced."""
    sync = [x for x in extracted_items if x not in protected]
    skipped = [x for x in extracted_items if x in protected]
    return sync, skipped


@dataclass
class AutoUpdate:
    """Decision-complete stand-in for the reference daemon
    (auto_update.py:35-251).  ``apply`` and ``restart`` are injected;
    the defaults RECORD the decision (a restart marker a supervisor—
    systemd / the Spark submit wrapper—acts on) instead of mutating the
    deployment in-process."""

    config: dict
    current_version: str
    apply: Callable[[str], None] = lambda ref: None
    restart: Callable[[], None] = lambda: None
    log: list[str] = field(default_factory=list)

    def check_git(self, local_head: str, remote_head: str,
                  dirty: bool) -> str:
        if not self.config.get("enabled", True):
            self.log.append("disabled")
            return "disabled"
        decision = decide_git_update(local_head, remote_head, dirty)
        self.log.append(f"git:{decision}")
        if decision == "update":
            self.apply(remote_head)
            self.restart()
        return decision

    def check_for_update(self, is_git_repo: bool, *, git_state=None,
                         releases=None) -> str:
        """Deployment dispatch (auto_update.py:70-80): a git checkout
        updates via HEAD comparison, anything else via GitHub releases.
        ``git_state`` is (local_head, remote_head, dirty)."""
        if not self.config.get("enabled", True):
            self.log.append("disabled")
            return "disabled"
        if is_git_repo:
            return self.check_git(*(git_state or ("", "", False)))
        return self.check_release(releases or [])

    def check_release(self, releases: list[dict]) -> str:
        if not self.config.get("enabled", True):
            self.log.append("disabled")
            return "disabled"
        rel = pick_release(releases,
                           self.config.get("include_prereleases", False))
        if rel is None:
            self.log.append("release:none")
            return "none"
        if not release_keyword_gate(
                rel.get("name", ""),
                self.config.get("release_keywords", []),
                self.config.get("only_on_release", False)):
            self.log.append("release:keyword_skip")
            return "keyword_skip"
        tag = rel.get("tag_name", "")
        if not tag or normalize_version(tag) == \
                normalize_version(self.current_version):
            self.log.append("release:up_to_date")
            return "up_to_date"
        url = pick_asset(rel.get("assets", []), rel.get("zipball_url"),
                         rel.get("tarball_url"))
        if url is None:
            self.log.append("release:no_asset")
            return "no_asset"
        self.log.append(f"release:update:{tag}")
        self.apply(url)
        self.restart()
        return "update"
