"""Auto-update decision engine vs reference semantics
(reference: auto_update.py:20-251).

Pure-Python tests — no Spark session.  Each case pins a branch of the
reference daemon's decision logic: restart-arg filtering, git HEAD
comparison with dirty-tree skip, release selection (stable vs
pre-release), the only_on_release keyword gate, v-prefix version
normalization, asset preference order, and the protected-file sync
plan.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

from auto_update import (  # noqa: E402
    PROTECTED_FILES,
    AutoUpdate,
    decide_git_update,
    get_restart_args,
    normalize_version,
    pick_asset,
    pick_release,
    plan_sync,
    release_keyword_gate,
)


# ---- restart args (auto_update.py:31-33) -----------------------------

def test_restart_args_drop_add_seeds():
    argv = ["--workers", "4", "--add-seeds", "seeds.txt", "--verbose",
            "--add-seeds=more.txt"]
    assert get_restart_args(argv) == ["--workers", "4", "seeds.txt",
                                      "--verbose"]


def test_restart_args_passthrough():
    assert get_restart_args(["--a", "--b"]) == ["--a", "--b"]


# ---- git decision (auto_update.py:85-131) ----------------------------

def test_git_dirty_tree_skips_even_when_behind():
    assert decide_git_update("aaa", "bbb", dirty=True) == "skip_dirty"


def test_git_update_on_head_divergence():
    assert decide_git_update("aaa", "bbb", dirty=False) == "update"


def test_git_up_to_date():
    assert decide_git_update("aaa", "aaa", dirty=False) == "up_to_date"


# ---- version normalization (auto_update.py:181-183) ------------------

def test_normalize_version_strips_v_prefix():
    assert normalize_version("v1.2.3") == "1.2.3"
    assert normalize_version("V1.2.3") == "1.2.3"
    assert normalize_version("1.2.3") == "1.2.3"
    assert normalize_version(None) == ""
    # lstrip semantics, faithfully: every leading v/V goes
    assert normalize_version("vv2") == "2"


# ---- release selection (auto_update.py:151-173) ----------------------

RELEASES = [
    {"name": "alpha", "tag_name": "v2.0.0-rc1", "prerelease": True,
     "published_at": "2025-03-01T00:00:00Z"},
    {"name": "stable old", "tag_name": "v1.0.0", "prerelease": False,
     "published_at": "2025-01-01T00:00:00Z"},
    {"name": "stable new", "tag_name": "v1.5.0", "prerelease": False,
     "published_at": "2025-02-01T00:00:00Z"},
]


def test_pick_release_stable_only():
    rel = pick_release(RELEASES, include_prereleases=False)
    assert rel["tag_name"] == "v1.5.0"


def test_pick_release_with_prereleases_takes_newest_published():
    rel = pick_release(RELEASES, include_prereleases=True)
    assert rel["tag_name"] == "v2.0.0-rc1"


def test_pick_release_empty_and_all_prerelease():
    assert pick_release([], include_prereleases=False) is None
    pre_only = [r for r in RELEASES if r["prerelease"]]
    assert pick_release(pre_only, include_prereleases=False) is None
    assert pick_release(pre_only, include_prereleases=True) is not None


# ---- keyword gate (auto_update.py:176-180) ---------------------------

def test_keyword_gate_only_engages_with_flag_and_keywords():
    # flag off -> always pass
    assert release_keyword_gate("anything", ["deploy"], False)
    # flag on but empty keyword list -> pass (reference's `and keywords`)
    assert release_keyword_gate("anything", [], True)
    # flag on, keyword present -> pass; absent -> block
    assert release_keyword_gate("deploy v2", ["deploy"], True)
    assert not release_keyword_gate("hotfix v2", ["deploy"], True)


# ---- asset preference (auto_update.py:186-201) -----------------------

def test_pick_asset_prefers_zip_then_targz_then_ball():
    assets = [
        {"name": "notes.txt", "browser_download_url": "u0"},
        {"name": "pkg.tar.gz", "browser_download_url": "u1"},
        {"name": "pkg.zip", "browser_download_url": "u2"},
    ]
    assert pick_asset(assets) == "u2"
    assert pick_asset(assets[:2]) == "u1"
    assert pick_asset([assets[0]], zipball_url="zb") == "zb"
    assert pick_asset([], zipball_url=None, tarball_url="tb") == "tb"
    assert pick_asset([]) is None


# ---- sync plan (auto_update.py:20,225-239) ---------------------------

def test_plan_sync_protects_env_and_venv():
    items = ["src", ".env", "README.md", ".venv", "local_settings.py"]
    sync, skipped = plan_sync(items)
    assert sync == ["src", "README.md"]
    assert set(skipped) == PROTECTED_FILES


# ---- daemon state machine (auto_update.py:35-251) --------------------

def _daemon(config=None, version="v1.5.0"):
    applied, restarted = [], []
    d = AutoUpdate(config=config or {}, current_version=version,
                   apply=applied.append,
                   restart=lambda: restarted.append(True))
    return d, applied, restarted


def test_disabled_config_short_circuits_everything():
    d, applied, restarted = _daemon({"enabled": False})
    assert d.check_git("a", "b", False) == "disabled"
    assert d.check_release(RELEASES) == "disabled"
    assert d.check_for_update(True, git_state=("a", "b", False)) == \
        "disabled"
    assert not applied and not restarted


def test_git_flow_applies_and_restarts():
    d, applied, restarted = _daemon()
    assert d.check_git("aaa", "bbb", dirty=False) == "update"
    assert applied == ["bbb"] and restarted == [True]
    assert d.log == ["git:update"]


def test_release_up_to_date_by_normalized_tag():
    # current 1.5.0 vs release v1.5.0 -> up to date despite v prefix
    d, applied, restarted = _daemon(version="1.5.0")
    assert d.check_release(RELEASES) == "up_to_date"
    assert not applied and not restarted


def test_release_update_downloads_preferred_asset():
    rel = {"name": "deploy v2", "tag_name": "v2.0.0", "prerelease": False,
           "published_at": "2025-04-01T00:00:00Z",
           "assets": [{"name": "pkg.zip", "browser_download_url": "u"}]}
    d, applied, restarted = _daemon(version="v1.5.0")
    assert d.check_release([rel]) == "update"
    assert applied == ["u"] and restarted == [True]


def test_release_keyword_skip_blocks_apply():
    rel = {"name": "hotfix", "tag_name": "v9", "prerelease": False,
           "published_at": "2025-04-01T00:00:00Z", "assets": []}
    d, applied, _ = _daemon(
        {"only_on_release": True, "release_keywords": ["deploy"]})
    assert d.check_release([rel]) == "keyword_skip"
    assert not applied


def test_release_no_asset_blocks_apply():
    rel = {"name": "r", "tag_name": "v9", "prerelease": False,
           "published_at": "2025-04-01T00:00:00Z", "assets": []}
    d, applied, _ = _daemon()
    assert d.check_release([rel]) == "no_asset"
    assert not applied


def test_dispatch_routes_by_deployment_type():
    d, applied, _ = _daemon()
    assert d.check_for_update(True, git_state=("a", "a", False)) == \
        "up_to_date"
    assert d.check_for_update(False, releases=[]) == "none"
    assert not applied
