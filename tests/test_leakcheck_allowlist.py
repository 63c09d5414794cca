"""Round-11 ADVICE (medium): the leak self-scan must cover EVERY tracked
file — ADVICE.md/VERDICT.md included — and exempt only individual lines
that visibly quote regex source (the round-10 case: advice prose quoted
the shortlink pattern). Pure-python: drives the scanner module directly.
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

spec = importlib.util.spec_from_file_location(
    "leakcheck", REPO / "tools" / "leakcheck.py"
)
leakcheck = importlib.util.module_from_spec(spec)
sys.modules["leakcheck"] = leakcheck
spec.loader.exec_module(leakcheck)


def test_no_whole_file_exemptions_remain():
    # the round-10 _SKIP_NAMES escape hatch must stay gone: a module
    # attribute bringing it back would silently narrow the scan
    assert not hasattr(leakcheck, "_SKIP_NAMES")


def test_quoted_pattern_lines_are_recognized():
    # the exact shape round-10 advice used: regex source quoted in prose
    quoted = r"anchored the shortlink regex `(?<![\w/.-])` + `go/`..."
    assert leakcheck._line_quotes_a_pattern(quoted)
    # ordinary prose, imports, URLs, keys: NOT exempt
    for line in (
        "see https://example.com/go/somewhere for details",
        "import something_internal",
        "key = '" + "AKIA" + "0" * 16 + "'",  # assembled: the scanner
        # must treat such a line as a REAL hit, never an exemption
        "plain sentence about scanners",
    ):
        assert not leakcheck._line_quotes_a_pattern(line)


def test_patterns_still_fire_outside_quoted_lines():
    # the scanner's own hit classes keep matching when the line is NOT
    # quoting a pattern (sanity: the allowlist didn't neuter the scan)
    pat = leakcheck._PATTERNS["api-key"]
    assert pat.search("token: " + "AKIA" + "0" * 16)
    line = "token: " + "AKIA" + "0" * 16
    assert not leakcheck._line_quotes_a_pattern(line)


def test_tracked_repo_is_clean_end_to_end(capsys):
    # the full scan over the real tracked tree must pass (exit 0) and
    # report zero hits — with ADVICE.md/VERDICT.md now in scope
    rc = leakcheck.main()
    out = capsys.readouterr().out
    assert rc == 0
    import json

    report = json.loads(out)
    assert report["n_hits"] == 0
    scanned = report["n_files_scanned"]
    assert scanned > 150  # the whole tracked tree, not a subset
