#!/usr/bin/env python
"""Builder-side leak scanner: greps every tracked text file for the same
hit classes as the driver's LEAKCHECK.json, and stamps the report with
commit + timestamp + nonce so a fresh run is provably fresh (round-8
ADVICE: a round-stamped artifact whose only change is the round number is
indistinguishable from a stale copy).

Usage: python tools/leakcheck.py [--json OUT.json]
Exit 1 on any hit. Patterns are assembled by concatenation so this file
does not match itself.
"""

from __future__ import annotations

import json
import re
import secrets
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# Hit classes mirror the driver's LEAKCHECK.json keys. Each pattern is
# split so the scanner source never contains a matchable literal.
_PATTERNS: dict[str, re.Pattern] = {
    "internal-import": re.compile(
        r"^\s*(?:from|import)\s+(?:anthropic_|ant_internal|claude_cli_)"
        r"\w*",
        re.M,
    ),
    "internal-url": re.compile(
        r"https?://[\w.-]*(?:" + "corp\\." + "|" + "intranet\\." + "|"
        + "internal\\." + r")[\w.-]+"
    ),
    "internal-pkg2": re.compile(
        r"@" + "anthropic" + r"-ai/|pip install\s+" + "anthropic" + r"\b"
    ),
    "internal-bucket": re.compile(
        r"s3://(?:" + "anthropic" + "|" + "ant-" + r")[\w.-]*"
    ),
    "slack-link": re.compile(
        # left boundary on the shortlink so ordinary paths that happen
        # to end in "go/" (e.g. "django/cc-utils") don't false-positive
        r"slack\.com/archives/|" + r"(?<![\w/.-])" + "go/"
        + r"(?:cc|claude)\b"
    ),
    "api-key": re.compile(
        r"\b(?:" + "sk-ant-" + r"[\w-]{10,}|AKIA[0-9A-Z]{16}|"
        + "xoxb-" + r"[\w-]{10,})\b"
    ),
    "axon-env": re.compile(r"\b" + "AXON" + r"_[A-Z_]+\b"),
}

_SKIP_SUFFIX = {".parquet", ".orc", ".avro", ".png", ".jpg", ".bin",
                ".pyc", ".crc", ".snappy"}
_SELF = Path(__file__).resolve()

# Reviewer prose (ADVICE/VERDICT) sometimes QUOTES a scanner regex when
# discussing it (round 10: the shortlink pattern). Round-10's whole-file
# skip silently exempted those tracked files from the scan; per round-11
# ADVICE the skip is now LINE-level and pattern-shaped instead: a match
# is allowlisted only when its own line visibly quotes regex source
# (contains a regex construct no real secret/URL/import line carries).
# Every file stays in scope; allowlisted matches are still REPORTED
# (``allowlisted`` key) so a reviewer can audit the exemptions.
_QUOTED_PATTERN_MARKERS = ("(?:", "(?<!", "(?<=", "[\\w", "\\b(?:")


def _line_quotes_a_pattern(line: str) -> bool:
    return any(m in line for m in _QUOTED_PATTERN_MARKERS)


def tracked_files() -> list[Path]:
    out = subprocess.run(
        ["git", "-C", str(REPO), "ls-files"],
        capture_output=True, text=True, check=True,
    ).stdout.splitlines()
    return [REPO / p for p in out]


def main() -> int:
    json_out = None
    if "--json" in sys.argv:
        json_out = sys.argv[sys.argv.index("--json") + 1]
    hits: dict[str, list] = {k: [] for k in _PATTERNS}
    allowlisted: list[dict] = []
    n_files = 0
    for path in tracked_files():
        if path.suffix.lower() in _SKIP_SUFFIX or path == _SELF:
            continue
        try:
            text = path.read_text(errors="ignore")
        except (OSError, UnicodeDecodeError):
            continue
        n_files += 1
        lines = text.splitlines()
        for cls, pat in _PATTERNS.items():
            for m in pat.finditer(text):
                line = text.count("\n", 0, m.start()) + 1
                rec = {"file": str(path.relative_to(REPO)), "line": line,
                       "match": m.group(0)[:80]}
                if line <= len(lines) and _line_quotes_a_pattern(
                    lines[line - 1]
                ):
                    rec["class"] = cls
                    allowlisted.append(rec)
                else:
                    hits[cls].append(rec)
    n_hits = sum(len(v) for v in hits.values())
    report = {
        "n_hits": n_hits,
        "n_files_scanned": n_files,
        "hits": hits,
        "allowlisted": allowlisted,
        "stamp": {
            "commit": subprocess.run(
                ["git", "-C", str(REPO), "rev-parse", "HEAD"],
                capture_output=True, text=True).stdout.strip(),
            "timestamp_utc": time.strftime(
                "%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "nonce": secrets.token_hex(8),
        },
    }
    print(json.dumps(report, indent=1))
    if json_out:
        Path(json_out).write_text(json.dumps(report, indent=1))
    return 1 if n_hits else 0


if __name__ == "__main__":
    sys.exit(main())
