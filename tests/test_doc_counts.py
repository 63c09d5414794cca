"""Docs must state the registry's real key counts — round-4 verdict flagged
drifted totals; tools/doc_counts.py is the fixer, this test is the gate."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_doc_counts_match_registry():
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "doc_counts.py")],
        capture_output=True, text=True,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
