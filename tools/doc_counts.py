# Emit the registry's key counts and check (or rewrite) the count lines in
# OPERATORS.md / BASELINE.md so the docs can never drift from the code again.
# Usage:
#   python tools/doc_counts.py            — print counts + check docs (exit 1 on drift)
#   python tools/doc_counts.py --write    — rewrite the drifted lines in place
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from hive_2_spark import registry  # noqa: E402

REPO = Path(__file__).resolve().parent.parent

q = registry.all_queries()
o = registry.all_oracles()
n_keys, n_oracles = len(q), len(o)
n_rows_only = n_keys - n_oracles
print(f"registry: {n_keys} keys, {n_oracles} oracle-checked, "
      f"{n_rows_only} rows-only")

# (file, pattern-with-one-capture-per-count, replacement)
CHECKS = [
    (REPO / "OPERATORS.md",
     r"Total: \d+ keys, \d+ oracle-checked, \d+ rows-only\.",
     f"Total: {n_keys} keys, {n_oracles} oracle-checked, "
     f"{n_rows_only} rows-only."),
    (REPO / "BASELINE.md",
     r"Correctness as of round \d+: \d+/\d+ query keys",
     # keep whatever round number the doc states; only fix the counts
     None),
    (REPO / "BASELINE.md",
     r"\(\d+ rows-only by documented necessity",
     f"({n_rows_only} rows-only by documented necessity"),
    (REPO / "README.md",
     r"— \d+ as\nof round \d+, \d+ hash-verified",
     None),
]

write = "--write" in sys.argv
drift = 0
not_found = 0
for path, pattern, replacement in CHECKS:
    text = path.read_text()
    m = re.search(pattern, text)
    if not m:
        # a reworded count sentence can never be auto-fixed — fail loudly
        # even under --write (a no-op rewrite is not a fix)
        print(f"{path.name}: count line NOT FOUND (pattern: {pattern})")
        not_found += 1
        continue
    if replacement is None and path.name == "BASELINE.md":
        rnd = re.search(r"Correctness as of round (\d+)", m.group(0)).group(1)
        replacement = (f"Correctness as of round {rnd}: "
                       f"{n_oracles}/{n_keys} query keys")
    elif replacement is None:  # README.md
        rnd = re.search(r"of round (\d+)", m.group(0)).group(1)
        replacement = (f"— {n_keys} as\nof round {rnd}, "
                       f"{n_oracles} hash-verified")
    if m.group(0) == replacement:
        print(f"{path.name}: OK ({m.group(0)!r})")
        continue
    drift += 1
    if write:
        path.write_text(text[:m.start()] + replacement + text[m.end():])
        print(f"{path.name}: REWROTE {m.group(0)!r} -> {replacement!r}")
    else:
        print(f"{path.name}: DRIFT {m.group(0)!r} != {replacement!r}")

sys.exit(1 if (not_found or (drift and not write)) else 0)
