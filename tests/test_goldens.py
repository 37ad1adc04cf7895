"""Frozen reference-format output lines (VERDICT r1 §9).

The golden file pins the engine's stdout-format rendering for 40 fixture
documents across all four output modes, reviewed line-by-line against the
reference's printed-line spec (Entity.__str__ ner/entity.py:357-388,
Date.__str__ libs/dates.py:167-183, date semantics libs/dates.py:305-356 —
e.g. numeric dates keep dayfirst=True, so "1767-10-06" renders iso
1767-06-10; absent month/day print as zero-filled "-00").

This breaks the pipeline≡oracle circularity: the oracle port and the Spark
pipeline share the semantics modules, so a drift in those modules would
pass the parity test — but it changes these frozen lines and fails here.
Regenerate only after reviewing the diff:
    python tools/gen_goldens.py > tests/goldens/reference_lines.txt
"""

from __future__ import annotations

import os
import subprocess
import sys

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "reference_lines.txt")


def test_reference_lines_match_golden():
    got = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..",
                                      "tools", "gen_goldens.py")],
        capture_output=True, text=True, check=True).stdout
    with open(GOLDEN) as fh:
        want = fh.read()
    assert got == want, "reference-format output drifted from the golden; " \
        "review the diff before regenerating (tools/gen_goldens.py)"


def test_golden_covers_all_modes_and_docs():
    with open(GOLDEN) as fh:
        headers = [ln for ln in fh if ln.startswith("###")]
    # 40 docs x 4 modes + 2 handcrafted -n post-filter docs x 2 strictness
    assert len(headers) == 164
    for mode in ("default", "all", "score"):
        assert sum(f"mode={mode}" in h for h in headers) == 40
    assert sum("mode=names" in h for h in headers) == 44
    assert sum("strict=True" in h for h in headers) == 2
