#!/usr/bin/env python
"""Generate tests/goldens/reference_lines.txt — frozen stdout-format lines
for 40 fixture documents (modes: default, all, score, names).

The golden freezes the engine's reference-format output (Entity.__str__
ner/entity.py:357-388, Date.__str__ libs/dates.py:167-183) independently of
the oracle modules, breaking the pipeline≡oracle circularity: any semantic
drift in resolve/recognize changes these lines and fails the golden test.
Regenerate ONLY after deliberately reviewing the diff:

    python tools/gen_goldens.py > tests/goldens/reference_lines.txt
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from ner_spark.fixtures.gen import gen_kb_rows, gen_pages  # noqa: E402
from ner_spark.semantics.automaton import GazetteerAutomaton  # noqa: E402
from ner_spark.semantics.kb import KBBundle, build_namelist  # noqa: E402
from ner_spark.semantics.lang import get_lang  # noqa: E402
from ner_spark.semantics.recognize import (recognize,  # noqa: E402
                                           render_reference_lines)

N_DOCS = 40
MODES = ("default", "all", "score")


def main() -> None:
    kb_rows = gen_kb_rows()
    bundle = KBBundle.from_rows(kb_rows)
    namelist = build_namelist(bundle, lang=get_lang("en"))
    atm = GazetteerAutomaton.build(namelist.items())
    pages = gen_pages(kb_rows, n_pages=N_DOCS, seed=20260817)
    for p in pages:
        for mode in MODES:
            rows = recognize(bundle, atm, p["text"], mode=mode)
            print(f"### url={p['url']} mode={mode}")
            for line in render_reference_lines(rows):
                print(line)
        rows = recognize(bundle, atm, p["text"], find_names=True)
        print(f"### url={p['url']} mode=names")
        for line in render_reference_lines(rows):
            print(line)


if __name__ == "__main__":
    main()
