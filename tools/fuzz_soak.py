#!/usr/bin/env python
"""Extended differential fuzz soak vs the compiled reference figa.

A bigger-budget version of tests/test_ctdict.py's layer-2b fuzz: N trials
of random namelists × 8 random corpora each, run through the g++-compiled
reference binary and our scanner, asserting identical KBlookup TSV in char
mode AND `-b` byte-offset mode.  The corpus alphabet includes bare
delimiter pieces ("\\t", "  ", "\\n") — the separator class where the r5
soak found a real divergence (strong-newline scope, figa_cedar.tpp:985-
1012, fixed in semantics/automaton.py + the C kernel).

    python tools/fuzz_soak.py <seed> <n_trials>

Requires g++ and the reference tree; exits non-zero on the first
divergence with a full repro tuple.
"""
import os
import random
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import test_ctdict as T  # noqa: E402  (test helpers double as the harness)
from ner_spark.semantics.automaton import (GazetteerAutomaton,  # noqa: E402
                                           byte_offset_matches)


def build_figa(d: str) -> str:
    for f in T._FIGA_FILES:
        shutil.copyfile(os.path.join(T.REF_SRC, f), os.path.join(d, f))
    objs = []
    for src in ("main.cpp", "figa_cedar.cpp"):
        obj = os.path.join(d, src + ".o")
        subprocess.run(["g++", *T._CFLAGS, "-c", os.path.join(d, src),
                        "-o", obj], check=True, cwd=d, capture_output=True)
        objs.append(obj)
    exe = os.path.join(d, "figav1.0")
    subprocess.run(["g++", *objs, "-o", exe], check=True, capture_output=True)
    return exe


def main() -> None:
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 20260818
    n_trials = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    d = tempfile.mkdtemp(prefix="figa_soak")
    figa = build_figa(d)
    rng = random.Random(seed)
    words = ["New", "York", "Praha", "Jan", "Novak", "Fond", "U.S.A",
             "Žofín", "Dvořák", "al-Idrisi", "O'Neil", "x", "mega-city",
             "Ltd.", "Čapek", "ünited", "ООН", "東京", "a1", "42nd",
             "š", "Ćirić", "d'Artagnan", "№5", "e.g", "A.B.C", "niño"]
    fillers = ["saw", "the", "and", "on", "in", "of", "it", "was", ",",
               ".", ";", "(", ")", "-", "http://ex.com/a.b", "https:",
               "1997", "–", "\t", "  ", "\n", "…"]
    checked = 0
    for trial in range(n_trials):
        keys = {}
        for _ in range(rng.randint(3, 20)):
            k = " ".join(rng.choice(words) for _ in range(rng.randint(1, 4)))
            ids = sorted({rng.randint(1, 12) for _ in range(rng.randint(1, 3))})
            if rng.random() < 0.3:
                ids.append(0)
            keys[k] = ids
        nl_file = os.path.join(d, "nl.tsv")
        with open(nl_file, "w") as fh:
            fh.write(T._namelist_text(keys))
        ct = os.path.join(d, "f.ct")
        subprocess.run([figa, "-d", nl_file, "-n", "-w", ct],
                       check=True, capture_output=True)
        atm = GazetteerAutomaton.build(keys.items())
        pieces = list(keys) + words + fillers
        for _ in range(8):
            n = rng.randint(0, 60)
            body = []
            for _ in range(n):
                body.append(rng.choice(pieces))
                if rng.random() < 0.08:
                    body.append("\n")
            text = " ".join(body) + "\n"
            theirs = T._lookup(figa, ct, text)
            ms = atm.scan(text)
            ours = T._render_ours(ms)
            assert theirs == ours, (seed, trial, text, theirs, ours)
            theirs_b = subprocess.run(
                [figa, "-p", "-b", "-d", ct], input=text,
                capture_output=True, text=True, check=True).stdout
            ours_b = T._render_ours(byte_offset_matches(text, ms))
            assert theirs_b == ours_b, (seed, trial, text, theirs_b, ours_b)
            checked += 2
    print(f"soak OK: seed={seed} trials={n_trials} comparisons={checked}")


if __name__ == "__main__":
    main()
