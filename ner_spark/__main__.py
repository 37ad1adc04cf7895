"""CLI with the reference's surface: ``python -m ner_spark`` ≈ ``./ner.py``.

    python -m ner_spark -f doc.txt --kb KB.tsv      # one file
    echo "text" | python -m ner_spark               # stdin
    ... | python -m ner_spark -d                    # daemon line protocol
                                                    # (NER_NEW_FILE / NER_END
                                                    #  tokens, ner.py:819)

Flags mirror the reference (ner.py:723-751): ``-a`` print all candidate
mentions, ``-s`` scores mode, ``-n`` find unknown names, ``-l`` lowercase,
``-r`` remove accents, ``-d`` daemon mode, ``-q`` language (en only).
Output: the reference's line format ``start\\tend\\tkind\\ttext\\tsense``.
Single-node, no Spark; the distributed path is tools/run_job.py.
"""

from __future__ import annotations

import argparse
import sys

from ner_spark.api import LocalRecognizer
from ner_spark.streaming.daemon import iter_daemon_documents


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="python -m ner_spark")
    ap.add_argument("-f", "--file", default=None)
    ap.add_argument("--kb", default=None, help="KB.tsv (default: synthetic)")
    ap.add_argument("-d", "--daemon", action="store_true")
    ap.add_argument("-a", "--all", action="store_true", dest="print_all")
    ap.add_argument("-s", "--score", action="store_true")
    ap.add_argument("-n", "--names", action="store_true")
    ap.add_argument("--names-strict", action="store_true",
                    help="apply the strict garbage-name suppressor "
                         "(process_outputs filter_names intent)")
    ap.add_argument("-l", "--lowercase", action="store_true")
    ap.add_argument("-r", "--remove-accent", action="store_true")
    ap.add_argument("-q", "--lang", default="en", choices=["en", "cs", "sk"])
    args = ap.parse_args(argv)

    rec = LocalRecognizer(kb_tsv=args.kb, lowercase=args.lowercase,
                          deaccent=args.remove_accent, lang=args.lang)
    mode = "all" if args.print_all else ("score" if args.score else "default")

    def emit(text: str, doc_mode: str = mode, find_names: bool = args.names):
        # one shared path: LocalRecognizer.recognize applies the same
        # sanitize → -r plain deaccent → scan-only -d lower pipeline
        # (recognize.py), so the CLI cannot diverge from the library
        for line in rec.recognize_lines(text, mode=doc_mode,
                                        find_names=find_names,
                                        names_strict=args.names_strict):
            print(line)

    if args.daemon:
        for doc, doc_mode, token in iter_daemon_documents(sys.stdin):
            # the token alone selects the mode — plain NER_NEW_FILE/NER_END
            # always run default (print_all=False/print_score=False) and
            # without find_names, regardless of CLI -a/-s/-n (ner.py:843-850)
            resolve_mode = doc_mode if doc_mode in ("all", "score") else "default"
            emit(doc, resolve_mode, find_names=(doc_mode == "names"))
            print(token)  # sync marker, ner.py:850
            sys.stdout.flush()
        return 0

    if args.file:
        with open(args.file) as fh:
            text = fh.read().strip()
    else:
        text = sys.stdin.read().strip()
    emit(text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
