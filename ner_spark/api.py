"""User-facing API: what a user of the reference switches to.

:class:`LocalRecognizer` — the reference's single-node CLI semantics
(`./ner.py [-f file] [-d] [-a|-s] [-n] [-l] [-r]`, ner.py:723-751) without
a SparkSession: compile the KB driver-side, recognize one document at a
time, print reference-format lines.  :class:`Engine` — the Spark scale
path: same KB compile broadcast to executors, pages DataFrame → mentions /
triples.
"""

from __future__ import annotations

from ner_spark.semantics.automaton import GazetteerAutomaton
from ner_spark.semantics.kb import (KBBundle, build_namelist,
                                    build_uri_namelist)
from ner_spark.semantics.recognize import recognize, render_reference_lines


def _compile_local(kb_rows: list[dict], lowercase: bool = False,
                   deaccent: bool = False, uri_mode: bool = False,
                   stop_list: set[str] | None = None, lang: str = "en"):
    from ner_spark.kb.build import _transform_namelist
    from ner_spark.semantics.lang import get_lang
    from ner_spark.semantics.textnorm import remove_accent

    bundle = KBBundle.from_rows(kb_rows)
    if uri_mode:
        namelist = build_uri_namelist(bundle)
    else:
        namelist = build_namelist(bundle, stop_list=stop_list,
                                  lang=get_lang(lang))
    if lowercase or deaccent:
        def tf(k: str) -> str:
            if deaccent:
                k = remove_accent(k)
            return k.lower() if lowercase else k
        namelist = _transform_namelist(namelist, tf, bundle.get_score)
    return bundle, GazetteerAutomaton.build(namelist.items())


class LocalRecognizer:
    """Single-node recognizer, no Spark dependency at runtime."""

    def __init__(self, kb_rows: list[dict] | None = None,
                 kb_tsv: str | None = None, lowercase: bool = False,
                 deaccent: bool = False, uri_mode: bool = False,
                 stop_list: set[str] | None = None, lang: str = "en"):
        if kb_rows is None:
            if kb_tsv is None:
                from ner_spark.fixtures.gen import gen_kb_rows
                kb_rows = gen_kb_rows()
            else:
                from ner_spark.io.kbtsv import read_kb_tsv
                with open(kb_tsv) as fh:
                    _, _, kb_rows = read_kb_tsv(fh)
        self.lowercase = lowercase
        self.deaccent = deaccent
        self.lang = lang
        self.bundle, self.automaton = _compile_local(
            kb_rows, lowercase, deaccent, uri_mode, stop_list, lang)

    def recognize(self, text: str, mode: str = "default",
                  find_names: bool = False,
                  names_strict: bool = False) -> list[dict]:
        from ner_spark.semantics.lang import get_lang

        rows = recognize(self.bundle, self.automaton, text,
                         lowercase=self.lowercase, deaccent=self.deaccent,
                         find_names=find_names, mode=mode,
                         lang=get_lang(self.lang),
                         names_strict=names_strict)
        return rows

    def recognize_lines(self, text: str, **kw) -> list[str]:
        return render_reference_lines(self.recognize(text, **kw))

    def autocomplete(self, prefix: str, m: int = 5):
        return self.automaton.autocomplete(prefix, m)


class Engine:
    """Spark scale path with the same options."""

    def __init__(self, spark, kb_rows: list[dict] | None = None,
                 kb_tsv: str | None = None, **compile_kw):
        from ner_spark.kb.build import compile_kb

        if kb_rows is None:
            if kb_tsv is None:
                from ner_spark.fixtures.gen import gen_kb_rows
                kb_rows = gen_kb_rows()
            else:
                from ner_spark.io.kbtsv import read_kb_tsv
                with open(kb_tsv) as fh:
                    _, _, kb_rows = read_kb_tsv(fh)
        self.spark = spark
        self._compile_kw = compile_kw
        self.artifacts = compile_kb(spark, kb_rows, **compile_kw)

    def mentions(self, pages, **kw):
        from ner_spark.pipeline.ner import extract_mentions
        kw.setdefault("lowercase", self._compile_kw.get("lowercase", False))
        kw.setdefault("deaccent", self._compile_kw.get("deaccent", False))
        kw.setdefault("lang", self._compile_kw.get("lang", "en"))
        return extract_mentions(pages, self.artifacts, **kw)

    def triples(self, pages, **kw):
        from ner_spark.pipeline.triples import build_triples
        m = self.mentions(pages, **kw).persist()
        return build_triples(m, self.artifacts.kb_df)

    def write_triples(self, pages, out_path: str, n_buckets: int = 64, **kw):
        from ner_spark.io.catalog import resumable_write
        return resumable_write(self.triples(pages, **kw), out_path,
                               key="subj", n_buckets=n_buckets)
