"""Gazetteer automaton with figa-compatible matching semantics.

Brand-new implementation (no code shared with the reference's C++ DARTS /
CEDAR tries).  Reproduces the observable semantics of the reference's
``figa`` scanner:

  - tokenization: a char is a delimiter iff it is ASCII whitespace,
    punctuation or a control char (figa_cedar.cpp:62-67, C locale — non-ASCII
    is always a word char); punctuation chars form single-char words of their
    own and attach to neighbours with an empty separator, whitespace runs
    collapse to a single " " separator in the match path
    (figa_cedar.tpp:955-1000);
  - URI rule: a word starting "http:"/"https:" swallows punctuation until
    whitespace (figa_cedar.tpp:972-976);
  - strong delimiters '\\n'/'\\r' (and EOF) terminate any match path
    (figa_cedar.cpp:76-81, figa_cedar.tpp:1007-1013);
  - matches start at word starts and end at word ends; the LONGEST match
    wins (backtrack to the last word with a trie value,
    figa_cedar.tpp:555-616); matched words are consumed, so emitted matches
    never overlap (figa_cedar.tpp:1033-1064);
  - offsets are in characters; this module emits 0-based half-open
    [start, end) spans, i.e. already in the form ner.py:426 converts to.

The automaton is built once on the driver from the namelist and broadcast
to executors (the Spark analogue of the reference's memory-mapped ``.dct``
automaton file, figa/src/figa.cpp:22-31).  Link values are KB row ids;
id 0 marks a pronoun / name-fragment key (ner.py:417 BNF comment: "řádek 0
značí zájmeno – coreference"; 'N' fragment links, uniq_namelist.py:104-107).
"""

from __future__ import annotations

import string
from typing import Iterable, Iterator, NamedTuple

_ASCII_SPACE = set(" \t\n\r\v\f")
_ASCII_PUNCT = set(string.punctuation)
_STRONG = set("\n\r")


def _is_cntrl(c: str) -> bool:
    o = ord(c)
    return o < 0x20 or o == 0x7F


def is_delimiter(c: str) -> bool:
    """C-locale isspace|ispunct|iscntrl, ASCII only (figa_cedar.cpp:62-67)."""
    return c in _ASCII_SPACE or c in _ASCII_PUNCT or (ord(c) < 0x80 and _is_cntrl(c))


class Word(NamedTuple):
    text: str
    start: int  # 0-based char offset
    end: int    # exclusive
    sep: str | None  # separator to the NEXT word in the match path:
    #                  " " (whitespace), "" (adjacent punct), None (strong/EOF)


def tokenize(text: str) -> list[Word]:
    """Split text into figa words with offsets and inter-word separators.

    A word is either a maximal run of non-delimiter chars (URI rule may
    extend it through punctuation) or a single punctuation char.  The
    separator between adjacent words is "" when they touch, " " when only
    space-like chars lie between (runs collapse: the reference consumes one
    delimiter per break and skips empty words, figa_cedar.tpp:986-1003), and
    None when the gap contains a strong delimiter '\\n'/'\\r'.  The final
    word gets None (EOF acts as '\\n', figa_cedar.tpp:1007).
    """
    spans: list[tuple[str, int, int]] = []
    n = len(text)
    i = 0
    while i < n:
        c = text[i]
        if c in _ASCII_PUNCT:
            spans.append((c, i, i + 1))
            i += 1
            continue
        if is_delimiter(c):
            i += 1
            continue
        start = i
        is_uri = False
        while i < n:
            c = text[i]
            if not is_uri and c == ":" and text[start:i] in ("http", "https"):
                is_uri = True
            if is_uri:
                if c in _ASCII_SPACE or (ord(c) < 0x80 and _is_cntrl(c)):
                    break
            elif is_delimiter(c):
                break
            i += 1
        spans.append((text[start:i], start, i))
    words: list[Word] = []
    for k, (w, s, e) in enumerate(spans):
        if k + 1 == len(spans):
            sep: str | None = None
        else:
            gap = text[e : spans[k + 1][1]]
            if not gap:
                sep = ""
            elif any(g in _STRONG for g in gap):
                sep = None
            else:
                sep = " "
        words.append(Word(w, s, e, sep))
    return words


class Match(NamedTuple):
    ids: tuple[int, ...]  # KB row ids in namelist order (0 = pronoun/fragment)
    start: int            # 0-based char offset
    end: int              # exclusive
    fragment: str


class GazetteerAutomaton:
    """Char-trie with a token-anchored longest-match walk.

    Nodes are plain dicts (picklable → ``sparkContext.broadcast``-able).
    ``_VAL`` keys the link list of a complete key.  The match path between
    words inserts the word separator (" " or "") exactly as the reference's
    trie traverses ``word_delimiter`` (figa_cedar.tpp:1022-1027).
    """

    _VAL = 0  # int key cannot collide with single-char str edges

    def __init__(self) -> None:
        self.root: dict = {}
        self.n_keys = 0

    @classmethod
    def build(cls, namelist: Iterable[tuple[str, Iterable[int]]]) -> "GazetteerAutomaton":
        atm = cls()
        for key, ids in namelist:
            atm.add(key, ids)
        return atm

    def add(self, key: str, ids: Iterable[int]) -> None:
        node = self.root
        for c in key:
            node = node.setdefault(c, {})
        if self._VAL not in node:
            self.n_keys += 1
        node[self._VAL] = tuple(ids)

    def _descend(self, node: dict, s: str) -> dict | None:
        for c in s:
            node = node.get(c)
            if node is None:
                return None
        return node

    def scan(self, text: str) -> list[Match]:
        """Longest-match, non-overlapping scan; matches start/end at words."""
        words = tokenize(text)
        out: list[Match] = []
        root = self.root
        VAL = self._VAL
        nw = len(words)
        i = 0
        while i < nw:
            w = words[i]
            node = root.get(w.text[0]) if w.text else None
            if node is None:
                i += 1
                continue
            node = self._descend(node, w.text[1:])
            best_j = -1
            best_ids: tuple[int, ...] | None = None
            j = i
            while node is not None:
                val = node.get(VAL)
                if val is not None:
                    best_j, best_ids = j, val
                sep = words[j].sep
                if sep is None or j + 1 >= nw:
                    break
                if sep:
                    node = self._descend(node, sep)
                    if node is None:
                        break
                j += 1
                node = self._descend(node, words[j].text)
            if best_ids is not None:
                start = w.start
                end = words[best_j].end
                out.append(Match(best_ids, start, end, text[start:end]))
                i = best_j + 1  # consume matched words → no overlaps
            else:
                i += 1
        return out

    def iter_keys(self) -> Iterator[tuple[str, tuple[int, ...]]]:
        """Yield (key, ids) — used by the reflexive round-trip test, the same
        contract as figa/test_figa.py:85-98."""
        stack: list[tuple[dict, str]] = [(self.root, "")]
        while stack:
            node, prefix = stack.pop()
            for k, v in node.items():
                if k == self._VAL:
                    yield prefix, v
                else:
                    stack.append((v, prefix + k))
