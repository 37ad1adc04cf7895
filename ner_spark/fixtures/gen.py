"""Deterministic synthetic pages + KB generators (seed=42, no wall clock).

Schemas follow FIXTURES.md: ``pages`` matches BASELINE.json input_hint
(url, warc_ts, html, text, lang); ``kb`` is the flat minimal KB of
SURVEY §1.3.  Mention frequency over entities is Zipf-distributed so a few
hot entities dominate (exercises skew handling); ambiguous surfaces are
built in (a surname shared by a person and a city — the reference's worked
example, ner/entity.py:160-165).
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone

FIRST_M = ["George", "Antonin", "Karel", "Johann", "Ludwig", "Franz", "Martin",
           "Pavel", "Jan", "Thomas", "Henry", "Oliver", "Samuel", "Victor",
           "Albert", "Rudolf", "Otto", "Emil", "Hugo", "Felix"]
FIRST_F = ["Marie", "Anna", "Clara", "Eliska", "Johanna", "Tereza", "Alice",
           "Emma", "Greta", "Helena", "Ida", "Klara", "Lotte", "Nora"]
SURNAMES = ["Washington", "Dvorak", "Novak", "Svoboda", "Berger", "Fischer",
            "Weber", "Meyer", "Wagner", "Becker", "Hoffman", "Richter",
            "Klein", "Wolf", "Schroeder", "Neumann", "Braun", "Zimmermann",
            "Kruger", "Hartmann", "Lange", "Schmitt", "Werner", "Krause",
            "Lehmann", "Kohler", "Herrmann", "Walter", "Peters", "Moller"]
CITY_BASES = ["Washington", "Springfield", "Richmond", "Arlington", "Georgetown",
              "Brookfield", "Fairview", "Salem", "Clayton", "Dover", "Milton",
              "Oxford", "Bristol", "Franklin", "Greenville", "Kingston",
              "Madison", "Newport", "Riverton", "Ashland"]
COUNTRIES = ["United States", "Czech Republic", "Germany", "Austria", "France"]
NATIONALITIES = [("American", "United States"), ("Czech", "Czech Republic"),
                 ("German", "Germany"), ("Austrian", "Austria"),
                 ("French", "France")]
JOBS = ["president", "composer", "painter", "general", "writer", "architect",
        "scientist", "singer", "politician", "engineer"]
ORG_WORDS = ["Atlas", "Meridian", "Pioneer", "Summit", "Vanguard", "Horizon",
             "Keystone", "Beacon", "Cascade", "Harbor"]
ORG_SUFFIX = ["Corporation", "Institute", "Society", "University", "Company"]
EVENT_KINDS = ["Battle", "Treaty", "Congress", "Siege", "Council"]

EPOCH = datetime(2021, 6, 1, tzinfo=timezone.utc)


def gen_kb_rows(n_persons: int = 60, n_geo: int = 40, n_org: int = 25,
                n_event: int = 15, seed: int = 42) -> list[dict]:
    """Flat KB rows; id = 1-based line number."""
    rng = random.Random(seed)
    rows: list[dict] = []

    def add(**kw) -> None:
        kw.setdefault("aliases", "")
        kw.setdefault("redirects", "")
        rows.append(dict(id=len(rows) + 1, **kw))

    used_names: set[str] = set()
    for i in range(n_persons):
        male = rng.random() < 0.62
        first = rng.choice(FIRST_M if male else FIRST_F)
        last = rng.choice(SURNAMES)
        name = f"{first} {last}"
        while name in used_names:
            first = rng.choice(FIRST_M if male else FIRST_F)
            last = rng.choice(SURNAMES)
            name = f"{first} {last}"
        used_names.add(name)
        byear = rng.randint(1700, 1980)
        dyear = byear + rng.randint(30, 90)
        birth = f"{byear:04d}-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}"
        death = f"{dyear:04d}-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}" if dyear < 2020 else ""
        nat = rng.choice(NATIONALITIES)[0]
        jobs = "|".join(rng.sample(JOBS, rng.randint(1, 3)))
        subtype = rng.random()
        typ = "person:artist" if subtype < 0.2 else ("person:fictional" if subtype < 0.27 else "person")
        aliases = []
        if rng.random() < 0.4:
            aliases.append(f"{first[0]}. {last}")
        if rng.random() < 0.2:
            aliases.append(f"{rng.choice(['Sir','Doctor','General'])} {last}#ntype=nick")
        add(type=typ, name=name, aliases="|".join(aliases),
            gender="M" if male else "F",
            date_of_birth=birth, date_of_death=death, nationalities=nat,
            jobs=jobs, roles=jobs,
            fictional="1" if typ == "person:fictional" else "0",
            description=f"{nat} {jobs.split('|')[0]} born {byear}." + " Notable figure." * rng.randint(0, 4),
            wikipedia_url=f"https://en.wikipedia.org/wiki/{name.replace(' ', '_')}",
            wiki_backlinks=int(rng.paretovariate(1.2) * 40),
            wiki_hits=int(rng.paretovariate(1.3) * 25),
            wiki_ps=rng.randint(0, 1))

    for i in range(n_geo):
        base = CITY_BASES[i % len(CITY_BASES)]
        name = base if i < len(CITY_BASES) else f"New {base}"
        country = rng.choice(COUNTRIES)
        # a few carry an explicit 'location' subtype → exercises the EN
        # location rules (en/entity.py:12-20)
        typ = "geographical:location" if rng.random() < 0.3 else "geographical"
        add(type=typ, name=name, country=country,
            description=f"City in {country}." + " Long history." * rng.randint(0, 3),
            wikipedia_url=f"https://en.wikipedia.org/wiki/{name.replace(' ', '_')}",
            wiki_backlinks=int(rng.paretovariate(1.2) * 30),
            wiki_hits=int(rng.paretovariate(1.3) * 20),
            wiki_ps=rng.randint(0, 1))

    for i in range(n_org):
        name = f"{rng.choice(ORG_WORDS)} {rng.choice(ORG_SUFFIX)}"
        while name in used_names:
            name = f"{rng.choice(ORG_WORDS)} {rng.choice(ORG_SUFFIX)} of {rng.choice(CITY_BASES)}"
        used_names.add(name)
        founded = f"{rng.randint(1800, 1995):04d}"
        # redirect chains: org i redirects to org i-1's name occasionally → CC
        redirects = ""
        if i and rng.random() < 0.3:
            redirects = rows[-1]["name"]
        add(type="organization", name=name, location=rng.choice(CITY_BASES),
            founded=founded, cancelled="", redirects=redirects,
            description=f"Organization founded {founded}." + " Later expanded." * rng.randint(0, 3),
            wikipedia_url=f"https://en.wikipedia.org/wiki/{name.replace(' ', '_')}",
            wiki_backlinks=int(rng.paretovariate(1.3) * 20),
            wiki_hits=int(rng.paretovariate(1.3) * 15),
            wiki_ps=rng.randint(0, 1))

    for i in range(n_event):
        name = f"{rng.choice(EVENT_KINDS)} of {rng.choice(CITY_BASES)}"
        while name in used_names:
            name = f"{rng.choice(EVENT_KINDS)} of New {rng.choice(CITY_BASES)}"
        used_names.add(name)
        start = rng.randint(1600, 1950)
        add(type="event", name=name, start=f"{start:04d}",
            end=f"{start + rng.randint(0, 5):04d}",
            location=rng.choice(CITY_BASES),
            description=f"Event of {start}.",
            wikipedia_url=f"https://en.wikipedia.org/wiki/{name.replace(' ', '_')}",
            wiki_backlinks=int(rng.paretovariate(1.4) * 15),
            wiki_hits=int(rng.paretovariate(1.4) * 10),
            wiki_ps=rng.randint(0, 1))

    for nat, country in NATIONALITIES:
        add(type="nationality", name=nat, aliases=f"{nat}s",
            country=country, description=f"People of {country}.")
    return rows


_SENT_TEMPLATES = [
    "{p} was a famous {job} .",
    "{p} was born on {date} in {g} .",
    "In {year} , {p} visited {g} .",
    "{p} worked for the {o} .",
    "The {o} was founded in {g} .",
    "{p} wrote about the {e} .",
    "The {e} changed {g} forever .",
    "Critics say {p} admired {p2} .",
    "{g} lies near {g2} .",
    "He later moved to {g} .",
    "She published her memoirs in {year} .",
    "Many {natpl} remember {p} .",
    "A {nat} delegation arrived in {g} .",
]
_DISTRACTORS = [
    "Blue Mountain Coffee is popular .",
    "The quick brown fox jumps over the lazy dog .",
    "Market prices rose sharply last week .",
    "Several Grand Hotel Plaza guests complained .",
    "It rained for three days without pause .",
]


def _zipf_pick(rng: random.Random, items: list, a: float = 1.3):
    n = len(items)
    while True:
        r = int(rng.paretovariate(a)) - 1
        if r < n:
            return items[r]


def _kb_pools(kb_rows: list[dict]) -> dict:
    return {
        "persons": [r for r in kb_rows if r["type"].startswith("person")],
        "geos": [r for r in kb_rows if r["type"].startswith("geo")],
        "orgs": [r for r in kb_rows if r["type"] == "organization"],
        "events": [r for r in kb_rows if r["type"] == "event"],
        "nats": [r for r in kb_rows if r["type"] == "nationality"],
    }


def _gen_page_text(rng: random.Random, pools: dict) -> str:
    n_pars = rng.randint(2, 5)
    pars = []
    for _ in range(n_pars):
        n_sents = rng.randint(2, 6)
        sents = []
        for _ in range(n_sents):
            if rng.random() < 0.15:
                sents.append(rng.choice(_DISTRACTORS))
                continue
            t = rng.choice(_SENT_TEMPLATES)
            p = _zipf_pick(rng, pools["persons"])
            p2 = _zipf_pick(rng, pools["persons"])
            g = _zipf_pick(rng, pools["geos"])
            g2 = _zipf_pick(rng, pools["geos"])
            o = _zipf_pick(rng, pools["orgs"])
            e = _zipf_pick(rng, pools["events"])
            nat = rng.choice(pools["nats"])
            year = rng.randint(1600, 2020)
            date = f"{rng.randint(1700, 1990):04d}-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}"
            surface = p["name"]
            if rng.random() < 0.35:
                surface = p["name"].split()[-1]  # surname-only → coref path
            sents.append(t.format(
                p=surface, p2=p2["name"], g=g["name"], g2=g2["name"],
                o=o["name"], e=e["name"], nat=nat["name"],
                natpl=nat["name"] + "s", year=year, date=date,
                job=p["jobs"].split("|")[0]))
        pars.append(" ".join(sents))
    return "\n\n".join(pars)


def gen_pages(kb_rows: list[dict], n_pages: int = 200, seed: int = 42) -> list[dict]:
    """Pages rows (url, warc_ts, html, text, lang) with Zipf entity mentions."""
    rng = random.Random(seed + 1)
    pools = _kb_pools(kb_rows)
    pages = []
    for i in range(n_pages):
        text = _gen_page_text(rng, pools)
        url = f"https://example.org/p/{i:08d}"
        ts = EPOCH + timedelta(seconds=60 * i)
        pages.append(dict(
            url=url, warc_ts=ts,
            html=(b"<html><body>" + text.encode() + b"</body></html>"),
            text=text, lang="en"))
    return pages


def gen_pages_df(spark, kb_rows: list[dict], n_pages: int, seed: int = 42,
                 partitions: int | None = None):
    """Distributed page generator: each page's text derives only from
    (seed, page id), so the table content is identical at any parallelism —
    the property the two-cluster-size scaling run needs.  Executors build
    Arrow batches; nothing is materialized on the driver."""
    import pandas as pd
    from pyspark.sql import functions as F

    pools_bc = spark.sparkContext.broadcast(_kb_pools(kb_rows))
    base = spark.range(0, n_pages, 1, partitions or spark.sparkContext.defaultParallelism)

    def fn(batches):
        pools = pools_bc.value
        for pdf in batches:
            urls, texts = [], []
            for i in pdf["id"]:
                rng = random.Random((seed << 20) ^ int(i))
                urls.append(f"https://example.org/p/{int(i):08d}")
                texts.append(_gen_page_text(rng, pools))
            yield pd.DataFrame({"url": urls, "text": texts})

    df = base.mapInPandas(fn, schema="url string, text string")
    return df.select(
        "url",
        (F.lit(EPOCH.replace(tzinfo=None)) + F.make_interval(
            secs=F.regexp_extract("url", r"(\d+)$", 1).cast("long") * 60)
         ).alias("warc_ts"),
        F.encode(F.concat(F.lit("<html><body>"), F.col("text"),
                          F.lit("</body></html>")), "utf-8").alias("html"),
        "text",
        F.lit("en").alias("lang"))


# ---------------------------------------------------------------------------
# realistic near-duplicate document fixture (round-5 dedup crossover study)
# ---------------------------------------------------------------------------

def gen_realistic_docs(n_docs: int = 2400, seed: int = 20260818,
                       n_sources: int = 4, dup_rate: float = 0.06,
                       vocab_size: int = 8000,
                       doc_len: tuple[int, int] = (80, 200)) -> list[dict]:
    """Web-realistic near-dup corpus: unlike the driver's ``documents``
    table (pathologically self-similar — 71% of within-block pairs pass
    Jaccard 0.5, so LSH candidate pruning cannot win there by
    construction), most docs here are pairwise dissimilar (shared-vocab
    Jaccard ≪ 0.1) and ~``dup_rate`` of them are true near-duplicates of
    an earlier doc in the same source (5-25% token substitutions →
    Jaccard ~0.6-0.9) — the 1-10% near-dup rate real crawls show.
    Deterministic in (seed, args); no wall clock."""
    rng = random.Random(seed)
    vocab = [f"w{i:05d}" for i in range(vocab_size)]
    common = vocab[:200]  # Zipf head shared across docs
    docs: list[dict] = []
    by_source: dict[str, list[int]] = {}
    for i in range(n_docs):
        source = f"web{i % n_sources}"
        prior = by_source.setdefault(source, [])
        if prior and rng.random() < dup_rate:
            base = docs[rng.choice(prior)]
            toks = base["text"].split()
            n_sub = max(1, int(len(toks) * rng.uniform(0.05, 0.25)))
            for _ in range(n_sub):
                toks[rng.randrange(len(toks))] = rng.choice(vocab)
            text = " ".join(toks)
        else:
            n = rng.randint(*doc_len)
            toks = [rng.choice(common) if rng.random() < 0.3
                    else rng.choice(vocab) for _ in range(n)]
            text = " ".join(toks)
        docs.append({"doc_id": i, "source": source, "text": text})
        prior.append(i)
    return docs


def ensure_realistic_docs_parquet(path: str, **kw) -> str:
    """Write the realistic corpus as ONE deterministic parquet file (plain
    pyarrow — no Spark session needed, so both the Spark query and the
    DuckDB oracle can read the identical table from ``path``)."""
    import os

    if not os.path.exists(path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        docs = gen_realistic_docs(**kw)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tbl = pa.table({
            "doc_id": pa.array([d["doc_id"] for d in docs], pa.int64()),
            "source": pa.array([d["source"] for d in docs], pa.string()),
            "text": pa.array([d["text"] for d in docs], pa.string()),
        })
        tmp = f"{path}.tmp.{os.getpid()}"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)
    return path
