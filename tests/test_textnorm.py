"""Text normalization: sanitize / accents / NCR (reference:
/root/reference/ner.py:611, libs/utils.py:14-46)."""

import re

from ner_spark.semantics.textnorm import (ncr2unicode, remove_accent,
                                          remove_accent_unicode, sanitize)


def test_sanitize_exact_class():
    s = "a;b\x01c\x08d\x0ee\x1ff\x0cg\x7fh \x0b\x09ok"
    out = sanitize(s)
    assert out == "a b c d e f g h \x0b\x09ok"
    # chars NOT in the class survive: \x0b \x09 \x0d \x0a
    assert sanitize("x\x0by\x09z\x0dw\x0av") == "x\x0by\x09z\x0dw\x0av"


def test_sanitize_matches_reference_regex():
    ref = re.compile("[;\x01-\x08\x0e-\x1f\x0c\x7f]")
    for s in ["; ;", "".join(chr(i) for i in range(1, 128)), "plain text"]:
        assert sanitize(s) == ref.sub(" ", s)


def test_remove_accent():
    assert remove_accent("Dvořák") == "Dvorak"
    assert remove_accent("café") == "cafe"
    assert remove_accent("Antonín") == "Antonin"


def test_remove_accent_unicode_length_guard():
    # deaccenting must not change length; ﬁ ligature decomposes to 2 chars
    assert remove_accent_unicode("ﬁn") == "ﬁn"
    assert remove_accent_unicode("Dvořák") == "Dvorak"


def test_ncr2unicode():
    assert ncr2unicode("Dvo&#x159;&#xE1;k") == "Dvořák"
    assert ncr2unicode("plain") == "plain"


def test_spark_sanitize_byte_identical(spark):
    """The JVM regexp_replace in the pipeline must be byte-identical to the
    Python sanitize — the per-row invariant of BASELINE.json."""
    from ner_spark.pipeline.ner import sanitized_pages

    texts = [
        "hello; world",
        "ctl\x01\x02\x03\x04\x05\x06\x07\x08end",
        "keep\x0b\x09\r\n these",
        "mix\x0c\x7f\x0e\x1f done",
        "Dvořák; café\x01",
    ]
    df = spark.createDataFrame([(str(i), t) for i, t in enumerate(texts)],
                               "url string, text string")
    got = {r.url: r.text for r in sanitized_pages(df).collect()}
    for i, t in enumerate(texts):
        assert got[str(i)] == sanitize(t), repr(t)
