"""Unicode normalization + cleanup (text.clean_text / nfc_normalize_col).

The corpus is ASCII, so the real NFC behavior is pinned here on planted
unicode: decomposed accents compose, control bytes vanish, CRLF and
whitespace runs collapse — and the Catalyst-only variant (nfc=False)
stays Python-free.
"""

from __future__ import annotations

import unicodedata

from pyspark.sql import functions as F

from f1_data_pipeline_spark.operators.text import clean_text


def _clean(spark, texts, nfc=True):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    out = df.select("i", clean_text("t", nfc=nfc).alias("c")).orderBy("i").collect()
    return [r.c for r in out]


def test_nfc_composes_decomposed_accents(spark):
    decomposed = "café"  # e + COMBINING ACUTE
    (got,) = _clean(spark, [decomposed])
    assert got == "café"
    assert got == unicodedata.normalize("NFC", decomposed)


def test_controls_stripped_whitespace_collapsed(spark):
    got = _clean(
        spark,
        [
            "a\x00b\x07c",            # C0 controls vanish entirely
            "line1\r\nline2\n\nline3",  # CRLF + newline runs -> single spaces
            "  padded\t\tout  ",       # tabs + edge whitespace
        ],
    )
    assert got == ["abc", "line1 line2 line3", "padded out"]


def test_null_passthrough(spark):
    df = spark.createDataFrame([(1, None)], "i long, t string")
    (r,) = df.select(clean_text("t").alias("c")).collect()
    assert r.c is None


def test_catalyst_only_variant_has_no_python(spark):
    df = spark.createDataFrame([(1, "x")], "i long, t string")
    plan = (
        df.select(clean_text("t", nfc=False).alias("c"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_matches_python_replay_on_mixed_corpus(spark):
    import re

    texts = [
        "ascii only here",
        "café düsseldorf",
        "tabs\tand\nnewlines\x1f!",
        "ﬁle ligature ﬁ",  # NFC leaves compatibility ligatures alone
    ]
    got = _clean(spark, texts)

    def replay(t):
        t = unicodedata.normalize("NFC", t)
        t = re.sub(r"[\x00-\x08\x0B-\x1F\x7F]", "", t)
        t = re.sub(r"[ \t\n\r]+", " ", t)
        return t.strip()

    assert got == [replay(t) for t in texts]
