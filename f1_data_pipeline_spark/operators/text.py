"""Text-analysis operators for training-data pipelines.

All hot-path expressions are Catalyst builtins / higher-order functions —
no Python UDFs — so they vectorize JVM-side and scale linearly with
partitions: token counting, quality scoring, language-ID heuristics, and
content fingerprinting over a `documents(doc_id, text, lang, source,
n_chars)` table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from f1_data_pipeline_spark.catalog import Tables
from f1_data_pipeline_spark.queries import query

# Tiny deterministic stopword list shared with the SQL oracles.
STOPWORDS = ("the", "a", "of", "to", "and", "in")
EN_MARKERS = ("the", "a")


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (single-space delimiter to match the corpus)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), " ")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def stopword_ratio(text: Column | str, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    toks = tokens(text)
    hits = F.size(F.filter(toks, lambda w: w.isin(*stopwords)))
    return hits / F.size(toks)


def avg_word_len(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.length(F.replace(F.trim(c), F.lit(" "), F.lit(""))) / F.size(tokens(c))


def lang_id(text: Column | str, threshold: float = 0.08) -> Column:
    """N-gram-free language heuristic: density of English marker tokens.

    A real deployment swaps in a trigram model; the operator shape (pure
    column expression, no shuffle) is the point — language-ID over 100 TB is
    embarrassingly parallel and must never leave the scan stage.
    """
    toks = tokens(text)
    ratio = F.size(F.filter(toks, lambda w: w.isin(*EN_MARKERS))) / F.size(toks)
    return F.when(ratio >= threshold, F.lit("en")).otherwise(F.lit("other"))


def fingerprint(text: Column | str) -> Column:
    """Content fingerprint (md5) for exact-dup detection & lineage keys."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(c)


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full stat bundle — single narrow projection, no shuffle."""
    return df.withColumns(
        {
            "n_tokens": token_count(text_col),
            "stop_ratio": stopword_ratio(text_col),
            "awl": avg_word_len(text_col),
            "pred_lang": lang_id(text_col),
            "fp": fingerprint(text_col),
        }
    )


# ---------------------------------------------------------------------------
# Registered correctness queries
# ---------------------------------------------------------------------------


@query(
    "x_text_tokens",
    """SELECT doc_id, CAST(len(string_split(trim(text), ' ')) AS INTEGER) AS n_tokens
       FROM documents ORDER BY doc_id""",
)
def x_text_tokens(t: Tables) -> DataFrame:
    """Token counting (whitespace) — scan-local, zero shuffle."""
    return t.documents.select("doc_id", token_count("text").alias("n_tokens")).orderBy(
        "doc_id"
    )


@query(
    "x_text_quality",
    """SELECT doc_id,
              ROUND(CAST(len(list_filter(string_split(trim(text), ' '),
                    w -> w IN ('the','a','of','to','and','in'))) AS DOUBLE)
                    / len(string_split(trim(text), ' ')), 4) AS stop_ratio,
              ROUND(CAST(length(replace(trim(text), ' ', '')) AS DOUBLE)
                    / len(string_split(trim(text), ' ')), 4) AS awl
       FROM documents ORDER BY doc_id""",
)
def x_text_quality(t: Tables) -> DataFrame:
    """Quality scoring: stopword density + mean token length."""
    return t.documents.select(
        "doc_id",
        F.round(stopword_ratio("text"), 4).alias("stop_ratio"),
        F.round(avg_word_len("text"), 4).alias("awl"),
    ).orderBy("doc_id")


@query(
    "x_text_langid",
    """SELECT doc_id,
              CASE WHEN CAST(len(list_filter(string_split(trim(text), ' '),
                        w -> w IN ('the','a'))) AS DOUBLE)
                        / len(string_split(trim(text), ' ')) >= 0.08
                   THEN 'en' ELSE 'other' END AS pred_lang
       FROM documents ORDER BY doc_id""",
)
def x_text_langid(t: Tables) -> DataFrame:
    """Language-ID heuristic as a pure column expression."""
    return t.documents.select("doc_id", lang_id("text").alias("pred_lang")).orderBy(
        "doc_id"
    )


@query(
    "x_text_fingerprint",
    """SELECT doc_id, md5(text) AS fp FROM documents ORDER BY doc_id""",
)
def x_text_fingerprint(t: Tables) -> DataFrame:
    """Content fingerprinting (md5)."""
    return t.documents.select("doc_id", fingerprint("text").alias("fp")).orderBy("doc_id")
