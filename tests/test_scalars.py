"""Property-based parser parity (SURVEY §5.2 item 4): the Catalyst column
expressions in functions/scalars.py must behave exactly like the reference's
per-record Python parsers (re-implemented here from their documented
semantics, transformer.py:422-476) on arbitrary inputs."""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from f1_data_pipeline_spark.functions.scalars import (
    bool_parse,
    int_coerce,
    lap_time_seconds,
    numeric_coerce,
)


# --- reference semantics, re-stated in pure python -------------------------

def ref_lap_time(s):
    if not s:
        return None
    try:
        return float(s)
    except (ValueError, TypeError):
        m = re.match(r"(\d+):(\d+\.\d+)", s)
        if m:
            return int(m.group(1)) * 60 + float(m.group(2))
        return None


def ref_float(v):
    if v is None or v == "":
        return None
    s = v.strip().lower() if isinstance(v, str) else v
    if s == "true":
        return 1.0
    if s == "false":
        return 0.0
    try:
        return float(s)
    except (ValueError, TypeError):
        return None


def ref_int(v):
    if v is None or v == "":
        return None
    try:
        return int(v)
    except (ValueError, TypeError):
        return None


def _run(spark, col_fn, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return [r[0] for r in df.select(col_fn("v")).collect()]


LAP_CASES = ["1:23.456", "83.2", "", "2:05.001", "1:23", "abc", "12:34.5:extra", "0:00.000", "999", "1:2.3", ":", "-5", "1:23.456xyz"]


def test_lap_time_golden(spark):
    got = _run(spark, lap_time_seconds, LAP_CASES)
    want = [ref_lap_time(s) for s in LAP_CASES]
    for s, g, w in zip(LAP_CASES, got, want):
        if w is None:
            assert g is None, (s, g)
        else:
            assert g == pytest.approx(w), (s, g, w)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.one_of(
            # ASCII only: python re/\d and float() accept Unicode digits
            # (e.g. '٠'), Java regex does not — documented divergence, the
            # wire protocol is ASCII
            st.text(st.characters(min_codepoint=32, max_codepoint=126), max_size=12),
            st.from_regex(r"[0-9]{1,2}:[0-9]{2}\.[0-9]{3}", fullmatch=True),
            st.floats(0, 1e5).map(lambda x: f"{x:.3f}"),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_lap_time_property(spark, vals):
    got = _run(spark, lap_time_seconds, vals)
    for s, g in zip(vals, got):
        w = ref_lap_time(s)
        # Spark's float() accepts a superset in edge cases like 'Infinity';
        # restrict the property to reference-parseable or both-None
        if w is None:
            if g is not None:
                assert _python_float_accepts(s), (s, g)
        else:
            assert g == pytest.approx(w), (s, g, w)


def _python_float_accepts(s):
    try:
        float(s)
        return True
    except (ValueError, TypeError):
        return False


NUM_CASES = ["true", "False", "", "42", "3.14", "  7.5 ", "1e3", "nan-ish", None, "-0.5"]


def test_numeric_coerce_golden(spark):
    got = _run(spark, numeric_coerce, NUM_CASES)
    want = [ref_float(v) for v in NUM_CASES]
    for s, g, w in zip(NUM_CASES, got, want):
        assert (g is None) == (w is None), (s, g, w)
        if w is not None:
            assert g == pytest.approx(w), (s, g, w)


INT_CASES = ["3", "3.7", "", " 12 ", "abc", None, "-4", "0"]


def test_int_coerce_golden(spark):
    got = _run(spark, int_coerce, INT_CASES)
    want = [ref_int(v) for v in INT_CASES]
    assert got == want


def test_bool_parse_golden(spark):
    vals = ["true", "TRUE", " True ", "false", "0", "1", "", None]
    got = _run(spark, bool_parse, vals)
    assert got == [True, True, True, False, False, False, False, None]


def test_strip_quotes(spark):
    from f1_data_pipeline_spark.functions.scalars import strip_quotes

    vals = ['"quoted"', "plain", '"half', 'tail"', '""']
    got = _run(spark, strip_quotes, vals)
    assert got == ["quoted", "plain", "half", "tail", ""]
