"""Scaled-corpus generator invariants (scale_data.py): the asymptotic gate
is only as good as the data it runs on, so pin the properties that make the
sf1 corpus a faithful 10x — exact cardinalities, referential integrity,
preserved key uniqueness, and near- (not exact-) duplicate documents.
Skips when the corpus has not been generated (bench generates on demand)."""

from __future__ import annotations

import os

import duckdb
import pytest

SF1 = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data", "scale", "sf1")
SRC = "/root/testdata/sf0.1"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(SF1, "_COMPLETE")),
    reason="sf1 corpus not generated (run scale_data.py or bench.py)",
)


def _q(sql: str):
    return duckdb.sql(sql).fetchone()


def test_cardinalities_are_exactly_10x():
    for t in ("orders", "lineitem", "events", "documents", "embeddings", "customer"):
        base = _q(f"SELECT count(*) FROM '{SRC}/{t}.parquet'")[0]
        big = _q(f"SELECT count(*) FROM '{SF1}/{t}.parquet'")[0]
        assert big == 10 * base, t
    for t in ("region", "nation"):  # fixed-cardinality dims must NOT grow
        base = _q(f"SELECT count(*) FROM '{SRC}/{t}.parquet'")[0]
        big = _q(f"SELECT count(*) FROM '{SF1}/{t}.parquet'")[0]
        assert big == base, t


def test_keys_stay_unique_and_joins_resolve():
    dups = _q(
        f"SELECT count(*) - count(DISTINCT o_orderkey) FROM '{SF1}/orders.parquet'"
    )[0]
    assert dups == 0
    orphans = _q(
        f"""SELECT count(*) FROM '{SF1}/lineitem.parquet' l
            LEFT JOIN '{SF1}/orders.parquet' o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderkey IS NULL"""
    )[0]
    assert orphans == 0
    cust_orphans = _q(
        f"""SELECT count(*) FROM '{SF1}/orders.parquet' o
            LEFT JOIN '{SF1}/customer.parquet' c ON o.o_custkey = c.c_custkey
            WHERE c.c_custkey IS NULL"""
    )[0]
    assert cust_orphans == 0


def test_documents_become_near_not_exact_duplicates():
    """Replica perturbation must keep exact-dup group counts scaling ~10x
    (intra-replica dups preserved) instead of collapsing every doc into a
    10-copy exact-dup group (which would distort dedup-operator scaling)."""
    base_groups = _q(
        f"""SELECT count(*) FROM (SELECT text FROM '{SRC}/documents.parquet'
            GROUP BY text HAVING count(*) > 1)"""
    )[0]
    big_groups = _q(
        f"""SELECT count(*) FROM (SELECT text FROM '{SF1}/documents.parquet'
            GROUP BY text HAVING count(*) > 1)"""
    )[0]
    assert big_groups == 10 * base_groups
    # n_chars stays consistent with the perturbed text
    bad = _q(
        f"SELECT count(*) FROM '{SF1}/documents.parquet' WHERE n_chars <> length(text)"
    )[0]
    assert bad == 0
