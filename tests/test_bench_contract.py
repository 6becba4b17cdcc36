"""Bench contract guards: the scaling gate's name lists must track the
query registry — a renamed query silently vanishing from the exemption
list (or the sf5 subset) would quietly weaken the asymptotic check."""

from __future__ import annotations

import importlib.util
import os

from f1_data_pipeline_spark.queries import all_queries

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_scaling_name_lists_track_registry():
    bench = _load_bench()
    registered = set(all_queries())
    missing_exempt = set(bench.SCALING_EXEMPT) - registered
    assert not missing_exempt, f"SCALING_EXEMPT names not registered: {missing_exempt}"
    missing_subset = set(bench.SF5_SUBSET) - registered
    assert not missing_subset, f"SF5_SUBSET names not registered: {missing_subset}"


def test_every_exemption_carries_a_reason():
    bench = _load_bench()
    for name, reason in bench.SCALING_EXEMPT.items():
        assert reason and "production" in reason or "pin" in reason, (
            f"{name}: exemption must document the sub-quadratic production twin"
        )
