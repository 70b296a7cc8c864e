"""bench.py round-over-round delta logic (pure unit tests, no Spark)."""

import pytest
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_query_deltas_flat_format(monkeypatch):
    monkeypatch.setattr(
        bench, "_prev_round_bench", lambda: (3, {"queries": {"a": 1.0, "b": 2.0}})
    )
    d = bench.query_deltas({"a": 1.5, "b": 1.0, "c": 9.9})
    assert d["vs_round"] == 3
    assert d["query_deltas_pct"] == {"a": 50.0, "b": -50.0}  # c: no prior
    assert d["regressions_gt_20pct"] == ["a"]


def test_query_deltas_driver_wrapped_format(monkeypatch):
    wrapped = {"n": 1, "rc": 0, "parsed": {"queries": {"a": 2.0}}}
    monkeypatch.setattr(bench, "_prev_round_bench", lambda: (1, wrapped))
    d = bench.query_deltas({"a": 1.0})
    assert d["query_deltas_pct"] == {"a": -50.0}
    assert d["regressions_gt_20pct"] == []


def test_query_deltas_without_prior_round(monkeypatch):
    monkeypatch.setattr(bench, "_prev_round_bench", lambda: None)
    assert bench.query_deltas({"a": 1.0}) == {}


# two-tier test policy (round 7): this module is in the smoke tier
pytestmark = pytest.mark.smoke
