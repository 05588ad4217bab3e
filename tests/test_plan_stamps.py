"""Plan-stamp tool pins (VERDICT r13 ask #2).

PLAN_STAMPS.json is the committed per-round ground truth for transitive
re-front detection: a query whose canonicalized-plan hash differs from
the committed stamp changed materially since its last driver row and
must re-front via rotation.CHANGED_SINCE_CHECK. These tests pin the
properties the workflow depends on: volatile run-local tokens are
normalized away (else every run would diff), stamps are deterministic
within a session, and the committed file covers the whole registry.
"""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import plan_stamps  # noqa: E402


def test_normalizer_strips_volatile_tokens():
    raw = (
        "Relation [k#123L] parquet, file:/tmp/cfeed_src1a2b3c4d/part-00000,"
        " MemoryPlan chain_ab12cd34, rdd_42], obj@deadbeef12"
    )
    norm = plan_stamps.normalize(raw)
    assert "/tmp/" not in norm
    assert "ab12cd34" not in norm and "deadbeef" not in norm
    assert "#123" not in norm
    assert "rdd_42" not in norm
    # two runs differing only in volatile tokens normalize identically
    raw2 = (
        "Relation [k#456L] parquet, file:/tmp/cfeed_src9f8e7d6c/part-00000,"
        " MemoryPlan chain_00ff11ee, rdd_7], obj@c0ffee4242"
    )
    assert norm == plan_stamps.normalize(raw2)


def test_normalizer_keeps_semantic_tokens():
    raw = "Aggregate [l_returnflag], [sum(l_quantity) AS sum_qty], numPartitions=32"
    norm = plan_stamps.normalize(raw)
    assert "l_returnflag" in norm and "sum_qty" in norm
    assert "numPartitions=32" in norm  # plan-shape numbers survive


def test_stamp_deterministic_within_session(spark, sf_smoke):
    from spring_cloud_kafka_streams_dbz_etl_spark.queries import all_queries

    spec = all_queries()["q_agg_group"]
    a = plan_stamps.stamp_one(spark, "q_agg_group", spec, sf_smoke)
    b = plan_stamps.stamp_one(spark, "q_agg_group", spec, sf_smoke)
    assert a == b
    assert a["plan"] != a["src"]  # distinct signals


def test_committed_stamps_cover_registry():
    stamp_file = os.path.join(os.path.dirname(__file__), "..", "PLAN_STAMPS.json")
    if not os.path.exists(stamp_file):
        pytest.skip("no committed stamp file yet")
    with open(stamp_file) as f:
        stamps = json.load(f)
    from spring_cloud_kafka_streams_dbz_etl_spark.queries import all_queries

    registered = set(all_queries())
    missing = registered - set(stamps)
    assert not missing, f"unstamped queries (run tools/plan_stamps.py): {missing}"
    errors = {n for n, s in stamps.items() if s["plan"].startswith("ERROR")}
    assert not errors, f"stamp errors: {errors}"


def test_diff_classifies_changes(tmp_path, monkeypatch, capsys):
    old = {
        "a": {"plan": "p1", "src": "s1"},
        "b": {"plan": "p2", "src": "s2"},
        "c": {"plan": "p3", "src": "s3"},
        "gone": {"plan": "p4", "src": "s4"},
    }
    stamp_file = tmp_path / "PLAN_STAMPS.json"
    stamp_file.write_text(json.dumps(old))
    monkeypatch.setattr(plan_stamps, "STAMP_FILE", str(stamp_file))
    new = {
        "a": {"plan": "p1", "src": "s1"},        # unchanged
        "b": {"plan": "pX", "src": "s2"},        # plan-only: transitive
        "c": {"plan": "pY", "src": "sY"},        # plan+src: direct edit
        "fresh": {"plan": "p5", "src": "s5"},    # new registration
    }
    rc = plan_stamps.diff(new)
    out = capsys.readouterr().out
    assert rc == 1
    assert "CHANGED b  [plan-only (transitive helper change!)]" in out
    assert "CHANGED c  [plan+src]" in out
    assert "NEW     fresh" in out
    assert "REMOVED gone" in out
    # identical stamps -> clean exit
    assert plan_stamps.diff(old) == 0
