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


def test_normalizer_strips_plan_id_counter():
    """[plan_id=N] comes from a global monotonic counter in physical
    fragments embedded by cache builders / executed subqueries — it
    differed on two back-to-back builds of q_tpch_q2 in one session
    (caught r14), so it must normalize away."""
    a = plan_stamps.normalize("BroadcastExchange Mode(List(x)), [plan_id=66]")
    b = plan_stamps.normalize("BroadcastExchange Mode(List(x)), [plan_id=144]")
    assert a == b
    assert "[plan_id=x]" in a


def test_stamp_deterministic_for_cache_embedding_plan(spark, sf_smoke):
    """q_tpch_q2 embeds an InMemoryRelation whose cached physical plan
    carries plan_id counters — the regression case for the normalizer."""
    from spring_cloud_kafka_streams_dbz_etl_spark.queries import all_queries

    spec = all_queries()["q_tpch_q2"]
    a = plan_stamps.stamp_one(spark, "q_tpch_q2", spec, sf_smoke)
    b = plan_stamps.stamp_one(spark, "q_tpch_q2", spec, sf_smoke)
    assert a == b


def test_normalizer_collapses_uuid_guard_both_orders():
    """The no_pushdown guard's uuid() carries a fresh random seed per
    expression instance, and canonicalized() orders the comparison by
    child hash — so the SAME guard prints as `length(uuid(Some(N))) > -1`
    or `-1 < length(uuid(Some(-N)))` run to run (caught r14 on
    q_cdc_envelope_parse / s_dlq_split). Both forms must normalize to one
    token."""
    a = plan_stamps.normalize("Filter CASE WHEN (length(uuid(Some(1234567))) > -1) THEN x")
    b = plan_stamps.normalize("Filter CASE WHEN (-1 < length(uuid(Some(-987654321012)))) THEN x")
    assert a == b
    assert "(uuid_guard)" in a


def test_stamp_immune_to_cache_contamination(spark, sf_smoke):
    """Cache substitution is global and canonicalized-plan-matched: once
    any stamped query .cache()s a scan, later queries over the same
    relation optimize to InMemoryRelation and their stamps shift with
    stamping ORDER (caught r14 on q_tpch_q21). stamp_one must clear the
    cache so the stamp is position-independent."""
    from spring_cloud_kafka_streams_dbz_etl_spark.queries import all_queries

    spec = all_queries()["q_agg_group"]
    clean = plan_stamps.stamp_one(spark, "q_agg_group", spec, sf_smoke)
    cached = spark.read.parquet(f"{sf_smoke}/lineitem.parquet").cache()
    cached.count()
    try:
        assert plan_stamps.stamp_one(spark, "q_agg_group", spec, sf_smoke) == clean
    finally:
        cached.unpersist()


def test_normalizer_collapses_hof_lambda_counter():
    """HOF lambda variables are named from a JVM-global counter
    (lambda x_1 / x_6 ...) that depends on how many HOF plans the session
    built before this one (caught r14 on q_curation_near_dup)."""
    a = plan_stamps.normalize("transform(t, lambdafunction(f(lambda x_1#33 + 1), lambda x_1#33))")
    b = plan_stamps.normalize("transform(t, lambdafunction(f(lambda x_6#99 + 1), lambda x_6#99))")
    assert a == b
    # binary lambdas (aggregate's merge fn) draw y_/z_ names from the
    # same counter — caught a second time on q_quality_score's y_N
    c = plan_stamps.normalize("aggregate(t, 0, lambdafunction((lambda x_2#1 + lambda y_3#2), lambda x_2#1, lambda y_3#2))")
    d = plan_stamps.normalize("aggregate(t, 0, lambdafunction((lambda x_8#5 + lambda y_9#6), lambda x_8#5, lambda y_9#6))")
    assert c == d


def test_normalizer_sorts_commutative_operands():
    """canonicalized() orders AND/OR operands by expression hashCode,
    which incorporates raw exprIds from the session-global counter — so
    operand ORDER depends on how many expressions the session allocated
    before this plan (caught r14: q_tpch_q2's bloom conjuncts swapped
    after ~200 queries were stamped first). The normalizer re-sorts each
    multicommutativeop operand list, nested lists bottom-up."""
    a = plan_stamps.normalize(
        "Filter multicommutativeop(isnotnull(none#7), isnotnull(none#9),"
        " might_contain(scalar-subquery#3 [], xxhash64(none#7, 42)),"
        " class org.apache.spark.sql.catalyst.expressions.And, None)"
    )
    b = plan_stamps.normalize(
        "Filter multicommutativeop(isnotnull(none#2),"
        " might_contain(scalar-subquery#8 [], xxhash64(none#2, 42)),"
        " isnotnull(none#4), class org.apache.spark.sql.catalyst.expressions.And, None)"
    )
    assert a == b
    n1 = plan_stamps.normalize(
        "multicommutativeop(z#1, multicommutativeop(q#2, p#3, class Or, None), class And, None)"
    )
    n2 = plan_stamps.normalize(
        "multicommutativeop(multicommutativeop(p#9, q#8, class Or, None), z#7, class And, None)"
    )
    assert n1 == n2


def test_normalizer_strips_runtime_stage_numbering():
    """Embedded EXECUTED fragments (cached relations, executed
    subqueries) print AQE query-stage ids and whole-stage-codegen span
    labels numbered by runtime materialization order, which races across
    runs (caught r14 on q_perplexity_filter: BroadcastQueryStage 6 vs 5,
    *(4) vs *(3) for the identical stages)."""
    a = plan_stamps.normalize(
        "+- BroadcastQueryStage 6\n+- *(4) HashAggregate(keys=[t#1])\n"
        "+- ShuffleQueryStage 2\nWholeStageCodegen (7)"
    )
    b = plan_stamps.normalize(
        "+- BroadcastQueryStage 5\n+- *(3) HashAggregate(keys=[t#9])\n"
        "+- ShuffleQueryStage 4\nWholeStageCodegen (2)"
    )
    assert a == b


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


def test_committed_stamps_match_live_plans_sample(spark, sf_smoke):
    """The committed PLAN_STAMPS.json must describe the plans at HEAD,
    not a stale snapshot: spot-stamp three stable anchor queries and
    compare against the file. If this fails after an intentional plan
    change, rerun tools/plan_stamps.py (and re-front consumers via
    CHANGED_SINCE_CHECK) — that is the workflow, not a flake: the
    normalizer suite makes these stamps process-deterministic."""
    stamp_file = os.path.join(os.path.dirname(__file__), "..", "PLAN_STAMPS.json")
    if not os.path.exists(stamp_file):
        pytest.skip("no committed stamp file yet")
    with open(stamp_file) as f:
        committed = json.load(f)
    from spring_cloud_kafka_streams_dbz_etl_spark.queries import all_queries

    specs = all_queries()
    # anchors must be PARALLELISM-INDEPENDENT: the test session runs at
    # SPARK_GRAFT_CPUS=8 while the stamp tool runs at the machine width,
    # and fan_out()-using plans embed the width as a repartition literal
    # (q_agg_group mismatches here for exactly that reason — correctly,
    # since the stamp describes the tool's environment)
    for name in ("q_filter_predicate", "q_tpch_q6", "q_tpch_q1", "q_window_rank"):
        live = plan_stamps.stamp_one(spark, name, specs[name], sf_smoke)
        assert live == committed[name], (
            f"{name}: committed stamp is stale — rerun tools/plan_stamps.py"
        )


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


def test_diff_classifies_known_process_variant(tmp_path, monkeypatch, capsys):
    """A plan-only hash move on a PROCESS_VARIANT member (Spark's
    RewriteDistinctAggregates gid ordering is JVM-dependent) reports as
    VARIANT, not CHANGED — but a src change still reports CHANGED."""
    name = next(iter(plan_stamps.PROCESS_VARIANT))
    old = {name: {"plan": "p1", "src": "s1"}}
    stamp_file = tmp_path / "PLAN_STAMPS.json"
    stamp_file.write_text(json.dumps(old))
    monkeypatch.setattr(plan_stamps, "STAMP_FILE", str(stamp_file))
    rc = plan_stamps.diff({name: {"plan": "pX", "src": "s1"}})
    out = capsys.readouterr().out
    assert rc == 0
    assert f"VARIANT {name}" in out and "CHANGED" not in out
    rc = plan_stamps.diff({name: {"plan": "pX", "src": "sX"}})
    out = capsys.readouterr().out
    assert rc == 1
    assert f"CHANGED {name}  [plan+src]" in out


# ---------------------------------------------------------------------------
# Closure digests (VERDICT r14 ask #2): edits inside Python kernel/helper
# BODIES move neither the optimized plan nor the query's own source —
# the class the r14 GroupState.get fix fell in. The closure digest must
# catch them mechanically.
# ---------------------------------------------------------------------------

_HELPER_V1 = '''
def kernel(rows):
    """Doc v1."""
    # a comment
    return [r + 1 for r in rows]


def caller(xs):
    return kernel(xs)
'''

# logic edit inside the kernel body only — caller untouched
_HELPER_V2 = _HELPER_V1.replace("r + 1", "r + 2")

# prose-only edit: docstring and comment change, logic identical
_HELPER_V3 = _HELPER_V1.replace("Doc v1.", "Doc v2 rewritten.").replace(
    "# a comment", "# another comment"
)


def _load_temp_module(tmp_path, body, name):
    import importlib.util

    path = tmp_path / f"{name}.py"
    path.write_text(body)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # make it look package-local so the walk keeps it
    for fn in (mod.kernel, mod.caller):
        fn.__module__ = "spring_cloud_kafka_streams_dbz_etl_spark._closure_fixture"
    return mod


def test_closure_digest_moves_on_kernel_body_edit(tmp_path):
    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    m1 = _load_temp_module(tmp_path / "a", _HELPER_V1, "closure_mod")
    m2 = _load_temp_module(tmp_path / "b", _HELPER_V2, "closure_mod")
    d1 = plan_stamps.closure_digest(m1.caller)
    d2 = plan_stamps.closure_digest(m2.caller)
    # caller's own source is identical in both versions; only the
    # referenced kernel's body changed — the digest must still move
    assert d1 != d2


def test_closure_digest_ignores_prose_edits(tmp_path):
    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    m1 = _load_temp_module(tmp_path / "a", _HELPER_V1, "closure_mod")
    m3 = _load_temp_module(tmp_path / "b", _HELPER_V3, "closure_mod")
    assert plan_stamps.closure_digest(m1.caller) == plan_stamps.closure_digest(
        m3.caller
    )


def test_closure_walk_reaches_stateful_kernels():
    """The exact r14 blind-spot instances: both applyInPandasWithState
    consumers must transitively reach their kernel-bearing builders in
    streaming/stateful.py, including through an in-function relative
    import (s_shard_assign does `from ..streaming.stateful import ...`
    inside the query body)."""
    from spring_cloud_kafka_streams_dbz_etl_spark.queries import all_queries

    qs = all_queries()
    ent = plan_stamps.closure_entries(qs["s_shard_assign"].fn)
    assert any(k.endswith("stateful.running_shard_assign") for k in ent)
    ent = plan_stamps.closure_entries(qs["s_stateful_count"].fn)
    assert any(k.endswith("stateful.running_user_counters") for k in ent)


def test_diff_flags_closure_only_change(tmp_path, monkeypatch, capsys):
    old = {
        "a": {"plan": "p1", "src": "s1", "closures": "c1"},
        "legacy": {"plan": "p2", "src": "s2"},  # pre-closure-digest stamp
    }
    stamp_file = tmp_path / "PLAN_STAMPS.json"
    stamp_file.write_text(json.dumps(old))
    monkeypatch.setattr(plan_stamps, "STAMP_FILE", str(stamp_file))
    # closure digest moved, plan+src identical -> flagged
    rc = plan_stamps.diff(
        {"a": {"plan": "p1", "src": "s1", "closures": "cX"}}
    )
    out = capsys.readouterr().out
    assert rc == 1
    assert "CHANGED a  [closure-only (Python kernel/helper body change!)]" in out
    # a legacy stamp with no closures key compares as unchanged
    rc = plan_stamps.diff(
        {"legacy": {"plan": "p2", "src": "s2", "closures": "c9"}}
    )
    assert rc == 0
