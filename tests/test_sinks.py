"""Partitioned/bucketed sink tests: layout + pruning/shuffle-elimination
properties that matter at scale."""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import functions as F

from spring_cloud_kafka_streams_dbz_etl_spark.catalog import table
from spring_cloud_kafka_streams_dbz_etl_spark.plans import explain_str
from spring_cloud_kafka_streams_dbz_etl_spark.sources.sinks import (
    read_partition_pruned,
    write_bucketed,
    write_partitioned,
)


def test_partitioned_write_prunes(spark, sf_smoke):
    out = tempfile.mkdtemp(prefix="scksde_part_")
    ev = table(spark, sf_smoke, "events")
    write_partitioned(ev, out, ["event_type"])
    # hive-style directories exist
    assert any(d.startswith("event_type=") for d in os.listdir(out))
    back = read_partition_pruned(spark, out).filter(F.col("event_type") == "click")
    text = explain_str(back)
    assert "PartitionFilters" in text and "event_type" in text.split("PartitionFilters")[1][:200]
    assert back.count() == ev.filter("event_type = 'click'").count()


def test_bucketed_join_skips_shuffle(spark, sf_smoke):
    suffix = uuid.uuid4().hex[:6]
    ev = table(spark, sf_smoke, "events")
    cust = table(spark, sf_smoke, "customer")
    write_bucketed(ev, f"ev_b_{suffix}", ["user_id"], num_buckets=8)
    write_bucketed(
        cust.withColumnRenamed("c_custkey", "user_id"), f"cust_b_{suffix}", ["user_id"], 8
    )
    a = spark.table(f"ev_b_{suffix}")
    b = spark.table(f"cust_b_{suffix}")
    # disable broadcast so the join would need a shuffle if not bucketed
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "user_id")
        text = explain_str(joined)
        assert "SortMergeJoin" in text
        assert "Exchange hashpartitioning" not in text, "bucketed join must not shuffle"
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql(f"DROP TABLE IF EXISTS ev_b_{suffix}")
        spark.sql(f"DROP TABLE IF EXISTS cust_b_{suffix}")


# -- dimension CRUD (§2A #22) ------------------------------------------------


def test_upsert_dimension_latest_wins_and_append(spark, tmp_path):
    from spring_cloud_kafka_streams_dbz_etl_spark.sources.sinks import (
        delete_from_dimension,
        load_dimension,
        upsert_dimension,
    )

    path = str(tmp_path / "dim")
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "k int, name string, v double"
    )
    info = upsert_dimension(base, path, keys=["k"])
    assert info["total"] == 2

    # replace k=2, append k=3
    up = spark.createDataFrame(
        [(2, "b2", 21.0), (3, "c", 30.0)], "k int, name string, v double"
    )
    info = upsert_dimension(up, path, keys=["k"])
    assert info == {"upserted": 2, "total": 3, "path": path}
    rows = {r.k: r for r in load_dimension(spark, path).collect()}
    assert rows[1].name == "a"          # untouched key kept
    assert rows[2].name == "b2" and rows[2].v == 21.0  # replaced, not duplicated
    assert rows[3].name == "c"          # new key appended

    # schema drift fails loudly
    import pytest

    with pytest.raises(ValueError):
        upsert_dimension(
            spark.createDataFrame([(9,)], "k int"), path, keys=["k"]
        )

    # delete side
    info = delete_from_dimension(
        spark, path, keys=["k"], keys_df=spark.createDataFrame([(1,)], "k int")
    )
    assert info["total"] == 2
    assert sorted(r.k for r in load_dimension(spark, path).collect()) == [2, 3]

    # commit hygiene: only the latest two committed versions remain, no
    # staging leftovers (3 CRUD commits happened -> _v00002/_v00003)
    import os

    entries = sorted(os.listdir(path))
    assert entries == ["_v00002", "_v00003"]

    # static-dim fallback: load_dimension on a plain parquet path
    plain = str(tmp_path / "static")
    base.write.parquet(plain)
    assert load_dimension(spark, plain).count() == 2


def test_upsert_rejects_duplicate_key_batch(spark, tmp_path):
    """Review finding r03: duplicate keys in one upsert batch have no
    defined winner and would give the dimension duplicate join keys —
    must fail loudly, not fan out enrichment."""
    import pytest

    from spring_cloud_kafka_streams_dbz_etl_spark.sources.sinks import (
        load_dimension,
        upsert_dimension,
    )

    path = str(tmp_path / "dim")
    upsert_dimension(
        spark.createDataFrame([(1, "a")], "k int, v string"), path, keys=["k"]
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        upsert_dimension(
            spark.createDataFrame([(2, "x"), (2, "y")], "k int, v string"),
            path,
            keys=["k"],
        )
    # dimension untouched by the rejected batch
    assert [r.k for r in load_dimension(spark, path).collect()] == [1]


def test_upsert_survives_interrupted_commit(spark, tmp_path):
    """Crash model of the versioned-commit layout: a writer dying before
    its atomic staging->version rename leaves only an invisible
    ``.staging_*`` dir. The dimension must stay fully readable the whole
    time, and the next CRUD call must merge against the committed state
    and clean the leftover."""
    import os

    from spring_cloud_kafka_streams_dbz_etl_spark.sources.sinks import (
        load_dimension,
        upsert_dimension,
    )

    path = str(tmp_path / "dim")
    upsert_dimension(
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"),
        path,
        keys=["k"],
    )
    # simulate the crash window: a half-written staging dir, never committed
    dead = f"{path}/.staging_deadbeef0000"
    os.makedirs(dead)
    with open(f"{dead}/part-00000.parquet", "w") as f:
        f.write("garbage")
    assert sorted(r.k for r in load_dimension(spark, path).collect()) == [1, 2]
    info = upsert_dimension(
        spark.createDataFrame([(3, "c")], "k int, v string"), path, keys=["k"]
    )
    assert info["total"] == 3  # prior rows kept, staging ignored
    assert sorted(r.k for r in load_dimension(spark, path).collect()) == [1, 2, 3]
    assert not os.path.exists(dead)  # dead staging pruned by the commit


def test_dynamic_partition_pruning_from_dim_filter(spark, sf_smoke, tmp_path):
    """Dynamic partition pruning: a fact table PARTITIONED on the join
    key must be pruned at runtime by a FILTERED dimension — the filter
    sits on the dim, never literally on the fact, yet only matching
    partitions are scanned. This is the 100 TB star-join contract: the
    dim filter decides which fact partitions exist in the plan, without
    the user rewriting the predicate onto the fact side."""
    out = str(tmp_path / "events_by_type")
    ev = spark.read.parquet(f"{sf_smoke}/events.parquet")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(out)

    dim = spark.createDataFrame(
        [("click", 1.5), ("purchase", 3.0), ("view", 0.5),
         ("signup", 2.0), ("error", 0.0)],
        "etype string, weight double",
    ).filter(F.col("weight") >= 2.0)  # keeps purchase + signup only

    fact = spark.read.parquet(out)
    joined = fact.join(dim, fact.event_type == dim.etype).select(
        "event_id", "event_type", "weight"
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:3000]
    # and the pruning is semantically right: only the two kept types survive
    types = {r.event_type for r in joined.select("event_type").distinct().collect()}
    assert types == {"purchase", "signup"}
