"""q_variant_json row-level degradation on dirty payloads (ADVICE r7 #2).

The driver fixture's props column is clean JSON, so the oracle-parity row
can't distinguish "malformed props nulls only k" from "malformed props
nulls the whole envelope and regroups the row into the NULL group". This
test feeds a deliberately dirty events table: the grouping columns
(event_type, user_id) must come through untouched — only k degrades to
NULL on the bad rows, exactly DuckDB's json_extract-on-clean / missing
behavior extended row-wise.
"""

from __future__ import annotations

from spring_cloud_kafka_streams_dbz_etl_spark.queries.sourcefmt import q_variant_json


def test_variant_json_malformed_props_keep_their_group(spark, tmp_path):
    rows = [
        # (event_id, event_type, user_id, props)
        (1, "click", 10, '{"k": 3}'),
        (2, "click", 11, '{"k": 4}'),
        (3, "click", 12, "{not json at all"),  # malformed → k NULL only
        (4, "view", 20, None),  # NULL props → k NULL only
        (5, "view", 21, '{"other": 1}'),  # missing path → k NULL
        (6, "view", 20, '{"k": 7}'),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, user_id long, props string"
    )
    sf = str(tmp_path / "dirty_sf")
    df.coalesce(1).write.parquet(f"{sf}/events.parquet")

    got = {
        r["etype"]: (r["n_events"], r["sum_k"], r["max_k"], r["n_users"])
        for r in q_variant_json(spark, sf).collect()
    }
    # the malformed row 3 stays in the 'click' group (n_events=3) with k
    # excluded from sum/max; no NULL etype group may exist
    assert set(got) == {"click", "view"}
    assert got["click"] == (3, 7, 4, 3)
    assert got["view"] == (3, 7, 7, 2)
