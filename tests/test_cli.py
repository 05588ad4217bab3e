"""CLI front door + SQL-view registration tests (in-process main())."""

from __future__ import annotations

from spring_cloud_kafka_streams_dbz_etl_spark.__main__ import main


def test_cli_list(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "q_agg_group" in out and "oracled" in out and "bench" in out


def test_cli_run_query(spark, sf_smoke, capsys):
    assert main(["run", "q_agg_group", "--sf", sf_smoke, "--limit", "3"]) == 0
    out = capsys.readouterr().out
    assert "rows shown" in out
    assert main(["run", "nope"]) == 2


def test_cli_sql_over_views(spark, sf_smoke, capsys):
    assert (
        main(
            [
                "sql",
                "SELECT r_name, count(*) AS n FROM region r "
                "JOIN nation n ON n.n_regionkey = r.r_regionkey "
                "GROUP BY r_name ORDER BY r_name",
                "--sf",
                sf_smoke,
            ]
        )
        == 0
    )
    out = capsys.readouterr().out
    assert "r_name" in out


def test_register_views_matches_catalog(spark, sf_smoke):
    from spring_cloud_kafka_streams_dbz_etl_spark.catalog import TABLES, register_views, table

    register_views(spark, sf_smoke, suffix="_v")
    for t in TABLES:
        assert (
            spark.sql(f"SELECT count(*) FROM {t}_v").first()[0]
            == table(spark, sf_smoke, t).count()
        )


def test_serve_dim_crud_end_to_end(spark, sf_smoke, tmp_path):
    """`serve` wires the dimension CRUD store: a PUT through the HTTP
    facade is visible to the NEXT micro-batch's enrichment — the
    reference's controller-write-then-stream-read loop through the CLI
    wiring (not a stub registry)."""
    import glob
    import json
    import os
    import urllib.request

    from spring_cloud_kafka_streams_dbz_etl_spark.sources.sinks import (
        upsert_dimension,
    )
    from spring_cloud_kafka_streams_dbz_etl_spark.streaming.dimstore import DimStore
    from spring_cloud_kafka_streams_dbz_etl_spark.streaming.http_facade import (
        StreamControlHttp,
    )
    from spring_cloud_kafka_streams_dbz_etl_spark.streaming.pipeline import (
        CdcPipelineConfig,
        build_cdc_pipeline,
    )
    from spring_cloud_kafka_streams_dbz_etl_spark.streaming.registry import (
        StreamRegistry,
    )

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    for f in glob.glob(os.path.join(sf_smoke, "events*.parquet")):
        os.symlink(f, src_dir / os.path.basename(f))
    dim_path = str(src_dir / "customer.parquet")
    upsert_dimension(
        spark.read.parquet(os.path.join(sf_smoke, "customer.parquet")),
        dim_path,
        keys=["c_custkey"],
    )
    reg = StreamRegistry()
    cfg = CdcPipelineConfig(
        sf_dir=str(src_dir),
        out_path=str(tmp_path / "out"),
        dlq_path=str(tmp_path / "dlq"),
        checkpoint=str(tmp_path / "ckpt"),
    )
    reg.register("cdc", build_cdc_pipeline(spark, cfg), checkpoint=str(tmp_path / "ckpt"))
    srv = StreamControlHttp(
        reg, dim_store=DimStore(spark, {"customer": (dim_path, "c_custkey")})
    )
    port = srv.start()
    try:
        reg.process_available("cdc")
        # rename customer 1 over HTTP, then read it back through the store
        row = json.loads(
            urllib.request.urlopen(f"http://127.0.0.1:{port}/api/dim/customer/1").read()
        )
        row.pop("timestamp", None)  # facade response stamp, not a dim column
        row["c_name"] = "RENAMED-VIA-HTTP"
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/dim/customer/1",
            data=json.dumps(row).encode(),
            method="PUT",
        )
        assert urllib.request.urlopen(req).status == 200
        got = json.loads(
            urllib.request.urlopen(f"http://127.0.0.1:{port}/api/dim/customer/1").read()
        )
        assert got["c_name"] == "RENAMED-VIA-HTTP"
        # the pipeline's next micro-batch reads the updated dimension
        from spring_cloud_kafka_streams_dbz_etl_spark.sources.sinks import (
            load_dimension,
        )

        assert (
            load_dimension(spark, dim_path)
            .filter("c_custkey = 1")
            .collect()[0]["c_name"]
            == "RENAMED-VIA-HTTP"
        )
    finally:
        srv.stop()
        reg.stop("cdc")
