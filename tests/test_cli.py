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
