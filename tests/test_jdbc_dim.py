"""JDBC dimension source (reference §2A #22 source of truth; VERDICT r12
ask #5).

The reference's dimension store is Postgres via JPA
(app/src/main/java/com/example/app/repository/EventRepository.java:6);
SURVEY §1.4 maps it to "JDBC read or parquet dimension table". The
parquet half is sources/sinks.py's versioned store; this pins the JDBC
half. No live Postgres exists in the sandbox, but Spark bundles the
embedded Derby driver (derby-10.16.x in pyspark/jars), so the PLAN
SHAPE — filter pushdown into the generated SQL, column pruning,
partitioned range scan — is proven against a real JDBC relation, not
mocked. A Postgres URL swaps in with zero code changes.
"""

from __future__ import annotations

import os
import tempfile

import pytest

from spring_cloud_kafka_streams_dbz_etl_spark.sources.streams import (
    jdbc_dimension,
    jdbc_dimension_options,
)

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def test_option_assembly_full_quad():
    opts = jdbc_dimension_options(
        "jdbc:postgresql://db:5432/app",
        "public.customer",
        partition_column="c_custkey",
        lower_bound=1,
        upper_bound=150_000,
        num_partitions=16,
        fetchsize=5000,
        driver="org.postgresql.Driver",
    )
    assert opts == {
        "url": "jdbc:postgresql://db:5432/app",
        "dbtable": "public.customer",
        "fetchsize": "5000",
        "driver": "org.postgresql.Driver",
        "partitionColumn": "c_custkey",
        "lowerBound": "1",
        "upperBound": "150000",
        "numPartitions": "16",
    }


def test_option_assembly_rejects_partial_quad():
    with pytest.raises(ValueError, match="set together"):
        jdbc_dimension_options(
            "jdbc:postgresql://db:5432/app",
            "customer",
            partition_column="c_custkey",
            num_partitions=4,
        )


def test_option_assembly_unpartitioned_minimal():
    opts = jdbc_dimension_options("jdbc:derby:memory:d", "region")
    assert opts == {"url": "jdbc:derby:memory:d", "dbtable": "region", "fetchsize": "1000"}
    assert "partitionColumn" not in opts


@pytest.fixture(scope="module")
def derby_dim(spark, sf_smoke):
    """customer slice written to an embedded Derby DB via Spark's own
    JDBC writer — the round-trip also exercises the write path."""
    db = os.path.join(tempfile.mkdtemp(prefix="jdbc_dim_"), "dimdb")
    url = f"jdbc:derby:{db};create=true"
    src = spark.read.parquet(f"{sf_smoke}/customer.parquet").select(
        "c_custkey", "c_name", "c_mktsegment", "c_acctbal"
    )
    (
        src.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "customer_dim")
        .option("driver", DERBY_DRIVER)
        .save()
    )
    return url, src


def test_jdbc_dimension_roundtrip_values(spark, derby_dim):
    url, src = derby_dim
    got = jdbc_dimension(spark, url, "customer_dim", driver=DERBY_DRIVER)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, src.collect()))


def test_cdc_pipeline_enriches_from_jdbc_dimension(spark, sf_smoke, derby_dim):
    """End-to-end §2A #22: the CDC enrichment stream running with a JDBC
    database as the dimension source of truth (the reference's actual
    topology — Kafka stream × Postgres-backed lookup; here embedded
    Derby via cfg.dim_source, re-read per micro-batch like the
    reference's always-fresh JPA lookup). Output must be byte-identical
    to the same pipeline run against the parquet dimension."""
    import tempfile
    import uuid

    from spring_cloud_kafka_streams_dbz_etl_spark.streaming.pipeline import (
        ENRICHED_SCHEMA,
        CdcPipelineConfig,
        build_cdc_pipeline,
    )
    from spring_cloud_kafka_streams_dbz_etl_spark.streaming.registry import (
        StreamRegistry,
    )

    url, src = derby_dim

    def run(dim_source):
        d = tempfile.mkdtemp(prefix=f"jdbc_cdc_{uuid.uuid4().hex[:6]}_")
        cfg = CdcPipelineConfig(
            sf_dir=sf_smoke,
            out_path=f"{d}/out",
            dlq_path=f"{d}/dlq",
            checkpoint=f"{d}/ckpt",
            dim_source=dim_source,
        )
        reg = StreamRegistry()
        reg.register("jdbc_cdc", build_cdc_pipeline(spark, cfg), checkpoint=f"{d}/ckpt")
        reg.process_available("jdbc_cdc")
        reg.stop("jdbc_cdc")
        return sorted(
            map(tuple, spark.read.schema(ENRICHED_SCHEMA).parquet(f"{d}/out").collect())
        )

    jdbc_rows = run(
        lambda: jdbc_dimension(spark, url, "customer_dim", driver=DERBY_DRIVER)
    )
    parquet_rows = run(None)
    assert jdbc_rows == parquet_rows
    assert len(jdbc_rows) > 0


def test_jdbc_dimension_pushdown_and_partitioning(spark, derby_dim):
    """The scale pins: predicate lands in the remote SQL (PushedFilters),
    projection prunes to the selected columns (ReadSchema), and the
    partitioning quad yields numPartitions concurrent range scans."""
    url, src = derby_dim
    hi = src.agg({"c_custkey": "max"}).collect()[0][0]
    dim = jdbc_dimension(
        spark,
        url,
        "customer_dim",
        partition_column="c_custkey",
        lower_bound=1,
        upper_bound=int(hi),
        num_partitions=4,
        driver=DERBY_DRIVER,
    )
    out = dim.filter("c_acctbal > 100").select("c_custkey", "c_name")
    plan = out._jdf.queryExecution().executedPlan().toString()
    scan = next(line for line in plan.splitlines() if "JDBCRelation" in line)
    assert "numPartitions=4" in scan
    assert "GreaterThan(c_acctbal,100.0)" in scan  # filter pushed to the DB
    assert "ReadSchema: struct<c_custkey:bigint,c_name:string>" in scan  # pruned
    assert out.rdd.getNumPartitions() == 4
    # pushdown must not change results: compare against the parquet truth
    exp = sorted(
        (r["c_custkey"], r["c_name"])
        for r in src.filter("c_acctbal > 100").collect()
    )
    assert sorted(map(tuple, out.collect())) == exp
