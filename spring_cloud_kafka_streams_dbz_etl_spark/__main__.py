"""Operational front door: ``python -m spring_cloud_kafka_streams_dbz_etl_spark``.

Subcommands:
  list                       — registered queries (rotation order), oracle'd flag
  run <query> [--sf DIR]     — run one registered query, print rows (capped)
  sql "<stmt>" [--sf DIR]    — ad-hoc Spark SQL over the registered views
  serve [--port N] [--sf DIR]— start the HTTP control plane (stream registry
                               + manual export + schema registry routes) over
                               the demo CDC pipeline

The reference splits these across two Spring apps and REST controllers;
here one entrypoint covers query execution and the control plane.
"""

from __future__ import annotations

import argparse
import sys


def _spark():
    from .session import get_spark

    return get_spark("scksde-cli")


def cmd_list(_args) -> int:
    from .queries import all_queries

    for name, spec in all_queries().items():
        flags = []
        if spec.oracle is not None:
            flags.append("oracled")
        if spec.bench:
            flags.append("bench")
        print(f"{name:28s} {' '.join(flags)}")
    return 0


def cmd_run(args) -> int:
    from .queries import all_queries

    specs = all_queries()
    if args.query not in specs:
        print(f"unknown query {args.query!r}; see `list`", file=sys.stderr)
        return 2
    df = specs[args.query].fn(_spark(), args.sf)
    # single execution: fetch limit+1 rows once instead of show()+count()
    # (count() would re-run the whole query — painful for the iterative ones)
    rows = df.take(args.limit + 1)
    import pandas as pd

    print(pd.DataFrame(rows[: args.limit], columns=df.columns).to_string(index=False))
    more = " (more rows exist)" if len(rows) > args.limit else ""
    print(f"({len(rows[: args.limit])} rows shown{more})")
    return 0


def cmd_sql(args) -> int:
    from .catalog import register_views
    from .session import tune

    spark = _spark()
    tune(spark)
    register_views(spark, args.sf)
    spark.sql(args.statement).show(args.limit, truncate=False)
    return 0


def cmd_serve(args) -> int:
    import glob
    import os
    import tempfile

    from .sources.avro_codec import SchemaRegistry
    from .sources.sinks import upsert_dimension
    from .streaming.dimstore import DimStore
    from .streaming.export import make_exporter
    from .streaming.http_facade import StreamControlHttp
    from .streaming.pipeline import CdcPipelineConfig, build_cdc_pipeline
    from .streaming.registry import StreamRegistry

    spark = _spark()
    out = args.out or tempfile.mkdtemp(prefix="scksde_out_")
    dlq, ckpt = tempfile.mkdtemp(prefix="scksde_dlq_"), tempfile.mkdtemp(
        prefix="scksde_ckpt_"
    )
    # Writable working dir: events symlinked read-only from the sf dir, the
    # customer dimension seeded as a VERSIONED CRUD store so the HTTP
    # CRUD routes can write it (testdata itself is never written).
    src_dir = tempfile.mkdtemp(prefix="scksde_src_")
    for f in glob.glob(os.path.join(args.sf, "events*.parquet")):
        os.symlink(f, os.path.join(src_dir, os.path.basename(f)))
    dim_path = os.path.join(src_dir, "customer.parquet")
    upsert_dimension(
        spark.read.parquet(os.path.join(args.sf, "customer.parquet")),
        dim_path,
        keys=["c_custkey"],
    )
    reg = StreamRegistry()
    cfg = CdcPipelineConfig(sf_dir=src_dir, out_path=out, dlq_path=dlq, checkpoint=ckpt)
    reg.register("cdc", build_cdc_pipeline(spark, cfg), checkpoint=ckpt)
    srv = StreamControlHttp(
        reg,
        port=args.port,
        exporter=make_exporter(spark, {"events": out}),
        schema_registry=SchemaRegistry(),
        dim_store=DimStore(spark, {"customer": (dim_path, "c_custkey")}),
    )
    port = srv.start()
    print(f"control plane on http://127.0.0.1:{port} (sink: {out}); Ctrl-C to stop")
    try:
        import time

        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        pass
    finally:
        srv.stop()
        reg.stop_all()
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="spring_cloud_kafka_streams_dbz_etl_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list").set_defaults(fn=cmd_list)
    r = sub.add_parser("run")
    r.add_argument("query")
    r.add_argument("--sf", default="/root/testdata/sf0.01")
    r.add_argument("--limit", type=int, default=20)
    r.set_defaults(fn=cmd_run)
    q = sub.add_parser("sql")
    q.add_argument("statement")
    q.add_argument("--sf", default="/root/testdata/sf0.01")
    q.add_argument("--limit", type=int, default=20)
    q.set_defaults(fn=cmd_sql)
    s = sub.add_parser("serve")
    s.add_argument("--port", type=int, default=0)
    s.add_argument("--sf", default="/root/testdata/sf0.01")
    s.add_argument("--out", default=None)
    s.set_defaults(fn=cmd_serve)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
