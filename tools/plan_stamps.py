#!/usr/bin/env python
"""Per-query physical-plan stamps — automated transitive re-front
detection (VERDICT r13 ask #2).

The rotation's CHANGED_SINCE_CHECK discipline was manual: when a shared
helper changes (``_pca_model`` extraction, ``lsh_bits_for``
integer-exactness in r13), the builder had to *remember* which consumers'
plans changed and re-front them. At 244 registered queries that is the
next silent-staleness risk — a helper edit that shifts a downstream plan
without anyone noticing leaves a green driver row attached to a plan that
no longer exists.

This tool makes the detection mechanical:

  python tools/plan_stamps.py             # stamp all queries at sf0.001
  python tools/plan_stamps.py --diff      # compare against PLAN_STAMPS.json
  python tools/plan_stamps.py --only a,b  # spot-stamp a subset

For every registered query it builds the DataFrame at sf0.001 and hashes
the CANONICALIZED optimized logical plan (expression IDs normalized by
Catalyst, volatile run-local tokens — temp checkpoint paths, uuid-suffixed
memory-sink names, RDD ids — normalized here). A committed
``PLAN_STAMPS.json`` then gives each round a ground truth: any query whose
stamp differs from the prior round's file changed plan shape or
driver-computed literals (knob values, trained-model literals) and MUST
either re-front via CHANGED_SINCE_CHECK or be explained.

A second, coarser signal is stamped alongside: the sha of the query
function's own source. ``src`` changing without ``plan`` changing is a
comment/doc edit; ``plan`` changing without ``src`` changing is exactly
the transitive-helper case this tool exists to catch.

Cost note: batch queries stamp lazily (no job runs — plan-only, ~0.1 s
each). Streaming queries EXECUTE on call (their returned DataFrame is the
read-back of a memory sink / state store), so a full stamp run costs a few
minutes at sf0.001 — a per-round tool, not a pre-commit hook. Determinism:
stamps are stable across processes on one machine + Spark version (pinned
by test_plan_stamps.py); cross-round comparison assumes the same driver
environment, which the harness provides.
"""

from __future__ import annotations

import argparse
import hashlib
import inspect
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STAMP_FILE = os.path.join(REPO, "PLAN_STAMPS.json")
DEFAULT_SF = os.environ.get("SPARK_GRAFT_STAMP_SF", "/root/testdata/sf0.001")

# Volatile run-local tokens, normalized before hashing. Order matters:
# paths first (they may contain hex runs), then bare hex runs.
_NORMALIZERS: list[tuple[re.Pattern[str], str]] = [
    # temp checkpoint/source dirs (tempfile.mkdtemp) and anything under
    # the system temp root, including when suffixed with [...] or quoted
    (re.compile(r"(?:file:)?/(?:tmp|var/folders)/[^\s\],)]+"), "<TMP>"),
    # spark-warehouse / derby side paths embedded by some sinks
    (re.compile(re.escape(REPO) + r"/[^\s\],)]+"), "<REPO>"),
    # uuid-suffixed memory-sink / stream names (chain_ab12cd34, cfeed_...)
    # and any >=8-char hex run (uuids, digest literals in temp names)
    (re.compile(r"[0-9a-f]{8,}", re.IGNORECASE), "<HEX>"),
    # expression ids survive canonicalization in some fallback paths
    (re.compile(r"#\d+L?"), "#x"),
    # cached-plan internals: RDD ids / storage-level object addresses
    (re.compile(r"\b(?:rdd_|MapPartitionsRDD\[)\d+\]?"), "<RDD>"),
    (re.compile(r"@[0-9a-f]{6,}", re.IGNORECASE), "@obj"),
]


def normalize(plan: str) -> str:
    for pat, repl in _NORMALIZERS:
        plan = pat.sub(repl, plan)
    return plan


def _sha(text: str) -> str:
    return hashlib.sha256(text.encode()).hexdigest()[:16]


def plan_text(df) -> str:
    """Canonicalized optimized logical plan (stable expr ids); falls back
    to the raw optimized plan string if canonicalization throws (it can
    on plans holding foreign expressions, e.g. python data sources)."""
    qe = df._jdf.queryExecution()
    try:
        raw = qe.optimizedPlan().canonicalized().toString()
    except Exception:
        raw = qe.optimizedPlan().toString()
    return normalize(raw)


def stamp_one(spark, name: str, spec, sf_dir: str) -> dict[str, str]:
    df = spec.fn(spark, sf_dir)
    src = inspect.getsource(inspect.unwrap(spec.fn))
    return {"plan": _sha(plan_text(df)), "src": _sha(src)}


def run(sf_dir: str, only: set[str] | None) -> dict[str, dict[str, str]]:
    from spring_cloud_kafka_streams_dbz_etl_spark.queries import all_queries
    from spring_cloud_kafka_streams_dbz_etl_spark.session import get_spark

    spark = get_spark("plan-stamps")
    stamps: dict[str, dict[str, str]] = {}
    specs = all_queries()
    todo = [n for n in specs if only is None or n in only]
    for i, name in enumerate(sorted(todo), 1):
        try:
            stamps[name] = stamp_one(spark, name, specs[name], sf_dir)
        except Exception as exc:  # stamp failures are findings, not aborts
            stamps[name] = {"plan": f"ERROR:{type(exc).__name__}", "src": ""}
        print(f"[{i}/{len(todo)}] {name} {stamps[name]['plan']}", file=sys.stderr)
    return stamps


def diff(new: dict[str, dict[str, str]]) -> int:
    try:
        with open(STAMP_FILE) as f:
            old = json.load(f)
    except (OSError, ValueError):
        print("no prior PLAN_STAMPS.json — nothing to diff", file=sys.stderr)
        return 0
    changed, added, removed = [], [], sorted(set(old) - set(new))
    for name, st in sorted(new.items()):
        if name not in old:
            added.append(name)
        elif old[name]["plan"] != st["plan"]:
            kind = (
                "plan+src" if old[name].get("src") != st.get("src")
                else "plan-only (transitive helper change!)"
            )
            changed.append((name, kind))
    for name, kind in changed:
        print(f"CHANGED {name}  [{kind}]")
    for name in added:
        print(f"NEW     {name}")
    for name in removed:
        print(f"REMOVED {name}")
    if changed:
        print(
            f"\n{len(changed)} plan(s) changed since the committed stamps — "
            "each needs a fresh driver row: add to rotation.CHANGED_SINCE_CHECK "
            "(or document why the change is non-material).",
            file=sys.stderr,
        )
    return 1 if changed else 0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=DEFAULT_SF)
    ap.add_argument("--only", default=None, help="comma-separated names")
    ap.add_argument("--diff", action="store_true",
                    help="compare against committed stamps; don't rewrite")
    ap.add_argument("--out", default=STAMP_FILE)
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None
    stamps = run(args.sf, only)
    if args.diff:
        sys.exit(diff(stamps))
    if only:
        # spot-stamp: merge into the existing file instead of truncating
        try:
            with open(args.out) as f:
                merged = json.load(f)
        except (OSError, ValueError):
            merged = {}
        merged.update(stamps)
        stamps = merged
    with open(args.out, "w") as f:
        json.dump(dict(sorted(stamps.items())), f, indent=1)
        f.write("\n")
    print(f"wrote {len(stamps)} stamps to {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
