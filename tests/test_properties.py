"""Property-based tests (hypothesis) for the custom operators.

The oracle-parity suite checks each operator on ONE fixed dataset; these
check the operator ALGEBRA on adversarial inputs hypothesis shrinks to —
duplicate timestamps, singleton keys, empty payloads, chain/star graphs.
Each example batches every generated case into a single DataFrame (cases
isolated by a case-id key column / id offset) so one Spark job verifies
the whole example — keeping hypothesis affordable on a JVM engine.

The reference repo has no property tests at all (SURVEY.md §5); this is
part of the "add what the reference lacks" test plan.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from spring_cloud_kafka_streams_dbz_etl_spark.operators.changelog import (
    materialize_changelog,
)
from spring_cloud_kafka_streams_dbz_etl_spark.operators.graph import (
    connected_components,
)
from spring_cloud_kafka_streams_dbz_etl_spark.operators.temporal import sessionize

SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,  # CI determinism: same cases every run
)

# -- changelog materialization ----------------------------------------------

change_stream = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),  # key id
        st.integers(min_value=0, max_value=20),  # ts
        st.sampled_from(["c", "u", "d"]),  # op
    ),
    min_size=0,
    max_size=25,
)


@given(st.lists(change_stream, min_size=1, max_size=8))
@settings(**SETTINGS)
def test_materialize_changelog_matches_replay(spark, cases):
    rows = []
    for case_id, changes in enumerate(cases):
        # seq disambiguates equal (ts) within a key — replay order
        for seq, (kid, ts, op) in enumerate(changes):
            rows.append((case_id, kid, ts, seq, op))
    if not rows:
        return
    df = spark.createDataFrame(
        rows, "case_id int, id int, ts int, seq int, op string"
    )
    got = {
        (r["case_id"], r["id"])
        for r in materialize_changelog(
            df, key_cols=["case_id", "id"], order_cols=["ts", "seq"]
        ).collect()
    }
    expected = set()
    for case_id, changes in enumerate(cases):
        # replay must apply by (ts, seq) order, not list order
        state: dict[int, str] = {}
        for kid, ts, op, seq in sorted(
            ((k, t, o, s) for s, (k, t, o) in enumerate(changes)),
            key=lambda x: (x[1], x[3]),
        ):
            state[kid] = op
        expected |= {(case_id, k) for k, op in state.items() if op != "d"}
    assert got == expected


# -- sessionization -----------------------------------------------------------

session_case = st.lists(
    st.integers(min_value=0, max_value=100), min_size=1, max_size=30
)  # event times (seconds), one key per case


@given(st.lists(session_case, min_size=1, max_size=8), st.integers(1, 10))
@settings(**SETTINGS)
def test_sessionize_matches_gap_model(spark, cases, gap_s):
    rows = []
    for case_id, times in enumerate(cases):
        for seq, t in enumerate(sorted(times)):
            rows.append((case_id, seq, t))
    df = spark.createDataFrame(rows, "key int, seq int, t_s long").select(
        "key", "seq", F.timestamp_seconds("t_s").alias("ts")
    )
    gap_us = gap_s * 1_000_000
    out = sessionize(df, key="key", time_col="ts", gap=F.lit(gap_us), order_tiebreak=["seq"])
    got = {
        (r["key"], r["seq"]): r["session_id"] for r in out.collect()
    }
    for case_id, times in enumerate(cases):
        sid, prev = 0, None
        for seq, t in enumerate(sorted(times)):
            if prev is None or (t - prev) * 1_000_000 > gap_us:
                sid += 1
            prev = t
            assert got[(case_id, seq)] == sid, (case_id, seq, t)


# -- connected components -----------------------------------------------------

graph_case = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=0, max_size=20
)


def _union_find_components(n_vertices: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = list(range(n_vertices))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component label = min member id per root
    by_root: dict[int, int] = {}
    for v in range(n_vertices):
        r = find(v)
        by_root[r] = min(by_root.get(r, v), v)
    return {v: by_root[find(v)] for v in range(n_vertices)}


@given(st.lists(graph_case, min_size=1, max_size=6))
@settings(**SETTINGS)
def test_connected_components_matches_union_find(spark, cases):
    N = 10  # vertices per case; offset isolates cases in one graph
    vrows, erows, expected = [], [], {}
    for case_id, edges in enumerate(cases):
        off = case_id * N
        vrows += [(off + v,) for v in range(N)]
        erows += [(off + a, off + b) for a, b in edges]
        for v, c in _union_find_components(N, edges).items():
            expected[off + v] = off + c
    vertices = spark.createDataFrame(vrows, "id long")
    edges_df = (
        spark.createDataFrame(erows, "src long, dst long")
        if erows
        else spark.createDataFrame([], "src long, dst long")
    )
    out = connected_components(vertices, edges_df, id_col="id")
    got = {r["id"]: r["component"] for r in out.collect()}
    assert got == expected


@given(st.lists(graph_case, min_size=1, max_size=4))
@settings(**SETTINGS)
def test_pointer_jumping_matches_union_find(spark, cases):
    from spring_cloud_kafka_streams_dbz_etl_spark.operators.graph import (
        connected_components_pointer_jumping,
    )

    N = 10
    vrows, erows, expected = [], [], {}
    for case_id, edges in enumerate(cases):
        off = case_id * N
        vrows += [(off + v,) for v in range(N)]
        erows += [(off + a, off + b) for a, b in edges]
        for v, c in _union_find_components(N, edges).items():
            expected[off + v] = off + c
    vertices = spark.createDataFrame(vrows, "id long")
    edges_df = (
        spark.createDataFrame(erows, "src long, dst long")
        if erows
        else spark.createDataFrame([], "src long, dst long")
    )
    out = connected_components_pointer_jumping(vertices, edges_df, id_col="id")
    got = {r["id"]: r["component"] for r in out.collect()}
    assert got == expected


def test_pointer_jumping_long_chain_few_rounds(spark):
    """The reason pointer-jumping exists: a 200-hop path graph converges
    in O(log d) rounds where min-label propagation needs one round PER HOP
    (it raises at max_iter=25 on this graph)."""
    import pytest

    from spring_cloud_kafka_streams_dbz_etl_spark.operators.graph import (
        connected_components,
        connected_components_pointer_jumping,
    )

    n = 200
    vertices = spark.range(n).withColumnRenamed("id", "id")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    out = connected_components_pointer_jumping(vertices, edges, id_col="id")
    assert {r["component"] for r in out.collect()} == {0}
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(vertices, edges, id_col="id", max_iter=25)


# -- Avro codec roundtrip ---------------------------------------------------
# Pure-Python codec — no Spark job per example, so a full hypothesis budget
# is affordable. The schema exercises every branch-selection path the
# ADVICE-r02 union fix added (multi-type unions, null branches, nesting).

_AVRO_PROP_SCHEMA = {
    "type": "record",
    "name": "Prop",
    "fields": [
        {"name": "u3", "type": ["null", "string", "long"]},
        {"name": "flag", "type": "boolean"},
        {"name": "xs", "type": {"type": "array", "items": "long"}},
        {"name": "m", "type": {"type": "map", "values": ["null", "double"]}},
        {"name": "blob", "type": "bytes"},
    ],
}

avro_value = st.fixed_dictionaries(
    {
        "u3": st.one_of(st.none(), st.text(max_size=20), st.integers(-(2**62), 2**62)),
        "flag": st.booleans(),
        "xs": st.lists(st.integers(-(2**62), 2**62), max_size=8),
        "m": st.dictionaries(
            st.text(max_size=8),
            st.one_of(
                st.none(),
                st.floats(allow_nan=False, allow_infinity=False, width=64),
            ),
            max_size=5,
        ),
        "blob": st.binary(max_size=32),
    }
)


@given(avro_value)
@settings(max_examples=200, deadline=None, derandomize=True)
def test_avro_codec_roundtrip_property(value):
    import json as _json

    from spring_cloud_kafka_streams_dbz_etl_spark.sources.avro_codec import AvroCodec

    c = AvroCodec(_json.dumps(_AVRO_PROP_SCHEMA))
    assert c.decode(c.encode(value)) == value


# -- as-of join (backward, inclusive) --------------------------------------

asof_case = st.tuples(
    st.lists(  # left events: (key, t)
        st.tuples(st.integers(0, 3), st.integers(0, 30)), min_size=1, max_size=12
    ),
    st.lists(  # right versions: (key, t, payload)
        st.tuples(st.integers(0, 3), st.integers(0, 30), st.integers(0, 99)),
        max_size=12,
    ),
)


@given(st.lists(asof_case, min_size=1, max_size=4))
@settings(**SETTINGS)
def test_asof_join_matches_model(spark, cases):
    """asof_join_backward == 'greatest right_t <= left_t per key', with the
    right side pre-deduped latest-wins per (key, t) as the contract demands."""
    from spring_cloud_kafka_streams_dbz_etl_spark.operators.temporal import (
        asof_join_backward,
    )

    K = 10
    lrows, rrows, expected = [], [], {}
    for case_id, (left, right) in enumerate(cases):
        off = case_id * K
        # dedup right per (key, t): keep the LARGEST payload (deterministic)
        best: dict[tuple[int, int], int] = {}
        for k, t, p in right:
            best[(k, t)] = max(best.get((k, t), -1), p)
        rrows += [(off + k, t, p) for (k, t), p in best.items()]
        for i, (k, t) in enumerate(left):
            lid = off * 100 + i
            lrows.append((lid, off + k, t))
            cands = [(rt, p) for (rk, rt), p in best.items() if rk == k and rt <= t]
            expected[lid] = max(cands)[1] if cands else None
    ldf = spark.createDataFrame(lrows, "event_id long, k long, t long")
    rdf = (
        spark.createDataFrame(rrows, "k long, t long, payload long")
        if rrows
        else spark.createDataFrame([], "k long, t long, payload long")
    )
    out = asof_join_backward(
        ldf, rdf, key="k", left_time="t", right_time="t", payload_cols=["payload"]
    )
    got = {r.event_id: r.asof_payload for r in out.collect()}
    assert got == expected


# -- winnowing fingerprints -------------------------------------------------

winnow_case = st.lists(
    st.lists(st.integers(0, 9), min_size=6, max_size=20),  # token-id docs
    min_size=2,
    max_size=4,
)


@given(winnow_case)
@settings(**SETTINGS)
def test_winnow_guarantee_shared_substring_shares_fingerprint(spark, docs_tokens):
    """The winnowing guarantee (Schleimer et al.): two documents sharing a
    token substring of length >= n + window - 1 MUST share at least one
    fingerprint. Construct that case explicitly by splicing a common run
    into every generated doc, and verify; also verify fingerprints are a
    subset of each doc's gram hashes (no phantom fingerprints)."""
    from spring_cloud_kafka_streams_dbz_etl_spark.operators.dedup import (
        winnow_fingerprints,
    )

    n, window = 3, 4
    common = [7, 1, 7, 2, 7, 3]  # length n + window - 1 = 6
    rows = []
    for i, toks in enumerate(docs_tokens):
        mid = len(toks) // 2
        spliced = toks[:mid] + common + toks[mid:]
        rows.append((i, [f"t{x}" for x in spliced]))
    df = spark.createDataFrame(rows, "doc_id long, toks array<string>")
    fp = winnow_fingerprints(df, "doc_id", "toks", n=n, window=window)
    by_doc = {}
    for r in fp.collect():
        by_doc.setdefault(r.doc_id, set()).add(r.wmin)
    # guarantee: every pair shares >= 1 fingerprint (all contain `common`)
    ids = sorted(by_doc)
    assert ids == list(range(len(rows)))
    for a in ids:
        for b in ids:
            if a < b:
                assert by_doc[a] & by_doc[b], (a, b)


@settings(deadline=None, max_examples=20, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.tuples(st.integers(0, (1 << 16) - 1), st.integers(0, (1 << 16) - 1)),
        min_size=1,
        max_size=40,
        unique=True,
    )
)
def test_zvalue_interleave_is_bijective_and_prefix_bounds_dims(spark, pairs):
    """Morton-code properties q_zorder_layout relies on: (a) the
    interleave is a BIJECTION on (a, b) bucket pairs — distinct inputs
    never collide, and de-interleaving recovers the inputs exactly;
    (b) a z-prefix (file id) fixes the top bits of BOTH dimensions, the
    min/max-bounding property that makes multi-column file skipping
    work."""
    from pyspark.sql import functions as F

    from spring_cloud_kafka_streams_dbz_etl_spark.operators.layout import (
        z_file_id,
        z_value,
    )

    df = spark.createDataFrame(pairs, "a long, b long")
    rows = df.select(
        "a",
        "b",
        z_value([F.col("a"), F.col("b")], 16).alias("z"),
        z_file_id(z_value([F.col("a"), F.col("b")], 16), 32, 64).alias("f"),
    ).collect()
    seen = {}
    for r in rows:
        # de-interleave: even z bits -> a, odd z bits -> b
        a = sum(((r.z >> (2 * i)) & 1) << i for i in range(16))
        b = sum(((r.z >> (2 * i + 1)) & 1) << i for i in range(16))
        assert (a, b) == (r.a, r.b), (r.a, r.b, r.z)
        assert r.z not in seen or seen[r.z] == (r.a, r.b)
        seen[r.z] = (r.a, r.b)
        # file id = top 6 z bits
        assert 0 <= r.f < 64
        assert r.f == (r.z >> 26) & 0x3F
        # same file -> same top-3 bits of both dims
    by_file: dict[int, list] = {}
    for r in rows:
        by_file.setdefault(r.f, []).append(r)
    for f, grp in by_file.items():
        assert len({r.a >> 13 for r in grp}) == 1, f
        assert len({r.b >> 13 for r in grp}) == 1, f


@settings(deadline=None, max_examples=50)
@given(
    st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1),
    st.sets(st.integers(0, 63), max_size=3),
    st.integers(0, (1 << 16) - 1),
    st.sets(st.integers(0, 15), max_size=3),
)
def test_simhash_block_pigeonhole_both_widths(fp64, flips64, fp16, flips16):
    """The Manku block-permutation guarantee q_simhash_near_dup relies on:
    flipping at most d = max_hamming bits of a fingerprint split into
    d+1 blocks always leaves >= 1 block bit-identical (pigeonhole), so
    the (block_idx, block_val) equi-join's candidate set is COMPLETE —
    every true near-dup pair is a candidate. Pinned at the 64-bit
    production width (16-bit blocks) and the 16-bit oracle width (4-bit
    blocks)."""
    from spring_cloud_kafka_streams_dbz_etl_spark.queries.dedup import (
        SIMHASH_BLOCK_BITS,
        SIMHASH_BLOCKS,
        SIMHASH_MAX_HAMMING,
    )

    assert SIMHASH_BLOCKS == SIMHASH_MAX_HAMMING + 1

    def blocks(x, n_blocks, bits):
        mask = (1 << bits) - 1
        return [(x >> (b * bits)) & mask for b in range(n_blocks)]

    for fp, flips, width, n_blocks, bits in (
        (fp64, flips64, 64, SIMHASH_BLOCKS, SIMHASH_BLOCK_BITS),
        (fp16, flips16, 16, 4, 4),
    ):
        other = fp
        for j in flips:
            other ^= 1 << j
        # two's-complement wrap for the 64-bit signed fingerprint
        if width == 64 and other >= 1 << 63:
            other -= 1 << 64
        if width == 64 and other < -(1 << 63):
            other += 1 << 64
        ham = bin((fp ^ other) & ((1 << width) - 1)).count("1")
        assert ham <= SIMHASH_MAX_HAMMING
        shared = [
            a == b
            for a, b in zip(blocks(fp, n_blocks, bits), blocks(other, n_blocks, bits))
        ]
        assert any(shared), (fp, other, width)


def test_simhash_width_for_tracks_corpus_size():
    """simhash_width_for follows lsh_bits_for's occupancy rule: width
    grows with corpus size so E|block bucket| stays <= target, capping at
    the 64-bit BIGINT fingerprint."""
    from spring_cloud_kafka_streams_dbz_etl_spark.operators.dedup import (
        simhash_width_for,
    )

    assert simhash_width_for(10_000) == 32  # floor of 8 bits/block * 4
    assert simhash_width_for(1_000_000) == 40  # ceil(log2(1e6/1024)) = 10
    assert simhash_width_for(1_000_000_000) == 64  # 20 bits/block, capped
    assert simhash_width_for(10**12) == 64  # cap
    # monotone in n
    widths = [simhash_width_for(n) for n in (10**3, 10**5, 10**7, 10**9)]
    assert widths == sorted(widths)


def test_simhash_bits_matches_python_model(spark):
    """simhash_bits(width=64) equals a direct Python computation of the
    same nibble-bit vote scheme, including the sign-bit (two's complement)
    assembly for bit 63."""
    import hashlib

    from spring_cloud_kafka_streams_dbz_etl_spark.operators.dedup import simhash_bits

    docs = [
        (1, ["alpha", "beta", "gamma"]),
        (2, ["alpha", "beta", "gamma", "delta"]),
        (3, ["zed"]),
    ]

    def model(toks):
        votes = [0] * 64
        for t in set(toks):
            hx = hashlib.md5(t.encode()).hexdigest()
            for j in range(64):
                nib = int(hx[j // 4], 16)
                votes[j] += 1 if (nib >> (j % 4)) & 1 else -1
        fp = 0
        for j in range(63):
            if votes[j] > 0:
                fp += 1 << j
        if votes[63] > 0:
            fp += -(1 << 63)
        return fp

    from spring_cloud_kafka_streams_dbz_etl_spark.operators.dedup import (
        simhash_bits_arrow,
    )

    df = spark.createDataFrame(docs, "doc_id long, toks array<string>")
    for op in (simhash_bits, simhash_bits_arrow):
        got = {r.doc_id: r.simhash for r in op(df, "doc_id", "toks").collect()}
        for doc_id, toks in docs:
            assert got[doc_id] == model(toks), (op.__name__, doc_id)


def test_simhash_arrow_memo_cap_bounds_memory_not_results(spark):
    """The md5 memo inside simhash_bits_arrow is a pure cache bounded by
    memo_cap (VERDICT r17 #3): a task whose batches carry far more
    distinct tokens than the cap must produce fingerprints identical to
    the uncapped kernel AND the JVM form — the `len(memo) < memo_cap`
    guard stops insertion (bounding the dict at cap entries for the
    task's lifetime) without ever changing a digest. Runs on ONE
    partition so a single task sees every distinct token."""
    from spring_cloud_kafka_streams_dbz_etl_spark.operators.dedup import (
        simhash_bits,
        simhash_bits_arrow,
    )

    # 40 docs x 50 unique tokens = 2000 distinct tokens >> cap=16, with
    # some cross-doc repetition so the memo's hot path is exercised too
    docs = [
        (i, [f"tok_{i}_{j}" for j in range(50)] + ["shared_a", "shared_b"])
        for i in range(40)
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, toks array<string>"
    ).coalesce(1)
    capped = {
        r.doc_id: r.simhash
        for r in simhash_bits_arrow(df, "doc_id", "toks", memo_cap=16).collect()
    }
    uncapped = {
        r.doc_id: r.simhash
        for r in simhash_bits_arrow(df, "doc_id", "toks").collect()
    }
    jvm = {
        r.doc_id: r.simhash for r in simhash_bits(df, "doc_id", "toks").collect()
    }
    assert capped == uncapped == jvm
    assert len(capped) == len(docs)


@settings(deadline=None, max_examples=8, suppress_health_check=[HealthCheck.function_scoped_fixture], derandomize=True)
@given(
    st.lists(
        st.lists(st.integers(0, 12), min_size=1, max_size=8, unique=True),
        min_size=2,
        max_size=12,
    )
)
def test_prefix_filter_candidates_complete_vs_bruteforce(spark, sets):
    """Prefix-filter guarantee q_ngram_jaccard relies on: every pair with
    Jaccard >= t appears in the candidate set (completeness). Brute-force
    all-pairs Jaccard over hypothesis-generated element sets (heavy
    overlap by construction: elements drawn from a 13-value universe) is
    the model."""
    from spring_cloud_kafka_streams_dbz_etl_spark.operators.dedup import (
        prefix_filter_candidates,
    )

    t_num, t_den = 3, 10
    rows = [(i, [f"e{e}" for e in s]) for i, s in enumerate(sets)]
    df = spark.createDataFrame(rows, "sid long, elems array<string>")
    cand = {
        (r.id_a, r.id_b)
        for r in prefix_filter_candidates(df, "sid", "elems", t_num, t_den).collect()
    }
    for i, a in enumerate(sets):
        for j, b in enumerate(sets):
            if i < j:
                jac = len(set(a) & set(b)) / len(set(a) | set(b))
                if jac >= t_num / t_den:
                    assert (i, j) in cand, (a, b, jac)


@settings(deadline=None, max_examples=6, suppress_health_check=[HealthCheck.function_scoped_fixture], derandomize=True)
@given(
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 99)), min_size=0, max_size=30),
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 9)), min_size=0, max_size=8),
)
def test_salted_join_equals_plain_join(spark, left_rows, right_rows):
    """salted_join's contract: identical multiset of rows to the plain
    join, for inner and left, including keys present on only one side
    and duplicate right-side keys (each right row exists once per salt,
    so multiplicity is preserved)."""
    from spring_cloud_kafka_streams_dbz_etl_spark.operators.relational import (
        salted_join,
    )

    left = spark.createDataFrame(
        [(k, v) for k, v in left_rows] or [(None, None)], "k int, lv int"
    ).filter(F.col("k").isNotNull())
    right = spark.createDataFrame(
        [(k, v) for k, v in right_rows] or [(None, None)], "k int, rv int"
    ).filter(F.col("k").isNotNull())
    for how in ("inner", "left"):
        plain = sorted(
            map(tuple, left.join(right, "k", how).select("k", "lv", "rv").collect())
        )
        salted = sorted(
            map(
                tuple,
                salted_join(
                    left, right, on="k", salt_src=F.col("lv"), n_salts=4, how=how
                )
                .select("k", "lv", "rv")
                .collect(),
            )
        )
        assert salted == plain, how


@settings(deadline=None, max_examples=60)
@given(
    st.text(alphabet="abcdefghij#0123456789", min_size=18, max_size=18),
    st.sets(st.integers(0, 17), max_size=2),
)
def test_fuzzy_segment_pigeonhole(name, subs):
    """q_fuzzy_match's blocking guarantee: <=2 substitutions in an
    18-char string always leave >=1 of the 3 six-char segments
    bit-identical, so the segment equi-join's candidate set is complete."""
    other = list(name)
    for i in subs:
        other[i] = "X"
    other = "".join(other)
    segs_a = [name[s * 6 : s * 6 + 6] for s in range(3)]
    segs_b = [other[s * 6 : s * 6 + 6] for s in range(3)]
    assert any(a == b for a, b in zip(segs_a, segs_b))


@settings(deadline=None, max_examples=12, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.tuples(st.integers(0, 14), st.integers(0, 14)).filter(lambda e: e[0] != e[1]),
        min_size=0,
        max_size=40,
    )
)
def test_triangle_enumeration_matches_bruteforce(spark, edge_list):
    """graph.triangle_enumerate (the operator q_triangle_count and
    tools/measure_triangles.py run) enumerates EXACTLY the triangle set
    of the undirected graph — each triangle once, none missed, on
    arbitrary (including hub-heavy) graphs, vs an itertools brute
    force."""
    import itertools

    from spring_cloud_kafka_streams_dbz_etl_spark.operators.graph import (
        triangle_enumerate,
    )

    edges = {(min(a, b), max(a, b)) for a, b in edge_list}
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expected = {
        (a, b, c)
        for a, b, c in itertools.combinations(sorted(adj), 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    }

    if not edges:
        return
    pairs = spark.createDataFrame(
        [(a, b) for a, b in sorted(edges)], "vec_a long, vec_b long"
    )
    got = {
        (r.tri_a, r.tri_b, r.tri_c)
        for r in triangle_enumerate(pairs, src="vec_a", dst="vec_b").collect()
    }
    assert got == expected


def test_zone_map_skip_is_sound(spark, sf_smoke):
    """A file marked can_skip must contain ZERO rows matching the probe
    — zone-map pruning may only ever skip provably-empty files (false
    positives in 'keep' are allowed; false negatives in 'skip' are
    data loss at the scan layer)."""
    from spring_cloud_kafka_streams_dbz_etl_spark.queries import all_queries
    from spring_cloud_kafka_streams_dbz_etl_spark.queries.layout import (
        ZM_CUST_HI,
        ZM_CUST_LO,
        ZM_PRICE_LO,
    )

    specs = all_queries()
    zm = specs["q_zone_map_skip"].fn(spark, sf_smoke)
    skippable = {r.file_id for r in zm.filter("can_skip").collect()}
    if not skippable:
        return
    layout = specs["q_zorder_layout"].fn(spark, sf_smoke).select("o_orderkey", "file_id")
    orders = spark.read.parquet(f"{sf_smoke}/orders.parquet")
    matches = (
        orders.join(layout, "o_orderkey")
        .filter(
            (F.col("o_custkey") >= ZM_CUST_LO)
            & (F.col("o_custkey") <= ZM_CUST_HI)
            & (F.col("o_totalprice") >= ZM_PRICE_LO)
        )
        .filter(F.col("file_id").isin(skippable))
        .count()
    )
    assert matches == 0


@settings(deadline=None, max_examples=15, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.tuples(
            st.integers(0, 6),                      # user
            st.integers(0, 99),                     # time position
            st.floats(-1e6, 1e6, allow_nan=False),  # value
        ),
        min_size=1,
        max_size=60,
    ),
    st.integers(0, 100),
)
def test_incremental_agg_merge_equals_recompute(spark, rows, cutoff):
    """q_incremental_agg's invariant on arbitrary data and ANY cutoff:
    FULL OUTER merging the base-slice aggregate with the delta-slice
    aggregate equals aggregating everything — count and DECIMAL-sum are
    commutative monoids, and the decimal path keeps the equality exact
    (bit-for-bit, not approximately) regardless of how rows split."""
    from decimal import Decimal

    df = spark.createDataFrame(rows, "user long, pos long, value double")
    base = df.filter(F.col("pos") < cutoff).groupBy("user").agg(
        F.count(F.lit(1)).alias("bn"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("bv"),
    )
    delta = df.filter(F.col("pos") >= cutoff).groupBy(
        F.col("user").alias("d_user")
    ).agg(
        F.count(F.lit(1)).alias("dn"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("dv"),
    )
    zero = F.lit(0).cast("decimal(18,6)")
    merged = (
        base.join(delta, base.user == delta.d_user, "full_outer")
        .select(
            F.coalesce("user", "d_user").alias("user"),
            (F.coalesce("bn", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias("n"),
            (F.coalesce("bv", zero) + F.coalesce("dv", zero)).alias("v"),
        )
    )
    recomputed = df.groupBy("user").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("v"),
    )
    got = {(r.user, r.n, r.v) for r in merged.collect()}
    exp = {(r.user, r.n, r.v) for r in recomputed.collect()}
    assert got == exp


pareto_points = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),  # x (small range forces ties)
        st.integers(min_value=0, max_value=6),  # y (and exact duplicates)
    ),
    min_size=1,
    max_size=20,
)


@given(st.lists(pareto_points, min_size=1, max_size=6))
@settings(**SETTINGS)
def test_pareto_frontier_matches_bruteforce_dominance(spark, cases):
    """Spec pin for the skyline operator (the oracle-parity check runs the
    SAME algorithm on both engines, so it cannot catch an algorithmic
    bug): a row survives iff no other row in its case is >= on both axes
    and strictly > on one — exact duplicates all survive."""
    from spring_cloud_kafka_streams_dbz_etl_spark.operators.relational import (
        pareto_frontier,
    )

    rows = [
        (case_id, i, x, y)
        for case_id, pts in enumerate(cases)
        for i, (x, y) in enumerate(pts)
    ]
    df = spark.createDataFrame(rows, "case_id int, row_id int, x int, y int")
    # isolate cases in ONE operator call: shift x ascending and y
    # DESCENDING by case — any two points from different cases are then
    # incomparable (one axis strictly higher, the other strictly lower),
    # so no cross-case domination; monotone shifts within a case preserve
    # its dominance relation exactly.
    n_cases = len(cases)
    shifted = df.select(
        "case_id",
        "row_id",
        (F.col("case_id") * 1000 + F.col("x")).alias("x"),
        ((F.lit(n_cases) - F.col("case_id")) * 1000 + F.col("y")).alias("y"),
    )
    got = {
        (r["case_id"], r["row_id"])
        for r in pareto_frontier(shifted, "x", "y").collect()
    }
    expected = set()
    for case_id, pts in enumerate(cases):
        for i, (x, y) in enumerate(pts):
            dominated = any(
                (x2 >= x and y2 > y) or (x2 > x and y2 >= y) for (x2, y2) in pts
            )
            if not dominated:
                expected.add((case_id, i))
    assert got == expected


scd2_changes = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # key
        st.integers(min_value=0, max_value=12),  # ts (collisions likely)
        st.integers(min_value=0, max_value=99),  # unique-ified below
    ),
    min_size=1,
    max_size=18,
)


@given(
    st.lists(scd2_changes, min_size=1, max_size=5),
    st.integers(min_value=0, max_value=17),
    st.integers(min_value=0, max_value=17),
)
@settings(**SETTINGS)
def test_scd2_merge_equals_recompute(spark, cases, cut1, cut2):
    """Folding a changelog through scd2_merge in ANY batch split —
    including out-of-order splits, so late changes rewrite a touched
    key's history — must equal one-shot scd2_intervals over the whole
    changelog (the s_scd2_stream invariant)."""
    from spring_cloud_kafka_streams_dbz_etl_spark.operators.changelog import (
        scd2_intervals,
        scd2_merge,
    )

    rows = [
        (case_id, key, ts, case_id * 1000 + i)  # change_id: unique tiebreak
        for case_id, changes in enumerate(cases)
        for i, (key, ts, _) in enumerate(changes)
    ]
    schema = "case_id int, key int, ts int, change_id int"
    full = spark.createDataFrame(rows, schema)
    keys = ["case_id", "key"]

    lo, hi = sorted((min(cut1, cut2), max(cut1, cut2)))
    splits = [
        [r for r in rows if r[3] % 18 < lo],
        [r for r in rows if lo <= r[3] % 18 < hi],  # arbitrary, ts-unordered
        [r for r in rows if r[3] % 18 >= hi],
    ]
    cur = None
    for batch_rows in splits:
        if not batch_rows:
            continue
        batch = spark.createDataFrame(batch_rows, schema)
        cur = scd2_merge(cur, batch, keys, "ts", tiebreak_cols=["change_id"])
        # materialize between batches like the streaming sink does
        cur = spark.createDataFrame(cur.collect(), cur.schema)

    got = {tuple(r) for r in cur.collect()}
    exp = {
        tuple(r)
        for r in scd2_intervals(full, keys, "ts", tiebreak_cols=["change_id"]).collect()
    }
    assert got == exp


# -- grid-cell interval overlap join ----------------------------------------

interval_case = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1),  # key
        st.integers(min_value=0, max_value=45),  # start day offset
        st.integers(min_value=0, max_value=25),  # span (end = start + span)
    ),
    min_size=0,
    max_size=18,
)


@given(st.lists(interval_case, min_size=1, max_size=6),
       st.sampled_from([1, 7, 30]))
@settings(**SETTINGS)
def test_interval_overlap_grid_equals_bruteforce(spark, cases, cell_days):
    """Grid-cell bucketed overlap join == quadratic brute force, for every
    cell width: completeness (no overlapping pair escapes its ownership
    cell) and uniqueness (no pair double-counted across the cells it
    co-occupies — the property the ownership filter exists for).
    Adversarial shapes hypothesis reaches: spans crossing many cells,
    boundary-aligned ends, duplicate intervals, zero-length intervals,
    singleton keys."""
    from datetime import date, timedelta

    from spring_cloud_kafka_streams_dbz_etl_spark.operators.temporal import (
        interval_overlap_pairs,
    )

    epoch = date(1992, 1, 1)
    rows = []
    for case_id, intervals in enumerate(cases):
        for i, (k, s, span) in enumerate(intervals):
            rows.append(
                (
                    case_id * 1000 + k,  # isolate cases by key namespace
                    case_id * 1000000 + i,
                    epoch + timedelta(days=s),
                    epoch + timedelta(days=s + span),
                )
            )
    if not rows:
        return
    df = spark.createDataFrame(rows, "k bigint, id bigint, s date, e date")
    got = sorted(
        (r.k, r.a_id, r.b_id)
        for r in interval_overlap_pairs(
            df, key="k", id_col="id", start="s", end="e", cell_days=cell_days
        ).collect()
    )
    expected = sorted(
        (ka, ia, ib)
        for (ka, ia, sa, ea) in rows
        for (kb, ib, sb, eb) in rows
        if ka == kb and ia < ib and sa <= eb and sb <= ea
    )
    assert got == expected


# -- CEP pattern-with-negation ----------------------------------------------

event_seq = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # user
        st.integers(min_value=0, max_value=100),  # minute offset
        st.sampled_from(["view", "purchase", "error", "click"]),
    ),
    min_size=0,
    max_size=30,
)


@given(st.lists(event_seq, min_size=1, max_size=6))
@settings(**SETTINGS)
def test_event_pattern_matches_bruteforce(spark, cases):
    """The REGISTERED pattern-with-negation plan (event_pattern_matches,
    the exact conditional-last state columns q_event_pattern serves)
    must equal the brute-force scan of each user's ordered history —
    duplicate timestamps, back-to-back purchases, errors ON the view
    minute, and users with no views are the shapes hypothesis shrinks
    to. Until r10 this test fuzzed an inline replica of the window
    expressions; it now drives the production operator (VERDICT r9 #4)."""
    from datetime import datetime, timedelta

    from spring_cloud_kafka_streams_dbz_etl_spark.queries.analytic import (
        event_pattern_matches,
    )

    T = 30  # minutes
    epoch = datetime(2024, 1, 1)
    rows = []
    for case_id, events in enumerate(cases):
        for i, (u, minute, typ) in enumerate(events):
            rows.append(
                (
                    case_id * 10 + u,
                    case_id * 1000 + i,
                    epoch + timedelta(minutes=minute),
                    typ,
                )
            )
    if not rows:
        return
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp_ntz, event_type string"
    )
    got = sorted(
        (r.user_id, r.event_id)
        for r in event_pattern_matches(df, window_us=T * 60 * 1_000_000).collect()
    )
    expected = []
    by_user: dict = {}
    for uid, eid, ts, typ in rows:
        by_user.setdefault(uid, []).append((ts, eid, typ))
    for uid, evs in by_user.items():
        evs.sort()
        last_view = last_err = None
        for ts, eid, typ in evs:
            if (
                typ == "purchase"
                and last_view is not None
                and (ts - last_view).total_seconds() * 1_000_000 <= T * 60 * 1_000_000
                and (last_err is None or last_err < last_view)
            ):
                expected.append((uid, eid))
            if typ == "view":
                last_view = ts
            elif typ == "error":
                last_err = ts
    assert got == sorted(expected)


# -- time-series sliding-window subsequence match ----------------------------

ts_case = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # supplier
        st.integers(min_value=0, max_value=12),  # week
        st.integers(min_value=0, max_value=9),  # count
    ),
    min_size=0,
    max_size=25,
)


@given(
    st.lists(ts_case, min_size=1, max_size=5),
    st.lists(st.integers(min_value=0, max_value=8), min_size=2, max_size=4),
)
@settings(**SETTINGS)
def test_ts_similarity_matches_bruteforce(spark, cases, pattern):
    """ts_best_window — the REGISTERED integer-HOF sliding-window
    distance plan behind q_ts_similarity (VERDICT r9 #4) — must equal a
    plain-python scan of every zero-filled series: same global horizon
    (max week over ALL suppliers), same squared-L2 per offset, the
    (distance, smaller offset) tie-break, and the degenerate-horizon
    rule (no length-L window -> supplier absent). Sparse weeks,
    all-zero series, distance ties between offsets, and horizons
    shorter than the pattern are the shrink targets."""
    from spring_cloud_kafka_streams_dbz_etl_spark.queries.advanced import (
        ts_best_window,
    )

    seen: dict[tuple[int, int], int] = {}
    for case_id, triples in enumerate(cases):
        for skr, w, c in triples:
            # (sk, w) unique by construction upstream (wk is a groupBy
            # result); last write wins to dedup the generated triples
            seen[(case_id * 10 + skr, w)] = c
    if not seen:
        return
    rows = [(sk, w, c) for (sk, w), c in seen.items()]
    wk = spark.createDataFrame(rows, "sk bigint, w int, c bigint")
    got = sorted(
        (r.l_suppkey, r.best_offset, r.best_dist)
        for r in ts_best_window(wk, pattern).collect()
    )
    L = len(pattern)
    n_weeks = max(w for (_, w) in seen) + 1
    expected = []
    if n_weeks >= L:
        for sk in sorted({s for (s, _) in seen}):
            series = [seen.get((sk, w), 0) for w in range(n_weeks)]
            best = min(
                (
                    sum((series[o + d] - pattern[d]) ** 2 for d in range(L)),
                    o,
                )
                for o in range(n_weeks - L + 1)
            )
            expected.append((sk, best[1], best[0]))
    assert got == sorted(expected)


def test_corpus_shuffle_invariant_to_partitioning(spark, sf_smoke):
    """q_corpus_shuffle's claim: the permutation is stable across
    physical partitionings — repartitioned inputs produce the identical
    (doc_id, shard, pos) assignment."""
    from spring_cloud_kafka_streams_dbz_etl_spark.queries import all_queries

    fn = all_queries()["q_corpus_shuffle"].fn
    base = sorted(map(tuple, fn(spark, sf_smoke).collect()))
    import spring_cloud_kafka_streams_dbz_etl_spark.catalog as cat

    orig = cat.table

    def skewed(spark_, sf, name):
        df = orig(spark_, sf, name)
        return df.repartition(7) if name == "documents" else df

    cat.table = skewed
    try:
        import spring_cloud_kafka_streams_dbz_etl_spark.queries.curation as cur

        orig_cur = cur.table
        cur.table = skewed
        try:
            again = sorted(map(tuple, fn(spark, sf_smoke).collect()))
        finally:
            cur.table = orig_cur
    finally:
        cat.table = orig
    assert base == again


# -- distributed exact global rank ------------------------------------------

rank_values = st.lists(
    st.one_of(
        st.none(),  # NULL leads must rank FIRST (the r7 bucket-0 fix)
        st.integers(min_value=-5, max_value=5),  # heavy duplicate mass
        st.integers(min_value=-(10**6), max_value=10**6),
    ),
    min_size=1,
    max_size=120,
)


@given(values=rank_values, n_buckets=st.sampled_from([1, 2, 4, 32]))
@settings(**SETTINGS)
def test_global_rank_equals_single_sort(spark, values, n_buckets):
    """global_rank's invariant on arbitrary data and ANY bucket count:
    (rank, total) per row must equal the single-partition
    Window.orderBy row_number it replaces — including NULL leads
    (NULLS FIRST under ascending sort), duplicate-heavy distributions
    (equal keys may never straddle a bucket boundary), and the
    degenerate 1-bucket case. The sketch accuracy knob may only affect
    bucket BALANCE, never ranks."""
    from pyspark.sql import Window as W

    from spring_cloud_kafka_streams_dbz_etl_spark.operators.rank import global_rank

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "id long, v long"
    )
    got = {
        r["id"]: (r["rank"], r["total"])
        for r in global_rank(df, ["v", "id"], n_buckets=n_buckets).collect()
    }
    w = W.orderBy(F.col("v").asc(), F.col("id").asc())  # asc = NULLS FIRST
    exp = {
        r["id"]: (r["rank"], len(values))
        for r in df.withColumn(
            "rank", F.row_number().over(w).cast("long")
        ).collect()
    }
    assert got == exp


@given(n=st.integers(min_value=8, max_value=2_000_000_000))
@settings(max_examples=300, deadline=None)
def test_ivf_knob_chain_invariants(n):
    """The corpus-sized ANN knob chain (r11, width doubled r12) holds
    its contracts at any corpus size: k in [8, max(8, n/32)] and within
    the FAISS band up to the occupancy clamp; nprobe in [4, k]
    (2·ceil(√k) ≤ k for every k ≥ KMEANS_K_MIN = 8, ivf_probe's
    validation range) with the scanned fraction nprobe/k nonincreasing
    in k; the refine depth is exactly 2*TOPK per probed cell. Also pins the
    Python/SQL twin property on the subset DuckDB can check cheaply —
    the formulas use only GREATEST/LEAST/CEIL/SQRT over exact ints, so
    agreement on representative values implies agreement everywhere the
    same libm sqrt is used."""
    import math

    from spring_cloud_kafka_streams_dbz_etl_spark.operators.similarity import (
        IVF_TARGET_CELL,
        KMEANS_K_MIN,
        ivf_cells_for,
        nprobe_for,
    )
    from spring_cloud_kafka_streams_dbz_etl_spark.queries.similarity import (
        TOPK,
        refine_depth_for,
    )

    k = ivf_cells_for(n)
    assert k >= KMEANS_K_MIN
    assert k <= max(KMEANS_K_MIN, n // IVF_TARGET_CELL)
    assert k <= max(KMEANS_K_MIN, math.ceil(4 * math.sqrt(n)))
    np_ = nprobe_for(k)
    assert 4 <= np_ <= k  # ivf_probe's accepted range
    assert refine_depth_for(np_) == 2 * TOPK * np_
    # pruning improves (weakly) with corpus growth once the cell count
    # actually grows: the r12 2× width multiplies both sides of the
    # r11 inequality by 2, so for k4 >= 2k, 2·ceil(sqrt(k4))/k4 <=
    # 2·(1/sqrt(2k) + 1/(2k)) < 2/sqrt(k) <= 2·ceil(sqrt(k))/k. Across
    # the KMEANS_K_MIN floor the fraction CAN tick up (hypothesis found
    # n=80 -> 3/8 vs n=320 -> 4/10) — the floor pins k for corpora too
    # small for pruning to matter, so the guarantee starts where the
    # rule leaves the clamp.
    k4 = ivf_cells_for(4 * n)
    if k4 >= 2 * k:
        assert nprobe_for(k4) / k4 <= np_ / k + 1e-12


def test_ivf_knob_chain_matches_duckdb_twin():
    """The knobs CTE arithmetic (the SQL twin inside _kmeans_cte_chain)
    must equal the Python rules value-for-value across a size sweep —
    the same GREATEST/LEAST/CEIL/SQRT composition, so any drift here
    means an engine's sqrt/ceil semantics changed."""
    import duckdb

    from spring_cloud_kafka_streams_dbz_etl_spark.operators.similarity import (
        IVF_TARGET_CELL,
        KMEANS_K_MIN,
        ivf_cells_for,
        nprobe_for,
    )

    sizes = [8, 32, 100, 250, 500, 1_000, 2_000, 16_384, 1_000_000,
             123_456_789, 1_000_000_000]
    rows = duckdb.sql(
        "SELECT n, k, GREATEST(4, 2 * CAST(CEIL(SQRT(k)) AS BIGINT)) AS np FROM ("
        f"  SELECT n, GREATEST({KMEANS_K_MIN}, LEAST(CAST(CEIL(4 * SQRT(n)) AS BIGINT),"
        f"         n // {IVF_TARGET_CELL})) AS k"
        f"  FROM (SELECT UNNEST({sizes}) AS n))"
    ).fetchall()
    for n, k_sql, np_sql in rows:
        assert k_sql == ivf_cells_for(n), n
        assert np_sql == nprobe_for(k_sql), n


def test_seed_hash_order_matches_duckdb_twin():
    """_seed_hash (Spark) and _seed_h (SQL) must induce the SAME total
    order over ids — the property cell/code numbering depends on. Checked
    as pure arithmetic over a range with collisions (ids equal mod 2^20
    tie-break on id), no Spark session needed."""
    import duckdb

    ids = list(range(0, 3000)) + [2**20, 2**20 + 1, 5 * 2**20 + 7, 2**40 + 7]
    py = sorted(ids, key=lambda i: ((i % 2**20) * 2654435761 % 2**32, i))
    sql = [
        r[0]
        for r in duckdb.sql(
            f"SELECT i FROM (SELECT UNNEST({ids}) AS i) "
            "ORDER BY ((i % 1048576) * 2654435761) % 4294967296, i"
        ).fetchall()
    ]
    assert py == sql


@settings(max_examples=300, deadline=None)
@given(
    st.one_of(
        st.floats(
            min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
        ),
        # stress the tie neighborhood: exact 7-decimal lattice points,
        # where the 7th digit is 5 and Python round() would go half-even
        st.integers(min_value=-10_000_000, max_value=10_000_000).map(
            lambda n: n / 1e7
        ),
    )
)
def test_round_half_up6_matches_duckdb_round(x):
    """round_half_up6 is the driver-side control-plane twin of the SQL
    ROUND(x, 6) the mse oracles use (q_linear_probe /
    s_linear_probe_online / q_linear_probe_pca). This fuzz pins it
    against DuckDB itself — and it has already earned its keep twice:
    it killed Python round() (half-to-even, the ADVICE r11 item) AND
    the first replacement (shortest-repr Decimal quantize), whose
    counterexample 562949953.9125094 revealed DuckDB's real algorithm
    is half-away on the SCALED DOUBLE (std::round(x*1e6)/1e6), not on
    the decimal expansion. The wide float strategy covers the
    scaled-tie artifacts; the lattice strategy covers true decimal
    ties."""
    import duckdb

    from spring_cloud_kafka_streams_dbz_etl_spark.queries import round_half_up6

    expected = duckdb.sql(
        "SELECT ROUND(CAST(? AS DOUBLE), 6)", params=[x]
    ).fetchone()[0]
    assert round_half_up6(x) == expected, (x, round_half_up6(x), expected)


# -- r12 daily-rollup detectors ------------------------------------------------

daily_series = st.lists(
    st.integers(min_value=0, max_value=50), min_size=1, max_size=40
)  # one count per consecutive day, one series per case


@given(st.lists(daily_series, min_size=1, max_size=6))
@settings(**SETTINGS)
def test_mean_shift_table_matches_python_model(spark, cases):
    """mean_shift_table (q_mean_shift_detect's detector stage) == a
    plain-Python two-window scan on random daily series — full-window
    row set, exact window means, the 25%-of-global-mean flag."""
    import datetime

    from spring_cloud_kafka_streams_dbz_etl_spark.queries.analytic import (
        MS_W,
        mean_shift_table,
    )

    rows = []
    day0 = datetime.date(2024, 1, 1)
    for case_id, counts in enumerate(cases):
        for i, c in enumerate(counts):
            rows.append((f"t{case_id}", day0 + datetime.timedelta(days=i), c))
    daily = spark.createDataFrame(rows, "event_type string, day date, cnt long")
    got = {
        (r["event_type"], r["day"]): (
            r["before_mean"], r["after_mean"], r["shift"], r["is_change"]
        )
        for r in mean_shift_table(daily).collect()
    }
    expected = {}
    for case_id, counts in enumerate(cases):
        n = len(counts)
        gmean = sum(counts) / n
        for i in range(n):
            if i < MS_W or i + MS_W > n:
                continue  # incomplete before/after window
            sb = sum(counts[i - MS_W : i])
            sa = sum(counts[i : i + MS_W])
            shift_raw = (sa - sb) / MS_W
            expected[(f"t{case_id}", day0 + datetime.timedelta(days=i))] = (
                round(sb / MS_W, 6),
                round(sa / MS_W, 6),
                round(shift_raw, 6),
                1 if abs(shift_raw) > 0.25 * gmean else 0,
            )
    assert set(got) == set(expected)
    for k in expected:
        # window means/shift divide exact ints by a constant; Python
        # round() on these agrees with F.round because the quotients
        # terminate well before the 6th decimal (x/7 to 6dp has no ties)
        assert got[k] == expected[k], (k, got[k], expected[k])


@given(st.lists(daily_series, min_size=1, max_size=6))
@settings(**SETTINGS)
def test_seasonal_decompose_identity(spark, cases):
    """q_seasonal_decompose's algebra on random series: trend is the
    exact centered-window mean (full windows only), and
    trend + seasonal + residual reconstructs the observed count to
    rounding (the additive-decomposition identity)."""
    import datetime

    from spring_cloud_kafka_streams_dbz_etl_spark.queries.analytic import SD_HALF

    # drive the detector stage via a temp view mirroring its daily CTE:
    # rebuild the same relation the query derives from events
    rows = []
    day0 = datetime.date(2024, 3, 1)
    for case_id, counts in enumerate(cases):
        for i, c in enumerate(counts):
            rows.append((f"t{case_id}", day0 + datetime.timedelta(days=i), c))
    daily = spark.createDataFrame(rows, "event_type string, day date, cnt long")
    width = 2 * SD_HALF + 1

    from pyspark.sql import Window

    wc = (
        Window.partitionBy("event_type")
        .orderBy(F.col("day").asc())
        .rowsBetween(-SD_HALF, SD_HALF)
    )
    tr = daily.select(
        "event_type",
        "day",
        "cnt",
        F.sum("cnt").over(wc).alias("tsum"),
        F.count(F.lit(1)).over(wc).alias("tn"),
    ).filter(F.col("tn") == width)
    got = {(r["event_type"], r["day"]): r["tsum"] for r in tr.collect()}
    for case_id, counts in enumerate(cases):
        n = len(counts)
        for i in range(n):
            key = (f"t{case_id}", day0 + datetime.timedelta(days=i))
            if i < SD_HALF or i + SD_HALF >= n:
                assert key not in got, key
            else:
                assert got[key] == sum(counts[i - SD_HALF : i + SD_HALF + 1]), key


# -- vocabulary growth (Heaps curve) ------------------------------------------

# (doc_id, text) corpora: sparse non-contiguous ids, empty docs,
# multi-space runs, duplicated words across and within docs — the
# adversarial surface for the threshold/conditional-sum arithmetic.
heaps_corpus = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=400),  # sparse doc_id
        st.lists(
            st.sampled_from(["a", "bb", "ccc", "dd", "e", "ffff"]),
            min_size=0,
            max_size=6,
        ),
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda t: t[0],
)


@given(heaps_corpus, st.lists(st.tuples(
    st.integers(min_value=1, max_value=4),
    st.integers(min_value=1, max_value=16),
), min_size=1, max_size=4))
@settings(**SETTINGS)
def test_vocab_growth_matches_python_model(spark, corpus, fracs):
    """vocab_growth_curve == the brute-force Heaps model: for each
    threshold t = max_id * num // den, n_docs / n_tokens over docs with
    id <= t and vocab = |{w : min doc_id containing w <= t}| — on
    corpora with sparse ids and empty documents."""
    from spring_cloud_kafka_streams_dbz_etl_spark.queries.text import (
        vocab_growth_curve,
    )

    rows = [(int(i), " ".join(ws)) for i, ws in corpus]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    grid = tuple(fracs)
    got = {
        r["grid_idx"]: (
            r["threshold_id"], r["n_docs"], r["n_tokens"], r["vocab_size"]
        )
        for r in vocab_growth_curve(spark, d, grid).collect()
    }
    max_id = max(i for i, _ in corpus)
    first = {}
    for i, ws in sorted(corpus):
        for w in ws:
            first.setdefault(w, i)
    for gi, (num, den) in enumerate(grid, start=1):
        t = max_id * num // den
        in_pref = [(i, ws) for i, ws in corpus if i <= t]
        n_docs = len(in_pref)
        n_tokens = sum(len(ws) for _, ws in in_pref)
        vocab = sum(1 for w, fd in first.items() if fd <= t)
        # rows exist for EVERY grid point, including all-empty prefixes
        # (ttr is NULL there — not compared; the oracle parity pins it)
        assert got[gi] == (t, n_docs, n_tokens, vocab), (gi, got.get(gi))


# -- embedding DQ audit: cross-engine on anomalous corpora --------------------


def test_embedding_dq_cross_engine_anomalies(spark, tmp_path):
    """The driver fixture is fully healthy (every anomaly column 0), so
    this pins the anomaly branches cross-engine on a synthetic corpus:
    zero vectors, zero-LENGTH vectors (DuckDB empty list_sum is NULL),
    NaN / +-Inf components (whose sqrt would not cast to DECIMAL in
    DuckDB — excluded from the envelope on both engines), width
    mismatches, and an entirely-poisoned label (avg over zero finite
    rows -> NULL, not a job abort). Spark query vs the registered
    DuckDB oracle, compared the driver's way (repr over name-sorted
    columns)."""
    import math

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spring_cloud_kafka_streams_dbz_etl_spark.queries import all_queries

    nan, inf = float("nan"), float("inf")
    rows = [
        (0, 0, [1.0] * 64),                     # healthy, right width
        (1, 0, [0.0] * 64),                     # zero norm
        (2, 0, []),                             # zero LENGTH -> zero norm
        (3, 0, [0.5] * 16),                     # width mismatch, finite
        (4, 1, [nan] + [1.0] * 63),             # NaN component
        (5, 1, [inf] + [1.0] * 63),             # +Inf
        (6, 1, [-inf] + [1.0] * 63),            # -Inf
        (7, 2, [nan] * 8),                      # label 2: ALL poisoned
        (8, 2, [-inf] * 64),
    ]
    tbl = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [r[2] for r in rows], pa.list_(pa.float32())
            ),
            "label": pa.array([r[1] for r in rows], pa.int32()),
        }
    )
    pq.write_table(tbl, tmp_path / "embeddings.parquet")

    spec = all_queries()["q_embedding_dq"]
    sdf = spec.fn(spark, str(tmp_path))
    got = sorted(
        tuple(repr(row[c]) for c in sorted(sdf.columns)) for row in sdf.collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{tmp_path}/embeddings.parquet')"
    )
    res = con.execute(spec.oracle).fetchall()
    cols = [d[0] for d in con.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    exp = sorted(tuple(repr(r[i]) for i in order) for r in res)
    assert got == exp

    by_label = {int(r["label"]): r for r in sdf.collect()}
    l0, l1, l2 = by_label[0], by_label[1], by_label[2]
    assert (l0["n_vectors"], l0["n_zero_norm"], l0["n_dim_mismatch"],
            l0["n_nonfinite"]) == (4, 2, 2, 0)
    assert math.isclose(l0["max_norm"], 8.0)  # ||[1]*64||
    assert math.isclose(l0["min_norm"], 0.0)
    assert (l1["n_nonfinite"], l1["n_zero_norm"]) == (3, 0)
    assert l1["min_norm"] is None and l1["avg_norm"] is None  # no finite rows
    assert (l2["n_vectors"], l2["n_nonfinite"]) == (2, 2)
    assert l2["avg_norm"] is None


def test_bpe_capacity_cross_engine_on_degenerate_corpus(spark, tmp_path):
    """q_bpe_capacity on an all-empty/whitespace corpus: zero histogram
    rows make SUM NULL, and both engines' NULL-skipping LEAST would let
    n_merges silently degrade to the raw vocab_target without the
    COALESCE. Pins n_merges == 0 and capacity == 0, cross-engine."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spring_cloud_kafka_streams_dbz_etl_spark.queries import all_queries

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["", "   ", " "], pa.string()),
            "lang": pa.array(["en"] * 3, pa.string()),
            "source": pa.array(["s"] * 3, pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    spec = all_queries()["q_bpe_capacity"]
    sdf = spec.fn(spark, str(tmp_path))
    rows = {int(r["vocab_target"]): r for r in sdf.collect()}
    for t, r in rows.items():
        assert (r["merge_capacity"], r["n_merges"], r["alphabet_size"]) == (0, 0, 0), (t, r)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    got = sorted(
        tuple(repr(row[c]) for c in sorted(sdf.columns)) for row in sdf.collect()
    )
    res = con.execute(spec.oracle).fetchall()
    cols = [d[0] for d in con.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    assert got == sorted(tuple(repr(r[i]) for i in order) for r in res)


# -- knob-plan: lsh_bits float/integer equivalence ----------------------------


@given(st.one_of(
    st.integers(min_value=1, max_value=10**9),
    # adversarial band: around powers of two times the target bucket
    st.integers(min_value=1, max_value=40).flatmap(
        lambda k: st.integers(min_value=-2, max_value=2).map(
            lambda d: max(1, 1024 * (1 << k) + d)
        )
    ),
))
@settings(max_examples=300, deadline=None, derandomize=True)
def test_lsh_bits_integer_equivalence(n):
    """q_knob_plan's oracle states lsh_bits_for INTEGER-exactly (the
    smallest b >= 8 with 2^b * 1024 >= n) to keep libm log2 out of the
    cross-engine surface; this pins the Python float form equal to that
    definition, including the +-2 neighborhoods of every power-of-two
    boundary where a misrounded log2 would flip the ceil."""
    from spring_cloud_kafka_streams_dbz_etl_spark.operators.similarity import (
        lsh_bits_for,
    )

    b = 8
    while (1 << b) * 1024 < n:
        b += 1
    assert lsh_bits_for(n) == b, (n, lsh_bits_for(n), b)


@given(
    st.lists(graph_case, min_size=1, max_size=4),
    st.data(),
)
@settings(**SETTINGS)
def test_survivor_manifest_matches_argmax_model(spark, cases, data):
    """survivor_manifest == union-find clusters + pure-Python argmax
    survivorship (max n_chars, tie -> min doc_id), with n_chars drawn
    from a TINY range so ties inside clusters are common — the fixture
    corpus may never exercise the tie-break, this does."""
    from spring_cloud_kafka_streams_dbz_etl_spark.operators.dedup import (
        survivor_manifest,
    )

    N = 10
    comp_rows, doc_rows = [], []
    clusters: dict[int, list[int]] = {}
    chars: dict[int, int] = {}
    for case_id, edges in enumerate(cases):
        off = case_id * N
        labels = _union_find_components(N, edges)
        for v in range(N):
            doc, comp_id = off + v, off + labels[v]
            comp_rows.append((doc, comp_id))
            chars[doc] = data.draw(st.integers(1, 3))
            doc_rows.append((doc, chars[doc]))
            clusters.setdefault(comp_id, []).append(doc)
    expected = {}
    for cid, members in clusters.items():
        if len(members) < 2:
            continue
        surv = min(members, key=lambda d: (-chars[d], d))
        expected[cid] = (
            len(members), surv, chars[surv], len(members) - 1,
            sum(chars[d] for d in members if d != surv),
        )
    comp = spark.createDataFrame(comp_rows, "doc_id long, cluster_id long")
    docs = spark.createDataFrame(doc_rows, "doc_id long, n_chars long")
    got = {
        r["cluster_id"]: (
            r["cluster_size"], r["survivor_id"], r["survivor_chars"],
            r["n_dropped"], r["chars_reclaimed"],
        )
        for r in survivor_manifest(comp, docs).collect()
    }
    assert got == expected


@given(
    st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(0, 500)),  # (doc_id, n_chars)
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    st.integers(1, 6),  # number of micro-batches to split arrivals into
    st.integers(1, 1000),  # target chars per shard
)
@settings(max_examples=60, deadline=None)
def test_shard_assign_state_function_matches_cumulative_model(
    rows, n_batches, target
):
    """The applyInPandasWithState kernel behind s_shard_assign, driven
    directly (no Spark): arbitrary docs split across arbitrary batch
    boundaries must produce shard_id = floor(chars_before/target) exactly
    as the single-pass cumulative model does — the assignment is a pure
    function of the (batch, doc_id)-ordered prefix, independent of WHERE
    the batch boundaries fall. (The Spark-side twin is the
    s_shard_assign oracle + the checkpoint-restart pin.)"""
    import pandas as pd

    from spring_cloud_kafka_streams_dbz_etl_spark.streaming.stateful import (
        running_shard_assign,
    )

    assign = None

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            assert self.exists
            return self._v

        def update(self, v):
            self._v = tuple(v)
            self.exists = True

    # extract the closure the operator hands to applyInPandasWithState
    class Capture:
        def groupBy(self, *_):
            return self

        def applyInPandasWithState(self, fn, **_):
            nonlocal assign
            assign = fn
            return None

    running_shard_assign(Capture(), target)
    assert assign is not None

    # replay: batches are doc_id-striped (doc_id % n_batches), matching
    # the arrival rule the registered query uses
    state = FakeState()
    got = {}
    for b in range(n_batches):
        batch = [(i, c) for i, c in rows if i % n_batches == b]
        pdf = pd.DataFrame(
            {"doc_id": [i for i, _ in batch], "n_chars": [c for _, c in batch]}
        )
        for out in assign(("src",), iter([pdf] if len(pdf) else []), state):
            for r in out.itertuples():
                got[r.doc_id] = r.shard_id
    # model: one pass in (batch, doc_id) order
    cum, exp = 0, {}
    for b in range(n_batches):
        for i, c in sorted((t for t in rows if t[0] % n_batches == b)):
            exp[i] = cum // target
            cum += c
    assert got == exp


# --- assign_shards: the two-pass distributed prefix scan must equal the
# naive per-source cumulative window on ANY input, including the edges
# the sf fixtures never produce: zero-char docs, docs far beyond the
# target (which leave empty shard ids behind them), single-doc sources,
# and more range partitions than rows.
shard_case = st.lists(
    st.tuples(
        st.integers(0, 3),        # source index
        st.integers(0, 200_000),  # n_chars (oversize >> target below)
    ),
    min_size=1,
    max_size=60,
)


@given(shard_case, st.integers(1, 40))
@settings(**SETTINGS)
def test_assign_shards_matches_naive_window_property(spark, docs, n_parts):
    from spring_cloud_kafka_streams_dbz_etl_spark.operators.layout import (
        assign_shards_handle,
    )

    target = 4_096
    rows = [(i, f"s{src}", chars) for i, (src, chars) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    a, parted = assign_shards_handle(df, target, n_parts=n_parts)
    try:
        got = {r["doc_id"]: r["shard_id"] for r in a.collect()}
    finally:
        parted.unpersist()
    exp = {
        r["doc_id"]: r["shard_id"]
        for r in df.select(
            "doc_id",
            F.expr(
                f"(sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id "
                f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
                f"- n_chars) DIV {target}"
            ).alias("shard_id"),
        ).collect()
    }
    assert got == exp


# --- dup-timeline: streaming per-slice partials re-aggregated through the
# shared rollup must equal the batch cells on ANY input — duplicate digests
# within one slice, across slices, singleton digests, and slice counts both
# above and below the distinct-digest count. The attribution key is the
# total integer order slice*(max_id+1)+doc_id, so first-occurrence must be
# unambiguous no matter how docs interleave.
dup_case = st.lists(
    st.tuples(
        st.integers(0, 5),   # text index (small space -> forced duplicates)
        st.integers(0, 3),   # slice id
    ),
    min_size=1,
    max_size=40,
)


@given(dup_case)
@settings(**SETTINGS)
def test_dup_timeline_stream_partials_equal_batch_cells(spark, docs):
    import tempfile

    from spring_cloud_kafka_streams_dbz_etl_spark.queries.curation import (
        dup_timeline_rollup,
    )
    from spring_cloud_kafka_streams_dbz_etl_spark.streaming.curation import (
        dup_timeline_partials,
    )

    rows = [(i, f"text body {t}", sl) for i, (t, sl) in enumerate(docs)]
    n = len(rows)  # max doc_id + 1
    df = spark.createDataFrame(rows, "doc_id long, text string, slice_id int")
    store = tempfile.mkdtemp(prefix="duptl_prop_")
    # epoch is a DENSE counter deliberately decoupled from the (possibly
    # sparse) slice ids — the ADVICE-r16 divergence case: attribution
    # must ride the slice_id data column, batch_id is only the
    # replay-overwrite partition key.
    for epoch, sl in enumerate(sorted({r[2] for r in rows})):
        batch = df.filter(F.col("slice_id") == sl)
        dup_timeline_partials(batch, epoch, store, n)
        # replay immediately: must not change the store's logical content
        dup_timeline_partials(batch, epoch, store, n)
    partials = spark.read.parquet(store).select(
        "h",
        F.col("slice_id").cast("int").alias("slice_id"),
        F.col("cnt").cast("bigint").alias("cnt"),
        F.col("key").cast("bigint").alias("key"),
    )
    got = {
        r["slice_id"]: (r["n_docs"], r["n_dup"], r["dup_ppm"])
        for r in dup_timeline_rollup(partials).collect()
    }
    # batch reference: same cells computed in one pass
    cells = df.groupBy(F.md5("text").alias("h"), "slice_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.min(F.col("slice_id").cast("long") * n + F.col("doc_id")).alias("key"),
    )
    exp = {
        r["slice_id"]: (r["n_docs"], r["n_dup"], r["dup_ppm"])
        for r in dup_timeline_rollup(cells).collect()
    }
    assert got == exp
