"""Dirty-data parity: degenerate inputs must degrade, not abort.

Spark 4 runs ANSI mode by default, where ``x / 0`` throws and kills the
job — so one zero-norm embedding, one single-row group, or one constant
series in a 100 TB corpus would abort an entire run. The DuckDB oracle
returns NULL for those divisions instead. functions/vector.py::safe_div
aligns the engine with the oracle at every data-dependent denominator;
this suite feeds deliberately dirty tables through the REAL registered
queries AND their REAL registered oracles and requires full parity —
the same contract the driver checks, on data the driver's clean
fixtures can't reach.
"""

from __future__ import annotations

import duckdb
import pytest

from spring_cloud_kafka_streams_dbz_etl_spark.queries import all_queries

from .oracle import canonical

SPECS = all_queries()

# dim-64 embeddings (the contract dim — q_lsh_cosine's fixed hyperplane
# matrix and its static oracle SQL are both pinned to 64), two label
# cells; vec_id < 8 are probes. Degenerates:
#  - 2 and 8: all-zero (zero norm -> NULL cosine; 2 is also a probe)
#  - 5: exact duplicate of 1 (forces cosine == 1.0 ties)
#  - 12: one NaN component (corrupt embedding). Scoring paths propagate
#    the NaN identically in both engines (NaN ranks largest); candidate
#    GENERATION paths (LSH index, blocked cosine pairs) exclude it via
#    the has_nan guard on both sides — without the guard the LSH integer
#    quantization ABORTS both engines and the Arrow pair pass drops
#    pairs the oracle keeps.
# Deterministic integer-grid components (k/8) so both engines read
# identical doubles from the parquet.
_DIM = 64


def _vec(i: int) -> list[float]:
    if i in (2, 8):
        return [0.0] * _DIM
    j = 1 if i == 5 else i
    v = [((j * 7 + d * 3) % 11 - 5) / 8.0 for d in range(_DIM)]
    if i == 12:
        v[3] = float("nan")
    return v


_LABELS = (0, 0, 0, 1, 1, 0, 1, 1, 1, 0, 1, 0, 1)
DIRTY_EMBEDDINGS = [(i, _vec(i), _LABELS[i]) for i in range(13)]

# l_returnflag groups: 'S' single row (n-1 = 0: sample variance
# undefined), 'C' constant on BOTH axes (sdx*sdy = 0: corr undefined),
# 'M' constant on one axis only, 'N' normal
DIRTY_LINEITEM = [
    ("S", 5.0, 100.0),
    ("C", 3.0, 50.0),
    ("C", 3.0, 50.0),
    ("C", 3.0, 50.0),
    ("M", 7.0, 10.0),
    ("M", 7.0, 20.0),
    ("M", 7.0, 30.0),
    ("N", 1.0, 10.0),
    ("N", 2.0, 25.0),
    ("N", 4.0, 60.0),
]


@pytest.fixture(scope="module")
def dirty_sf(spark, tmp_path_factory):
    sf = str(tmp_path_factory.mktemp("dirty") / "sf")
    spark.createDataFrame(
        DIRTY_EMBEDDINGS, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(f"{sf}/embeddings.parquet")
    spark.createDataFrame(
        DIRTY_LINEITEM, "l_returnflag string, l_quantity double, l_extendedprice double"
    ).coalesce(1).write.parquet(f"{sf}/lineitem.parquet")
    return sf


def dirty_compare(spark, sf: str, name: str, tables: tuple[str, ...]) -> None:
    spec = SPECS[name]
    got_df = spec.fn(spark, sf)
    got = [tuple(r) for r in got_df.collect()]
    con = duckdb.connect()
    for t in tables:
        con.execute(
            # Spark writes a part-file directory, unlike the driver's
            # single-file testdata — glob into it for DuckDB
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet/*.parquet')"
        )
    expected = con.execute(spec.oracle).fetchall()
    exp_cols = [d[0] for d in con.description]
    assert sorted(got_df.columns) == sorted(exp_cols), name
    assert len(got) == len(expected), (
        f"{name}: spark={len(got)} oracle={len(expected)}"
    )
    c_got, c_exp = canonical(got, got_df.columns), canonical(expected, exp_cols)
    assert c_got == c_exp, (
        f"{name}: first diffs "
        + str([(g, e) for g, e in zip(c_got, c_exp) if g != e][:3])
    )


EMBEDDING_QUERIES = [
    "q_cosine_topk",  # NULL cosines rank after every real score, both engines
    "q_vector_quantize",  # zero vector -> NULL scale -> NULL q8 parts
    "q_lsh_cosine",  # zero-norm pair inside a colliding bucket -> NULL, dropped
    "q_embedding_cosine_dup",  # Arrow NaN -> NULL handoff == oracle x/0.0
    "q_knn_graph",
    "q_knn_hubness",  # NULL/NaN cosines rank identically inside the kNN cut
    "q_triangle_count",
    "q_semantic_clusters",  # corrupt vector = singleton cluster, both sides
]


@pytest.mark.parametrize("name", EMBEDDING_QUERIES)
def test_dirty_embeddings_parity(spark, dirty_sf, name):
    dirty_compare(spark, dirty_sf, name, ("embeddings",))


def test_dirty_lineitem_stats_parity(spark, dirty_sf):
    # single-row group: NULL stddev+corr; constant group: NULL corr —
    # never a DIVIDE_BY_ZERO abort
    dirty_compare(spark, dirty_sf, "q_stats_moments", ("lineitem",))


# empty string, whitespace-only, NULL text, single char, unicode,
# repeated single token, normal — the shapes a raw web crawl actually
# contains. split(' ') never yields an empty array (empty string ->
# ['']) so the token-ratio family NULL-propagates on NULL text and
# stays finite otherwise, in both engines.
DIRTY_DOCUMENTS = [
    (0, "", "en", "webA", 0),
    (1, "   ", "en", "webA", 3),
    (2, None, "en", "webB", None),
    (3, "x", "und", "webB", 1),
    (4, "héllo wörld héllo wörld", "de", "webB", 23),
    (5, "a a a a a a a a", "en", "webC", 15),
    (6, "the quick brown fox jumps over the lazy dog", "en", "webC", 43),
    # single-doc source: zero variance -> q_quality_length_corr must
    # return NULL corr on BOTH engines, never a DIVIDE_BY_ZERO abort
    (7, "solo source document here", "en", "webD", 25),
    # exact duplicate of doc 6 in a LATER id-decile: q_dup_timeline must
    # attribute it to its own slice, first occurrence stays clean
    (8, "the quick brown fox jumps over the lazy dog", "en", "webC", 43),
]

TEXT_QUERIES = [
    "q_text_stats",
    "q_token_count",
    "q_lang_id",
    "q_quality_score",
    "q_char_entropy",
    "q_fingerprint",
]


@pytest.fixture(scope="module")
def dirty_docs_sf(spark, tmp_path_factory):
    sf = str(tmp_path_factory.mktemp("dirtydocs") / "sf")
    spark.createDataFrame(
        DIRTY_DOCUMENTS,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(f"{sf}/documents.parquet")
    return sf


@pytest.mark.parametrize("name", TEXT_QUERIES)
def test_dirty_documents_parity(spark, dirty_docs_sf, name):
    dirty_compare(spark, dirty_docs_sf, name, ("documents",))


# r16 additions over documents: NULL text must NULL-propagate through
# the chunk loop / correlation inputs / gram builders identically, the
# single-doc source must yield NULL correlation (zero variance) instead
# of aborting, and the exact duplicate must attribute to its own slice.
R16_DOC_QUERIES = [
    "q_chunk_langid_mix",
    "q_quality_length_corr",
    "q_dup_timeline",
    "q_source_mix_drift",
    "q_eval_gram_coverage",  # every dirty doc is bench-id'd: corpus side empty
    "q_langid_gate_sweep",  # NULL text: integer gate compare NULL-propagates
]


@pytest.mark.parametrize("name", R16_DOC_QUERIES)
def test_dirty_documents_r16_parity(spark, dirty_docs_sf, name):
    dirty_compare(spark, dirty_docs_sf, name, ("documents",))


def test_dirty_quality_gate_sweep_parity(spark, dirty_docs_sf):
    """q_quality_gate_sweep on the dirty corpus — parity including the
    NULL-text drop and the coalesced token sums."""
    dirty_compare(spark, dirty_docs_sf, "q_quality_gate_sweep", ("documents",))


def test_quality_gate_sweep_all_und_corpus_degrades(spark, tmp_path):
    """An all-non-English corpus (lang gate keeps nothing) must yield the
    FULL threshold grid with zero counts and NULL shares on both engines
    — never a divide-by-zero abort, never an empty result."""
    import duckdb

    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        [(0, "xyzzy plugh grue", "und", "webX", 16),
         (1, "foo bar baz qux", "und", "webX", 15)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(f"{sf}/documents.parquet")
    spec = SPECS["q_quality_gate_sweep"]
    got = sorted(tuple(r) for r in spec.fn(spark, sf).collect())
    assert len(got) == 5
    assert all(r[1] == 0 and r[2] == 0 and r[3] is None and r[4] is None
               for r in got)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    exp = sorted(tuple(r) for r in con.execute(spec.oracle).fetchall())
    assert got == exp


def test_dirty_quality_length_corr_null_variance(spark, dirty_docs_sf):
    """The zero-variance guard fires on the single-doc source: corr is
    NULL (not NaN, not an abort) for webD."""
    got = {
        r["source"]: r["corr_lq"]
        for r in SPECS["q_quality_length_corr"].fn(spark, dirty_docs_sf).collect()
    }
    assert got["webD"] is None
